"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the reference's CPU-forcing convention (`CUDA_VISIBLE_DEVICES=-1` in
every *_test.py), but for JAX: tests run on 8 virtual CPU devices so the
multi-device sharding paths are exercised without TPU hardware.
"""
import os
import sys

# The environment presets JAX_PLATFORMS=axon (real TPU) and a sitecustomize
# registers the axon PJRT plugin at interpreter start, turning the config into
# "axon,cpu". Overriding the env var alone is not enough — set the jax config
# explicitly before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
# silence XLA:CPU AOT-loader "machine feature" noise when reloading cached
# executables (prefer-no-scatter/gather are compile hints, not ISA features)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU collectives ABORT the process (rendezvous.cc "Exiting to ensure a
# consistent program state") when the 8 oversubscribed virtual-device
# threads miss a hard 40 s rendezvous timeout — routine on a loaded 1-core
# host the first time a freshly compiled all-reduce runs. Raise it; slow is
# fine, dead is not.
if "collective_call_terminate_timeout" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
               " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is compile-dominated on the single
# test CPU; caching executables across runs cuts reruns from >10 min to the
# actual execute time. Safe to delete .jax_cache_tests/ at any time.
# NAMESPACED BY HOST-CPU FINGERPRINT: XLA:CPU caches AOT machine code keyed
# without the host's ISA features; after a machine swap between sessions the
# stale blobs produced SIGABRT crashes and wrong numerics (two golden tests)
# here — the loader's "could lead to execution errors such as SIGILL" warning
# is real, not noise.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from seld_tpu.utils.profiling import host_fingerprint  # noqa: E402

_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_tests", host_fingerprint())
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
