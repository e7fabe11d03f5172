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
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
