"""Profiling & step timing (the observability layer the reference lacks —
SURVEY §5: add jax.profiler traces + per-step timing as first-class).

Usage:
    with trace("/tmp/jax-trace"):          # xplane trace for TensorBoard
        step(...)

    timer = StepTimer(warmup=2)
    for batch in data:
        with timer:
            state, *_ = step(state, ...)
    print(timer.summary())                 # p50/p90/mean wall times + rate
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


def host_fingerprint() -> str:
    """Short hash identifying this host's ISA + jax version, used to
    namespace persistent compile caches (see enable_compilation_cache).
    Covers x86 ('flags') and arm ('Features') /proc/cpuinfo layouts, plus
    the machine arch so an unrecognized layout still splits per-arch."""
    import hashlib
    import platform
    try:
        with open("/proc/cpuinfo") as f:
            isa = next((ln for ln in f
                        if ln.startswith(("flags", "Features"))), "")
    except OSError:
        isa = ""
    return hashlib.sha1(
        (platform.machine() + isa + jax.__version__).encode()
    ).hexdigest()[:12]


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             min_compile_secs: float = 2.0) -> str:
    """Enable JAX's persistent compilation cache.

    Train-step compiles take minutes on a tunneled TPU; the cache makes them
    one-time per machine. Default location: `<repo>/.jax_cache/<host-fp>`.

    The default dir is namespaced by a host-CPU fingerprint: XLA:CPU stores
    AOT machine code keyed WITHOUT the host's ISA features, so a cache
    written on an AVX512 host and read on a lesser one warns "could lead to
    execution errors such as SIGILL" and then delivers exactly that
    (measured here: exit -6 aborts + sporadic wrong results after a machine
    swap between sessions). TPU executables don't care, but the same dir
    serves SELD_PLATFORM=cpu runs, so everything is namespaced.
    """
    import os
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache",
            host_fingerprint())
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir


def configure_fast_rng(impl: str = "rbg") -> None:
    """Use XLA's rbg PRNG for dropout/augmentation streams.

    threefry (JAX default) is ALU-heavy; rbg measured ~+10% SS5 train
    throughput on v5e with statistically adequate dropout randomness.
    """
    jax.config.update("jax_default_prng_impl", impl)


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with device-sync and warmup exclusion.

    Under async dispatch a jitted call returns before the device finishes;
    either block inside the timed region yourself (as profile_train.py
    does) or pass ``sync`` as a zero-argument CALLABLE returning the
    freshest result to block on — a captured array would already be ready
    after the first step, silently timing dispatch latency only.
    """

    def __init__(self, warmup: int = 2, sync=None):
        self.warmup = warmup
        self._times = []
        self._t0: Optional[float] = None
        if sync is not None and not callable(sync):
            raise TypeError(
                "sync must be a zero-arg callable returning the current "
                "step's result (a captured array goes stale after step 1)")
        self._sync = sync

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            jax.block_until_ready(self._sync())
        self._times.append(time.perf_counter() - self._t0)
        return False

    def observe(self, result=None):
        """Alternative API: call after each step with its result."""
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        if self._t0 is not None:
            self._times.append(now - self._t0)
        self._t0 = now

    @property
    def times(self) -> np.ndarray:
        return np.asarray(self._times[self.warmup:])

    def summary(self, items_per_step: Optional[int] = None) -> Dict[str, float]:
        t = self.times
        if len(t) == 0:
            return {}
        out = {
            "steps": int(len(t)),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "total_s": float(t.sum()),
            "steps_per_sec": float(1.0 / t.mean()),
        }
        if items_per_step:
            out["items_per_sec"] = float(items_per_step / t.mean())
        return out

    def reset(self):
        self._times = []
        self._t0 = None


def device_memory_stats(device=None) -> dict:
    """HBM usage for one device (empty dict where the backend doesn't
    report, e.g. the CPU backend). Keys follow PJRT conventions:
    bytes_in_use, peak_bytes_in_use, bytes_limit, ...

    The observability the reference lacks entirely (SURVEY §5); useful for
    sizing batch/steps_per_call against the 16 GB v5e HBM.
    """
    import jax
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


def format_memory_stats(stats: dict) -> str:
    if not stats:
        return "memory stats unavailable on this backend"
    gib = 1 << 30
    parts = []
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in stats:
            parts.append(f"{key}={stats[key] / gib:.2f}GiB")
    return ", ".join(parts) or str(stats)
