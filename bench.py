#!/usr/bin/env python3
"""Benchmark: flagship (conv_temporal + SS5) training throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "windows/sec", "vs_baseline": N}

Env knobs: BENCH_BATCH (256), BENCH_STEPS (40), BENCH_DTYPE (bf16|fp32,
default bf16 — mixed precision with fp32 master params; the loss curve is
pinned to fp32 by tests/test_train_core.py::test_bf16_loss_trajectory...),
BENCH_UNROLL (GRU scan unroll), BENCH_PRNG (rbg|threefry|unsafe_rbg),
BENCH_FLAT (1 = flattened optimizer), BENCH_MATMUL_PRECISION,
BENCH_PAD_CH (input channels; Conv now MXU-aligns channels internally),
BENCH_SPC / BENCH_SPC_UNROLL (multi-step scan), BENCH_FUSE_METRICS,
BENCH_SCAN_DEPTH (scan conformer stages over depth),
BENCH_AGC. Round-1 default config measured ~9,000 windows/sec; round-2
(Pallas GRU + bf16 + fused stem v2) ~17,700.

Baseline: the reference publishes no throughput anywhere (BASELINE.md). The
recorded reference anchor is a FLOPs-derived estimate of its TF2 stack on the
2021-era challenge GPU (V100): SS5 is ~0.44 GFLOPs/forward-window
(nas_seldnet.py:27-28 budget), ~1.32 GFLOPs fwd+bwd; at the ~7.5% achieved
utilization typical of this codebase's small-conv + cuDNN-biGRU graph that is
~890 windows/sec. vs_baseline = measured / 890.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_WINDOWS_PER_SEC = 890.0  # documented estimate, see BASELINE.md

# The only MEASURED like-for-like anchor available in this environment is
# CPU-class (scripts/measure_reference.py: the reference's own TF2 stack vs
# ours on the same single CPU core, SS5 B=32) — it cannot validate a
# chip-class ratio, so it ships alongside vs_baseline for honesty:
MEASURED_CPU_ANCHOR = {
    "reference_tf2_cpu_windows_per_sec": 22.07,
    "seld_tpu_xla_cpu_windows_per_sec": 10.1,
}

# Hardware peak for the MFU line: one v5e (v5litepod) chip is 197 TFLOP/s
# bf16. MFU convention: model FLOPs in the hardware counting (2 flops per
# multiply-accumulate; backward = 2x forward for conv/dense, so fwd+bwd =
# 3x forward = 6x the analytic MAC count complexity.py reports) divided by
# peak. See BASELINE.md "MFU accounting" for the reconciliation with the
# per-family geometry floors.
V5E_BF16_PEAK_TFLOPS = 197.0
FWD_BWD_HW_FLOPS_PER_MAC = 6.0  # 2 flops/MAC x (1 fwd + 2 bwd)


def robust_window_time(run_window, n_windows=2, anomaly_ratio=1.25):
    """Self-validating timed measurement (round-4 verdict demand #1).

    The recorded environment lesson (docs/STATUS.md round 3): the server's
    FIRST execution of a freshly-compiled executable can cost ~1000 s, and a
    warmup that ends in block_until_ready(params) does NOT flush it — params
    are already on device, so the wait returns before the step executable has
    ever run. BENCH_r04.json recorded 757 w/s (24x under the chip's real
    18.3k) exactly this way. Two guards:

      1. the caller's warmup must end in a REAL scalar fetch of the step
         output (enforced in main below), and
      2. this function times `n_windows` back-to-back measurement windows —
         any residual first-execution/recompile cost can only land in window
         0 (by window 1 the executable has certainly run), so if window 0
         exceeds `anomaly_ratio` x the best of the rest it is dropped and the
         run is flagged.

    run_window() must execute the fixed-size step loop, block until the
    device is idle, and return its wall time. Returns
    (per_window_seconds, window_times, anomaly_flag).
    """
    times = [run_window() for _ in range(n_windows)]
    if len(times) == 1:  # single window: no cross-check possible
        return times[0], times, False
    rest_min = min(times[1:])
    anomaly = times[0] > anomaly_ratio * rest_min
    counted = times[1:] if anomaly else times
    return sum(counted) / len(counted), times, anomaly


def main():
    import jax

    # SELD_PLATFORM=cpu for local smoke runs: the environment's
    # sitecustomize rewrites JAX_PLATFORMS to "axon,cpu", so the env var
    # alone cannot keep a test run off the tunneled chip
    if os.environ.get("SELD_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

    # persistent compilation cache: the SS5 train step takes minutes to
    # compile through the tunneled chip; cache it across runs
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from seld_tpu.config import get_model_config
    from seld_tpu.models import build_model
    from seld_tpu.train import losses as L
    from seld_tpu.train import metrics as M
    from seld_tpu.train.optimizers import adabelief
    from seld_tpu.train.steps import make_train_step
    from seld_tpu.train.train_state import TrainState

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    n_classes = 12
    # BENCH_PAD_CH=8 zero-pads the 7-channel input to 8 (MXU-aligned stem
    # wgrad experiment; numerics unchanged — the padded channel is zero)
    in_ch = int(os.environ.get("BENCH_PAD_CH", "7"))
    input_shape = (300, 64, in_ch)

    cfg = get_model_config("SS5", search_paths=["./model_config"])
    cfg["n_classes"] = n_classes
    if os.environ.get("BENCH_DROPOUT0", "0") == "1":
        # perf probe: zero every dropout (conformer stages default 0.1) to
        # bound the rng/mask family's share of the step
        for key in ("BLOCK0", "BLOCK1", "BLOCK2", "SED", "DOA"):
            cfg.setdefault(f"{key}_ARGS", {})["dropout_rate"] = 0.0
    if os.environ.get("BENCH_SCAN_DEPTH", "0") == "1":
        # perf probe: lax.scan the conformer stages over their depth (one
        # compiled body, depth-stacked params) instead of unrolling
        for key in ("BLOCK2", "SED"):
            cfg.setdefault(f"{key}_ARGS", {})["scan_depth"] = True
    if os.environ.get("BENCH_BN_PAIR", "0") == "1":
        # perf probe: batch the mother block's main-conv + skip-projection
        # BN stat reductions into one concat-BN-split (numerics exact)
        cfg.setdefault("BLOCK0_ARGS", {})["bn_pair_batch"] = True
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    if unroll > 1:
        cfg["DOA_ARGS"]["unroll"] = unroll
    model = build_model("conv_temporal", input_shape, cfg)
    # jitted init: eager init is hundreds of small dispatches (slow on a
    # tunneled chip); one compiled init is a single execution
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, *input_shape)),
        train=False)

    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_PRNG", "rbg"))
    if os.environ.get("BENCH_MATMUL_PRECISION"):
        jax.config.update("jax_default_matmul_precision",
                          os.environ["BENCH_MATMUL_PRECISION"])
    flatten_opt = os.environ.get("BENCH_FLAT", "1") == "1"
    agc = None if os.environ.get("BENCH_AGC", "1") == "0" else 0.01
    tx = optax.inject_hyperparams(
        lambda learning_rate: adabelief(learning_rate, agc_clip=agc,
                                        flatten=flatten_opt)
    )(learning_rate=1e-3)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx,
        rng=jax.random.PRNGKey(1))

    cw = L.class_weights_from_samples(L.DCASE2021_TRAIN_SAMPLES)
    import jax.numpy as _jnp
    compute_dtype = {"bf16": _jnp.bfloat16, "bfloat16": _jnp.bfloat16,
                     "": None, "fp32": None}[
                         os.environ.get("BENCH_DTYPE", "bf16")]
    spc = int(os.environ.get("BENCH_SPC", "1"))
    step_kwargs = dict(
        # label_smoothing=0: the reference's trainv2 --label_smoothing flag
        # is dead code (generate_iterloop never forwards it, trainv2.py:72),
        # so the actual challenge workload trains unsmoothed (docs/PARITY.md)
        sed_loss_fn=lambda y, p: L.sed_loss_with_weights(
            y, p, cw, label_smoothing=0.0),
        doa_loss_fn=lambda y, p: L.MMSE_with_cls_weights(y, p, cw),
        loss_weights=(1.0, 1000.0), l2=1e-3, donate=True,
        compute_dtype=compute_dtype)
    if spc > 1:
        from seld_tpu.train.steps import make_train_multistep
        step = make_train_multistep(
            steps_per_call=spc,
            unroll=int(os.environ.get("BENCH_SPC_UNROLL", "1")),
            **step_kwargs)
    else:
        step = make_train_step(
            fuse_metrics=os.environ.get("BENCH_FUSE_METRICS", "0") == "1",
            **step_kwargs)

    rng = np.random.RandomState(0)
    lead = (spc, batch) if spc > 1 else (batch,)
    # the batch is fed pre-cast to the compute dtype, as the real pipeline
    # does since round 3 (SeldDataset feature_dtype: datasets are cast once
    # at build) — this removes the in-graph f32->bf16 convert+relayout of
    # the 55 MB input (0.186 ms/step in the round-3 trace, +1.9%).
    # BENCH_X_DTYPE=fp32 restores an f32 feed.
    x_dtype = {"bf16": _jnp.bfloat16, "bfloat16": _jnp.bfloat16,
               "fp32": jnp.float32, "": jnp.float32}[
        os.environ.get("BENCH_X_DTYPE",
                       os.environ.get("BENCH_DTYPE", "bf16"))]
    x = jnp.asarray(rng.randn(*lead, *input_shape), x_dtype)
    sed = jnp.asarray((rng.rand(*lead, 60, n_classes) < 0.1), jnp.float32)
    doa = jnp.asarray(
        np.clip(rng.randn(*lead, 60, 3 * n_classes), -1, 1)
        * np.repeat(np.asarray(sed), 3, axis=-1), jnp.float32)
    mstate = M.init_state(n_classes)

    # warmup / compile. MUST end in a real scalar fetch of the STEP OUTPUT:
    # block_until_ready(state.params) returns before the freshly-compiled
    # step executable has ever run (params are already resident), and this
    # server's first execution of a new executable can cost ~1000 s
    # (docs/STATUS.md round 3) — that cost then lands inside the timed
    # window (BENCH_r04: 757 w/s vs the chip's real 18.3k). Fetching a loss
    # scalar cannot complete until the step has actually executed.
    state, mstate, wlosses = step(state, mstate, x, (sed, doa))
    state, mstate, wlosses = step(state, mstate, x, (sed, doa))
    warmup_loss = float(np.asarray(
        jax.tree_util.tree_leaves(wlosses)[0]).ravel()[0])
    assert np.isfinite(warmup_loss), f"non-finite warmup loss {warmup_loss}"

    # 400 timed steps: through the axon tunnel the final block_until_ready
    # costs a fixed ~32 ms RPC round trip (measured; BASELINE.md); at 40
    # steps that fixed cost understated throughput by ~5% (0.8 ms/step).
    # Real training syncs once per epoch (1000+ steps), so a long window is
    # the honest steady-state measurement. Two back-to-back windows are
    # timed and cross-checked (robust_window_time): if window 0 absorbed
    # residual first-execution cost anyway, it is dropped and flagged.
    n_steps = int(os.environ.get("BENCH_STEPS", "400"))
    n_calls = max(1, n_steps // spc)

    def run_window():
        nonlocal state, mstate
        t0 = time.perf_counter()
        losses = None
        for _ in range(n_calls):
            state, mstate, losses = step(state, mstate, x, (sed, doa))
        jax.block_until_ready(losses)
        return time.perf_counter() - t0

    dt, window_times, anomaly = robust_window_time(
        run_window,
        n_windows=max(1, int(os.environ.get("BENCH_WINDOWS", "2"))))

    windows_per_sec = n_calls * spc * batch / dt

    # MFU accounting (round-4 verdict demand #5): analytic forward MACs per
    # window from the NAS complexity model — itself pinned to XLA's
    # cost_analysis by tests/test_nas_flops.py — converted to hardware
    # fwd+bwd FLOPs (2 flops/MAC, backward = 2x forward) against the chip's
    # bf16 peak.
    from seld_tpu.nas.complexity import conv_temporal_complexity
    cx, _ = conv_temporal_complexity(cfg, input_shape)
    gmacs_fwd = cx["flops"] / 1e9  # analytic MACs (reference convention)
    gflops_window = gmacs_fwd * FWD_BWD_HW_FLOPS_PER_MAC
    achieved_tflops = windows_per_sec * gflops_window / 1e3
    print(json.dumps({
        "metric": "ss5_train_throughput",
        "value": round(windows_per_sec, 2),
        "unit": "windows/sec",
        "vs_baseline": round(windows_per_sec / REFERENCE_WINDOWS_PER_SEC, 3),
        # vs_baseline divides by a FLOPs-DERIVED estimate of the reference
        # on a 2021-era V100 (~890 w/s at ~7.5% util) — the reference
        # publishes no throughput anywhere (BASELINE.md). The measured
        # CPU-class pair below is the honest sanity anchor.
        "baseline_kind": "estimated",
        "baseline_windows_per_sec": REFERENCE_WINDOWS_PER_SEC,
        "measured_cpu_anchor": MEASURED_CPU_ANCHOR,
        # measurement-contract self-validation
        "warmup_anomaly": bool(anomaly),
        "window_times_sec": [round(t, 3) for t in window_times],
        "steps_per_window": n_calls * spc,
        # hardware-anchored utilization (fwd MACs are the reference's FLOP
        # convention; hardware FLOPs = 6x: 2/MAC x (fwd + 2x-fwd backward))
        "model_gmacs_per_window_fwd": round(gmacs_fwd, 4),
        "model_gflops_per_window": round(gflops_window, 4),
        "achieved_tflops": round(achieved_tflops, 2),
        "mfu_vs_bf16_peak": round(achieved_tflops / V5E_BF16_PEAK_TFLOPS, 4),
        "peak_tflops_bf16": V5E_BF16_PEAK_TFLOPS,
    }))


if __name__ == "__main__":
    main()
