#!/usr/bin/env python3
"""Profile the training step: per-step timing + optional jax.profiler trace
(the observability layer the reference lacks, SURVEY §5).

    python scripts/profile_train.py [--model conv_temporal --model_config SS5]
        [--batch 256] [--steps 20] [--trace /tmp/jax-trace]

Prints a timing summary (p50/p90/mean, windows/sec) and, with --trace,
writes an xplane trace viewable in TensorBoard / Perfetto.
"""
import argparse
import os
import sys

if os.environ.get("SELD_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seld_tpu.utils.profiling import (enable_compilation_cache,
                                      configure_fast_rng)
enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="conv_temporal")
    ap.add_argument("--model_config", default="SS5")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--n_classes", type=int, default=12)
    ap.add_argument("--trace", default="",
                    help="directory for a jax.profiler trace")
    ap.add_argument("--prng", default="rbg")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"],
                    help="compute dtype (bench default is bf16)")
    ap.add_argument("--pad_ch", type=int, default=7,
                    help="input channels (8 = MXU-aligned stem experiment)")
    args = ap.parse_args()
    configure_fast_rng(args.prng)

    import jax
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
    from seld_tpu.utils.profiling import StepTimer, trace

    input_shape = (300, 64, args.pad_ch)
    cfg = get_model_config(args.model_config,
                           search_paths=["./model_config"])
    cfg["n_classes"] = args.n_classes
    model = build_model(args.model, input_shape, cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, *input_shape)),
        train=False)

    tx = optax.inject_hyperparams(
        lambda learning_rate: adabelief(learning_rate, agc_clip=0.01)
    )(learning_rate=1e-3)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx,
        rng=jax.random.PRNGKey(1))

    cw = L.class_weights_from_samples(L.DCASE2021_TRAIN_SAMPLES[
        :, :args.n_classes]) if args.n_classes == 12 else None
    step = make_train_step(
        sed_loss_fn=lambda y, p: L.sed_loss_with_weights(y, p, cw, 0.2),
        doa_loss_fn=lambda y, p: L.MMSE_with_cls_weights(y, p, cw),
        loss_weights=(1.0, 1000.0), l2=1e-3, donate=True,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else None)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, *input_shape), jnp.float32)
    sed = jnp.asarray((rng.rand(args.batch, 60, args.n_classes) < 0.1),
                      jnp.float32)
    doa = jnp.repeat(sed, 3, axis=-1) * 0.5
    mstate = M.init_state(args.n_classes)

    print("compiling...", flush=True)
    state, mstate, losses = step(state, mstate, x, (sed, doa))
    jax.block_until_ready(losses)

    timer = StepTimer(warmup=2)
    def run(n):
        nonlocal state, mstate
        for _ in range(n):
            with timer:
                state, mstate, out = step(state, mstate, x, (sed, doa))
                jax.block_until_ready(out)

    if args.trace:
        run(2)  # warmup outside the trace
        with trace(args.trace):
            run(args.steps)
        print(f"trace written to {args.trace}")
        try:
            from seld_tpu.utils.trace_analysis import (analyze_trace,
                                                       format_report)
            print(format_report(analyze_trace(args.trace)))
        except Exception as e:
            print(f"(trace analysis unavailable: {e})")
    else:
        run(args.steps + 2)

    summary = timer.summary(items_per_step=args.batch)
    for k, v in summary.items():
        print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
