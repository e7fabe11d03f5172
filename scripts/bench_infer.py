#!/usr/bin/env python3
"""Sliding-window inference benchmark: exact vs fast (trunk-once) paths.

    python scripts/bench_infer.py [--clips 8] [--reps 5] [--batch 512]
        [--dtype bf16|fp32] [--paths exact,fast]

Measures ms per 60 s clip (SS5, win 300 / step 5 = 541 windows) with the
amortized-sync methodology from BASELINE.md: through the axon tunnel one
scalar fetch costs a fixed ~32 ms RPC, so we chain `clips x reps`
dispatches and sync once; per-clip cost = total / (clips * reps).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seld_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--paths", default="exact,fast")
    ap.add_argument("--model_config", default="SS5")
    ap.add_argument("--clip_batch", type=int, default=4,
                    help="fast path: clips stacked per head chunk")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from seld_tpu.config import get_model_config
    from seld_tpu.inference.ensemble import ensemble_outputs
    from seld_tpu.models import build_model

    cfg = get_model_config(args.model_config, search_paths=["./model_config"])
    cfg["n_classes"] = 12
    model = build_model("conv_temporal", (300, 64, 7), cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 300, 64, 7)),
        train=False)
    rng = np.random.RandomState(0)
    clips = [jnp.asarray(rng.randn(3000, 64, 7), jnp.float32)
             for _ in range(args.clips)]
    if args.dtype == "bf16":
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, variables)
        clips = [c.astype(jnp.bfloat16) for c in clips]

    time_down = cfg.get("first_pool_size", [5, 1])[0]

    def run(fast):
        return ensemble_outputs(
            model.apply, variables, clips, win_size=300, step_size=5,
            batch_size=args.batch, fast=fast, time_down=time_down,
            clip_batch=args.clip_batch)

    for path in args.paths.split(","):
        fast = path.strip() == "fast"
        outs = run(fast)  # compile + first execution
        # a REAL sync: through the tunnel block_until_ready does not block,
        # and the server's first execution of a new executable can cost
        # minutes (measured: 993 s one-time on the exact path) — a scalar
        # fetch is the only reliable barrier (BASELINE.md methodology)
        float(jnp.sum(outs[-1][0]))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            outs = run(fast)
        # one scalar fetch syncs the whole chain (amortized ~32 ms RPC)
        float(jnp.sum(outs[-1][0]))
        dt = time.perf_counter() - t0
        per_clip = dt / (args.reps * args.clips) * 1e3
        print(f"{path:5s}: {per_clip:7.2f} ms/clip "
              f"({60000.0 / per_clip:.0f}x real-time) "
              f"[{args.clips}x{args.reps} clips, batch {args.batch}, "
              f"{args.dtype}]")


if __name__ == "__main__":
    main()
