#!/usr/bin/env python3
"""Streaming-inference latency demo: simulate a live SELD feed.

Feeds a synthetic clip through seld_tpu.inference.StreamingSELD in
real-time-sized chunks and reports per-push latency (the serving metric:
each push blocks on its emitted frames) plus the real-time factor.

    python scripts/stream_demo.py [--model_config SS5] [--chunk 10]
        [--seconds 60] [--reps 3] [--bf16]

Through the tunneled axon chip every blocking fetch pays a fixed ~32 ms RPC
round trip (BASELINE.md); per-push wall time here includes it, so the
device-side cost is roughly (wall - RPC floor). On a co-located host the
RPC term vanishes.
"""
import argparse
import os
import sys
import time

if os.environ.get("SELD_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seld_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="conv_temporal")
    ap.add_argument("--model_config", default="SS5")
    ap.add_argument("--chunk", type=int, default=10,
                    help="label frames per push (10 = 1 s)")
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n_classes", type=int, default=12)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--streams", type=int, default=1,
                    help="lockstep concurrent streams per dispatch")
    ap.add_argument("--export_dir", default="",
                    help="serve from an exported stream bundle "
                         "(scripts/export_model.py --unit stream) instead "
                         "of the live model — no weights are loaded; "
                         "geometry flags come from the bundle's meta.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from seld_tpu.config import get_model_config
    from seld_tpu.models import build_model
    from seld_tpu.inference.streaming import StreamingSELD

    if args.export_dir:
        sp = StreamingSELD.from_exported(args.export_dir)
        if sp.n_streams != args.streams or sp.chunk_t != args.chunk:
            raise SystemExit(
                f"bundle was exported for n_streams={sp.n_streams}, "
                f"chunk={sp.chunk_t}; pass matching --streams/--chunk "
                "or re-export")
    else:
        cfg = get_model_config(args.model_config,
                               search_paths=["./model_config"])
        cfg["n_classes"] = args.n_classes
        input_shape = (300, 64, 7)
        model = build_model(args.model, input_shape, cfg)
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, *input_shape)),
            train=False)
        dtype = jnp.bfloat16 if args.bf16 else None
        if args.bf16:
            variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, variables)
        sp = StreamingSELD(model.apply, variables, feat_shape=(64, 7),
                           chunk=args.chunk, dtype=dtype,
                           n_streams=args.streams)
    print(f"measured trunk halo: {sp.halo_t} frames; "
          f"bootstrap length: {sp.l_f} feature frames "
          f"({sp.l_f / 50:.1f} s); emission latency: "
          f"{(sp.twin + sp.chunk_t) / 10:.1f} s behind the live edge; "
          f"{args.streams} lockstep stream(s) per dispatch")

    # geometry from the engine, so exported bundles of any feature shape /
    # time stride drive the same loop
    t_l = int(args.seconds * 10)          # label frames (100 ms each)
    t_f = t_l * sp.time_down
    rng = np.random.RandomState(0)
    clip = rng.randn(args.streams, t_f, *sp.feat_shape).astype(np.float32)
    if args.streams == 1:
        clip = clip[0]
    chunk_f = sp.chunk_f

    def cut(lo):
        return (clip[lo:lo + chunk_f] if args.streams == 1
                else clip[:, lo:lo + chunk_f])

    for rep in range(args.reps):
        sp.reset()
        lat, emitted = [], 0
        t_run0 = time.perf_counter()
        for lo in range(0, t_f, chunk_f):
            t0 = time.perf_counter()
            out = sp.push(cut(lo))
            lat.append(time.perf_counter() - t0)
            emitted += len(out)
        t0 = time.perf_counter()
        out = sp.finalize()
        fin = time.perf_counter() - t0
        emitted += len(out)
        wall = time.perf_counter() - t_run0
        # drop the bootstrap push unless it was the only one
        lat_ms = np.asarray(lat[1:] if len(lat) > 1 else lat) * 1e3
        rtx = args.seconds / wall * args.streams
        print(f"rep {rep}: {emitted}/{t_l} frames | push p50 "
              f"{np.percentile(lat_ms, 50):.1f} ms  p90 "
              f"{np.percentile(lat_ms, 90):.1f} ms  max {lat_ms.max():.1f} "
              f"ms | finalize {fin * 1e3:.1f} ms | whole clip {wall:.2f} s "
              f"= {rtx:.0f}x real-time aggregate")
        assert emitted == t_l, (emitted, t_l)


if __name__ == "__main__":
    main()
