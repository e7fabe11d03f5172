#!/usr/bin/env python3
"""Front-end dataset-build benchmark: batched vs per-clip extraction.

    python scripts/bench_frontend.py [--clips 16] [--chunk 8] [--mode foa]

Measures wall-clock for extracting N full 60 s clips through the on-device
front-end, comparing the round-3 batched path (`extract_features_clips`:
one vmapped dispatch per chunk) against the round-2 per-clip dispatch loop,
and extrapolates to a 500-clip dataset build (round-2 VERDICT Missing #3
acceptance: seconds, not minutes, through the tunneled chip).
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
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--mode", default="foa", choices=["foa", "mic"])
    ap.add_argument("--seconds", type=float, default=60.0)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from seld_tpu.ops import extract_features, extract_features_clips

    rng = np.random.RandomState(0)
    wavs = [rng.randn(4, int(24000 * args.seconds)).astype(np.float32)
            for _ in range(args.clips)]

    # warmup/compile both paths (real scalar-fetch sync, BASELINE.md rules)
    out = extract_features_clips(wavs[: args.chunk], chunk_size=args.chunk,
                                 mode=args.mode)
    _ = float(out[-1].sum())
    one = np.asarray(extract_features(jnp.asarray(wavs[0]), mode=args.mode))
    _ = float(one.sum())

    t0 = time.perf_counter()
    feats = extract_features_clips(wavs, chunk_size=args.chunk,
                                   mode=args.mode)
    _ = float(feats[-1].sum())
    batched = time.perf_counter() - t0

    t0 = time.perf_counter()
    for w in wavs:
        f = np.asarray(extract_features(jnp.asarray(w), mode=args.mode))
    per_clip = time.perf_counter() - t0

    n = args.clips
    print(f"batched ({args.mode}, chunk {args.chunk}): "
          f"{batched:.2f}s for {n} clips "
          f"({batched / n * 1e3:.0f} ms/clip; 500 clips ~ "
          f"{batched / n * 500:.0f}s)")
    print(f"per-clip loop (round-2 path):        {per_clip:.2f}s for {n} "
          f"clips ({per_clip / n * 1e3:.0f} ms/clip; 500 clips ~ "
          f"{per_clip / n * 500:.0f}s)")
    print(f"speedup: {per_clip / batched:.1f}x")


if __name__ == "__main__":
    main()
