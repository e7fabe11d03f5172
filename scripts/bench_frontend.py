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
    pcm = [(rng.randn(4, int(24000 * args.seconds)) * 6000).astype(np.int16)
           for _ in range(args.clips)]
    wavs = [p.astype(np.float32) / 32768.0 for p in pcm]

    # warmup/compile all paths (real scalar-fetch sync, BASELINE.md rules)
    for src in (wavs, pcm):
        out = extract_features_clips(src[: args.chunk],
                                     chunk_size=args.chunk, mode=args.mode)
        _ = float(out[-1].sum())
    one = np.asarray(extract_features(jnp.asarray(wavs[0]), mode=args.mode))
    _ = float(one.sum())

    def run(src):
        t0 = time.perf_counter()
        feats = extract_features_clips(src, chunk_size=args.chunk,
                                       mode=args.mode)
        _ = float(feats[-1].sum())
        return time.perf_counter() - t0

    batched = run(wavs)
    batched_pcm = run(pcm)

    t0 = time.perf_counter()
    for w in wavs:
        f = np.asarray(extract_features(jnp.asarray(w), mode=args.mode))
    per_clip = time.perf_counter() - t0

    n = args.clips

    def row(label, t):
        print(f"{label:38s} {t:6.2f}s for {n} clips "
              f"({t / n * 1e3:4.0f} ms/clip; 500 clips ~ {t / n * 500:.0f}s)")

    row(f"batched int16 PCM ({args.mode}, chunk {args.chunk}):", batched_pcm)
    row(f"batched float32 ({args.mode}, chunk {args.chunk}):", batched)
    row("per-clip float32 loop (round-2 path):", per_clip)
    print(f"speedup vs round-2 path: {per_clip / batched_pcm:.1f}x "
          f"(int16 transfer {batched / batched_pcm:.2f}x over float32)")


if __name__ == "__main__":
    main()
