#!/usr/bin/env python3
"""Build a VAD (features, labels) pairs .npz from wav + label directories
(reference: vad_dataloader.py __main__ joblib dumps).

    python scripts/prepare_vad.py --wav_dir <.../WAV> --label_dir <.../LABEL> \
        --out train.npz [--n_mels 80] [--sr 16000]

Labels are .npy sample-level 0/1 arrays named like the wavs
(vad_dataloader.py:11-16); wavs may live in nested subdirectories.
"""
import argparse
import os
import sys

if os.environ.get("SELD_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob

import numpy as np


def search_sub_dirs(path, ext="wav"):
    fnames = glob.glob(os.path.join(path, f"*.{ext}"))
    for sd in sorted(os.listdir(path)):
        sub = os.path.join(path, sd)
        if os.path.isdir(sub):
            fnames += search_sub_dirs(sub, ext)
    return fnames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav_dir", required=True)
    ap.add_argument("--label_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_fft", type=int, default=1024)
    ap.add_argument("--n_mels", type=int, default=80)
    ap.add_argument("--sr", type=int, default=16000)
    args = ap.parse_args()

    import jax.numpy as jnp
    from seld_tpu.data.vad import vad_features_from_wav, vad_labels_from_samples
    from scripts.extract_features import read_wav  # noqa: E402

    wav_fnames = sorted(search_sub_dirs(args.wav_dir))
    pairs = []
    for wav_path in wav_fnames:
        name = os.path.splitext(os.path.basename(wav_path))[0]
        label_path = os.path.join(args.label_dir, name + ".npy")
        if not os.path.exists(label_path):
            print(f"skip (no label): {name}")
            continue
        wav, sr = read_wav(wav_path)
        feat = np.asarray(vad_features_from_wav(
            jnp.asarray(wav), n_fft=args.n_fft, n_mels=args.n_mels, sr=sr))
        label = vad_labels_from_samples(np.load(label_path), n_fft=args.n_fft)
        n = min(len(feat), len(label))
        pairs.append((feat[:n], label[:n]))
        print(f"{name}: {feat.shape}")

    arr = np.empty(len(pairs), dtype=object)
    for i, pair in enumerate(pairs):
        arr[i] = pair
    np.savez_compressed(args.out, pairs=arr)
    print(f"{len(pairs)} pairs -> {args.out}")


if __name__ == "__main__":
    main()
