#!/usr/bin/env python3
"""Offline feature extraction CLI (reference: feature_extractor.py __main__).

Kept for parity checks and .npy interoperability with the reference's data
layout; the framework can also consume raw wavs directly through the
on-device front-end (seld_tpu.ops.extract_features inside the train step).

    python scripts/extract_features.py --mode foa \
        --wav_dir <.../foa_dev> --label_dir <.../metadata_dev> \
        --out_dir foa_dev --label_out_dir foa_dev_label [--normalize]
"""
import argparse
import os
import sys
import wave

if os.environ.get("SELD_PLATFORM"):  # e.g. SELD_PLATFORM=cpu for local runs
    import jax
    jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glob import glob

import numpy as np


def read_wav(path):
    """Minimal multi-channel PCM wav reader (no soundfile dependency)."""
    with wave.open(path, "rb") as w:
        n = w.getnframes()
        sr = w.getframerate()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width: {width}")
    return data.reshape(n, ch).T, sr  # [chan, time]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="foa", choices=["foa", "mic"])
    ap.add_argument("--wav_dir", required=True)
    ap.add_argument("--label_dir", default=None)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--label_out_dir", default=None)
    ap.add_argument("--n_classes", type=int, default=14)
    ap.add_argument("--normalize", action="store_true",
                    help="also write <out_dir>_norm with dataset mean/std")
    args = ap.parse_args()

    import jax.numpy as jnp
    from seld_tpu.ops import (extract_features, extract_labels,
                              preprocess_features_labels,
                              calculate_statistics, apply_normalizer)
    from seld_tpu.utils import create_folder

    wavs = sorted(glob(os.path.join(args.wav_dir, "*.wav")))
    if args.label_dir:
        # pair by basename, not by sorted position: a count check alone
        # would silently misalign features and labels when the file sets
        # differ (e.g. {a,b}.wav vs {a,c}.csv)
        labels = []
        for w in wavs:
            name = os.path.splitext(os.path.basename(w))[0]
            csv = os.path.join(args.label_dir, name + ".csv")
            if not os.path.exists(csv):
                raise ValueError(f"no label CSV for {name} in "
                                 f"{args.label_dir}")
            labels.append(csv)
    else:
        labels = [None] * len(wavs)

    create_folder(args.out_dir)
    if args.label_out_dir:
        create_folder(args.label_out_dir)

    for wav_path, label_path in zip(wavs, labels):
        name = os.path.splitext(os.path.basename(wav_path))[0]
        wav, sr = read_wav(wav_path)
        feats = np.asarray(extract_features(
            jnp.asarray(wav), sample_rate=sr, mode=args.mode,
            n_fft=1024, win_length=960, hop_length=480))
        if label_path is not None:
            labs = extract_labels(label_path, n_classes=args.n_classes)
            feats, labs = preprocess_features_labels(feats, labs)
            np.save(os.path.join(args.label_out_dir or args.out_dir + "_label",
                                 name + ".npy"), labs)
        else:
            feats, _ = preprocess_features_labels(
                feats, np.zeros((600, 4 * args.n_classes), np.float32))
        np.save(os.path.join(args.out_dir, name + ".npy"), feats)
        print(name, feats.shape)

    if args.normalize:
        files = sorted(glob(os.path.join(args.out_dir, "*.npy")))
        stacked = np.concatenate([np.load(f) for f in files], 0)
        mean, std = calculate_statistics(stacked)
        np.save("mean.npy", mean)
        np.save("std.npy", std)
        norm_dir = args.out_dir + "_norm"
        create_folder(norm_dir)
        for f in files:
            np.save(os.path.join(norm_dir, os.path.basename(f)),
                    apply_normalizer(np.load(f), mean, std))
        print(f"normalized features -> {norm_dir}")


if __name__ == "__main__":
    main()
