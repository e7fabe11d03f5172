#!/usr/bin/env python3
"""One-command VAD vertical rehearsal.

Drives the whole VAD chain the way `scripts/dress_rehearsal.py` drives the
SELD chain (reference workflow: vad_dataloader.py __main__ featurization ->
train_vad_baseline.py:38-73 training -> :206-227 AUC/F1 reporting):

1. synthesize a TIMIT-like mono VAD corpus — "speech" is AM-modulated
   band-limited noise bursts over a quiet noise floor, with sample-level
   0/1 labels, written as real PCM wavs + .npy labels;
2. featurize through the shipped `scripts/prepare_vad.py` CLI (80-mel
   log spectrograms, min-max normalized — vad_dataloader.py:77-98);
3. train the bDNN baseline through the shipped `scripts/train_vad.py`
   CLI (7-frame context windows, AdaBelief, AUC early stop);
4. print the parsed window-AUC and full-sequence metrics.

    python scripts/vad_rehearsal.py --workdir /tmp/vad_rehearsal \
        [--clips 96] [--val_clips 24] [--epochs 24]

Runs on whatever backend JAX selects (set SELD_PLATFORM=cpu to force the
host); the npz it leaves behind doubles as the `--vad_pairs` input for
`scripts/nas_search.py --task vad`.
"""
import argparse
import os
import subprocess
import sys
import wave

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bandpass_noise(rng, n, sr, lo=300.0, hi=3000.0):
    spec = np.fft.rfft(rng.standard_normal(n))
    freqs = np.fft.rfftfreq(n, 1.0 / sr)
    spec[(freqs < lo) | (freqs > hi)] = 0.0
    out = np.fft.irfft(spec, n)
    return out / (np.std(out) + 1e-8)


def synthesize_clip(rng, seconds, sr):
    """One mono clip + sample-level labels: 2-6 'speech' bursts."""
    n = int(seconds * sr)
    wav = 0.01 * rng.standard_normal(n)          # noise floor
    label = np.zeros(n, np.float32)
    for _ in range(int(rng.integers(2, 7))):
        dur = int(rng.uniform(0.3, 1.5) * sr)
        start = int(rng.integers(0, max(1, n - dur)))
        burst = _bandpass_noise(rng, dur, sr)
        # syllabic 3-8 Hz amplitude modulation, fade-in/out edges
        t = np.arange(dur) / sr
        am = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(3.0, 8.0) * t
                                  + rng.uniform(0, 2 * np.pi))
        edge = np.minimum(1.0, np.minimum(t, t[::-1]) / 0.03)
        wav[start:start + dur] += 0.25 * burst * am * edge
        label[start:start + dur] = 1.0
    peak = np.max(np.abs(wav))
    if peak > 0.99:
        wav *= 0.99 / peak
    return wav.astype(np.float32), label


def write_wav(path, wav, sr):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes())


def synthesize_split(root, n_clips, seconds, sr, seed):
    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(root, "wav")
    label_dir = os.path.join(root, "label")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(label_dir, exist_ok=True)
    for i in range(n_clips):
        wav, label = synthesize_clip(rng, seconds, sr)
        write_wav(os.path.join(wav_dir, f"clip{i:04d}.wav"), wav, sr)
        np.save(os.path.join(label_dir, f"clip{i:04d}.npy"), label)
    return wav_dir, label_dir


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--clips", type=int, default=96)
    ap.add_argument("--val_clips", type=int, default=24)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--units", type=int, default=512)
    ap.add_argument("--model", default="vad_architecture")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_synth", action="store_true",
                    help="reuse an existing workdir's wavs and npzs")
    args = ap.parse_args()

    train_npz = os.path.join(args.workdir, "train.npz")
    val_npz = os.path.join(args.workdir, "val.npz")
    if (not args.skip_synth or not os.path.exists(train_npz)
            or not os.path.exists(val_npz)):
        for split, n, seed in (("train", args.clips, args.seed),
                               ("val", args.val_clips, args.seed + 1)):
            wav_dir, label_dir = synthesize_split(
                os.path.join(args.workdir, split), n, args.seconds,
                args.sr, seed)
            run([sys.executable, os.path.join(REPO, "scripts/prepare_vad.py"),
                 "--wav_dir", wav_dir, "--label_dir", label_dir,
                 "--out", os.path.join(args.workdir, f"{split}.npz")])
        print(f"synthesized {args.clips}+{args.val_clips} clips")

    run([sys.executable, os.path.join(REPO, "scripts/train_vad.py"),
         "--train", train_npz, "--val", val_npz,
         "--model", args.model, "--epochs", str(args.epochs),
         "--batch", str(args.batch), "--lr", str(args.lr),
         "--units", str(args.units)])
    print(f"VAD rehearsal done; NAS input: --vad_pairs {train_npz}")


if __name__ == "__main__":
    main()
