"""Wav-native input pipeline: raw clips -> on-device front-end -> windows.

The reference preprocesses offline (feature_extractor.py:15-50: torch STFT ->
log-mel + intensity vectors -> .npy on disk -> normalized copies on disk) and
trains from the .npy files. Here the same front-end runs on-device
(seld_tpu.ops.extract_features, jitted; XLA matmul-DFT path) at dataset-build
time, so features never touch disk: wav -> features -> dataset-statistics
normalization -> 300/60-frame windows, all in memory.

Numerics match the offline path exactly (same jitted front-end, same
preprocess/statistics code: scripts/extract_features.py writes what this
module keeps in RAM) — parity-tested in tests/test_wav_native.py.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from glob import glob

from seld_tpu.data.loader import (SPLITS, SeldDataset, _fold_of,
                                  load_wav_clips)
from seld_tpu.ops.features import (apply_normalizer, calculate_statistics,
                                   extract_features_clips,
                                   preprocess_features_labels)


def _clip_stems(wav_dir: str, mode: str):
    return [os.path.splitext(os.path.basename(p))[0]
            for p in sorted(glob(os.path.join(wav_dir, "*.wav")))
            if _fold_of(p) in SPLITS[mode]]


def features_from_wavs(wavs: Sequence[np.ndarray],
                       labels: Sequence[np.ndarray],
                       *,
                       mode: str = "foa",
                       sample_rate: int = 24000,
                       n_fft: int = 1024,
                       win_length: int = 960,
                       hop_length: int = 480,
                       max_label_length: int = 600,
                       multiplier: int = 5,
                       chunk_size: int = 8
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """[chan, T] wav clips -> (features [N, max*mult, F, C], labels
    [N, max, 4C]) via the on-device front-end (feature_extractor.py:15-50
    semantics: extract at true length, then zero-pad/crop). Extraction is
    batched: one vmapped dispatch per `chunk_size` equal-length clips."""
    raw = extract_features_clips(
        wavs, chunk_size=chunk_size, sample_rate=sample_rate, mode=mode,
        n_fft=n_fft, win_length=win_length, hop_length=hop_length)
    feats, labs = [], []
    for f, lab in zip(raw, labels):
        f, lab = preprocess_features_labels(
            f, np.asarray(lab), max_label_length=max_label_length,
            multiplier=multiplier)
        feats.append(f)
        labs.append(lab)
    return np.stack(feats), np.stack(labs)


def wav_feature_splits(wav_dir: str,
                       label_dir: str,
                       *,
                       modes: Sequence[str] = ("train", "val", "test"),
                       mode: str = "foa",
                       n_classes: int = 12,
                       sample_rate: int = 24000,
                       max_label_length: int = 600,
                       normalize: bool = True,
                       **front_end) -> Tuple[
                           Dict[str, Tuple[np.ndarray, np.ndarray]],
                           Optional[Tuple[np.ndarray, np.ndarray]]]:
    """Fold-split wav loading + on-device extraction + train-set
    normalization (feature_extractor.py:218-234: per-(freq, chan) mean/std
    over the train split's concatenated frames, applied to every split).

    Returns ({split: (features, labels)}, (mean, std) or None).
    """
    splits = {}
    for m in modes:
        wavs, labels = load_wav_clips(wav_dir, label_dir, m,
                                      n_classes=n_classes,
                                      max_label_length=max_label_length,
                                      pcm=True)
        if not wavs:
            raise FileNotFoundError(
                f"no {m} wavs under {wav_dir} (fold-split by filename)")
        splits[m] = features_from_wavs(
            wavs, labels, mode=mode, sample_rate=sample_rate,
            max_label_length=max_label_length, **front_end)

    stats = None
    if normalize:
        src = splits.get("train") or next(iter(splits.values()))
        stacked = src[0].reshape(-1, *src[0].shape[2:])
        stats = calculate_statistics(stacked)
        splits = {m: (np.asarray(apply_normalizer(x, *stats)), y)
                  for m, (x, y) in splits.items()}
    return splits, stats


def joint_wav_feature_splits(foa_dir: str,
                             mic_dir: str,
                             label_dir: str,
                             *,
                             modes: Sequence[str] = ("train", "val", "test"),
                             **kwargs) -> Tuple[
                                 Dict[str, Tuple[np.ndarray, np.ndarray]],
                                 Optional[Tuple[np.ndarray, np.ndarray]]]:
    """Joint FOA+MIC 17-channel wav-native splits (4 foa mel + 3 IV +
    4 mic mel + 6 GCC), the acs_aug input layout.

    The reference reaches this point via two OFFLINE extractions
    (feature_extractor.py:196-214 for GCC) normalized separately and
    concatenated at load time (train.py:178-208); here both modalities run
    through the batched on-device front-end. Per-modality normalization ==
    per-(freq, chan) stats on the concatenation, since every statistic is
    channelwise — parity-tested against load_joint_seldnet_data's layout in
    tests/test_wav_native.py.
    """
    # row alignment between the two modalities is positional (both loaders
    # sort + fold-filter), so require identical clip-stem lists up front —
    # a bare count check would silently misalign every clip after the first
    # divergence (the _pair_by_basename lesson, data/loader.py:38)
    for m in modes:
        fs, ms = _clip_stems(foa_dir, m), _clip_stems(mic_dir, m)
        if fs != ms:
            diff = next((a, b) for a, b in zip(fs + [None], ms + [None])
                        if a != b)
            raise ValueError(
                f"{m}: foa_dir and mic_dir clip sets diverge at "
                f"{diff[0]!r} vs {diff[1]!r} — joint extraction pairs "
                f"clips positionally and needs identical recordings")
    foa_splits, foa_stats = wav_feature_splits(
        foa_dir, label_dir, modes=modes, mode="foa", **kwargs)
    # note: the mic pass re-parses the same label CSVs (fy is reused below,
    # mx's labels discarded) — CSV IO is negligible next to wav IO +
    # extraction, so the duplication is kept for signature simplicity
    mic_splits, mic_stats = wav_feature_splits(
        mic_dir, label_dir, modes=modes, mode="mic", **kwargs)
    splits = {}
    for m in modes:
        fx, fy = foa_splits[m]
        mx, _ = mic_splits[m]
        splits[m] = (np.concatenate([fx, mx], axis=-1), fy)
    stats = None
    if foa_stats is not None and mic_stats is not None:
        stats = (np.concatenate([np.asarray(foa_stats[0]),
                                 np.asarray(mic_stats[0])], axis=-1),
                 np.concatenate([np.asarray(foa_stats[1]),
                                 np.asarray(mic_stats[1])], axis=-1))
    return splits, stats


def make_wav_datasets(wav_dir: str,
                      label_dir: str,
                      *,
                      batch: int,
                      loop_time: int = 5,
                      n_classes: int = 12,
                      mic_dir: Optional[str] = None,
                      feature_dtype=None,
                      **kwargs) -> Tuple[Dict[str, SeldDataset],
                                         Dict[str, Tuple[np.ndarray,
                                                         np.ndarray]],
                                         Optional[Tuple[np.ndarray,
                                                        np.ndarray]]]:
    """Drop-in replacement for the offline .npy datasets in scripts/train.py:
    returns ({split: SeldDataset}, {split: (full-clip features, labels)},
    (mean, std)). The full clips feed the sliding-window ensemble evaluator;
    the train-split statistics must be persisted with the run so wav-native
    checkpoints can be served later (scripts/predict_wav.py).

    `mode="mic"` extracts the 10-channel GCC-PHAT stack from `wav_dir`;
    passing `mic_dir` builds the joint 17-channel FOA+MIC set (wav_dir =
    foa_dev, mic_dir = mic_dev) — `mode` is then ignored."""
    if mic_dir is not None:
        kwargs.pop("mode", None)
        splits, stats = joint_wav_feature_splits(
            wav_dir, mic_dir, label_dir, n_classes=n_classes, **kwargs)
    else:
        splits, stats = wav_feature_splits(wav_dir, label_dir,
                                           n_classes=n_classes, **kwargs)
    datasets = {
        m: SeldDataset.from_clips(list(x), list(y), batch_size=batch,
                                  train=m == "train", loop_time=loop_time,
                                  feature_dtype=feature_dtype)
        for m, (x, y) in splits.items()
    }
    return datasets, splits, stats
