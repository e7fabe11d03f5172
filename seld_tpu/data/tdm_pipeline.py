"""TDM training pipeline: curriculum + on-device feature re-extraction.

Reference behavior (train.py:278-289, 341-356 + get_tdm_dataset
:210-261): with --use_tdm the train set is rebuilt every `tdm_epoch`
epochs by pasting single-class bank events into the raw wavs, re-extracting
features, and re-normalizing; the allowed overlap grows on a curriculum
(after epoch 20, every 2 epochs: overlap_sec 1->3, then overlap_num 1->3).

Here the re-extraction runs through the on-device front-end (batched over
clips, fused Pallas path on TPU) instead of the reference's host-side
tf.signal pass.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from seld_tpu.data.loader import SeldDataset
from seld_tpu.data.tdm import tdm_aug
from seld_tpu.ops.features import extract_features_clips


class TDMCurriculum:
    """Growing-overlap schedule (train.py:341-356). Reference semantics,
    reproduced exactly: overlap_sec grows 1->max, then every time
    overlap_num is bumped overlap_sec RESETS to 1 and regrows
    (train.py:346-348 sets overlap_sec = 1 on each num increment)."""

    def __init__(self, max_overlap_num: int = 3, max_overlap_sec: int = 3,
                 warmup_epochs: int = 20, grow_every: int = 2):
        self.overlap_num = 1
        self.overlap_sec = 1
        self.max_overlap_num = max_overlap_num
        self.max_overlap_sec = max_overlap_sec
        self.warmup_epochs = warmup_epochs
        self.grow_every = grow_every

    def advance(self, epoch: int) -> None:
        if epoch % self.grow_every == 0 and epoch > self.warmup_epochs:
            if self.overlap_sec < self.max_overlap_sec:
                self.overlap_sec += 1
            elif self.overlap_num < self.max_overlap_num:
                self.overlap_sec = 1
                self.overlap_num += 1


def extract_clip_features(wavs: Sequence[np.ndarray],
                          sample_rate: int = 24000,
                          mode: str = "foa",
                          max_frames: int = 3000,
                          chunk_size: int = 8) -> np.ndarray:
    """Batch the on-device front-end over clips -> [N, max_frames, 64, C].

    One vmapped dispatch per `chunk_size` equal-length clips, so the
    per-`tdm_epoch` re-extraction costs ~N/chunk RPCs instead of N."""
    raw = extract_features_clips(wavs, chunk_size=chunk_size,
                                 sample_rate=sample_rate, mode=mode,
                                 n_fft=1024, win_length=960, hop_length=480)
    feats = []
    for f in raw:
        if f.shape[0] < max_frames:
            f = np.pad(f, ((0, max_frames - f.shape[0]), (0, 0), (0, 0)))
        feats.append(f[:max_frames])
    return np.stack(feats)


def make_tdm_trainset(wavs: Sequence[np.ndarray],
                      labels: Sequence[np.ndarray],
                      banks: Tuple[Sequence[np.ndarray], Sequence[np.ndarray]],
                      rng: np.random.RandomState,
                      batch_size: int,
                      curriculum: TDMCurriculum,
                      loop_time: int = 1,
                      sample_rate: int = 24000,
                      min_overlap_sec: float = 0.5,
                      max_overlap_per_frame: int = 2,
                      seed: int = 0) -> SeldDataset:
    """Paste events -> on-device features -> per-set normalization -> windows
    (get_tdm_dataset parity: normalization recomputed over the fresh set,
    train.py:346-349... :115-116)."""
    tdm_x, tdm_y = banks
    aug_wavs = [w.copy() for w in wavs]
    aug_labels = [l.copy() for l in labels]
    aug_wavs, aug_labels = tdm_aug(
        aug_wavs, aug_labels, tdm_x, tdm_y, rng, sr=sample_rate,
        max_overlap_num=curriculum.overlap_num,
        max_overlap_per_frame=max_overlap_per_frame,
        min_overlap_sec=min_overlap_sec,
        max_overlap_sec=curriculum.overlap_sec)

    # feature frames = label frames * multiplier (hop 480 at 24 kHz = 5x)
    feats = extract_clip_features(aug_wavs, sample_rate=sample_rate,
                                  max_frames=aug_labels[0].shape[0] * 5)
    mean = feats.reshape(-1, *feats.shape[2:]).mean(0, keepdims=True)
    std = feats.reshape(-1, *feats.shape[2:]).std(0, keepdims=True)
    feats = (feats - mean[None]) / np.maximum(std[None], 1e-8)

    return SeldDataset.from_clips(
        list(feats), list(aug_labels), batch_size=batch_size,
        loop_time=loop_time, seed=seed)
