"""Host-side data pipeline.

Replaces the reference's tf.data graph (data_loader.py:13-168) with a plain
numpy windowing pass plus a double-buffered host->HBM iterator:

  load fold .npy clips (fold digit parsed from the filename, :62-74)
  -> window into [300-feature / 60-label]-frame samples (:141-156)
  -> per-epoch *sample-level* shuffle + fixed-size batches
  -> async device_put with data-axis sharding (the prefetch boundary).

Augmentations are NOT applied here — they are jittable rng-keyed functions
(seld_tpu.data.transforms) fused into the compiled train step.

Deliberate upgrade over the reference: it shuffles at batch level only
(data_loader.py:163-166 — batches keep their composition across epochs);
here the permutation is over samples. Eval batches are full clips
(600/60 = 10 windows per clip, :158-159) to support clip-level scoring.
"""
from __future__ import annotations

import os
import threading
import queue
from glob import glob
from typing import Iterator, List, Sequence, Tuple

import jax
import numpy as np

SPLITS = {"train": [1, 2, 3, 4], "val": [5], "test": [6]}


def _fold_of(path: str) -> int:
    """Fold digit = 5th char of the basename (data_loader.py:74: fold1_...)."""
    return int(os.path.basename(path)[4])


def _pair_by_basename(a_paths, b_paths, b_dir_desc: str):
    """Pair two file lists by basename stem; raise on any missing partner.
    Positional pairing with a count check silently misaligns every clip
    when the file sets differ (e.g. {a,b} vs {a,c})."""
    b_by_name = {os.path.splitext(os.path.basename(p))[0]: p
                 for p in b_paths}
    pairs = []
    for a in a_paths:
        name = os.path.splitext(os.path.basename(a))[0]
        if name not in b_by_name:
            raise ValueError(f"no {b_dir_desc} file for {name}")
        pairs.append((a, b_by_name[name]))
    return pairs


def load_seldnet_data(feat_path: str, label_path: str, mode: str = "train",
                      n_freq_bins: int = 64
                      ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Load per-fold feature/label .npy clips for a split (name-matched)."""
    assert mode in SPLITS
    if not os.path.exists(feat_path):
        raise ValueError(f"no such feat_path ({feat_path}) exists")
    if not os.path.exists(label_path):
        raise ValueError(f"no such label_path ({label_path}) exists")
    feat_files = [f for f in sorted(glob(os.path.join(feat_path, "*.npy")))
                  if _fold_of(f) in SPLITS[mode]]
    label_files = [f for f in sorted(glob(os.path.join(label_path, "*.npy")))
                   if _fold_of(f) in SPLITS[mode]]
    pairs = _pair_by_basename(feat_files, label_files, "label")

    features = [np.load(f).astype("float32") for f, _ in pairs]
    labels = [np.load(l).astype("float32") for _, l in pairs]

    if features and features[0].ndim == 2:
        features = [np.transpose(
            f.reshape(f.shape[0], -1, n_freq_bins), (0, 2, 1))
            for f in features]
    return features, labels


def load_joint_seldnet_data(feat_label_root: str, mode: str = "train",
                            n_freq_bins: int = 64):
    """FOA + MIC features concatenated on the channel axis -> 17 channels
    (4 foa mel + 3 IV + 4 mic mel + 6 GCC), the acs_aug input layout
    (train.py get_both_dataset, :179-208)."""
    foa_x, y = load_seldnet_data(
        os.path.join(feat_label_root, "foa_dev_norm"),
        os.path.join(feat_label_root, "foa_dev_label"),
        mode=mode, n_freq_bins=n_freq_bins)
    mic_x, _ = load_seldnet_data(
        os.path.join(feat_label_root, "mic_dev_norm"),
        os.path.join(feat_label_root, "mic_dev_label"),
        mode=mode, n_freq_bins=n_freq_bins)
    if len(foa_x) != len(mic_x):
        raise ValueError(
            f"foa ({len(foa_x)}) and mic ({len(mic_x)}) clip counts differ")
    x = [np.concatenate([f, m], axis=-1) for f, m in zip(foa_x, mic_x)]
    return x, y


def load_wav_clips(wav_dir: str, label_dir: str, mode: str = "train",
                   n_classes: int = 14, max_label_length: int = 600,
                   expected_sr: int = 24000, pcm: bool = False):
    """Raw wavs + label CSVs for the on-device feature path / TDM aug
    (data_loader.py:95-129): returns (wavs [chan, T], labels [600, 4C]).
    Pairs are matched by basename; wavs must be at `expected_sr` (the
    100 ms label-frame geometry assumes 24 kHz — pass None to skip).

    `pcm=True` keeps wavs in their on-disk integer format (int16/int32,
    half the bytes of float32) — the jitted front-end scales integer input
    to [-1, 1) on device with the identical int/2^(bits-1) conversion, so
    host RAM and host->device transfer halve at no numeric cost."""
    import wave as wave_mod
    from seld_tpu.ops.features import extract_labels

    wav_paths = [p for p in sorted(glob(os.path.join(wav_dir, "*.wav")))
                 if _fold_of(p) in SPLITS[mode]]
    csv_paths = [p for p in sorted(glob(os.path.join(label_dir, "*.csv")))
                 if _fold_of(p) in SPLITS[mode]]
    pairs = _pair_by_basename(wav_paths, csv_paths, "label CSV")

    def read_wav(path):
        with wave_mod.open(path, "rb") as w:
            n, ch, width = w.getnframes(), w.getnchannels(), w.getsampwidth()
            sr = w.getframerate()
            raw = w.readframes(n)
        if expected_sr is not None and sr != expected_sr:
            raise ValueError(
                f"{os.path.basename(path)}: {sr} Hz, expected {expected_sr}"
                f" (the 100 ms label-frame geometry assumes it)")
        scale = {2: 32768.0, 4: 2147483648.0}[width]
        dtype = {2: np.int16, 4: np.int32}[width]
        data = np.frombuffer(raw, dtype)
        if not pcm:
            data = data.astype(np.float32) / scale
        return data.reshape(n, ch).T

    xs, ys = [], []
    for wav_path, csv_path in pairs:
        xs.append(read_wav(wav_path))
        lab = extract_labels(csv_path, n_classes=n_classes)
        if lab.shape[0] < max_label_length:
            lab = np.pad(lab, ((0, max_label_length - lab.shape[0]), (0, 0)))
        else:
            lab = lab[:max_label_length]
        ys.append(lab)
    return xs, ys


def window_clips(features: Sequence[np.ndarray], labels: Sequence[np.ndarray],
                 label_window_size: int = 60, drop_remainder: bool = True
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Clips -> fixed windows.

    features: list of [T_f, F, C] with T_f = multiplier * T_l
    labels:   list of [T_l, 4C]
    Returns x [N, window*multiplier, F, C], y [N, window, 4C].
    """
    feats = np.concatenate(features, axis=0)
    labs = np.concatenate(labels, axis=0)
    multiplier = feats.shape[0] // labs.shape[0]
    if feats.shape[0] != multiplier * labs.shape[0]:
        # keep the reference's loud reshape failure: a non-integer
        # feature/label frame ratio would otherwise silently shift every
        # later clip's windows off its labels
        raise ValueError(
            f"feature frames ({feats.shape[0]}) are not an integer "
            f"multiple of label frames ({labs.shape[0]})")

    n_windows = labs.shape[0] // label_window_size
    if not drop_remainder and labs.shape[0] % label_window_size:
        raise NotImplementedError("partial windows are always dropped")
    labs = labs[: n_windows * label_window_size]
    feats = feats[: n_windows * label_window_size * multiplier]

    y = labs.reshape(n_windows, label_window_size, labs.shape[-1])
    x = feats.reshape(n_windows, label_window_size * multiplier,
                      *feats.shape[1:])
    return x, y


class SeldDataset:
    """In-memory windowed dataset with epoch iteration.

    train=True : sample-shuffled fixed batches, dropping the ragged tail
    train=False: one full clip per batch (windows_per_clip consecutive
                 windows), deterministic order
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int,
                 train: bool = True, loop_time: int = 1,
                 windows_per_clip: int = 10, seed: int = 0,
                 process_index: int = 0, process_count: int = 1):
        # multi-host (DCN) sharding: each host keeps a strided slice of the
        # windows and iterates its local batch (SURVEY §5: data loading split
        # by jax.process_index()). Defaults collapse to single-host behavior.
        # The per-epoch TRAIN step count derives from the GLOBAL window
        # count (floor-divided over hosts), never the local slice: with a
        # global count not divisible by process_count the local slices are
        # uneven (e.g. 24 vs 23), and a host iterating one extra step would
        # hang every other host at the next collective. The longer host
        # drops its surplus from the tail of that epoch's permutation
        # (re-shuffled every epoch, so coverage rotates).
        if process_count > 1 and not train:
            # Eval batches are WHOLE clips (windows_per_clip consecutive
            # rows): a window-strided slice would interleave each clip's
            # windows across hosts, and the uneven local slices would give
            # hosts different len() — one host dispatching an extra
            # eval_step collective deadlocks the rest (the train path
            # derives its step count from the global count for exactly
            # this reason). Multi-host eval keeps the FULL eval set on
            # every host (trainer replication fallback) instead.
            raise ValueError(
                "process-strided sharding is train-only: eval batches are "
                "whole clips; build the eval dataset with process_count=1 "
                "(every host evaluates the full set — a documented design "
                "decision with an O(hosts) eval-compute cost, see "
                "docs/DESIGN.md 'Multi-host eval is replicated by design')")
        common_n = x.shape[0] // process_count if process_count > 1 \
            else x.shape[0]
        if process_count > 1:
            x = x[process_index::process_count]
            y = y[process_index::process_count]
        self.x, self.y = x, y
        self._common_n = common_n
        self.batch_size = batch_size if train else windows_per_clip
        self.train = train
        self.loop_time = loop_time if train else 1
        self._rng = np.random.RandomState(seed + process_index)

    @classmethod
    def from_clips(cls, features, labels, batch_size, train=True,
                   label_window_size=60, loop_time=1, seed=0,
                   process_index=0, process_count=1, feature_dtype=None):
        """feature_dtype: cast the windowed features ONCE at build (e.g.
        ml_dtypes.bfloat16 for bf16 training: halves host RAM, host->HBM
        transfer, AND removes the in-graph f32->bf16 convert+relayout of
        the input batch — 0.19 ms/step of the SS5 train step). Labels stay
        f32 (the loss/metric accumulators are f32)."""
        total_length = labels[0].shape[0]
        if feature_dtype is not None:
            # cast per clip BEFORE windowing: window_clips' concatenate is
            # the dominant allocation, so casting after it would transiently
            # hold the full f32 tensor plus the half-size copy (1.5x peak)
            features = [np.asarray(f).astype(feature_dtype)
                        for f in features]
        x, y = window_clips(features, labels, label_window_size)
        return cls(x, y, batch_size, train=train, loop_time=loop_time,
                   windows_per_clip=total_length // label_window_size,
                   seed=seed, process_index=process_index,
                   process_count=process_count)

    def __len__(self):
        if self.train:
            return (self._common_n * self.loop_time) // self.batch_size
        n = self.x.shape[0] * self.loop_time
        return int(np.ceil(n / self.batch_size))

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = self.x.shape[0]
        if self.train:
            order = np.concatenate(
                [self._rng.permutation(n) for _ in range(self.loop_time)])
            usable = len(self) * self.batch_size  # host-count-invariant
            order = order[:usable]
        else:
            order = np.arange(n)
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            yield self.x[idx], self.y[idx]


class DeviceIterator:
    """Double-buffered host->device feeder.

    Wraps a host batch iterator; a background thread stages the next batch
    with `jax.device_put` (sharded over the mesh's data axis when given)
    while the current one computes — the TPU-native equivalent of tf.data's
    prefetch(AUTOTUNE) at data_loader.py:168.
    """

    def __init__(self, iterable, sharding=None, prefetch: int = 2,
                 device=None):
        self._iterable = iterable
        self._sharding = sharding
        self._prefetch = prefetch
        self._device = device  # explicit placement (e.g. a CPU device)
        self._warned_replication = False

    def _put(self, batch):
        if self._sharding is None:
            if self._device is not None:
                return jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, self._device), batch)
            return jax.tree_util.tree_map(jax.device_put, batch)

        def put_one(a):
            # batches whose leading dim does not divide the batch-sharding
            # axis (e.g. 10-window eval clips on 8 devices) fall back to
            # replication. Multi-host: the local batch covers this
            # process's shards only.
            from seld_tpu.parallel.mesh import batch_shard_count, put_sharded
            try:
                n_shards = batch_shard_count(self._sharding)
            except (AttributeError, TypeError):
                n_shards = getattr(self._sharding, "num_devices", 1)
            n_shards = max(n_shards // jax.process_count(), 1)
            if a.shape[0] % max(n_shards, 1) == 0:
                return put_sharded(a, self._sharding)
            if not self._warned_replication:
                self._warned_replication = True
                import logging
                logging.getLogger("seld_tpu").warning(
                    "DeviceIterator: batch leading dim %d does not divide "
                    "the %d-device data axis; replicating instead of "
                    "sharding (every device runs the full batch). Pick a "
                    "batch size that is a multiple of the mesh axis — for "
                    "clip-level eval, group ceil(devices/windows_per_clip) "
                    "clips per batch.", a.shape[0], n_shards)
            return jax.device_put(a)

        return jax.tree_util.tree_map(put_one, batch)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        stop = object()
        error = []
        abandoned = threading.Event()

        def producer():
            try:
                for batch in self._iterable:
                    staged = self._put(batch)
                    # bounded put with an abandon check: if the consumer
                    # left mid-epoch (exception/KeyboardInterrupt in the
                    # step loop), drop the staged batches instead of
                    # blocking forever and pinning device memory
                    while not abandoned.is_set():
                        try:
                            q.put(staged, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if abandoned.is_set():
                        return
            except BaseException as e:  # propagate to the consumer
                error.append(e)
            finally:
                # bounded wait for sentinel space — never discard a staged
                # batch to make room; if the consumer abandoned, no one is
                # waiting for the sentinel
                while not abandoned.is_set():
                    try:
                        q.put(stop, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    if error:  # a dead producer must not mask as short epoch
                        raise error[0]
                    break
                yield item
        finally:
            abandoned.set()
            # release any staged batches so their device buffers free
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
