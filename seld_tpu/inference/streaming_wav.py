"""Live-audio streaming: raw samples -> on-device front-end -> StreamingSELD.

Completes the serving story of seld_tpu.inference.streaming: push raw
multichannel PCM/float samples as they arrive and receive final SELD label
frames. The front-end (centered STFT, reflect padding, mel/IV/GCC —
ops/features.py, reference feature_extractor.py:153-193) is itself streamed
with the same three-phase pattern as the trunk:

  - feature frame t reads samples [t*hop - n_fft//2, t*hop + n_fft//2), so
    a frame is exact once computed >= `hf = ceil((n_fft//2)/hop)` frames
    from a segment edge (no reflect-pad involvement);
  - the FIRST segment is clip-aligned (left reflect pad lands on the true
    clip start) and the tail segment is right-aligned (true clip end), so
    edge frames match the offline extraction bit-for-bit;
  - one `extract_features` dispatch per pushed chunk.

Emitted frames equal the offline pipeline: extract_features on the whole
clip, cropped to a multiple of the label multiplier, normalized, then
`ensemble_outputs(fast=True)` — tested in tests/test_streaming.py.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from seld_tpu.ops.features import extract_features
from seld_tpu.inference.streaming import StreamingSELD


class StreamingFrontEnd:
    """Incremental wav -> feature-frame extraction (push/finalize API).

    push(samples [chan, n]) -> [k, n_mels, C] newly-final feature frames;
    finalize() -> the remaining frames. Total frames over a clip of T
    samples (T % hop == 0) = T // hop + 1, identical to the offline
    centered STFT.
    """

    def __init__(self, *, mode: str = "foa", sample_rate: int = 24000,
                 n_mels: int = 64, n_fft: int = 1024, win_length: int = 960,
                 hop_length: int = 480, chunk_frames: int = 50):
        self.kw = dict(mode=mode, sample_rate=sample_rate, n_mels=n_mels,
                       n_fft=n_fft, win_length=win_length,
                       hop_length=hop_length)
        self.hop = hop_length
        self.hf = -(-(n_fft // 2) // hop_length)  # frames tainted per edge
        self.chunk_f = chunk_frames
        self.chunk_s = chunk_frames * hop_length
        self.l_s = (self.chunk_f + 2 * self.hf) * hop_length
        self.reset()

    def _extract(self, segment: np.ndarray) -> np.ndarray:
        return np.asarray(extract_features(jnp.asarray(segment), **self.kw),
                          np.float32)

    def push(self, samples: np.ndarray):
        """samples: [chan, n] float in [-1, 1) (or signed int PCM)."""
        samples = np.asarray(samples)
        if samples.dtype.kind == "u":
            raise ValueError(
                f"unsigned PCM ({samples.dtype}) is not supported — "
                "convert to signed PCM or float first (8-bit wav data is "
                "offset-binary, which a plain scale would silently corrupt)")
        scale = (float(2 ** (8 * samples.dtype.itemsize - 1))
                 if samples.dtype.kind == "i" else None)
        samples = samples.astype(np.float32)  # every block, one copy
        if scale is not None:
            samples /= scale
        if self._pending is None:
            self._pending = samples
        else:
            self._pending = np.concatenate([self._pending, samples], axis=1)
        self._fed_s += samples.shape[1]
        out = []
        if self._e == 0:
            if self._pending.shape[1] < self.l_s:
                return out
            # bootstrap: clip-aligned segment; left reflect pad is the true
            # clip edge. Settle frames [0, chunk_f + hf).
            seg = self._pending[:, :self.l_s]
            feats = self._extract(seg)
            n_settle = self.chunk_f + self.hf
            out.append(feats[:n_settle])
            self._e = self.l_s
            self._buf = seg
            self._pending = self._pending[:, self.l_s:]
        while self._pending.shape[1] >= self.chunk_s:
            chunk, self._pending = (self._pending[:, :self.chunk_s],
                                    self._pending[:, self.chunk_s:])
            self._buf = np.concatenate(
                [self._buf[:, self.chunk_s:], chunk], axis=1)
            feats = self._extract(self._buf)
            # frames [hf, hf + chunk_f) of the segment are pad-free and
            # >= hf from both edges -> exact
            out.append(feats[self.hf: self.hf + self.chunk_f])
            self._e += self.chunk_s
        return list(np.concatenate(out)) if out else []

    def finalize(self):
        """Right-aligned tail; returns the remaining frames (total
        T // hop + 1)."""
        if self._fed_s == 0:
            raise ValueError("no samples fed before finalize()")
        if self._pending is None:
            raise ValueError("already finalized; reset() starts a new clip")
        if self._fed_s % self.hop:
            raise ValueError(
                f"total samples ({self._fed_s}) must be a multiple of the "
                f"hop ({self.hop})")
        n_total = self._fed_s // self.hop + 1
        if self._e == 0:
            # short clip: one clip-aligned extraction (clear _pending only
            # on success so a failed finalize stays retryable)
            feats = self._extract(self._pending)
            self._pending = None
            return list(feats[:n_total])
        emitted = self._e // self.hop - self.hf   # settled frame count
        tail = np.concatenate([self._buf, self._pending], axis=1)
        tail = tail[:, tail.shape[1] - self.l_s:]  # last l_s real samples
        feats = self._extract(tail)
        self._pending = None
        # absolute frame t is segment frame t - (fed_s - l_s)/hop
        k0 = emitted - (self._fed_s - self.l_s) // self.hop
        return list(feats[k0: k0 + (n_total - emitted)])

    def reset(self):
        self._pending = None
        self._buf = None
        self._e = 0        # samples consumed into settled segments
        self._fed_s = 0


class StreamingSELDWav:
    """Raw audio in, SELD events out — live.

    Composes StreamingFrontEnd -> normalizer -> StreamingSELD. The frame
    count is cropped to a multiple of the label multiplier (the offline
    preprocess_features_labels crop, reference feature_extractor.py:49-50),
    so emitted label frames match `make_answer`-style offline inference of
    the same clip.

    >>> sw = StreamingSELDWav(model.apply, variables, normalizer=(mean, std))
    >>> for block in microphone:               # [4, n] samples
    ...     events.extend(sw.push(block))
    >>> events.extend(sw.finalize())
    """

    def __init__(self, apply_fn: Callable, variables,
                 normalizer: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 *, mode: str = "foa", sample_rate: int = 24000,
                 n_mels: int = 64, n_fft: int = 1024, win_length: int = 960,
                 hop_length: int = 480, win_size: int = 300,
                 time_down: int = 5, chunk: int = 10, halo=None, dtype=None):
        self.frontend = StreamingFrontEnd(
            mode=mode, sample_rate=sample_rate, n_mels=n_mels, n_fft=n_fft,
            win_length=win_length, hop_length=hop_length,
            chunk_frames=chunk * time_down)
        # channel count is determined by the front-end mode
        # (feature_extractor.py:153-214: foa = 4 mel + 3 IV, mic = 4 mel +
        # 6 GCC)
        n_feat_chan = {"foa": 7, "mic": 10}[mode]
        self.seld = StreamingSELD(
            apply_fn, variables, feat_shape=(n_mels, n_feat_chan),
            win_size=win_size, step_size=time_down, time_down=time_down,
            chunk=chunk, halo=halo, dtype=dtype)
        self.multiplier = time_down
        if normalizer is not None:
            self.mean = np.asarray(normalizer[0], np.float32)
            self.std = np.asarray(normalizer[1], np.float32)
        else:
            self.mean = self.std = None
        self._frame_carry = None

    def _normalize(self, feats: np.ndarray) -> np.ndarray:
        if self.mean is None:
            return feats
        return (feats - self.mean) / self.std

    def _feed(self, frames, last: bool):
        """Buffer frames to multiplier alignment; on the last feed, CROP
        the remainder (the offline preprocess crop)."""
        if not len(frames):
            frames = np.zeros((0, *self.seld.feat_shape), np.float32)
        else:
            frames = np.asarray(frames)
        if self._frame_carry is not None:
            frames = np.concatenate([self._frame_carry, frames])
        keep = (frames.shape[0] // self.multiplier) * self.multiplier
        self._frame_carry = None if last else frames[keep:]
        return frames[:keep]

    def push(self, samples: np.ndarray):
        frames = self._feed(self.frontend.push(samples), last=False)
        if not frames.shape[0]:
            return []
        return self.seld.push(self._normalize(frames))

    def finalize(self):
        frames = self._feed(self.frontend.finalize(), last=True)
        out = []
        if frames.shape[0]:
            out = self.seld.push(self._normalize(frames))
        return out + self.seld.finalize()

    def reset(self):
        self.frontend.reset()
        self.seld.reset()
        self._frame_carry = None
