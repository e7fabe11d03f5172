"""STFT on TPU.

Numerics parity: torchaudio.functional.spectrogram as called by the reference
(feature_extractor.py:153-173): hann window (periodic), `win_length` window
zero-padded symmetrically to `n_fft`, centered frames with reflect padding,
no normalization, complex output.

Two execution paths:
  - ``method='fft'``    : jnp.fft.rfft over frames (exact, good on CPU)
  - ``method='matmul'`` : real DFT as two matmuls with precomputed cos/sin
    bases — frames [N, n_fft] @ [n_fft, n_bins] rides the MXU, which on TPU
    beats the generic FFT for these sizes (n_fft ~ 1024) and fuses with the
    downstream mel projection.

Default resolves to 'matmul' on TPU and 'fft' elsewhere.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _padded_window(n_fft: int, win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Window of `win_length`, centered in a length-`n_fft` buffer."""
    w = hann_window(win_length, dtype)
    if win_length == n_fft:
        return w
    left = (n_fft - win_length) // 2
    return jnp.pad(w, (left, n_fft - win_length - left))


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int,
                 center: bool = True) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, frame_length] (reflect-padded if centered)."""
    if center:
        pad = frame_length // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode="reflect")
    n_frames = 1 + (x.shape[-1] - frame_length) // hop
    # gather frames via a strided reshape-free slice: build index [n_frames, frame_length]
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return x[..., idx]


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int) -> tuple:
    """Real-input DFT bases: cos/sin matrices [n_fft, n_fft//2 + 1] (numpy)."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def _default_method() -> str:
    platform = jax.default_backend()
    return "matmul" if platform == "tpu" else "fft"


def stft(x: jnp.ndarray,
         n_fft: int = 512,
         hop_length: Optional[int] = None,
         win_length: Optional[int] = None,
         center: bool = True,
         method: Optional[str] = None) -> jnp.ndarray:
    """Complex STFT of [..., T] -> complex64 [..., n_frames, n_fft//2 + 1].

    Note the reference keeps [chan, freq, time]; use `complex_spec` for that
    orientation. Frame-major here so the DFT is one big [N, n_fft] matmul.
    """
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = win_length // 2
    method = method or _default_method()

    window = _padded_window(n_fft, win_length, x.dtype)
    frames = frame_signal(x, n_fft, hop_length, center=center) * window

    if method == "fft":
        return jnp.fft.rfft(frames, n=n_fft, axis=-1)

    cos_b, sin_b = _dft_bases(n_fft)
    cos_b = jnp.asarray(cos_b, frames.dtype)
    sin_b = jnp.asarray(sin_b, frames.dtype)
    re = jnp.matmul(frames, cos_b, preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, sin_b, preferred_element_type=jnp.float32)
    return jax.lax.complex(re, im)


def complex_spec(wav: jnp.ndarray,
                 pad: int = 0,
                 n_fft: int = 512,
                 win_length: Optional[int] = None,
                 hop_length: Optional[int] = None,
                 normalized: bool = False,
                 method: Optional[str] = None) -> jnp.ndarray:
    """[chan, T] wav -> complex spec [chan, freq, time].

    Mirrors feature_extractor.py:153-173 (torchaudio.functional.spectrogram
    with power=None): optional end-padding, centered STFT, optional window-
    energy normalization.
    """
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = win_length // 2
    if pad > 0:
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)])

    spec = stft(wav, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
                method=method)  # [chan, time, freq]
    if normalized:
        window = _padded_window(n_fft, win_length, wav.dtype)
        spec = spec / jnp.sqrt(jnp.sum(window ** 2))
    return jnp.swapaxes(spec, -1, -2)  # [chan, freq, time]
