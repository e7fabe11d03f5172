"""Mel filterbank and dB conversion.

Numerics parity with the torchaudio calls in feature_extractor.py:59-71:
  - MelScale(n_mels, sample_rate): HTK mel scale (2595*log10(1+f/700)),
    f_min=0, f_max=sr/2, triangular filters, no normalization — this is the
    convention that produced the reference's shipped .npy features (the
    TF port in data_loader.py:313-317 uses a different (Slaney-ish) scale;
    per SURVEY §7 we standardize on the torchaudio convention).
  - amplitude_to_DB(multiplier=10, amin=1e-10, db_multiplier=0, top_db=80):
    10*log10(max(x, amin)), clamped below at (global max - top_db) where the
    max runs over the whole per-clip tensor.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np


def hz_to_mel(freq):
    """HTK mel scale."""
    return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def _mel_filterbank_np(n_freqs: int, n_mels: int, sample_rate: int,
                       f_min: float, f_max: float) -> np.ndarray:
    """[n_freqs, n_mels] triangular filterbank (HTK, unnormalized)."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = hz_to_mel(f_min)
    m_max = hz_to_mel(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz(m_pts)  # [n_mels + 2]

    # triangular filters: rise from f_pts[i] to f_pts[i+1], fall to f_pts[i+2]
    f_diff = f_pts[1:] - f_pts[:-1]                     # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]        # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]                # [n_freqs, n_mels]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_filterbank(n_freqs: int,
                   n_mels: int = 64,
                   sample_rate: int = 24000,
                   f_min: float = 0.0,
                   f_max: Optional[float] = None) -> jnp.ndarray:
    """[n_freqs, n_mels] HTK triangular filterbank (torchaudio MelScale parity)."""
    if f_max is None:
        f_max = float(sample_rate // 2)
    return jnp.asarray(_mel_filterbank_np(n_freqs, n_mels, sample_rate,
                                          float(f_min), float(f_max)))


def apply_melscale(spec: jnp.ndarray, fbank: jnp.ndarray) -> jnp.ndarray:
    """[..., freq, time] @ fbank[freq, n_mels] -> [..., n_mels, time]."""
    return jnp.einsum("...ft,fm->...mt", spec, fbank)


def amplitude_to_db(x: jnp.ndarray,
                    multiplier: float = 10.0,
                    amin: float = 1e-10,
                    db_multiplier: float = 0.0,
                    top_db: Optional[float] = 80.0) -> jnp.ndarray:
    """Power/amplitude -> dB with per-clip top_db floor (torchaudio parity)."""
    x_db = multiplier * jnp.log10(jnp.maximum(x, amin))
    x_db = x_db - multiplier * db_multiplier
    if top_db is not None:
        x_db = jnp.maximum(x_db, jnp.max(x_db) - top_db)
    return x_db
