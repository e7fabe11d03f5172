"""Fused FOA feature front-end as a Pallas TPU kernel.

One kernel computes, per tile of STFT frames, entirely in VMEM:
    windowed real DFT (two MXU matmuls against precomputed cos/sin bases,
    window folded into the bases) -> |X|^2 -> mel projection (MXU matmul)
    + FOA intensity vectors (VPU elementwise + MXU mel projection)

so the [freq=513] complex spectrogram never round-trips through HBM — the
reference materializes it twice (torch STFT then mel/IV passes,
feature_extractor.py:61-77). The dB conversion stays outside (its top_db
floor is a whole-clip reduction, amplitude_to_DB parity).

The GEMM-native DFT formulation follows the MelT recipe (arXiv 2606.01009):
on MXU-class accelerators an [n_frames, n_fft] x [n_fft, n_bins] matmul
beats generic FFT for front-end sizes and fuses with the mel projection.

Frequency axis is zero-padded 513 -> 640 (5 lanes of 128): padded bins have
zero bases and zero filterbank rows, contributing exactly nothing.

Grid: one program per `tile_t` frames; all 4 FOA channels processed
together because the intensity vectors couple them.

STATUS — measured-null variant, NOT the production front-end. On the
1x v5e behind the remote tunnel the plain XLA matmul-DFT path
(`seld_tpu.ops.features.foa_features`) is faster (8.1 ms vs slower here
for a 10 s clip; BASELINE.md round-1 table) and the front-end is
RPC-bound through the tunnel anyway, so every production path
(training, inference, serving) uses the XLA composition. This kernel is
kept parity-tested (tests/test_pallas.py) as the fusion recipe for
co-located hosts where the HBM round-trip of the [T, 513] complex
spectrogram — not the RPC floor — is the binding constraint; re-measure
there before promoting it.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from seld_tpu.ops.stft import _dft_bases, _padded_window, frame_signal
from seld_tpu.ops.mel import _mel_filterbank_np, amplitude_to_db


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=4)
def _frontend_constants(n_fft: int, win_length: int, n_mels: int,
                        sample_rate: int) -> Tuple[np.ndarray, ...]:
    """(windowed cos basis, windowed sin basis, mel fbank), freq-padded."""
    n_bins = n_fft // 2 + 1
    n_pad = _round_up(n_bins, 128)
    cos_b, sin_b = _dft_bases(n_fft)                    # [n_fft, n_bins]
    window = np.asarray(_padded_window(n_fft, win_length))[:, None]
    wre = np.zeros((n_fft, n_pad), np.float32)
    wim = np.zeros((n_fft, n_pad), np.float32)
    wre[:, :n_bins] = window * cos_b
    wim[:, :n_bins] = window * sin_b
    fbank = np.zeros((n_pad, n_mels), np.float32)
    fbank[:n_bins] = _mel_filterbank_np(n_bins, n_mels, sample_rate,
                                        0.0, float(sample_rate // 2))
    return wre, wim, fbank


def _frontend_kernel(frames_ref, wre_ref, wim_ref, fbank_ref,
                     mel_ref, iv_ref, *, eps: float):
    f = frames_ref[:]                                   # [4, Tt, n_fft]
    c, tt, n_fft = f.shape
    f2 = f.reshape(c * tt, n_fft)

    re = jnp.dot(f2, wre_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f2, wim_ref[:], preferred_element_type=jnp.float32)
    re = re.reshape(c, tt, -1)                          # [4, Tt, n_pad]
    im = im.reshape(c, tt, -1)

    power = re * re + im * im
    fb = fbank_ref[:]
    mel_ref[:] = jnp.dot(power.reshape(c * tt, -1), fb,
                         preferred_element_type=jnp.float32
                         ).reshape(c, tt, -1)

    # intensity vectors: Re(conj(W) * {X, Y, Z}), ACN order W,Y,Z,X
    ivx = re[0] * re[3] + im[0] * im[3]
    ivy = re[0] * re[1] + im[0] * im[1]
    ivz = re[0] * re[2] + im[0] * im[2]
    norm = jnp.maximum(jnp.sqrt(ivx * ivx + ivy * ivy + ivz * ivz), eps)
    iv = jnp.stack([ivx / norm, ivy / norm, ivz / norm])  # [3, Tt, n_pad]
    iv_ref[:] = jnp.dot(iv.reshape(3 * tt, -1), fb,
                        preferred_element_type=jnp.float32).reshape(3, tt, -1)


def _frontend_kernel_2d(frames_ref, wre_ref, wim_ref, fbank_ref,
                        mel_ref, iv_ref, *, eps: float, tile_t: int):
    """2-D-block variant: frames rows are [frame-major x 4 channels].

    All matmuls are plain [rows, n_fft] x [n_fft, n] GEMMs; only the cheap
    sublane reshape [4*Tt, n] -> [Tt, 4, n] separates channels for the IV
    arithmetic.
    """
    f2 = frames_ref[:]                                  # [4*Tt, n_fft]
    re = jnp.dot(f2, wre_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f2, wim_ref[:], preferred_element_type=jnp.float32)

    power = re * re + im * im
    fb = fbank_ref[:]
    mel_ref[:] = jnp.dot(power, fb, preferred_element_type=jnp.float32)

    re4 = re.reshape(tile_t, 4, -1)
    im4 = im.reshape(tile_t, 4, -1)
    w_re, w_im = re4[:, 0], im4[:, 0]
    ivx = w_re * re4[:, 3] + w_im * im4[:, 3]
    ivy = w_re * re4[:, 1] + w_im * im4[:, 1]
    ivz = w_re * re4[:, 2] + w_im * im4[:, 2]
    norm = jnp.maximum(jnp.sqrt(ivx * ivx + ivy * ivy + ivz * ivz), eps)
    iv = jnp.concatenate([ivx / norm, ivy / norm, ivz / norm], axis=0)
    iv_ref[:] = jnp.dot(iv, fb, preferred_element_type=jnp.float32)


def fused_foa_frontend_2d(wav: jnp.ndarray,
                          sample_rate: int = 24000,
                          n_mels: int = 64,
                          n_fft: int = 1024,
                          win_length: int = 960,
                          hop_length: int = 480,
                          tile_t: int = 64,
                          eps: float = 1e-8,
                          interpret: bool = False) -> jnp.ndarray:
    """2-D-block layout variant of `fused_foa_frontend` (same numerics)."""
    if wav.shape[0] != 4:
        raise ValueError("fused FOA frontend expects 4 input channels")
    wre, wim, fbank = _frontend_constants(n_fft, win_length, n_mels,
                                          sample_rate)

    frames = frame_signal(wav, n_fft, hop_length, center=True)  # [4, T, n_fft]
    n_frames = frames.shape[1]
    t_pad = _round_up(n_frames, tile_t)
    frames = jnp.pad(frames, ((0, 0), (0, t_pad - n_frames), (0, 0)))
    # frame-major rows: row 4k + c = channel c of frame k
    frames2d = jnp.transpose(frames, (1, 0, 2)).reshape(4 * t_pad, n_fft)

    grid = (t_pad // tile_t,)
    n_pad = wre.shape[1]
    kernel = functools.partial(_frontend_kernel_2d, eps=eps, tile_t=tile_t)

    mel2d, iv2d = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4 * tile_t, n_fft), lambda i: (i, 0)),
            pl.BlockSpec((n_fft, n_pad), lambda i: (0, 0)),
            pl.BlockSpec((n_fft, n_pad), lambda i: (0, 0)),
            pl.BlockSpec((n_pad, n_mels), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((4 * tile_t, n_mels), lambda i: (i, 0)),
            pl.BlockSpec((3 * tile_t, n_mels), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4 * t_pad, n_mels), jnp.float32),
            jax.ShapeDtypeStruct((3 * t_pad, n_mels), jnp.float32),
        ],
        interpret=interpret,
    )(frames2d, jnp.asarray(wre), jnp.asarray(wim), jnp.asarray(fbank))

    # un-interleave: mel rows [T*4] frame-major; iv rows [3*Tt per tile]
    mel = mel2d.reshape(t_pad, 4, n_mels)[:n_frames]         # [T, 4, M]
    mel = jnp.transpose(mel, (1, 0, 2))                      # [4, T, M]
    iv = iv2d.reshape(t_pad // tile_t, 3, tile_t, n_mels)
    iv = jnp.transpose(iv, (1, 0, 2, 3)).reshape(3, t_pad, n_mels)[:, :n_frames]

    mel_db = amplitude_to_db(mel)
    features = jnp.concatenate([mel_db, iv], axis=0)
    return jnp.transpose(features, (1, 2, 0))


def fused_foa_frontend(wav: jnp.ndarray,
                       sample_rate: int = 24000,
                       n_mels: int = 64,
                       n_fft: int = 1024,
                       win_length: int = 960,
                       hop_length: int = 480,
                       tile_t: int = 64,
                       eps: float = 1e-8,
                       interpret: bool = False) -> jnp.ndarray:
    """[4, T] FOA wav -> [time, n_mels, 7] features (extract_features parity).

    Channels: 4 log-mel (dB, top_db=80) + 3 mel-projected intensity vectors.
    """
    if wav.shape[0] != 4:
        raise ValueError("fused FOA frontend expects 4 input channels")
    wre, wim, fbank = _frontend_constants(n_fft, win_length, n_mels,
                                          sample_rate)

    frames = frame_signal(wav, n_fft, hop_length, center=True)  # [4, T, n_fft]
    n_frames = frames.shape[1]
    t_pad = _round_up(n_frames, tile_t)
    frames = jnp.pad(frames, ((0, 0), (0, t_pad - n_frames), (0, 0)))

    grid = (t_pad // tile_t,)
    n_pad = wre.shape[1]
    kernel = functools.partial(_frontend_kernel, eps=eps)

    mel, iv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, tile_t, n_fft), lambda i: (0, i, 0)),
            pl.BlockSpec((n_fft, n_pad), lambda i: (0, 0)),
            pl.BlockSpec((n_fft, n_pad), lambda i: (0, 0)),
            pl.BlockSpec((n_pad, n_mels), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((4, tile_t, n_mels), lambda i: (0, i, 0)),
            pl.BlockSpec((3, tile_t, n_mels), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, t_pad, n_mels), jnp.float32),
            jax.ShapeDtypeStruct((3, t_pad, n_mels), jnp.float32),
        ],
        interpret=interpret,
    )(frames, jnp.asarray(wre), jnp.asarray(wim), jnp.asarray(fbank))

    mel = mel[:, :n_frames]
    iv = iv[:, :n_frames]
    mel_db = amplitude_to_db(mel)
    features = jnp.concatenate([mel_db, iv], axis=0)    # [7, time, n_mels]
    return jnp.transpose(features, (1, 2, 0))           # [time, n_mels, 7]
