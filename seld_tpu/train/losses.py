"""Losses (jittable JAX).

Parity targets:
  - MMSE / MMSE_with_cls_weights   losses.py:4-26 (masked MSE over DOA where
    the mask is the active-class indicator recovered from round(sum(y^2))
    over the xyz axis, tiled x3, normalized by the mask sum)
  - focal_loss                     losses.py:29-34
  - class-weighted, label-smoothed BCE   trainv2.py:23-47 (elementwise BCE *
    class weights, reduced by mean; smoothing pulls targets toward 0.5)
  - MAE/MSE/MSLE selectable DOA losses   train.py:311-320 (reduced to scalar
    means here; the reference's vector-valued keras losses implicitly
    sum-reduce through tf.GradientTape — a quirk, not a contract)

The reference's non-callable `Focal_Loss` class (losses.py:37-47 defines
`call`, would crash at train.py:315) is intentionally not replicated.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

# per-class sample counts of the DCASE2021 train split (trainv2.py:25-29).
# Kept as a host constant so importing this module never touches a device.
DCASE2021_TRAIN_SAMPLES = np.asarray(
    [[58193, 32794, 29801, 21478, 14822,
      9174, 66527, 6740, 9342, 6498,
      22218, 49758]], dtype=np.float32)


def class_weights_from_samples(samples) -> jnp.ndarray:
    """mean(counts) / counts  (trainv2.py:30)."""
    samples = jnp.asarray(samples, jnp.float32)
    return jnp.mean(samples) / samples


def _doa_mask(y_true: jnp.ndarray) -> jnp.ndarray:
    """[..., 3C] -> activity mask [..., C]: round(sum over xyz of y^2)."""
    sed = y_true.reshape(*y_true.shape[:-1], 3, -1)
    return jnp.round(jnp.sum(sed ** 2, axis=-2))


def MMSE(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Masked MSE over active-class DOA components."""
    y_true = y_true.astype(y_pred.dtype)
    mask = _doa_mask(y_true)
    mask = jnp.concatenate([mask] * 3, axis=-1)
    return jnp.sum(jnp.square(y_true - y_pred) * mask) / jnp.sum(mask)


def MMSE_with_cls_weights(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                          cls_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    y_true = y_true.astype(y_pred.dtype)
    mask = _doa_mask(y_true)
    if cls_weights is not None:
        mask = mask * cls_weights
    mask = jnp.concatenate([mask] * 3, axis=-1)
    return jnp.sum(jnp.square(y_true - y_pred) * mask) / jnp.sum(mask)


def binary_crossentropy(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                        eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise BCE on probabilities (tf.keras.backend parity)."""
    y_pred = jnp.clip(y_pred, eps, 1.0 - eps)
    return -(y_true * jnp.log(y_pred) + (1.0 - y_true) * jnp.log(1.0 - y_pred))


def focal_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray,
               alpha: float = 0.25, gamma: float = 2.0,
               reduce: bool = True) -> jnp.ndarray:
    eps = 1e-7
    y_pred = jnp.clip(y_pred, eps, 1.0 - eps)
    focal = (- y_true * alpha * (1.0 - y_pred) ** gamma * jnp.log(y_pred)
             - (1.0 - y_true) * alpha * y_pred ** gamma * jnp.log(1.0 - y_pred))
    return jnp.mean(focal) if reduce else focal


def sed_loss_with_weights(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                          cls_weights: Optional[jnp.ndarray] = None,
                          label_smoothing: float = 0.0,
                          kind: str = "BCE",
                          focal_alpha: float = 0.25,
                          focal_gamma: float = 2.0) -> jnp.ndarray:
    """trainv2-style SED loss: smooth targets, elementwise loss * weights, mean.

    Note: in the reference, label smoothing is DEAD CODE — generate_iterloop
    never forwards it to generate_trainstep (trainv2.py:72 vs :23), so the
    published challenge runs trained with smoothing 0. Here it actually
    works; challenge-parity callers pass 0 (see docs/PARITY.md).
    """
    if label_smoothing > 0:
        y_true = y_true * (1.0 - label_smoothing) + 0.5 * label_smoothing
    if kind == "BCE":
        per = binary_crossentropy(y_true, y_pred)
    elif kind == "FOCAL":
        per = focal_loss(y_true, y_pred, focal_alpha, focal_gamma, reduce=False)
    else:
        raise ValueError(f"unknown sed loss: {kind!r}")
    if cls_weights is not None:
        if kind == "FOCAL":
            # reference quirk (trainv2.py:41): focal_loss already reduces
            # to a scalar there, so `reduce_mean(focal * cls_weights)` is
            # mean(focal) * mean(cls_weights) — a constant rescale, NOT
            # per-class weighting. Matched exactly.
            return jnp.mean(per) * jnp.mean(cls_weights)
        per = per * cls_weights
    return jnp.mean(per)


def MAE(y_true, y_pred):
    return jnp.mean(jnp.abs(y_true - y_pred))


def MSE(y_true, y_pred):
    return jnp.mean(jnp.square(y_true - y_pred))


def MSLE(y_true, y_pred, eps: float = 1e-7):
    # keras MSLE clamps with epsilon BEFORE log1p: cartesian DOA targets
    # are negative half the time (log1p(-1) = -inf without the clamp)
    return jnp.mean(jnp.square(jnp.log1p(jnp.maximum(y_true, eps))
                               - jnp.log1p(jnp.maximum(y_pred, eps))))


DOA_LOSSES = {"MAE": MAE, "MSE": MSE, "MSLE": MSLE, "MMSE": MMSE}


def get_doa_loss(name: str):
    if name not in DOA_LOSSES:
        raise ValueError(f"unknown doa loss: {name!r}; known {sorted(DOA_LOSSES)}")
    return DOA_LOSSES[name]
