"""Streaming SELD metrics as a jittable pytree accumulator.

Re-design of the reference's TF streaming `SELDMetrics` (metrics.py:7-154):
the reference loops over 10-frame blocks in Python; here the block dimension
is folded into the batch and the whole update is one fused vector op, so it
runs inside the compiled train step (no device->host sync per batch).

State is a plain dict of scalars / [C] arrays (a pytree), so it donates and
shards cleanly; `merge` psum-reduces states across data-parallel devices.

Semantics per block (metrics.py:77-154):
  detection  : class-in-block presence; ER from S/D/I counts
  location   : TP when the class matches and the mean angular error over
               matched frames is <= doa_threshold (20 deg)
  class-wise : per-class tp/fp/tn/fn for recall/precision
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray
State = Dict[str, Array]

_SCALARS = ("TP", "FP", "TN", "FN", "S", "D", "I", "Nref", "Nsys",
            "total_DE", "DE_TP")
_CLASS_ARRAYS = ("class_tp", "class_fp", "class_tn", "class_fn")


def init_state(n_classes: int = 14) -> State:
    state = {k: jnp.zeros([], jnp.float32) for k in _SCALARS}
    state.update({k: jnp.zeros([n_classes], jnp.float32) for k in _CLASS_ARRAYS})
    return state


def merge(a: State, b: State) -> State:
    return jax.tree_util.tree_map(jnp.add, a, b)


def distance_between_cartesian_coordinates(xyz0: Array, xyz1: Array) -> Array:
    """Great-circle distance in degrees over the last axis (metrics.py:173-190).

    Zero where both vectors are all-zero (unmatched frames)."""
    n0 = jnp.linalg.norm(xyz0, axis=-1, keepdims=True)
    n1 = jnp.linalg.norm(xyz1, axis=-1, keepdims=True)
    xyz0 = xyz0 / jnp.maximum(n0, 1e-12)
    xyz1 = xyz1 / jnp.maximum(n1, 1e-12)
    zeros = ((jnp.sum(xyz0, axis=-1) == 0) & (jnp.sum(xyz1, axis=-1) == 0))

    dist = jnp.clip(jnp.sum(xyz0 * xyz1, axis=-1), -1.0, 1.0)
    dist = jnp.degrees(jnp.arccos(dist))
    return dist * (1.0 - zeros.astype(dist.dtype))


def _safe_div(x, y, eps=1e-8):
    return x / jnp.maximum(y, eps)


def update(state: State,
           y_true: Tuple[Array, Array],
           y_pred: Tuple[Array, Array],
           doa_threshold: float = 20.0,
           block_size: int = 10,
           sed_threshold=0.5) -> State:
    """Accumulate one batch. sed [B, T, C], doa [B, T, 3C]; T % block_size == 0.

    sed_threshold may be a traced scalar: the NAS proxy folds the same
    predictions through a vmapped sweep of thresholds to score candidates
    at their BEST threshold (the reference's own model-selection journey,
    search_best.py), which is what discriminates architectures on data
    where the fixed 0.5 sits inside the no-detection attractor."""
    sed_true, doa_true = y_true
    sed_pred, doa_pred = y_pred

    if sed_true.ndim == 2:
        sed_true, doa_true = sed_true[None], doa_true[None]
        sed_pred, doa_pred = sed_pred[None], doa_pred[None]

    b, t, c = sed_true.shape
    if t % block_size != 0:
        raise ValueError(f"time {t} not divisible by block size {block_size}")
    nb = t // block_size

    sed_true = sed_true.reshape(b * nb, block_size, c)
    sed_pred = (sed_pred.reshape(b * nb, block_size, c)
                > sed_threshold).astype(jnp.float32)
    # [B*nb, block, 3C] -> [B*nb, block, C, 3]
    doa_true = doa_true.reshape(b * nb, block_size, 3, c).swapaxes(-1, -2)
    doa_pred = doa_pred.reshape(b * nb, block_size, 3, c).swapaxes(-1, -2)

    sed_true = sed_true.astype(jnp.float32)

    true_classes = jnp.max(sed_true, axis=-2, keepdims=True)   # [N, 1, C]
    pred_classes = jnp.max(sed_pred, axis=-2, keepdims=True)

    out = dict(state)
    out["Nref"] = state["Nref"] + jnp.sum(true_classes)
    out["Nsys"] = state["Nsys"] + jnp.sum(pred_classes)
    out["TN"] = state["TN"] + jnp.sum((1 - true_classes) * (1 - pred_classes))

    false_negative = true_classes * (1 - pred_classes)
    false_positive = (1 - true_classes) * pred_classes
    true_negative = (1 - true_classes) * (1 - pred_classes)
    true_positives = true_classes * pred_classes

    out["class_fn"] = state["class_fn"] + jnp.sum(false_negative, axis=(-3, -2))
    out["class_fp"] = state["class_fp"] + jnp.sum(false_positive, axis=(-3, -2))
    out["class_tn"] = state["class_tn"] + jnp.sum(true_negative, axis=(-3, -2))
    out["class_tp"] = state["class_tp"] + jnp.sum(true_positives, axis=(-3, -2))

    FN = jnp.sum(false_negative)
    FP = jnp.sum(false_positive)
    loc_FN = jnp.sum(false_negative, axis=(-2, -1))            # [N]
    loc_FP = jnp.sum(false_positive, axis=(-2, -1))

    # classes present in both: frame-level matching
    frames_true = sed_true * true_positives
    frames_pred = sed_pred * true_positives
    frames_matched = frames_true * frames_pred

    total_matched = jnp.sum(frames_matched, axis=-2, keepdims=True)  # [N, 1, C]
    matched_exist = (total_matched > 0).astype(jnp.float32)
    out["DE_TP"] = state["DE_TP"] + jnp.sum(matched_exist)

    fn2 = true_positives * (1 - matched_exist)
    FN = FN + jnp.sum(fn2)
    loc_FN = loc_FN + jnp.sum(fn2, axis=(-2, -1))

    distances = distance_between_cartesian_coordinates(
        doa_true * frames_matched[..., None],
        doa_pred * frames_matched[..., None])                   # [N, block, C]
    avg_distances = _safe_div(jnp.sum(distances, axis=-2, keepdims=True),
                              total_matched)
    out["total_DE"] = state["total_DE"] + jnp.sum(avg_distances)

    close = (avg_distances <= doa_threshold).astype(jnp.float32)
    out["TP"] = state["TP"] + jnp.sum(close * matched_exist)

    fn3 = (1 - close) * matched_exist
    FN = FN + jnp.sum(fn3)
    loc_FN = loc_FN + jnp.sum(fn3, axis=(-2, -1))

    out["FN"] = state["FN"] + FN
    out["FP"] = state["FP"] + FP
    out["S"] = state["S"] + jnp.sum(jnp.minimum(loc_FP, loc_FN))
    out["D"] = state["D"] + jnp.sum(jnp.maximum(0.0, loc_FN - loc_FP))
    out["I"] = state["I"] + jnp.sum(jnp.maximum(0.0, loc_FP - loc_FN))
    return out


def result(state: State) -> Tuple[Array, Array, Array, Array]:
    """(ER, F, DE, DE_F) — metrics.py:34-53."""
    ER = _safe_div(state["S"] + state["D"] + state["I"], state["Nref"])

    prec = _safe_div(state["TP"], state["TP"] + state["FP"])
    recall = _safe_div(state["TP"], state["TP"] + state["FN"])
    F = _safe_div(2 * prec * recall, prec + recall)

    DE = jnp.where(state["DE_TP"] > 0,
                   _safe_div(state["total_DE"], state["DE_TP"]),
                   jnp.float32(180.0))

    DE_prec = _safe_div(state["DE_TP"], state["Nsys"])
    DE_recall = _safe_div(state["DE_TP"], state["Nref"])
    DE_F = _safe_div(2 * DE_prec * DE_recall, DE_prec + DE_recall)
    return ER, F, DE, DE_F


def class_result(state: State) -> Tuple[Array, Array]:
    recall = _safe_div(state["class_tp"], state["class_tp"] + state["class_fn"])
    precision = _safe_div(state["class_tp"], state["class_tp"] + state["class_fp"])
    return recall, precision


def calculate_seld_score(metric_values) -> Array:
    """(ER + (1 - F) + LE/180 + (1 - LR)) / 4 (metrics.py:157-170)."""
    error_rate, f_score, doa_error, recall = metric_values
    return (error_rate + 1 - f_score + doa_error / 180.0 + 1 - recall) / 4


class SELDMetrics:
    """Stateful convenience wrapper mirroring the reference class API."""

    def __init__(self, doa_threshold: float = 20, block_size: int = 10,
                 n_classes: int = 14):
        self.doa_threshold = doa_threshold
        self.block_size = block_size
        self.n_classes = n_classes
        self.reset_states()

    def reset_states(self):
        self.state = init_state(self.n_classes)

    def update_states(self, y_true, y_pred):
        self.state = update(self.state, y_true, y_pred,
                            doa_threshold=self.doa_threshold,
                            block_size=self.block_size)

    def result(self):
        return result(self.state)

    def class_result(self):
        return class_result(self.state)
