"""Fused stem: conv2d + train-mode BatchNorm + ReLU + non-overlapping maxpool
with a hand-scheduled backward (v2: Pallas single-pass dy).

The conv_temporal stem (reference models.py:54-78: conv2d_bn + MaxPooling2D)
dominates the SS5 train step — its 7x7 conv at full 300x64 resolution is
~95% of the model's forward FLOPs, and its [B, 300, 64, 32] activation is
touched by ~6 separate XLA passes per step (round-2 trace, BASELINE.md).

The v1 hand-scheduled backward (pure XLA, rank-6 reshape routing) LOST 28%
on-chip: the pool-window reshape forced relayouts of the big activation.
v2 restructures the math so the backward needs exactly ONE full-resolution
pass beyond the conv wgrad, and runs that pass as a Pallas kernel
(seld_tpu.ops.pallas.stem_bwd):

  - dgamma/dbeta never touch the full-res activation. The forward saves the
    pool-window max of the BN output, m = maxpool(bno) (the pooled output is
    relu(m)). Every routed gradient lands on an element with bno == m, whose
    xhat is (m - beta) / gamma; tie-splitting cancels in the sums. So
      dbeta  = sum(dpooled * (m > 0))
      dgamma = sum(dpooled * (m > 0) * (m - beta) / gamma)
    — computed on the 32x-smaller pooled-size tensors. (Degenerate
    gamma == 0 contributes 0 here; the composed path would route through
    all-tied windows. gamma is initialized to 1 and never trained to exact
    0 in practice.)
  - dy (gradient w.r.t. the conv output) = inv*gamma*(dyr - dbeta/n -
    xhat*dgamma/n) with dyr the ReLU-masked, count-normalized pool routing:
    ONE Pallas pass reading y + dpooled and writing dy, recomputing the
    routing in-register. dbias partials fall out of the same pass.
  - The conv wgrad stays XLA (it reads x + the now-materialized bf16 dy
    instead of select-and-scatter output + an f32 activation copy).
  - dx is skipped (the stem consumes the input batch; Conv2DBN only takes
    this path for its stem position — see fused_stem_applicable).

Pool-tie semantics: the cotangent of a pooling window is split equally among
tied maxima (count-normalized equality) instead of select-and-scatter's
first-match. Total routed gradient per window is identical; with fp32/bf16
activations ties occur essentially only at ReLU zeros, where the upstream
ReLU gradient vanishes — verified gradient-equivalent in tests.

BatchNorm semantics match flax nn.BatchNorm (biased variance, f32 stats,
Keras epsilon passed by the caller).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _conv(x, kernel):
    """SAME conv with MXU channel alignment (shared with layers.Conv)."""
    from seld_tpu.models.layers import pad_channels_for_mxu
    x, kernel = pad_channels_for_mxu(x, kernel)
    return lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _max_pool(r, pool):
    return lax.reduce_window(r, -jnp.inf, lax.max,
                             (1, *pool, 1), (1, *pool, 1), "VALID")


def _stats(y):
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, (0, 1, 2))
    var = jnp.mean(jnp.square(yf), (0, 1, 2)) - jnp.square(mean)
    return mean, var


def _forward(x, kernel, bias, gamma, beta, pool, eps):
    y = _conv(x, kernel) + bias.astype(x.dtype)
    mean, var = _stats(y)
    inv = lax.rsqrt(var + eps)
    scale = (gamma * inv).astype(y.dtype)
    shift = (beta - gamma * mean * inv).astype(y.dtype)
    bno = y * scale + shift
    m_bno = _max_pool(bno, pool)        # pre-ReLU pool max, saved for bwd
    pooled = jax.nn.relu(m_bno)         # relu(max) == max(relu)
    return pooled, mean, var, y, m_bno


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def conv_bn_relu_pool(x, kernel, bias, gamma, beta, pool: Tuple[int, int],
                      eps: float):
    """Returns (pooled [B, T/pt, F/pf, C_out], batch_mean, batch_var)."""
    pooled, mean, var, _, _ = _forward(x, kernel, bias, gamma, beta, pool,
                                       eps)
    return pooled, mean, var


def _fwd(x, kernel, bias, gamma, beta, pool, eps):
    pooled, mean, var, y, m_bno = _forward(x, kernel, bias, gamma, beta,
                                           pool, eps)
    return ((pooled, mean, var),
            (x, kernel, bias, y, mean, var, gamma, beta, m_bno))


def _dy_xla(y, dpooled, params6, pool):
    """XLA fallback for shapes the Pallas kernel doesn't cover: same math
    via a rank-6 window-split view."""
    mean, inv, gamma, beta, dgn, dbn = (params6[i] for i in range(6))
    b, t, f, c = y.shape
    pt, pf = pool
    scale = (gamma * inv).astype(y.dtype)
    shift = (beta - mean * gamma * inv).astype(y.dtype)
    bno = y * scale + shift
    bno6 = bno.reshape(b, t // pt, pt, f // pf, pf, c)
    m = jnp.max(bno6, axis=(2, 4), keepdims=True)
    eq = jnp.logical_and(bno6 == m, bno6 > 0).astype(jnp.float32)
    cnt = jnp.sum(eq, axis=(2, 4), keepdims=True)
    dp6 = dpooled.astype(jnp.float32)[:, :, None, :, None, :]
    dyr = (eq * (dp6 / jnp.maximum(cnt, 1.0))).reshape(b, t, f, c)
    xhat = (y.astype(jnp.float32) - mean) * inv
    dy = (inv * gamma) * (dyr - dbn - xhat * dgn)
    return dy.astype(y.dtype), jnp.sum(dy, axis=(0, 1, 2))


def _bwd(pool, eps, res, cts):
    dpooled = cts[0]  # mean/var outputs feed running-stat state: no grad
    x, kernel, bias, y, mean, var, gamma, beta, m_bno = res
    n = y.shape[0] * y.shape[1] * y.shape[2]

    inv = lax.rsqrt(var + eps)
    gamma_f = gamma.astype(jnp.float32)
    beta_f = beta.astype(jnp.float32)

    # dgamma/dbeta from the saved pool max — pooled-size tensors only
    g = dpooled.astype(jnp.float32) * (m_bno > 0)
    dbeta = jnp.sum(g, (0, 1, 2))
    safe = jnp.where(gamma_f == 0, 1.0, gamma_f)
    xhat_max = jnp.where(gamma_f == 0, 0.0,
                         (m_bno.astype(jnp.float32) - beta_f) / safe)
    dgamma = jnp.sum(g * xhat_max, (0, 1, 2))

    params6 = jnp.stack([mean, inv, gamma_f, beta_f,
                         dgamma / n, dbeta / n])
    from seld_tpu.ops.pallas.stem_bwd import stem_dy, stem_dy_applicable
    backend = jax.default_backend()
    if backend in ("tpu", "axon") and not stem_dy_applicable(y.shape, pool):
        dy, dbias = _dy_xla(y, dpooled, params6, pool)
    else:
        dy, dbias = stem_dy(y, dpooled, params6, pool,
                            interpret=backend not in ("tpu", "axon"))

    # conv wgrad + dgrad via the conv's own vjp (the recomputed primal is
    # DCE'd by XLA). dx is REAL: Conv2DBN(pool=...) is usually the first
    # layer (its dx dies in DCE for free), but e.g. a multi-conv
    # simple_conv_block puts a pooled Conv2DBN mid-network, where upstream
    # layers need the gradient.
    _, conv_vjp = jax.vjp(lambda xx, w: _conv(xx, w), x, kernel)
    dx, dkernel = conv_vjp(dy)
    return (dx, dkernel, dbias.astype(bias.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))


conv_bn_relu_pool.defvjp(_fwd, _bwd)


def fused_stem_applicable(x_shape, pool, strides, padding: str,
                          groups: int, activation) -> bool:
    """Fast path: TPU backend, non-overlapping pool dividing the spatial
    dims, unit conv stride, SAME padding, no groups, ReLU activation."""
    mode = os.environ.get("SELD_FUSED_STEM", "auto")
    if mode == "never":
        return False
    if jax.default_backend() not in ("tpu", "axon") and mode != "always":
        return False
    if activation != "relu" or groups != 1 or padding.upper() != "SAME":
        return False
    if tuple(strides) != (1, 1):
        return False
    t, f = x_shape[1], x_shape[2]
    return t % pool[0] == 0 and f % pool[1] == 0
