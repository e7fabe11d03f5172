"""Fused stem: conv2d + train-mode BatchNorm + ReLU + non-overlapping maxpool
with a hand-scheduled backward.

The conv_temporal stem (reference models.py:54-78: conv2d_bn + MaxPooling2D)
dominates the SS5 train step: its [B, 300, 64, 32] activation is touched by
~9 separate XLA passes (round-2 trace, BASELINE.md), of which the backward
chain — pool-routing materialization, dgamma/dbeta reductions, BN backward,
conv wgrad — costs ~5.4 ms of a 15.7 ms step at B=256 on v5e.

This op keeps the forward as plain XLA (conv + stats + normalize + pool fuse
well already) but replaces autodiff's backward with a custom VJP that:
  - recomputes the routing (pool argmax + ReLU mask + xhat) from the saved
    conv output instead of materializing gradient tensors between passes,
    letting XLA duplicate the cheap elementwise work into each consumer;
  - computes dgamma/dbeta in ONE pass over the activation;
  - feeds the BN-backward expression directly into the conv wgrad so the
    [B, T, F, C] gradient tensor is never written to HBM;
  - skips dx entirely (the stem input is data, never differentiated).

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
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _conv(x, kernel):
    """SAME conv with MXU channel alignment (mirrors layers.Conv)."""
    if (jax.default_backend() in ("tpu", "axon") and x.shape[-1] % 8):
        extra = 8 - x.shape[-1] % 8
        x = jnp.pad(x, (*((0, 0),) * (x.ndim - 1), (0, extra)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, extra), (0, 0)))
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
    r = jax.nn.relu(y * scale + shift)
    return _max_pool(r, pool), mean, var, y


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def conv_bn_relu_pool(x, kernel, bias, gamma, beta, pool: Tuple[int, int],
                      eps: float):
    """Returns (pooled [B, T/pt, F/pf, C_out], batch_mean, batch_var)."""
    pooled, mean, var, _ = _forward(x, kernel, bias, gamma, beta, pool, eps)
    return pooled, mean, var


def _fwd(x, kernel, bias, gamma, beta, pool, eps):
    pooled, mean, var, y = _forward(x, kernel, bias, gamma, beta, pool, eps)
    return (pooled, mean, var), (x, kernel, y, mean, var, gamma, beta)


def _bwd(pool, eps, res, cts):
    dpooled = cts[0]  # mean/var outputs feed running-stat state: no grad
    x, kernel, y, mean, var, gamma, beta = res
    b, t, f, c = y.shape
    pt, pf = pool
    tl, fl = t // pt, f // pf
    n = b * t * f

    inv = lax.rsqrt(var + eps)
    yf = y.astype(jnp.float32)
    xhat = (yf - mean) * inv
    bno = xhat * gamma + beta
    r = jax.nn.relu(bno)

    # pool routing in the window-split (rank-6) view — reshapes are layout
    # no-ops; the elementwise work fuses into the consuming reductions
    r6 = r.reshape(b, tl, pt, fl, pf, c)
    m = jnp.max(r6, axis=(2, 4), keepdims=True)
    eqmask = (r6 == m).astype(jnp.float32)
    cnt = jnp.sum(eqmask, axis=(2, 4), keepdims=True)
    dp6 = dpooled.astype(jnp.float32)[:, :, None, :, None, :] / cnt
    relu6 = (bno > 0).reshape(b, tl, pt, fl, pf, c)
    dyr6 = eqmask * dp6 * relu6                       # grad wrt BN output
    dyr = dyr6.reshape(b, t, f, c)

    dbeta = jnp.sum(dyr6, axis=(0, 1, 2, 3, 4))
    dgamma = jnp.sum(dyr * xhat, axis=(0, 1, 2))

    # BN backward through the batch statistics (biased variance)
    dy = inv * gamma * (dyr - dbeta / n - xhat * (dgamma / n))
    dbias = jnp.sum(dy, axis=(0, 1, 2))

    # conv wgrad via the conv's own vjp; dy is an expression, not a saved
    # tensor — XLA fuses its producers into the wgrad operand. The vjp's
    # recomputed primal output is unused and DCE'd by XLA.
    _, conv_vjp = jax.vjp(lambda w: _conv(x, w), kernel)
    (dkernel,) = conv_vjp(dy.astype(y.dtype))

    dx = jnp.zeros_like(x)  # stem input is data; DCE'd when unused
    return (dx, dkernel, dbias.astype(jnp.float32),
            dgamma.astype(jnp.float32), dbeta.astype(jnp.float32))


conv_bn_relu_pool.defvjp(_fwd, _bwd)


def fused_stem_applicable(x_shape, pool, strides, padding: str,
                          groups: int, activation) -> bool:
    """Fast path: TPU backend, non-overlapping pool dividing the spatial
    dims, unit conv stride, SAME padding, no groups, ReLU activation."""
    if jax.default_backend() not in ("tpu", "axon"):
        import os
        if os.environ.get("SELD_FUSED_STEM", "auto") != "always":
            return False
    import os
    if os.environ.get("SELD_FUSED_STEM", "auto") == "never":
        return False
    if activation != "relu" or groups != 1 or padding.upper() != "SAME":
        return False
    if tuple(strides) != (1, 1):
        return False
    t, f = x_shape[1], x_shape[2]
    return t % pool[0] == 0 and f % pool[1] == 0
