"""Max pooling with a TPU-friendly backward pass.

XLA's default max-pool gradient is a select-and-scatter op — measured at
~6.6% of the SS5 train step on v5e (docs/STATUS.md round-1 trace), and it
resists fusion. For the non-overlapping pools used everywhere in this model
family (window == strides, e.g. the conv_temporal stem's [5, 2] pool,
models.py:54-78 in the reference), the gradient has a closed form:
upsample the pooled output and route the cotangent to the window elements
that equal the max.

Semantics note: select-and-scatter sends the cotangent to exactly ONE
(first) maximal element per window; the equality form sends it to ALL tied
maxima. Exact fp32 ties essentially only occur at ReLU zeros, where the
upstream ReLU gradient is zero anyway, so training is numerically
indistinguishable (verified by the loss-pin tests). The forward pass is the
same `lax.reduce_window` XLA sees from flax's nn.max_pool, so stem fusion
is untouched — only the backward changes.

Non-divisible shapes or overlapping windows fall back to the default VJP.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

def _use_eq_bwd() -> bool:
    """The equality backward MEASURED SLOWER on v5e for the SS5 train step
    (8,551 vs 8,985 windows/s): XLA fuses select-and-scatter into the stem's
    backward fusion, while the custom VJP boundary forces the upsampled
    compare to materialize. Kept opt-in (SELD_EQ_MAXPOOL_BWD=1) for future
    toolchains; default is XLA's backward. (Round-2 measurement,
    BASELINE.md.) Read at trace time so tests can toggle it."""
    return os.environ.get("SELD_EQ_MAXPOOL_BWD", "0") == "1"


def _plain_max_pool(x, window: Tuple[int, int], strides: Tuple[int, int],
                    padding: str):
    dims = (1, *window, 1)
    strs = (1, *strides, 1)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strs, padding)


def _fast_bwd_applicable(x_shape, window, strides, padding) -> bool:
    if tuple(window) != tuple(strides):
        return False
    t, f = x_shape[1], x_shape[2]
    return t % window[0] == 0 and f % window[1] == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool_eqbwd(x, window, strides, padding):
    return _plain_max_pool(x, window, strides, padding)


def _max_pool_fwd(x, window, strides, padding):
    y = _plain_max_pool(x, window, strides, padding)
    return y, (x, y)


def _max_pool_bwd(window, strides, padding, res, g):
    x, y = res
    b, t, f, c = x.shape
    wt, wf = window
    # window-split view: route the cotangent to tied maxima, split
    # count-normalized so the total routed gradient per window matches
    # select-and-scatter's single-winner routing (and the fused stem's
    # tie semantics, ops/pallas/stem_bwd.py)
    x6 = x.reshape(b, t // wt, wt, f // wf, wf, c)
    eq = (x6 == y.reshape(b, t // wt, 1, f // wf, 1, c)).astype(g.dtype)
    cnt = jnp.sum(eq, axis=(2, 4), keepdims=True)
    g6 = g.reshape(b, t // wt, 1, f // wf, 1, c) / jnp.maximum(cnt, 1)
    return ((eq * g6).reshape(x.shape),)


_max_pool_eqbwd.defvjp(_max_pool_fwd, _max_pool_bwd)


def max_pool(x: jnp.ndarray, window: Sequence[int],
             strides: Sequence[int] = None, padding: str = "VALID"
             ) -> jnp.ndarray:
    """Drop-in for flax nn.max_pool on [B, T, F, C] inputs.

    Uses the equality-based backward when the pool is non-overlapping and
    the spatial dims divide the window; otherwise defers to the default VJP
    (select-and-scatter).
    """
    window = tuple(window)
    strides = tuple(strides) if strides is not None else window
    if _use_eq_bwd() and _fast_bwd_applicable(
            x.shape, window, strides, padding):
        return _max_pool_eqbwd(x, window, strides, padding.upper())
    return _plain_max_pool(x, window, strides, padding.upper())
