"""Optimizers and gradient tools (optax).

  - adabelief : exact update-rule parity with the reference's TF2 AdaBelief
    (utils.py:99-247): m_t = b1 m + (1-b1) g; v_t = b2 v + (1-b2)(g - m_t)^2;
    step = lr * sqrt(1 - b2^t)/(1 - b1^t) * m_t / (sqrt(v_t) + eps), eps=1e-7.
    (optax's stock adabelief adds eps inside v and bias-corrects differently.)
  - adaptive_clip_grad : NFNet-style AGC (utils.py:67-96) with the reference's
    unitwise-norm convention: scalars/vectors -> global norm; 2D/3D -> axis 0;
    4D conv HWIO -> axes (0, 1, 2).
  - amsgrad variant supported (vhat max accumulator).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def unitwise_norm(x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim <= 1:
        return jnp.sqrt(jnp.sum(x ** 2))
    if x.ndim in (2, 3):
        return jnp.sqrt(jnp.sum(x ** 2, axis=0, keepdims=True))
    if x.ndim == 4:
        return jnp.sqrt(jnp.sum(x ** 2, axis=(0, 1, 2), keepdims=True))
    raise ValueError(f"Got a parameter with shape not in [1, 2, 3, 4]: {x.shape}")


def adaptive_clip_grad(params, grads, clip_factor: float = 0.01,
                       eps: float = 1e-3):
    """Pure-function AGC over matching pytrees."""
    def clip_one(p, g):
        p_norm = unitwise_norm(p)
        max_norm = jnp.maximum(p_norm, eps) * clip_factor
        g_norm = unitwise_norm(g)
        clipped = g * (max_norm / jnp.maximum(g_norm, 1e-6))
        return jnp.where(g_norm < max_norm, g, clipped)
    return jax.tree_util.tree_map(clip_one, params, grads)


def agc(clip_factor: float = 0.01, eps: float = 1e-3
        ) -> optax.GradientTransformation:
    """AGC as an optax transformation (requires params)."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("agc requires params")
        return adaptive_clip_grad(params, updates, clip_factor, eps), state

    return optax.GradientTransformation(init_fn, update_fn)


class ScaleByAdaBeliefState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    v: optax.Updates
    vhat: Optional[optax.Updates]


def scale_by_adabelief_ref(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-7, amsgrad: bool = False
                           ) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaleByAdaBeliefState(
            count=jnp.zeros([], jnp.int32),
            m=zeros,
            v=jax.tree_util.tree_map(jnp.zeros_like, params),
            vhat=(jax.tree_util.tree_map(jnp.zeros_like, params)
                  if amsgrad else None),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        m = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm + (1 - b1) * g, state.m, updates)
        v = jax.tree_util.tree_map(
            lambda vv, g, mm: b2 * vv + (1 - b2) * jnp.square(g - mm),
            state.v, updates, m)
        correction = jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        if amsgrad:
            vhat = jax.tree_util.tree_map(jnp.maximum, state.vhat, v)
            denom_tree = vhat
        else:
            vhat = None
            denom_tree = v
        scaled = jax.tree_util.tree_map(
            lambda mm, vv: correction * mm / (jnp.sqrt(vv) + eps),
            m, denom_tree)
        return scaled, ScaleByAdaBeliefState(count, m, v, vhat)

    return optax.GradientTransformation(init_fn, update_fn)


def adabelief(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-7, amsgrad: bool = False,
              agc_clip: Optional[float] = None,
              flatten: bool = True) -> optax.GradientTransformation:
    """AdaBelief with optional built-in AGC (applied to raw grads first).

    flatten=True wraps the moment updates in optax.flatten so they run as a
    few large fused ops over one flat vector instead of one kernel per param
    leaf (measured 6.9 ms -> sub-ms for SS5's ~300 leaves on v5e). AGC stays
    outside the flatten wrapper — its unitwise norms need real shapes.
    """
    inner = optax.chain(scale_by_adabelief_ref(b1, b2, eps, amsgrad),
                        optax.scale_by_learning_rate(learning_rate))
    if flatten:
        inner = optax.flatten(inner)
    chain = []
    if agc_clip is not None:
        chain.append(agc(agc_clip))
    chain.append(inner)
    return optax.chain(*chain)


def adam(learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7,
         agc_clip: Optional[float] = None,
         flatten: bool = True) -> optax.GradientTransformation:
    """Adam matching tf.keras defaults (eps inside sqrt denominator)."""
    inner = optax.chain(optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
                        optax.scale_by_learning_rate(learning_rate))
    if flatten:
        inner = optax.flatten(inner)
    chain = []
    if agc_clip is not None:
        chain.append(agc(agc_clip))
    chain.append(inner)
    return optax.chain(*chain)
