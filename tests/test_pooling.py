"""Custom max-pool backward (seld_tpu.ops.pooling): forward identical to
flax nn.max_pool, gradient identical to the select-and-scatter default for
tie-free inputs, graceful fallback for overlapping windows."""
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.ops.pooling import max_pool


@pytest.fixture(autouse=True)
def _eq_bwd(monkeypatch):
    # exercise the custom backward without leaking the env var into other
    # test modules in the same pytest process (it is read at trace time)
    monkeypatch.setenv("SELD_EQ_MAXPOOL_BWD", "1")


def _rand(shape, seed=0):
    # distinct values -> no ties -> select-and-scatter and equality backward
    # must agree exactly
    rng = np.random.RandomState(seed)
    x = rng.permutation(np.arange(np.prod(shape), dtype=np.float32))
    return jnp.asarray(x.reshape(shape) / np.prod(shape))


@pytest.mark.parametrize("window", [(5, 2), (1, 2), (5, 4)])
def test_forward_matches_flax(window):
    x = _rand((2, 20, 8, 3))
    np.testing.assert_array_equal(
        np.asarray(max_pool(x, window, strides=window, padding="SAME")),
        np.asarray(nn.max_pool(x, window, strides=window, padding="SAME")))


@pytest.mark.parametrize("window", [(5, 2), (1, 2)])
def test_grad_matches_default(window):
    x = _rand((2, 20, 8, 3), seed=1)

    def f_custom(x):
        return jnp.sum(jnp.sin(max_pool(x, window, strides=window)) ** 2)

    def f_default(x):
        return jnp.sum(jnp.sin(nn.max_pool(x, window, strides=window)) ** 2)

    g_c = jax.grad(f_custom)(x)
    g_d = jax.grad(f_default)(x)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_d), atol=1e-6)


def test_grad_with_relu_zero_ties():
    """Post-ReLU inputs tie at 0.0; the extra scattered cotangents must be
    killed by the upstream ReLU gradient, leaving d(pre-activation) equal."""
    rng = np.random.RandomState(2)
    pre = jnp.asarray(rng.randn(2, 10, 4, 3).astype(np.float32))

    def f(pool):
        def loss(p):
            return jnp.sum(pool(jax.nn.relu(p), (5, 2), strides=(5, 2)) ** 2)
        return jax.grad(loss)(pre)

    np.testing.assert_allclose(np.asarray(f(max_pool)),
                               np.asarray(f(nn.max_pool)), atol=1e-6)


def test_overlapping_window_falls_back():
    x = _rand((2, 12, 6, 2), seed=3)
    y = max_pool(x, (1, 3), strides=(1, 2), padding="SAME")
    ref = nn.max_pool(x, (1, 3), strides=(1, 2), padding="SAME")
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
    g = jax.grad(lambda a: jnp.sum(
        max_pool(a, (1, 3), strides=(1, 2), padding="SAME")))(x)
    g_ref = jax.grad(lambda a: jnp.sum(
        nn.max_pool(a, (1, 3), strides=(1, 2), padding="SAME")))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)


def test_nondivisible_falls_back():
    x = _rand((2, 7, 5, 2), seed=4)
    g = jax.grad(lambda a: jnp.sum(
        max_pool(a, (2, 2), strides=(2, 2), padding="SAME")))(x)
    g_ref = jax.grad(lambda a: jnp.sum(
        nn.max_pool(a, (2, 2), strides=(2, 2), padding="SAME")))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)


def test_tied_maxima_split_count_normalized():
    """Tied maxima share the cotangent (dp/cnt each): total routed gradient
    per window equals select-and-scatter's single-winner routing."""
    x = jnp.asarray(np.array(
        [[[[1.0], [1.0]], [[0.5], [1.0]]]], np.float32))  # [1, 2, 2, 1]
    g = jax.grad(lambda a: jnp.sum(
        max_pool(a, (2, 2), strides=(2, 2)) * 3.0))(x)
    got = np.asarray(g)[0, :, :, 0]
    np.testing.assert_allclose(got, [[1.0, 1.0], [0.0, 1.0]])  # 3 ties / 3
    assert got.sum() == pytest.approx(3.0)
