"""Fused stem (conv+BN+ReLU+pool, seld_tpu.ops.stem): forward identical to
the composed modules; hand-written backward identical to autodiff for
tie-free pooling windows; Conv2DBN(pool=...) wiring equivalence incl.
running-stat updates."""
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from `make test-fast`
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.models.layers import BatchNorm, Conv2DBN
from seld_tpu.ops.stem import conv_bn_relu_pool


def _data(b=3, t=20, f=8, ci=7, co=16, seed=0):
    # distinct values -> tie-free pooling -> autodiff and the count-
    # normalized routing must agree exactly
    rng = np.random.RandomState(seed)
    x = rng.permutation(np.arange(b * t * f * ci, dtype=np.float32))
    x = (x.reshape(b, t, f, ci) / x.size - 0.5) * 4
    kernel = rng.randn(7, 7, ci, co).astype(np.float32) * 0.2
    bias = rng.randn(co).astype(np.float32) * 0.1
    gamma = (rng.rand(co).astype(np.float32) * 0.8 + 0.6)
    beta = rng.randn(co).astype(np.float32) * 0.2
    return (jnp.asarray(a) for a in (x, kernel, bias, gamma, beta))


def _composed(x, kernel, bias, gamma, beta, pool, eps):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    mean = jnp.mean(y, (0, 1, 2))
    var = jnp.mean(jnp.square(y), (0, 1, 2)) - jnp.square(mean)
    r = jax.nn.relu(gamma * (y - mean) * jax.lax.rsqrt(var + eps) + beta)
    return nn.max_pool(r, pool, strides=pool), mean, var


def test_fused_forward_matches_composed():
    x, kernel, bias, gamma, beta = _data()
    got = conv_bn_relu_pool(x, kernel, bias, gamma, beta, (5, 2), 1e-3)
    want = _composed(x, kernel, bias, gamma, beta, (5, 2), 1e-3)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)


def test_fused_backward_matches_autodiff():
    x, kernel, bias, gamma, beta = _data(seed=1)

    def loss_fused(kernel, bias, gamma, beta):
        pooled, _, _ = conv_bn_relu_pool(x, kernel, bias, gamma, beta,
                                         (5, 2), 1e-3)
        return jnp.sum(jnp.sin(pooled) ** 2)

    def loss_ref(kernel, bias, gamma, beta):
        pooled, _, _ = _composed(x, kernel, bias, gamma, beta, (5, 2), 1e-3)
        return jnp.sum(jnp.sin(pooled) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(kernel, bias, gamma,
                                                     beta)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(kernel, bias, gamma, beta)
    names = ("dkernel", "dbias", "dgamma", "dbeta")
    for n, a, b in zip(names, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=n)


def test_fused_grad_through_stats_nonzero():
    """The BN-backward correction terms (grad through batch mean/var) must
    be present — a plain 'frozen-stats' backward would differ."""
    x, kernel, bias, gamma, beta = _data(seed=2)

    def loss(kernel):
        pooled, _, _ = conv_bn_relu_pool(x, kernel, bias, gamma, beta,
                                         (5, 2), 1e-3)
        return jnp.sum(pooled ** 2)

    def loss_frozen(kernel):
        # same forward but stats detached
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        mean = jax.lax.stop_gradient(jnp.mean(y, (0, 1, 2)))
        var = jax.lax.stop_gradient(
            jnp.mean(jnp.square(y), (0, 1, 2)) - jnp.square(mean))
        r = jax.nn.relu(gamma * (y - mean) * jax.lax.rsqrt(var + 1e-3) + beta)
        return jnp.sum(nn.max_pool(r, (5, 2), strides=(5, 2)) ** 2)

    g = jax.grad(loss)(kernel)
    g_frozen = jax.grad(loss_frozen)(kernel)
    assert not np.allclose(np.asarray(g), np.asarray(g_frozen), atol=1e-6)


def _run_module(x, monkeypatch, mode):
    monkeypatch.setenv("SELD_FUSED_STEM", mode)
    mod = Conv2DBN(12, 5, activation="relu", pool=(5, 2))
    v = mod.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, mutated = mod.apply(v, x, train=True, mutable=["batch_stats"])
    return v, out, mutated


def test_conv2dbn_pool_fused_equals_composed(monkeypatch):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.permutation(
        np.arange(2 * 20 * 8 * 7, dtype=np.float32)).reshape(2, 20, 8, 7)
        / 1000.0)
    v_f, out_f, mut_f = _run_module(x, monkeypatch, "always")
    v_c, out_c, mut_c = _run_module(x, monkeypatch, "never")
    # same param tree either way
    assert (jax.tree_util.tree_structure(v_f)
            == jax.tree_util.tree_structure(v_c))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut_f["batch_stats"]),
                    jax.tree_util.tree_leaves(mut_c["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_conv2dbn_pool_grads_match(monkeypatch):
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.permutation(
        np.arange(2 * 20 * 8 * 7, dtype=np.float32)).reshape(2, 20, 8, 7)
        / 1000.0)
    mod = Conv2DBN(12, 5, activation="relu", pool=(5, 2))
    v = mod.init({"params": jax.random.PRNGKey(1)}, x, train=False)

    def loss(params, mode):
        monkeypatch.setenv("SELD_FUSED_STEM", mode)
        out, _ = mod.apply({"params": params,
                            "batch_stats": v["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.tanh(out) ** 2)

    g_f = jax.grad(lambda p: loss(p, "always"))(v["params"])
    g_c = jax.grad(lambda p: loss(p, "never"))(v["params"])
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_f)
    flat_c, _ = jax.tree_util.tree_flatten_with_path(g_c)
    for (path, a), (_, b) in zip(flat_f, flat_c):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path))


def test_batchnorm_native_matches_flax():
    """The native BatchNorm must reproduce flax nn.BatchNorm exactly (train
    and eval, running-stat updates)."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 10, 6, 8).astype(np.float32))

    ours = BatchNorm()
    ref = nn.BatchNorm(use_running_average=False, momentum=0.99,
                       epsilon=1e-3)
    v_o = ours.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    v_r = ref.init({"params": jax.random.PRNGKey(0)}, x)
    # same init values (ones/zeros)
    out_o, mut_o = ours.apply(v_o, x, train=True, mutable=["batch_stats"])
    out_r, mut_r = ref.apply(v_r, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_o), np.asarray(out_r),
                               atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut_o["batch_stats"]),
                    jax.tree_util.tree_leaves(mut_r["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # eval mode uses the running stats
    ref_eval = nn.BatchNorm(use_running_average=True, momentum=0.99,
                            epsilon=1e-3)
    v_o2 = {"params": v_o["params"], "batch_stats": mut_o["batch_stats"]}
    v_r2 = {"params": v_r["params"], "batch_stats": mut_r["batch_stats"]}
    np.testing.assert_allclose(
        np.asarray(ours.apply(v_o2, x, train=False)),
        np.asarray(ref_eval.apply(v_r2, x)), atol=1e-5)


def test_fused_stem_sharded_matches_unsharded(monkeypatch):
    """The custom_partitioning wrapper must shard the Pallas dy pass over
    the mesh's data axis (dbias psum'd) with results identical to the
    single-device path — the multi-chip SPMD contract for the kernel."""
    from seld_tpu.parallel import make_mesh
    from seld_tpu.parallel.mesh import batch_sharding, replicate

    monkeypatch.setenv("SELD_FUSED_STEM", "always")
    mesh = make_mesh("data:8")
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.permutation(
        np.arange(8 * 20 * 8 * 7, dtype=np.float32)).reshape(8, 20, 8, 7)
        / 3000.0)
    mod = Conv2DBN(16, 5, activation="relu", pool=(5, 2))
    v = mod.init({"params": jax.random.PRNGKey(2)}, x, train=False)

    def loss(params, xx):
        out, _ = mod.apply({"params": params,
                            "batch_stats": v["batch_stats"]},
                           xx, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.tanh(out) ** 2)

    g_ref = jax.grad(loss)(v["params"], x)

    with mesh:
        xs = jax.device_put(x, batch_sharding(mesh))
        ps = replicate(v["params"], mesh)
        g_sh = jax.jit(jax.grad(loss))(ps, xs)

    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_sh)
    for (path, a), (_, b) in zip(flat_r, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_fused_stem_propagates_input_gradient(monkeypatch):
    """Conv2DBN(pool=...) is not always the first layer (multi-conv
    simple_conv_block stages pool after every conv): the fused backward
    must return the REAL dx so upstream layers keep training. When the
    input is a non-differentiated leaf, XLA DCEs the dgrad conv for free
    (verified by unchanged bench throughput)."""
    x, kernel, bias, gamma, beta = _data(seed=9)

    def loss_fused(xx):
        pooled, _, _ = conv_bn_relu_pool(xx, kernel, bias, gamma, beta,
                                         (5, 2), 1e-3)
        return jnp.sum(jnp.sin(pooled) ** 2)

    def loss_ref(xx):
        pooled, _, _ = _composed(xx, kernel, bias, gamma, beta, (5, 2), 1e-3)
        return jnp.sum(jnp.sin(pooled) ** 2)

    gx_f = jax.grad(loss_fused)(x)
    gx_r = jax.grad(loss_ref)(x)
    assert float(jnp.abs(gx_r).max()) > 0  # non-degenerate test
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-4, rtol=2e-4)
