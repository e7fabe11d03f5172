"""Pallas fused GRU kernel vs the lax.scan reference path (interpret mode).

Checks forward AND backward (custom VJP / BPTT kernel) equivalence on CPU via
the TPU interpreter, for uni- and bidirectional layers and all merge modes.
"""
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from `make test-fast`
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from seld_tpu.models.layers import GRU


def _data(b=8, t=5, i=12, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, t, i).astype(np.float32))


def _init(module, x):
    return module.init({"params": jax.random.PRNGKey(0)}, x)


@pytest.mark.parametrize("bidirectional,merge", [
    (True, "mul"), (True, "concat"), (False, "mul")])
def test_pallas_gru_forward_matches_scan(bidirectional, merge):
    x = _data()
    scan = GRU(16, bidirectional=bidirectional, merge_mode=merge,
               use_pallas=False)
    fused = GRU(16, bidirectional=bidirectional, merge_mode=merge,
                use_pallas=True)
    v = _init(scan, x)
    out_scan = scan.apply(v, x)
    with pltpu.force_tpu_interpret_mode():
        out_fused = fused.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_scan),
                               atol=1e-5)


def test_pallas_gru_grads_match_scan():
    x = _data(seed=3)
    scan = GRU(16, bidirectional=True, use_pallas=False)
    fused = GRU(16, bidirectional=True, use_pallas=True)
    v = _init(scan, x)
    w = jnp.asarray(np.random.RandomState(4).randn(8, 5, 16), jnp.float32)

    def loss(module):
        def f(params, x):
            out = module.apply({"params": params}, x)
            return jnp.sum(out * w)
        return f

    g_scan = jax.grad(loss(scan), argnums=(0, 1))(v["params"], x)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss(fused), argnums=(0, 1))(v["params"], x)

    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_scan)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (path, a), (_, b) in zip(flat_s, flat_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_pallas_gru_unidirectional_grads():
    x = _data(seed=6)
    scan = GRU(16, bidirectional=False, use_pallas=False)
    fused = GRU(16, bidirectional=False, use_pallas=True)
    v = _init(scan, x)

    def f(module):
        return lambda p, x: jnp.sum(
            jnp.tanh(module.apply({"params": p}, x)) ** 2)

    g_s = jax.grad(f(scan), argnums=(0, 1))(v["params"], x)
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(f(fused), argnums=(0, 1))(v["params"], x)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_applicability_gate():
    from seld_tpu.ops.pallas.gru import pallas_gru_applicable
    assert pallas_gru_applicable(256, 128)
    assert not pallas_gru_applicable(256, 96)
    assert not pallas_gru_applicable(3, 128)
    # per-shard alignment, not worst-case global division: a replicated
    # 8-row eval batch on an 8-device mesh is applicable (round-2 Weak #6);
    # misaligned shards fall back to the scan inside the partition lower_fn
    assert pallas_gru_applicable(8, 128)


def test_pallas_gru_misaligned_shard_falls_back_correctly():
    """B=8 sharded 8 ways gives per-shard b=1 (< sublane tile): the
    partition lower_fn must drop to the identical-semantics lax.scan and
    still match the unsharded result, fwd and bwd."""
    from seld_tpu.parallel import make_mesh
    from seld_tpu.parallel.mesh import batch_sharding, replicate

    mesh = make_mesh("data:8")
    x = _data(b=8, t=5, i=12, seed=9)
    mod = GRU(16, bidirectional=True, merge_mode="mul", use_pallas=True)
    v = _init(mod, x)

    def loss(params, xx):
        return jnp.sum(jnp.tanh(mod.apply({"params": params}, xx)) ** 2)

    out_ref = mod.apply(v, x)
    g_ref = jax.grad(loss)(v["params"], x)
    with mesh:
        xs = jax.device_put(x, batch_sharding(mesh))
        ps = replicate(v["params"], mesh)
        out_sh = jax.jit(mod.apply)({"params": ps}, xs)
        g_sh = jax.jit(jax.grad(loss))(ps, xs)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               atol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_sh)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_pallas_gru_sharded_matches_unsharded():
    """The custom_partitioning wrappers must shard the recurrence over the
    mesh's data axis (dRk/dRb psum'd in the BPTT kernel's partition body)
    with results identical to the single-device path."""
    from seld_tpu.parallel import make_mesh
    from seld_tpu.parallel.mesh import batch_sharding, replicate

    mesh = make_mesh("data:8")
    x = _data(b=16, t=5, i=12, seed=3)
    mod = GRU(16, bidirectional=True, merge_mode="mul", use_pallas=True)
    # no force_tpu_interpret_mode here: the kernels self-select plain jaxpr
    # interpretation off-TPU, which custom_partitioning can lower (the
    # forced TPU interpreter's effectful callbacks cannot be partitioned)
    v = _init(mod, x)

    def loss(params, xx):
        return jnp.sum(jnp.tanh(mod.apply({"params": params}, xx)) ** 2)

    out_ref = mod.apply(v, x)
    g_ref = jax.grad(loss)(v["params"], x)

    with mesh:
        xs = jax.device_put(x, batch_sharding(mesh))
        ps = replicate(v["params"], mesh)
        out_sh = jax.jit(mod.apply)({"params": ps}, xs)
        g_sh = jax.jit(jax.grad(loss))(ps, xs)

    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               atol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_sh)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_gru_dropout_keras_semantics():
    """Per-gate, time-constant dropout masks: deterministic given the rng,
    identical between the scan and Pallas paths (masks are sampled in the
    layer before dispatch), off in deterministic mode."""
    x = _data(b=8, t=6, i=12, seed=5)
    key = jax.random.PRNGKey(11)

    scan = GRU(16, bidirectional=True, merge_mode="mul", dropout=0.5,
               use_pallas=False)
    v = scan.init({"params": jax.random.PRNGKey(0), "dropout": key}, x)

    out_det = scan.apply(v, x, deterministic=True)
    a = scan.apply(v, x, deterministic=False, rngs={"dropout": key})
    b = scan.apply(v, x, deterministic=False, rngs={"dropout": key})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(out_det))

    fused = GRU(16, bidirectional=True, merge_mode="mul", dropout=0.5,
                use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        c = fused.apply(v, x, deterministic=False, rngs={"dropout": key})
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-5)


def test_gru_recurrent_dropout():
    """recurrent_dropout masks h_{t-1} per gate with time-constant masks
    (Keras implementation=1, forced whenever recurrent_dropout > 0 — the
    reference GRU blocks always pass recurrent_dropout=dropout_rate,
    modules.py:313-314). Deterministic given the rng; distinct from
    input-dropout-only; off in eval."""
    x = _data(b=4, t=6, i=12, seed=8)
    key = jax.random.PRNGKey(13)

    mod = GRU(16, bidirectional=True, dropout=0.3, recurrent_dropout=0.3)
    v = mod.init({"params": jax.random.PRNGKey(0), "dropout": key}, x)
    out_det = mod.apply(v, x, deterministic=True)
    a = mod.apply(v, x, deterministic=False, rngs={"dropout": key})
    b = mod.apply(v, x, deterministic=False, rngs={"dropout": key})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(out_det))

    only_input = GRU(16, bidirectional=True, dropout=0.3)
    c = only_input.apply(v, x, deterministic=False, rngs={"dropout": key})
    assert not np.allclose(np.asarray(a), np.asarray(c))
