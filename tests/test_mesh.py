"""Mesh-spec parsing and placement helper tests."""
import jax
import numpy as np
import pytest

from seld_tpu.parallel import make_mesh, parse_mesh_spec, shard_batch, replicate
from seld_tpu.parallel.mesh import host_init


def test_parse_mesh_spec():
    assert parse_mesh_spec("data:-1", 8) == {"data": 8}
    assert parse_mesh_spec("data:4,model:2", 8) == {"data": 4, "model": 2}
    assert parse_mesh_spec("data:-1,model:2", 8) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        parse_mesh_spec("data:3", 8)
    with pytest.raises(ValueError):
        parse_mesh_spec("a:-1,b:-1", 8)
    with pytest.raises(ValueError):
        parse_mesh_spec("data:-1,model:3", 8)


def test_make_mesh_multi_axis():
    mesh = make_mesh("data:4,model:2")
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)


def test_shard_and_replicate():
    mesh = make_mesh("data:8")
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    xs = shard_batch(x, mesh)
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), x)
    xr = replicate({"w": x}, mesh)
    assert xr["w"].sharding.is_fully_replicated


def test_host_init_runs_on_cpu():
    import jax.numpy as jnp
    out = host_init(lambda k: jax.random.normal(k, (8, 8)),
                    jax.random.PRNGKey(0))
    assert out.shape == (8, 8)
    assert out.devices().pop().platform == "cpu"


def test_tensor_parallel_specs_rules():
    """TP sharding rules: output-dim for dense/conv kernels, head dim for
    per-head attention kernels, replication for GRU/bias/BN leaves."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from seld_tpu.parallel import make_mesh, tp_param_specs

    mesh = make_mesh("data:4,model:2")
    params = {
        "Dense_0": {"kernel": jnp.zeros((16, 8)), "bias": jnp.zeros(8)},
        "Conv_0": {"kernel": jnp.zeros((3, 3, 4, 8))},
        "MultiHeadAttention_0": {"query_kernel": jnp.zeros((4, 16, 8))},
        "GRU_0": {"kernel": jnp.zeros((1, 16, 24)),
                  "recurrent_kernel": jnp.zeros((1, 8, 24))},
        "BatchNorm_0": {"scale": jnp.zeros(8), "bias": jnp.zeros(8)},
        "Dense_odd": {"kernel": jnp.zeros((16, 7))},  # 7 % 2 != 0
    }
    specs = tp_param_specs(params, mesh)
    assert specs["Dense_0"]["kernel"] == P(None, "model")
    assert specs["Dense_0"]["bias"] == P()
    assert specs["Conv_0"]["kernel"] == P(None, None, None, "model")
    assert specs["MultiHeadAttention_0"]["query_kernel"] == P("model")
    assert specs["GRU_0"]["kernel"] == P()
    assert specs["GRU_0"]["recurrent_kernel"] == P()
    assert specs["BatchNorm_0"]["scale"] == P()
    assert specs["Dense_odd"]["kernel"] == P()


def test_tensor_parallel_train_step_matches_unsharded():
    """One train step on a (data:4, model:2) mesh with TP-sharded params
    must reproduce the single-device step: params annotated, collectives
    left to GSPMD."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from seld_tpu.models import build_model
    from seld_tpu.parallel import (make_mesh, shard_batch, replicate,
                                   tp_param_specs, shard_tree)
    from seld_tpu.train import losses as L
    from seld_tpu.train import metrics as M
    from seld_tpu.train.steps import make_train_step
    from seld_tpu.train.train_state import TrainState

    n_classes = 4
    cfg = {
        "FIRST": "simple_conv_block",
        "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
        "SECOND": "transformer_encoder_stage",
        "SECOND_ARGS": {"depth": 1, "n_head": 2, "key_dim": 4,
                        "ff_multiplier": 2, "kernel_size": 1,
                        "dropout_rate": 0.0},
        "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
        "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        "n_classes": n_classes,
    }
    model = build_model("seldnet", (20, 16, 7), cfg)
    x0 = jnp.zeros((2, 20, 16, 7))
    v = model.init({"params": jax.random.PRNGKey(4)}, x0, train=False)

    def fresh_state():
        return TrainState.create(
            apply_fn=model.apply, params=v["params"],
            # sgd, not adam: adam normalizes every gradient to ~lr, which
            # amplifies the conv-bias-before-BN noise direction into a
            # false mismatch (its true gradient is ~0 + fp noise)
            batch_stats=v.get("batch_stats"), tx=optax.sgd(1e-2),
            rng=jax.random.PRNGKey(5))

    step = make_train_step(
        sed_loss_fn=lambda y, p: L.sed_loss_with_weights(y, p),
        doa_loss_fn=L.MSE, loss_weights=(1.0, 10.0),
        metric_block_size=2, donate=False)

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 20, 16, 7).astype(np.float32))
    sed = jnp.asarray((rng.rand(8, 4, n_classes) < 0.3).astype(np.float32))
    doa = jnp.asarray(np.repeat(np.asarray(sed), 3, -1) * 0.5)

    s_ref, m_ref, (sl_ref, dl_ref) = step(
        fresh_state(), M.init_state(n_classes), x, (sed, doa))

    mesh = make_mesh("data:4,model:2")
    with mesh:
        st = fresh_state()
        specs = tp_param_specs(st.params, mesh)
        st = st.replace(params=shard_tree(st.params, mesh, specs))
        st = st.replace(
            batch_stats=replicate(st.batch_stats, mesh),
            opt_state=replicate(st.opt_state, mesh),
            rng=replicate(st.rng, mesh), step=replicate(st.step, mesh))
        xb = shard_batch(x, mesh)
        yb = shard_batch((sed, doa), mesh)
        s_tp, m_tp, (sl, dl) = step(st, replicate(
            M.init_state(n_classes), mesh), xb, yb)

    # at least one kernel actually sharded over 'model'
    flat = jax.tree_util.tree_leaves(specs)
    assert any("model" in str(s) for s in flat)

    np.testing.assert_allclose(float(sl), float(sl_ref), rtol=1e-4)
    np.testing.assert_allclose(float(dl), float(dl_ref), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_tp.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(m_tp),
                    jax.tree_util.tree_leaves(m_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)
