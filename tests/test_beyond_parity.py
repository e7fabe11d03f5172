"""Beyond-parity additions: ACCDOA model and TCN stage."""
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from `make test-fast`
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.config.registry import get_block
from seld_tpu.models import build_model
from seld_tpu.nas.complexity import get_stage_complexity


def test_tcn_stage_shapes_and_cx():
    block = get_block("tcn_stage")({"filters": 16, "depth": 2,
                                    "kernel_size": 3})
    x = jnp.zeros((2, 20, 8, 4))
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = block.apply(variables, x, train=False, mutable=["batch_stats"])[0]
    assert out.shape == (2, 20, 16)

    cx, shape = get_stage_complexity("tcn_stage")(
        {"filters": 16, "depth": 2, "kernel_size": 3}, [20, 32])
    real = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert cx["params"] == real, (cx["params"], real)
    assert shape == [20, 16]


def test_accdoa_model_contract():
    cfg = {
        "n_classes": 12,
        "first_pool_size": [5, 2],
        "BLOCK0": "tcn_stage",
        "BLOCK0_ARGS": {"filters": 32, "depth": 2},
    }
    model = build_model("accdoa", (300, 64, 7), cfg)
    x = jnp.zeros((2, 300, 64, 7))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    sed, doa = model.apply(variables, x, train=False)
    assert sed.shape == (2, 60, 12)
    assert doa.shape == (2, 60, 36)
    s = np.asarray(sed)
    assert (s >= 0).all() and (s <= 1).all()
    # activity == clipped norm of the vector triplet
    v = np.asarray(doa).reshape(2, 60, 3, 12)
    np.testing.assert_allclose(
        s, np.minimum(np.linalg.norm(v, axis=-2), 1.0), atol=1e-6)


def test_accdoa_trains_with_existing_step():
    from seld_tpu.train import losses as L, metrics as M
    from seld_tpu.train.optimizers import adam
    from seld_tpu.train.steps import make_train_step
    from seld_tpu.train.train_state import TrainState

    cfg = {"n_classes": 4, "first_pool_size": [5, 2],
           "BLOCK0": "tcn_stage", "BLOCK0_ARGS": {"filters": 16, "depth": 1}}
    model = build_model("accdoa", (20, 16, 7), cfg)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((2, 20, 16, 7)), train=False)
    state = TrainState.create(apply_fn=model.apply, params=v["params"],
                              batch_stats=v.get("batch_stats"), tx=adam(3e-3),
                              rng=jax.random.PRNGKey(1))
    # ACCDOA objective: MSE on the activity-coupled vectors only
    step = make_train_step(
        sed_loss_fn=lambda y, p: jnp.zeros([]),
        doa_loss_fn=L.MSE, loss_weights=(0.0, 1.0),
        metric_block_size=2, donate=False)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 20, 16, 7), jnp.float32)
    sed = (rng.rand(8, 4, 4) < 0.3).astype(np.float32)
    doa3 = rng.randn(8, 4, 3, 4)
    doa3 /= np.linalg.norm(doa3, axis=2, keepdims=True)
    doa = jnp.asarray((doa3 * sed[:, :, None]).reshape(8, 4, 12), jnp.float32)
    ms = M.init_state(4)

    losses = []
    for _ in range(25):
        state, ms, (sl, dl) = step(state, ms, x, (jnp.asarray(sed), doa))
        losses.append(float(dl))
    assert losses[-1] < losses[0] * 0.9


def test_accdoa_model_complexity():
    from seld_tpu.nas.complexity import accdoa_complexity
    cfg = {"n_classes": 12, "first_pool_size": [5, 2],
           "BLOCK0": "tcn_stage", "BLOCK0_ARGS": {"filters": 32, "depth": 2}}
    model = build_model("accdoa", (300, 64, 7), cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 300, 64, 7)), train=False)
    real = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    cx, shape = accdoa_complexity(cfg, [300, 64, 7])
    assert cx["params"] == real, (cx["params"], real)
    assert shape == [60, 36]


def test_accdoa_trains_via_seldtrainer(tmp_path):
    """The full trainer journey works for ACCDOA: vector-MSE objective,
    derived-activity metrics, checkpointing — `--model accdoa` from the
    train CLI."""
    import argparse
    from seld_tpu.data.loader import SeldDataset
    from seld_tpu.train.trainer import SELDTrainer

    n_classes = 4
    rng = np.random.RandomState(0)
    feats = [rng.randn(100, 16, 7).astype(np.float32) for _ in range(2)]
    sed = [(rng.rand(20, n_classes) < 0.2).astype(np.float32)
           for _ in range(2)]
    labs = []
    for s in sed:
        v = rng.randn(20, 3, n_classes)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        labs.append(np.concatenate(
            [s, (v * s[:, None]).reshape(20, 3 * n_classes)],
            axis=-1).astype(np.float32))
    train_ds = SeldDataset.from_clips(feats, labs, batch_size=4, train=True,
                                      label_window_size=10)
    val_ds = SeldDataset.from_clips(feats, labs, batch_size=4, train=False,
                                    label_window_size=10)

    config = argparse.Namespace(
        name="accdoa_run", model="accdoa", lr=3e-3, batch=4, epoch=2,
        agc=True, sed_loss="BCE", doa_loss="MSE", patience=100,
        lr_patience=5, decay=0.5, swa_start=99, swa_freq=2,
        mesh="data:-1", seed=0)
    model_config = {"first_pool_size": [5, 2],
                    "BLOCK0": "tcn_stage",
                    "BLOCK0_ARGS": {"filters": 16, "depth": 1}}
    trainer = SELDTrainer(
        config, model_config, n_classes=n_classes, input_shape=(50, 16, 7),
        use_class_weights=False, workdir=str(tmp_path / "m"),
        logdir=str(tmp_path / "l"), metric_block_size=5)
    result = trainer.fit(train_ds, val_ds, verbose=False)
    assert len(result["history"]) == 2
    assert np.isfinite(result["best_score"])
    # the sed loss really is disabled (vector-only objective)
    assert result["history"][0]["train"]["sedLoss"] == 0.0
    assert result["history"][1]["train"]["doaLoss"] < \
        result["history"][0]["train"]["doaLoss"] * 1.5
