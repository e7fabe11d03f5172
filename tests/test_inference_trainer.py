"""Sliding-window inference + trainer loop tests."""
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from `make test-fast`
import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.inference import (
    sliding_windows, overlap_add, ensemble_outputs, average_ensemble,
    evaluate_clips_official)
from seld_tpu.models import build_model
from seld_tpu.utils import io


def test_sliding_windows():
    x = jnp.arange(20.0).reshape(20, 1)
    w = np.asarray(sliding_windows(x, 8, 4))
    assert w.shape == (4, 8, 1)
    np.testing.assert_array_equal(w[1, :, 0], np.arange(4, 12))


def test_overlap_add_counts():
    frames = jnp.ones((5, 10, 1))
    out = np.asarray(overlap_add(frames, 1))
    assert out.shape == (14, 1)
    np.testing.assert_array_equal(out[:, 0],
                                  np.minimum(np.arange(1, 15)[::-1],
                                             np.minimum(np.arange(1, 15), 5)))


def _tiny_model(n_classes=4):
    cfg = {
        "FIRST": "simple_conv_block",
        "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
        "SECOND": "bidirectional_GRU_block",
        "SECOND_ARGS": {"units": [8]},
        "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
        "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        "n_classes": n_classes,
    }
    model = build_model("seldnet", (50, 16, 7), cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 50, 16, 7)), train=False)
    return model, variables


def test_ensemble_outputs_matches_naive():
    model, variables = _tiny_model()
    rng = np.random.RandomState(0)
    clip = rng.randn(300, 16, 7).astype(np.float32)  # 60 label frames

    outs = ensemble_outputs(model.apply, variables, [clip],
                            win_size=50, step_size=5, batch_size=16)
    sed, doa = outs[0]
    assert sed.shape == (60, 4) and doa.shape == (60, 12)

    # naive reference: explicit windows, per-window forward, mean of overlaps
    apply = jax.jit(model.apply, static_argnames=("train",))
    n_win = (300 - 50) // 5 + 1
    acc = np.zeros((60, 4))
    cnt = np.zeros((60, 1))
    for i in range(n_win):
        w = clip[i * 5:i * 5 + 50][None]
        s, _ = apply(variables, jnp.asarray(w), train=False)
        acc[i:i + 10] += np.asarray(s)[0]
        cnt[i:i + 10] += 1
    np.testing.assert_allclose(np.asarray(sed), acc / cnt, atol=1e-4)


def test_ensemble_outputs_nondefault_step():
    """step_size != multiplier must advance the overlap-add by whole label
    frames (round-1 bug: label_step was hardcoded to 1)."""
    model, variables = _tiny_model()
    rng = np.random.RandomState(1)
    clip = rng.randn(300, 16, 7).astype(np.float32)

    outs = ensemble_outputs(model.apply, variables, [clip],
                            win_size=50, step_size=10, batch_size=16)
    sed, doa = outs[0]
    assert sed.shape == (60, 4) and doa.shape == (60, 12)

    apply = jax.jit(model.apply, static_argnames=("train",))
    n_win = (300 - 50) // 10 + 1
    acc = np.zeros((60, 4))
    cnt = np.zeros((60, 1))
    for i in range(n_win):
        w = clip[i * 10:i * 10 + 50][None]
        s, _ = apply(variables, jnp.asarray(w), train=False)
        acc[i * 2:i * 2 + 10] += np.asarray(s)[0]
        cnt[i * 2:i * 2 + 10] += 1
    np.testing.assert_allclose(np.asarray(sed), acc / cnt, atol=1e-4)


def test_ensemble_outputs_rejects_misaligned_step():
    model, variables = _tiny_model()
    clip = np.zeros((300, 16, 7), np.float32)
    with pytest.raises(ValueError, match="multiple of the feature/label"):
        ensemble_outputs(model.apply, variables, [clip],
                         win_size=50, step_size=7, batch_size=16)


def test_average_ensemble():
    a = [(jnp.ones((5, 2)), jnp.zeros((5, 6)))]
    b = [(jnp.zeros((5, 2)), jnp.ones((5, 6)) * 2)]
    out = average_ensemble([a, b])
    np.testing.assert_allclose(np.asarray(out[0][0]), 0.5)
    np.testing.assert_allclose(np.asarray(out[0][1]), 1.0)


def test_evaluate_clips_official_perfect(tmp_path):
    """Predictions == ground truth -> SELD score ~ 0."""
    rng = np.random.RandomState(5)
    n_classes, T = 12, 60
    sed = (rng.rand(T, n_classes) < 0.08).astype(np.float32)
    doa = rng.randn(T, 3, n_classes)
    doa /= np.linalg.norm(doa, axis=1, keepdims=True)
    doa = (doa * sed[:, None, :]).reshape(T, 3 * n_classes)

    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    io.write_answer(str(gt_dir), "fold6_room1_mix001.csv", sed, doa)

    outputs = [(jnp.asarray(sed), jnp.asarray(doa))]
    seld, (er, f, le, lr) = evaluate_clips_official(
        outputs, ["fold6_room1_mix001"], str(gt_dir),
        str(tmp_path / "out"), thresholds=0.5, n_classes=n_classes,
        gt_polar=False)
    assert er == pytest.approx(0.0, abs=1e-9)
    assert f == pytest.approx(1.0, abs=1e-9)
    assert seld == pytest.approx(0.0, abs=1e-3)


def test_per_class_thresholds(tmp_path):
    from seld_tpu.inference import DEFAULT_CLASS_THRESHOLDS
    assert DEFAULT_CLASS_THRESHOLDS.shape == (12,)
    sed = np.full((10, 12), 0.32, np.float32)
    picked = sed > DEFAULT_CLASS_THRESHOLDS
    assert picked[:, 2].all() and not picked[:, 0].any()


# ------------------------------ trainer -----------------------------------
def _trainer_setup(tmp_path, epochs=3, **config_overrides):
    from seld_tpu.data.loader import SeldDataset
    from seld_tpu.train.trainer import SELDTrainer

    n_classes = 4
    rng = np.random.RandomState(0)
    feats = [rng.randn(100, 16, 7).astype(np.float32) for _ in range(2)]
    labs = [(rng.rand(20, 4 * n_classes) < 0.1).astype(np.float32)
            for _ in range(2)]
    train_ds = SeldDataset.from_clips(feats, labs, batch_size=4, train=True,
                                      label_window_size=10)
    val_ds = SeldDataset.from_clips(feats, labs, batch_size=4, train=False,
                                    label_window_size=10)

    config = argparse.Namespace(
        name="unit_run", model="seldnet", lr=1e-3, batch=4, loss_weight="1,10",
        epoch=epochs, agc=True, label_smoothing=0.1, sed_loss="BCE",
        doa_loss="MMSE", patience=100, lr_patience=2, decay=0.5,
        swa_start=1, swa_freq=1, mesh="data:-1", seed=0,
    )
    for k, v in config_overrides.items():
        setattr(config, k, v)
    model_config = {
        "FIRST": "simple_conv_block",
        "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
        "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
        "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
        "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
    }
    trainer = SELDTrainer(
        config, model_config, n_classes=n_classes, input_shape=(50, 16, 7),
        use_class_weights=False, workdir=str(tmp_path / "models"),
        logdir=str(tmp_path / "logs"), metric_block_size=5)
    return trainer, train_ds, val_ds


def test_trainer_fit_and_resume(tmp_path):
    trainer, train_ds, val_ds = _trainer_setup(tmp_path)
    result = trainer.fit(train_ds, val_ds, verbose=False)
    assert len(result["history"]) == 3
    assert np.isfinite(result["best_score"])
    # SWA accumulated (start epoch 1, freq 1 -> epochs 1, 2)
    assert float(trainer.swa.count) == 2.0
    # checkpoint exists and resumes
    trainer2, train_ds2, _ = _trainer_setup(tmp_path)
    assert trainer2.resume()
    assert trainer2.best_score == pytest.approx(result["best_score"])
    assert trainer2.start_epoch >= 1
    # loss improves over first epoch's
    first = result["history"][0]["train"]["sedLoss"]
    last = result["history"][-1]["train"]["sedLoss"]
    assert last <= first


def test_trainer_with_augment(tmp_path):
    from seld_tpu.data import transforms as T
    trainer, train_ds, _ = _trainer_setup(tmp_path)
    trainer.set_augment(T.compose(
        lambda k, x, y: (T.batch_mask(k, x, -3, 10, period=50), y),
        T.foa_intensity_vec_aug,
    ))
    result = trainer.fit(train_ds, epochs=1, verbose=False)
    assert len(result["history"]) == 1


def test_trainer_logs_scalars(tmp_path):
    import json
    trainer, train_ds, val_ds = _trainer_setup(tmp_path)
    trainer.fit(train_ds, val_ds, epochs=1, verbose=False)
    log_path = trainer.logger.path
    tags = {json.loads(l)["tag"] for l in open(log_path)}
    assert "train/train_seldScore" in tags
    assert "val/val_ErrorRate" in tags


def test_ensemble_outputs_sharded_matches_unsharded():
    from seld_tpu.parallel import make_mesh, replicate
    model, variables = _tiny_model()
    rng = np.random.RandomState(7)
    clip = rng.randn(300, 16, 7).astype(np.float32)

    plain = ensemble_outputs(model.apply, variables, [clip],
                             win_size=50, step_size=5, batch_size=16)

    mesh = make_mesh("data:8")
    variables_r = replicate(variables, mesh)
    sharded = ensemble_outputs(model.apply, variables_r, [clip],
                               win_size=50, step_size=5, batch_size=16,
                               mesh=mesh)
    np.testing.assert_allclose(np.asarray(plain[0][0]),
                               np.asarray(sharded[0][0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(plain[0][1]),
                               np.asarray(sharded[0][1]), atol=1e-5)


def test_trainer_accepts_trainset_provider(tmp_path):
    """fit() accepts a callable(epoch) -> dataset (TDM rebuild path)."""
    trainer, train_ds, _ = _trainer_setup(tmp_path)
    calls = []

    def provider(epoch):
        calls.append(epoch)
        return train_ds

    result = trainer.fit(provider, epochs=2, verbose=False)
    assert calls == [0, 1]
    assert len(result["history"]) == 2


def test_conv_temporal_trunk_head_split_exact():
    """stage='trunk' then stage='head' must reproduce the full forward
    exactly (flax names line up because skipped modules are still
    constructed)."""
    from seld_tpu.config import get_model_config
    from seld_tpu.models import build_model

    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    m = build_model("conv_temporal", (50, 16, 7), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 50, 16, 7), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    full = m.apply(v, x, train=False)
    trunk = m.apply(v, x, train=False, stage="trunk")
    sed, doa = m.apply(v, trunk, train=False, stage="head")
    np.testing.assert_allclose(np.asarray(sed), np.asarray(full[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(doa), np.asarray(full[1]), atol=1e-6)


def test_fast_sliding_window_inference():
    """fast=True: trunk once per clip, heads slide. Exactly equal to the
    per-window path for a single-window clip; near-exact (conv edge
    effects only) with overlapping windows."""
    from seld_tpu.config import get_model_config
    from seld_tpu.models import build_model
    from seld_tpu.inference import ensemble_outputs

    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    m = build_model("conv_temporal", (50, 16, 7), cfg)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((2, 50, 16, 7)), train=False)

    x1 = jnp.asarray(np.random.RandomState(1).randn(50, 16, 7), jnp.float32)
    e1 = ensemble_outputs(m.apply, v, [x1], win_size=50, step_size=5,
                          batch_size=8)
    f1 = ensemble_outputs(m.apply, v, [x1], win_size=50, step_size=5,
                          batch_size=8, fast=True)
    np.testing.assert_allclose(np.asarray(f1[0][0]), np.asarray(e1[0][0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f1[0][1]), np.asarray(e1[0][1]),
                               atol=1e-5)

    x = jnp.asarray(np.random.RandomState(2).randn(200, 16, 7), jnp.float32)
    e = ensemble_outputs(m.apply, v, [x], win_size=50, step_size=5,
                         batch_size=8)
    f = ensemble_outputs(m.apply, v, [x], win_size=50, step_size=5,
                         batch_size=8, fast=True)
    # same shape, high agreement (edge frames may differ within the conv
    # receptive field of each window boundary)
    assert f[0][0].shape == e[0][0].shape
    corr = np.corrcoef(np.asarray(e[0][1]).ravel(),
                       np.asarray(f[0][1]).ravel())[0, 1]
    # random untrained weights on noise inflate edge effects (the 7-frame
    # receptive field is 14% of this tiny 50-frame test window vs 2% of the
    # real 300-frame window); agreement just needs to be clearly high
    assert corr > 0.98, corr

    # step not divisible by the trunk's time stride -> clear error
    with pytest.raises(ValueError):
        ensemble_outputs(m.apply, v, [x], win_size=50, step_size=3,
                         batch_size=8, fast=True)


def test_fast_inference_validates_time_down_and_se():
    """Wrong time_down raises (validated against the trunk's actual output
    length) and SE blocks (clip-global time statistics) are excluded from
    the trunk."""
    from seld_tpu.config import get_model_config
    from seld_tpu.models import build_model
    from seld_tpu.models.models import conv_temporal_trunk_blocks
    from seld_tpu.inference import ensemble_outputs

    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    # SS5 trunk = mother_stage + dense stage
    assert conv_temporal_trunk_blocks(cfg) == 2
    se_cfg = dict(cfg)
    se_cfg["BLOCK0_ARGS"] = {**cfg["BLOCK0_ARGS"], "squeeze_ratio": 0.5}
    assert conv_temporal_trunk_blocks(se_cfg) == 0

    # first_pool [1, 2]: claiming time_down=5 must be rejected, not
    # silently wrong
    p1 = dict(cfg)
    p1["first_pool_size"] = [1, 2]
    m = build_model("conv_temporal", (50, 16, 7), p1)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((2, 50, 16, 7)), train=False)
    x = jnp.zeros((100, 16, 7), jnp.float32)
    with pytest.raises(ValueError, match="time_down"):
        ensemble_outputs(m.apply, v, [x], win_size=50, step_size=5,
                         batch_size=8, fast=True, time_down=5)
    # correct stride works
    out = ensemble_outputs(m.apply, v, [x], win_size=50, step_size=5,
                           batch_size=8, fast=True, time_down=1)
    assert np.isfinite(np.asarray(out[0][0])).all()


def test_fast_inference_sharded_over_mesh():
    """fast=True under a mesh shards the head's window batches over the
    data axis with results matching the single-device fast path."""
    from seld_tpu.config import get_model_config
    from seld_tpu.models import build_model
    from seld_tpu.inference import ensemble_outputs
    from seld_tpu.parallel import make_mesh

    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    m = build_model("conv_temporal", (50, 16, 7), cfg)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((2, 50, 16, 7)), train=False)
    x = jnp.asarray(np.random.RandomState(3).randn(200, 16, 7), jnp.float32)

    ref = ensemble_outputs(m.apply, v, [x], win_size=50, step_size=5,
                           batch_size=16, fast=True)
    mesh = make_mesh("data:8")
    sh = ensemble_outputs(m.apply, v, [x], win_size=50, step_size=5,
                          batch_size=16, fast=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sh[0][0]), np.asarray(ref[0][0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh[0][1]), np.asarray(ref[0][1]),
                               atol=1e-5)


def test_trainer_init_from_warm_start(tmp_path):
    """init_from (scripts/train.py --init_from): model variables come from a
    weights-only checkpoint (e.g. an imported reference SWA_best), while the
    optimizer/schedule/epoch counter start fresh and SWA re-seeds from the
    LOADED params — the fine-tune journey, distinct from resume()."""
    from seld_tpu.train.checkpoint import save_checkpoint

    trainer, train_ds, val_ds = _trainer_setup(tmp_path)
    trainer.fit(train_ds, val_ds, epochs=1, verbose=False)
    ckpt = save_checkpoint(str(tmp_path / "export"), "weights",
                           trainer.state, trainer.swa)
    trained = jax.device_get(trainer.state.params)

    trainer2, train_ds2, val_ds2 = _trainer_setup(tmp_path, name="finetune")
    trainer2.init_from(ckpt)
    loaded = jax.device_get(trainer2.state.params)
    jax.tree_util.tree_map(np.testing.assert_allclose, loaded, trained)
    # fresh schedule: epoch 0, optimizer step 0, SWA accumulator reset
    assert trainer2.start_epoch == 0
    assert int(trainer2.state.step) == 0
    assert float(trainer2.swa.count) == 0.0
    # and fine-tuning actually runs from there
    result = trainer2.fit(train_ds2, val_ds2, epochs=1, verbose=False)
    assert np.isfinite(result["history"][0]["train"]["sedLoss"])


def test_swa_off_v1_decay_semantics(tmp_path):
    """--swa off = reference train.py (v1): plateau decay keeps firing past
    swa_start (train.py:381-385), no lr halving, no weight averaging."""
    trainer, train_ds, val_ds = _trainer_setup(
        tmp_path, epochs=4, swa=False, lr_patience=1)
    trainer.best_score = -np.inf  # nothing ever improves -> pure plateau path
    base = trainer.state.get_lr()
    trainer.fit(train_ds, val_ds, verbose=False)
    assert float(trainer.swa.count) == 0.0
    # decay fired repeatedly, including past swa_start=1 (epochs 1, 2, 3)
    assert trainer.state.get_lr() == pytest.approx(base * 0.5 ** 3)


def test_swa_on_v2_decay_stops_at_swa_start(tmp_path):
    """--swa on (default) = trainv2.py: lr halves once at swa_start
    (trainv2.py:325-326) and plateau decay never fires past it."""
    trainer, train_ds, val_ds = _trainer_setup(tmp_path, epochs=4,
                                               lr_patience=1)
    trainer.best_score = -np.inf
    base = trainer.state.get_lr()
    trainer.fit(train_ds, val_ds, verbose=False)
    # only the one-time swa_start halving; no plateau decay after epoch 1
    assert trainer.state.get_lr() == pytest.approx(base * 0.5)
    assert float(trainer.swa.count) == 3.0  # epochs 1, 2, 3 (freq 1)


def test_fast_clip_batched_matches_per_clip():
    """ensemble_outputs(fast=True, clip_batch>1) stacks equal-length clips
    into one head chunk; results must be numerically identical to the
    clip-at-a-time fast path (and handle a ragged tail group + a
    different-length clip via fallback)."""
    from seld_tpu.inference.ensemble import ensemble_outputs

    cfg = {
        "n_classes": 4,
        "filters": 8, "first_kernel_size": 3, "first_pool_size": [5, 2],
        "BLOCK0": "simple_dense_stage", "BLOCK0_ARGS": {"depth": 1,
                                                        "units": 16},
        "SED": "simple_dense_stage", "SED_ARGS": {"depth": 1, "units": 8},
        "DOA": "simple_dense_stage", "DOA_ARGS": {"depth": 1, "units": 8},
    }
    model = build_model("conv_temporal", (50, 16, 7), cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 50, 16, 7)), train=False)
    rng = np.random.RandomState(2)
    clips = [rng.randn(250, 16, 7).astype(np.float32) for _ in range(3)]
    clips.append(rng.randn(300, 16, 7).astype(np.float32))  # odd one out

    ref = ensemble_outputs(model.apply, variables, clips, win_size=50,
                           step_size=5, batch_size=64, fast=True,
                           time_down=5, clip_batch=1)
    got = ensemble_outputs(model.apply, variables, clips, win_size=50,
                           step_size=5, batch_size=64, fast=True,
                           time_down=5, clip_batch=2)
    for (rs, rd), (gs, gd) in zip(ref, got):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(rs),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(rd),
                                   atol=1e-5)
