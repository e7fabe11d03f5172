"""End-to-end integration: train -> ensemble inference -> official scoring,
and streaming-vs-official metric agreement monitoring (the reference prints
both side by side, train.py:101-130 / SURVEY §5)."""
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from `make test-fast`
import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.data.loader import SeldDataset
from seld_tpu.train import metrics as M
from seld_tpu.train.official_metrics import SELDMetricsOfficial
from seld_tpu.train.trainer import SELDTrainer
from seld_tpu.utils import io


def _learnable_clips(rng, n_clips=3, t_label=60, n_classes=4, f=16):
    """Features that encode the labels -> the model can actually learn."""
    feats, labels = [], []
    for _ in range(n_clips):
        lab = np.zeros((t_label, 4 * n_classes), np.float32)
        for _ in range(6):
            f0, c = rng.randint(0, t_label - 10), rng.randint(0, n_classes)
            v = rng.randn(3)
            v /= np.linalg.norm(v)
            lab[f0:f0 + 10, c] = 1.0
            lab[f0:f0 + 10, n_classes + c::n_classes] = v
        x = rng.randn(t_label * 5, f, 7).astype(np.float32) * 0.1
        # paint class activity into distinct freq bands
        for c in range(n_classes):
            band = slice(c * (f // n_classes), (c + 1) * (f // n_classes))
            x[:, band, 0] += np.repeat(lab[:, c], 5)[:, None] * 2.0
        feats.append(x)
        labels.append(lab)
    return feats, labels


def test_train_then_official_score_improves(tmp_path):
    rng = np.random.RandomState(0)
    n_classes = 4
    feats, labels = _learnable_clips(rng, n_classes=n_classes)
    trainset = SeldDataset.from_clips(feats, labels, batch_size=6, train=True,
                                      label_window_size=12, loop_time=4)

    config = argparse.Namespace(
        name="integration", model="seldnet", lr=3e-3, batch=6,
        loss_weight="1,10", epoch=4, agc=False, label_smoothing=0.0,
        sed_loss="BCE", doa_loss="MMSE", patience=100, lr_patience=100,
        decay=1.0, swa_start=999, swa_freq=2, mesh="data:-1", seed=0)
    model_config = {
        "FIRST": "simple_conv_block",
        "FIRST_ARGS": {"filters": [16], "pool_size": [[5, 2]]},
        "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [16]},
        "SED": "simple_dense_block", "SED_ARGS": {"units": [16]},
        "DOA": "simple_dense_block", "DOA_ARGS": {"units": [16]},
    }
    trainer = SELDTrainer(
        config, model_config, n_classes=n_classes, input_shape=(60, 16, 7),
        use_class_weights=False, workdir=str(tmp_path / "m"),
        logdir=str(tmp_path / "l"), metric_block_size=4)

    # ground-truth CSVs for the official scorer
    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    names = []
    for i, lab in enumerate(labels):
        name = f"fold6_room1_mix{i:03d}"
        io.write_answer(str(gt_dir), name + ".csv", lab[:, :n_classes],
                        lab[:, n_classes:])
        names.append(name)

    def ens_score():
        seld, _ = trainer.evaluate_ensemble(
            [jnp.asarray(x) for x in feats], names, str(gt_dir),
            str(tmp_path / "out"), epoch=0, batch_size=32, thresholds=0.5)
        return seld

    # full-clip sliding-window eval needs win < clip length
    trainer.evaluate_ensemble.__func__  # sanity: method exists
    before = None
    try:
        before = ens_score()
    except Exception as e:  # pragma: no cover
        pytest.fail(f"ensemble eval failed before training: {e}")

    trainer.fit(trainset, verbose=False)
    after = ens_score()
    assert after <= before + 1e-6, (before, after)
    assert np.isfinite(after)


def test_streaming_vs_official_agreement():
    """The fast streaming metric must track the official scorer closely on
    single-track data (the duality the reference monitors by printing both)."""
    rng = np.random.RandomState(3)
    n_classes, T = 11, 600

    sed_gt = np.zeros((T, n_classes), np.float32)
    doa_gt = np.zeros((T, 3, n_classes), np.float32)
    for _ in range(40):
        f0, c = rng.randint(0, T - 20), rng.randint(0, n_classes)
        v = rng.randn(3)
        v /= np.linalg.norm(v)
        sed_gt[f0:f0 + 20, c] = 1.0
        doa_gt[f0:f0 + 20, :, c] = v

    # noisy predictions: drop some events, perturb directions
    sed_p = sed_gt * (rng.rand(T, n_classes) > 0.15)
    noise = rng.randn(T, 3, n_classes) * 0.15
    doa_p = doa_gt + noise * (np.abs(doa_gt).sum(1, keepdims=True) > 0)

    # streaming
    m = M.SELDMetrics(n_classes=n_classes)
    m.update_states(
        (jnp.asarray(sed_gt[None]), jnp.asarray(doa_gt.reshape(T, -1)[None])),
        (jnp.asarray(sed_p[None]), jnp.asarray(doa_p.reshape(T, -1)[None])))
    s_er, s_f, s_de, s_def = [float(v) for v in m.result()]

    # official: round-trip through the CSV format
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        doa_gt_flat = doa_gt.transpose(1, 0, 2).reshape(3, T, n_classes)
        # io.write_answer expects [T, 3C] ordered x*C,y*C,z*C
        gt_flat = np.concatenate([doa_gt[:, 0], doa_gt[:, 1], doa_gt[:, 2]], -1)
        p_flat = np.concatenate([doa_p[:, 0], doa_p[:, 1], doa_p[:, 2]], -1)
        io.write_answer(d, "gt.csv", sed_gt, gt_flat)
        io.write_answer(d, "p.csv", sed_p, p_flat)
        gt = io.segment_labels(io.load_output_format_file(
            os.path.join(d, "gt.csv")), T)
        pred = io.segment_labels(io.load_output_format_file(
            os.path.join(d, "p.csv")), T)
    official = SELDMetricsOfficial(nb_classes=n_classes)
    official.update_seld_scores(pred, gt)
    o_er, o_f, o_le, o_lr = official.compute_seld_scores()

    # same ballpark (the two metrics differ by design in matching details)
    assert abs(s_er - o_er) < 0.15, (s_er, o_er)
    assert abs(s_f - o_f) < 0.15, (s_f, o_f)
    assert abs(s_de - o_le) < 5.0, (s_de, o_le)
    assert abs(s_def - o_lr) < 0.15, (s_def, o_lr)


def test_joint_foa_mic_acs_training_path(tmp_path):
    """17-channel (FOA+MIC) load -> acs_aug -> train step (get_both_dataset
    path, train.py:179-208)."""
    import os
    from seld_tpu.data.loader import load_joint_seldnet_data, SeldDataset
    from seld_tpu.data import transforms as T
    from seld_tpu.models import build_model
    from seld_tpu.train.optimizers import adam
    from seld_tpu.train.steps import make_train_step
    from seld_tpu.train.train_state import TrainState
    from seld_tpu.train import losses as L, metrics as M

    rng = np.random.RandomState(0)
    root = tmp_path / "feat_label"
    for kind, chans in (("foa", 7), ("mic", 10)):
        os.makedirs(root / f"{kind}_dev_norm")
        os.makedirs(root / f"{kind}_dev_label")
        for fold in (1,):
            name = f"fold{fold}_room1_mix001.npy"
            np.save(root / f"{kind}_dev_norm" / name,
                    rng.randn(100, 16, chans).astype(np.float32))
            np.save(root / f"{kind}_dev_label" / name,
                    (rng.rand(20, 16) < 0.2).astype(np.float32))

    xs, ys = load_joint_seldnet_data(str(root), mode="train", n_freq_bins=16)
    assert xs[0].shape[-1] == 17

    ds = SeldDataset.from_clips(xs, ys, batch_size=2, label_window_size=10)
    x, y = next(iter(ds))
    x2, y2 = T.acs_aug(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    assert x2.shape == x.shape

    cfg = {"FIRST": "simple_conv_block",
           "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
           "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
           "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
           "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
           "n_classes": 4}
    model = build_model("seldnet", (50, 16, 17), cfg)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 50, 16, 17)), train=False)
    state = TrainState.create(apply_fn=model.apply, params=v["params"],
                              batch_stats=v.get("batch_stats"),
                              tx=adam(1e-3), rng=jax.random.PRNGKey(1))
    step = make_train_step(
        sed_loss_fn=lambda yy, p: L.sed_loss_with_weights(yy, p),
        doa_loss_fn=L.MMSE, metric_block_size=5, donate=False)
    sed, doa = y2[..., :4], y2[..., 4:]
    state, ms, (sl, dl) = step(state, M.init_state(4), x2, (sed, doa))
    assert np.isfinite(float(sl)) and np.isfinite(float(dl))
