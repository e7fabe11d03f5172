"""Device-resident dataset (data/device_dataset.py): HBM staging + on-device
gather must reproduce the host loader exactly on one shard, keep exact
per-epoch coverage under sharding, and train bit-identically to the host
feed path."""
import argparse

import jax
import numpy as np
import pytest

from seld_tpu.data.device_dataset import DeviceDataset
from seld_tpu.data.loader import SeldDataset
from seld_tpu.parallel import make_mesh
from seld_tpu.train.trainer import SELDTrainer


def _data(n=24, t=10, f=4, c=3, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, t, f, c).astype(np.float32)
    y = rng.randn(n, 5, 8).astype(np.float32)
    return x, y


def test_single_shard_matches_host_loader_exactly():
    """One shard = SeldDataset's RandomState sequence: identical batches."""
    x, y = _data()
    mesh = make_mesh("data:1", devices=jax.devices()[:1])
    host = SeldDataset(x, y, batch_size=8, train=True, loop_time=2, seed=3)
    dev = DeviceDataset(x, y, 8, mesh, loop_time=2, seed=3)
    assert len(host) == len(dev) == 6
    host_batches = list(host)
    dev_batches = list(dev)
    assert len(host_batches) == len(dev_batches)
    for (hx, hy), (dx, dy) in zip(host_batches, dev_batches):
        np.testing.assert_array_equal(hx, np.asarray(dx))
        np.testing.assert_array_equal(hy, np.asarray(dy))


def test_sharded_gather_coverage_and_residency():
    """8-way sharding: every window appears exactly once per epoch, x/y stay
    aligned, and each batch segment gathers from its own shard."""
    x, y = _data(n=32)
    mesh = make_mesh("data:8")
    dev = DeviceDataset(x, y, 16, mesh, loop_time=1, seed=0)
    shard_len = 32 // 8
    local_b = 16 // 8
    assert len(dev) == shard_len // local_b == 2
    seen = []
    for dx, dy in dev:
        dxn, dyn = np.asarray(dx), np.asarray(dy)
        assert dxn.shape == (16, 10, 4, 3)
        for pos, (row_x, row_y) in enumerate(zip(dxn, dyn)):
            matches = np.where((x == row_x).all(axis=(1, 2, 3)))[0]
            assert len(matches) == 1
            i = int(matches[0])
            np.testing.assert_array_equal(y[i], row_y)
            # segment s of the batch must hold rows from shard s
            assert i // shard_len == pos // local_b
            seen.append(i)
    assert sorted(seen) == list(range(32))


def test_works_on_mixed_data_model_mesh():
    """P('data') specs replicate over the model axis — no collectives."""
    x, y = _data(n=16)
    mesh = make_mesh("data:4,model:2")
    dev = DeviceDataset(x, y, 8, mesh, loop_time=1, seed=1)
    batches = list(dev)
    assert len(batches) == 2
    assert np.asarray(batches[0][0]).shape == (8, 10, 4, 3)


def test_validation_errors_and_trim():
    x, y = _data(n=26)  # 26 % 8 = 2 -> trimmed to 24
    mesh = make_mesh("data:8")
    with pytest.raises(ValueError, match="must divide"):
        DeviceDataset(x, y, 12, mesh)
    dev = DeviceDataset(x, y, 16, mesh)
    assert dev._shard_len == 3
    with pytest.raises(ValueError, match="exceeds per-shard"):
        DeviceDataset(x, y, 32, mesh)  # local_b 4 > shard_len 3


def test_eval_mode_matches_host_loader():
    """train=False: deterministic whole-clip batches identical to
    SeldDataset's eval iteration, on 1 shard and (pre-permuted) on many."""
    x, y = _data(n=30)  # 3 clips x 10 windows
    mesh = make_mesh("data:1", devices=jax.devices()[:1])
    host = SeldDataset(x, y, batch_size=99, train=False, windows_per_clip=10)
    # build through from_clips (mirrors SeldDataset.from_clips: whole-clip
    # batches derived from the label length, cast-before-window)
    import ml_dtypes
    clips_x = [x[i * 10:(i + 1) * 10].reshape(100, 4, 3) for i in range(3)]
    clips_y = [y[i * 10:(i + 1) * 10].reshape(50, 8) for i in range(3)]
    via_clips = DeviceDataset.from_clips(
        clips_x, clips_y, batch_size=99, mesh=mesh, train=False,
        label_window_size=5, feature_dtype=ml_dtypes.bfloat16)
    assert via_clips.batch_size == 10 and len(via_clips) == 3
    assert np.asarray(via_clips.device_arrays[0]).dtype == ml_dtypes.bfloat16
    dev = DeviceDataset(x, y, 10, mesh, train=False)
    host_b, dev_b = list(host), list(dev)
    assert len(host_b) == len(dev_b) == len(dev) == 3
    for (hx, hy), (dx, dy) in zip(host_b, dev_b):
        np.testing.assert_array_equal(hx, np.asarray(dx))
        np.testing.assert_array_equal(hy, np.asarray(dy))
    # second epoch identical (deterministic)
    for (ax, _), (bx, _) in zip(dev_b, dev):
        np.testing.assert_array_equal(np.asarray(ax), np.asarray(bx))

    # multi-shard eval: rows staged pre-permuted so the shard-major gather
    # reassembles exact dataset order — parity vs the host loader on 2 shards
    dev2 = DeviceDataset(x, y, 10, make_mesh("data:2", devices=jax.devices()[:2]), train=False)
    for (hx, hy), (dx, dy) in zip(host, dev2):
        np.testing.assert_array_equal(hx, np.asarray(dx))
        np.testing.assert_array_equal(hy, np.asarray(dy))

    with pytest.raises(ValueError, match="divide over"):
        DeviceDataset(x, y, 10, make_mesh("data:8"), train=False)
    with pytest.raises(ValueError, match="whole number"):
        DeviceDataset(x, y, 7, mesh, train=False)


@pytest.mark.heavy
def test_trainer_device_data_loss_parity(tmp_path):
    """fit() over a DeviceDataset must produce the same losses as the host
    DeviceIterator feed (single shard -> identical batch composition)."""
    rng = np.random.RandomState(0)
    n_classes = 4
    x = rng.randn(12, 60, 16, 7).astype(np.float32)
    y = rng.rand(12, 12, 4 * n_classes).astype(np.float32)
    mesh = make_mesh("data:1", devices=jax.devices()[:1])

    config = argparse.Namespace(
        name="devdata", model="seldnet", lr=3e-3, batch=6,
        loss_weight="1,10", epoch=2, agc=False, label_smoothing=0.0,
        sed_loss="BCE", doa_loss="MMSE", patience=100, lr_patience=100,
        decay=1.0, swa_start=999, swa_freq=2, mesh="data:1", seed=0)
    model_config = {
        "FIRST": "simple_conv_block",
        "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 2]]},
        "SECOND": "simple_dense_block", "SECOND_ARGS": {"units": [8]},
        "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
        "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
    }

    xv = rng.randn(6, 60, 16, 7).astype(np.float32)
    yv = rng.rand(6, 12, 4 * n_classes).astype(np.float32)

    def run(trainset, valset, tag, epoch_scan=False, fuse_metrics=False):
        cfg = argparse.Namespace(**vars(config), epoch_scan=epoch_scan,
                                 fuse_metrics=fuse_metrics)
        trainer = SELDTrainer(
            cfg, model_config, n_classes=n_classes,
            input_shape=(60, 16, 7), use_class_weights=False, mesh=mesh,
            workdir=str(tmp_path / tag / "m"), logdir=str(tmp_path / tag / "l"),
            metric_block_size=4)
        out = trainer.fit(trainset, valset, verbose=False)
        return [(h["train"]["sedLoss"], h["train"]["doaLoss"],
                 h["train"]["seldScore"], h["val"]["sedLoss"],
                 h["val"]["seldScore"]) for h in out["history"]]

    host = run(SeldDataset(x, y, batch_size=6, train=True, loop_time=2,
                           seed=0),
               SeldDataset(xv, yv, batch_size=3, train=False,
                           windows_per_clip=3), "host")
    dev = run(DeviceDataset(x, y, 6, mesh, loop_time=2, seed=0),
              DeviceDataset(xv, yv, 3, mesh, train=False), "dev")
    # whole-epoch lax.scan (one dispatch/epoch): same updates, same metric
    # accumulation — bit-identical scalars
    scan = run(DeviceDataset(x, y, 6, mesh, loop_time=2, seed=0),
               DeviceDataset(xv, yv, 3, mesh, train=False), "scan",
               epoch_scan=True)
    fused = run(DeviceDataset(x, y, 6, mesh, loop_time=2, seed=0),
                DeviceDataset(xv, yv, 3, mesh, train=False), "fused",
                epoch_scan=True, fuse_metrics=True)
    assert len(host) == len(dev) == len(scan) == len(fused) == 2
    for h, d, s, fm in zip(host, dev, scan, fused):
        np.testing.assert_allclose(h, d, rtol=0, atol=0)
        # the scan epochs are DIFFERENT compiled programs (gather + update
        # fused, XLA reassociates reductions): same updates, fp32-noise
        # divergence only (observed ~1e-7 relative on step losses,
        # compounding through two epochs of state)
        np.testing.assert_allclose(h, s, rtol=2e-3)
        np.testing.assert_allclose(h, fm, rtol=2e-3)


@pytest.mark.heavy
def test_epoch_scan_sharded_with_augment(tmp_path):
    """epoch_scan on an 8-device mesh with a fused augment: runs, finite,
    and parameters actually update (semantics differ from the host augment
    stream by design — keys split inside the scan)."""
    from seld_tpu.data import transforms as T

    rng = np.random.RandomState(1)
    n_classes = 4
    x = rng.randn(16, 60, 16, 7).astype(np.float32)
    y = rng.rand(16, 12, 4 * n_classes).astype(np.float32)
    mesh = make_mesh("data:8")
    config = argparse.Namespace(
        name="scan8", model="seldnet", lr=3e-3, batch=8,
        loss_weight="1,10", epoch=1, agc=False, label_smoothing=0.0,
        sed_loss="BCE", doa_loss="MMSE", patience=100, lr_patience=100,
        decay=1.0, swa_start=999, swa_freq=2, mesh="data:8", seed=0,
        epoch_scan=True)
    model_config = {
        "FIRST": "simple_conv_block",
        "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
        "SECOND": "simple_dense_block", "SECOND_ARGS": {"units": [8]},
        "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
        "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
    }
    trainer = SELDTrainer(
        config, model_config, n_classes=n_classes, input_shape=(60, 16, 7),
        use_class_weights=False, mesh=mesh, workdir=str(tmp_path / "m"),
        logdir=str(tmp_path / "l"), metric_block_size=4)
    trainer.set_augment(lambda k, xb, yb: (
        T.batch_mask(k, xb, axis=-2, max_mask_size=4, n_mask=1, period=60),
        yb))
    p0 = jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
    out = trainer.fit(DeviceDataset(x, y, 8, mesh, loop_time=2, seed=0),
                      verbose=False)
    h = out["history"][0]["train"]
    assert np.isfinite(h["sedLoss"]) and np.isfinite(h["seldScore"])
    p1 = jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
    assert not np.array_equal(p0, p1)


def test_eval_multi_shard_8way_clip_order():
    """8-shard device-resident eval with multi-clip batches (windows/clip
    not divisible by shards -> group clips): rows come back in exact
    dataset order on every batch."""
    x, y = _data(n=80)  # 8 clips x 10 windows
    dev = DeviceDataset(x, y, 40, make_mesh("data:8"), train=False)
    assert len(dev) == 2
    rows = np.concatenate([np.asarray(bx) for bx, _ in dev])
    np.testing.assert_array_equal(rows, x)
    lab = np.concatenate([np.asarray(by) for _, by in dev])
    np.testing.assert_array_equal(lab, y)
