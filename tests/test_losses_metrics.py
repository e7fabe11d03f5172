"""Tests for losses, streaming metrics, and the official scorer.

The official scorer is parity-tested against the vendored upstream evaluator
(read-only at /root/reference/SELD_evaluation_metrics.py) on randomized
segment dicts — exact agreement required.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from seld_tpu.train import losses
from seld_tpu.train import metrics as M
from seld_tpu.train.official_metrics import SELDMetricsOfficial
from seld_tpu.utils import io


# ------------------------------- losses -----------------------------------
def test_mmse_masks_inactive_classes():
    C = 4
    y_true = np.zeros((2, 5, 3 * C), np.float32)
    # class 0 active in frame 0 of sample 0 with doa (1,0,0)
    y_true[0, 0, 0] = 1.0
    y_pred = np.zeros_like(y_true)
    y_pred[0, 0, 0] = 0.5       # active component: err 0.25
    y_pred[1, 2, 5] = 100.0     # inactive: must be ignored
    loss = float(losses.MMSE(jnp.asarray(y_true), jnp.asarray(y_pred)))
    # mask sum = 3 (class 0 tiled x3); err sum = 0.25
    assert loss == pytest.approx(0.25 / 3.0, rel=1e-5)


def test_mmse_cls_weights():
    C = 2
    y_true = np.zeros((1, 1, 3 * C), np.float32)
    y_true[0, 0, 0] = 1.0  # class 0, x=1
    y_true[0, 0, 1] = 1.0  # class 1, x=1
    y_pred = np.zeros_like(y_true)
    w = jnp.asarray([[2.0, 1.0]])
    loss = float(losses.MMSE_with_cls_weights(
        jnp.asarray(y_true), jnp.asarray(y_pred), w))
    # err per class = 1 (x component); weighted sum = 2+1=3; mask sum = 3*(2+1)=9
    assert loss == pytest.approx(3.0 / 9.0, rel=1e-5)


def test_bce_label_smoothing():
    y_true = jnp.asarray([[1.0, 0.0]])
    y_pred = jnp.asarray([[0.9, 0.1]])
    plain = float(losses.sed_loss_with_weights(y_true, y_pred))
    smooth = float(losses.sed_loss_with_weights(y_true, y_pred,
                                                label_smoothing=0.2))
    expected_plain = -np.mean([np.log(0.9), np.log(0.9)])
    assert plain == pytest.approx(expected_plain, rel=1e-5)
    t = 0.9  # smoothed target for the positive
    expected_smooth = -np.mean([
        t * np.log(0.9) + (1 - t) * np.log(0.1),
        (1 - t) * np.log(0.1) + t * np.log(0.9),
    ])
    assert smooth == pytest.approx(expected_smooth, rel=1e-5)


def test_focal_loss_downweights_easy():
    y_true = jnp.asarray([1.0])
    easy = float(losses.focal_loss(y_true, jnp.asarray([0.95])))
    hard = float(losses.focal_loss(y_true, jnp.asarray([0.3])))
    assert hard > easy * 10


def test_class_weights_from_samples():
    w = np.asarray(losses.class_weights_from_samples(
        losses.DCASE2021_TRAIN_SAMPLES))
    assert w.shape == (1, 12)
    assert w[0, 9] == w.max()  # rarest class (6498 samples) gets biggest weight
    assert w[0, 6] == w.min()  # most frequent (66527)


def test_doa_loss_registry():
    assert losses.get_doa_loss("MMSE") is losses.MMSE
    with pytest.raises(ValueError):
        losses.get_doa_loss("nope")


# --------------------------- streaming metrics ----------------------------
def _random_labels(rng, B=3, T=60, C=14, p=0.1):
    sed = (rng.rand(B, T, C) < p).astype(np.float32)
    doa = rng.randn(B, T, 3 * C).astype(np.float32)
    doa3 = doa.reshape(B, T, 3, C)
    doa3 /= np.maximum(np.linalg.norm(doa3, axis=2, keepdims=True), 1e-8)
    doa3 *= sed[:, :, None, :]
    return sed, doa3.reshape(B, T, 3 * C)


def test_streaming_perfect_predictions():
    rng = np.random.RandomState(0)
    sed, doa = _random_labels(rng)
    m = M.SELDMetrics(n_classes=14)
    m.update_states((jnp.asarray(sed), jnp.asarray(doa)),
                    (jnp.asarray(sed), jnp.asarray(doa)))
    ER, F, DE, DE_F = [float(v) for v in m.result()]
    assert ER == pytest.approx(0.0, abs=1e-6)
    assert F == pytest.approx(1.0, abs=1e-6)
    assert DE == pytest.approx(0.0, abs=1e-3)
    assert DE_F == pytest.approx(1.0, abs=1e-6)
    assert float(M.calculate_seld_score(m.result())) == pytest.approx(0, abs=1e-4)


def test_streaming_empty_predictions():
    rng = np.random.RandomState(1)
    sed, doa = _random_labels(rng)
    m = M.SELDMetrics(n_classes=14)
    m.update_states((jnp.asarray(sed), jnp.asarray(doa)),
                    (jnp.zeros_like(sed), jnp.zeros_like(doa)))
    ER, F, DE, DE_F = [float(v) for v in m.result()]
    assert ER == pytest.approx(1.0, abs=1e-6)  # all deletions
    assert F == 0.0
    assert DE == pytest.approx(180.0)
    assert DE_F == 0.0


def test_streaming_doa_threshold():
    # one active class; predicted direction off by ~30 deg -> loc-sensitive FP
    C = 14
    sed = np.zeros((1, 10, C), np.float32)
    sed[0, :, 2] = 1.0
    doa_t = np.zeros((1, 10, 3 * C), np.float32)
    doa_t[0, :, 2] = 1.0  # x
    doa_p = np.zeros_like(doa_t)
    ang = np.radians(30)
    doa_p[0, :, 2] = np.cos(ang)
    doa_p[0, :, 2 + C] = np.sin(ang)

    m = M.SELDMetrics(n_classes=C)
    m.update_states((jnp.asarray(sed), jnp.asarray(doa_t)),
                    (jnp.asarray(sed), jnp.asarray(doa_p)))
    ER, F, DE, DE_F = [float(v) for v in m.result()]
    assert DE == pytest.approx(30.0, abs=0.1)
    assert F == 0.0            # outside 20 deg -> not a location-sensitive TP
    assert DE_F == pytest.approx(1.0)  # class matched though


def test_streaming_matches_blockwise_reference_accounting():
    """Folding blocks into batch must equal per-block sequential updates."""
    rng = np.random.RandomState(2)
    sed_t, doa_t = _random_labels(rng)
    sed_p, doa_p = _random_labels(rng)

    fast = M.init_state(14)
    fast = M.update(fast, (jnp.asarray(sed_t), jnp.asarray(doa_t)),
                    (jnp.asarray(sed_p), jnp.asarray(doa_p)))

    slow = M.init_state(14)
    for b in range(0, 60, 10):
        slow = M.update(
            slow,
            (jnp.asarray(sed_t[:, b:b + 10]), jnp.asarray(doa_t[:, b:b + 10])),
            (jnp.asarray(sed_p[:, b:b + 10]), jnp.asarray(doa_p[:, b:b + 10])))

    for k in fast:
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(slow[k]),
                                   rtol=1e-5, err_msg=k)


def test_streaming_update_is_jittable():
    import jax
    rng = np.random.RandomState(3)
    sed, doa = _random_labels(rng)
    jit_update = jax.jit(M.update)
    s = jit_update(M.init_state(14), (jnp.asarray(sed), jnp.asarray(doa)),
                   (jnp.asarray(sed), jnp.asarray(doa)))
    assert float(M.result(s)[1]) == pytest.approx(1.0, abs=1e-6)


# ---------------------------- official scorer -----------------------------
def _reference_scorer():
    ref_dir = "/root/reference"
    if not os.path.exists(os.path.join(ref_dir, "SELD_evaluation_metrics.py")):
        pytest.skip("upstream reference not available")
    if not hasattr(np, "float"):
        np.float = float  # upstream uses np.finfo(np.float); numpy>=1.24 removed it
    sys.path.insert(0, ref_dir)
    try:
        import SELD_evaluation_metrics as ref
    finally:
        sys.path.remove(ref_dir)
    return ref


def _random_segments(rng, n_frames=100, n_classes=11, cartesian=True):
    """Random DCASE output dict -> segment dict."""
    out = {}
    for f in range(n_frames):
        if rng.rand() < 0.4:
            continue
        out[f] = []
        for cls in rng.choice(n_classes, size=rng.randint(1, 3), replace=False):
            if cartesian:
                v = rng.randn(3)
                v /= np.linalg.norm(v)
                out[f].append([int(cls), v[0], v[1], v[2], 0])
            else:
                out[f].append([int(cls), rng.uniform(-180, 180),
                               rng.uniform(-90, 90), 0])
    return io.segment_labels(out, n_frames)


@pytest.mark.parametrize("cartesian", [True, False])
def test_official_scorer_parity_with_upstream(cartesian):
    ref = _reference_scorer()
    rng = np.random.RandomState(7)

    ours = SELDMetricsOfficial(doa_threshold=20, nb_classes=11)
    theirs = ref.SELDMetrics_(doa_threshold=20, nb_classes=11)

    for _ in range(5):
        gt = _random_segments(rng, cartesian=cartesian)
        # predictions: mix of perturbed gt and fresh noise
        pred = _random_segments(rng, cartesian=cartesian)
        ours.update_seld_scores(pred, gt)
        theirs.update_seld_scores(pred, gt)

    ours_scores = ours.compute_seld_scores()
    theirs_scores = theirs.compute_seld_scores()
    np.testing.assert_allclose(ours_scores, theirs_scores, rtol=1e-10)
    assert ours._Nref == theirs._Nref
    assert ours._TP == theirs._TP
    assert ours._FP == theirs._FP
    assert ours._FN == theirs._FN
    assert (ours._S, ours._D, ours._I) == (theirs._S, theirs._D, theirs._I)


def test_official_scorer_perfect_match():
    rng = np.random.RandomState(11)
    gt = _random_segments(rng)
    m = SELDMetricsOfficial(nb_classes=11)
    m.update_seld_scores(gt, gt)
    ER, F, LE, LR = m.compute_seld_scores()
    assert ER == pytest.approx(0.0, abs=1e-9)
    assert F == pytest.approx(1.0, abs=1e-9)
    # LE has a ~1e-3 deg numerical floor from the upstream's 1e-10 norm eps
    assert LE == pytest.approx(0.0, abs=0.01)
    assert LR == pytest.approx(1.0, abs=1e-9)
    assert m.early_stopping_metric() == pytest.approx(0.0, abs=1e-4)
