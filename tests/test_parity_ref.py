"""Pin scripts/parity_ref.py's reimplemented reference pieces (round-4
verdict weak #4 / demand #3): the convergence-parity record rests on two
components the harness necessarily reimplements — the reference AdaBelief
(its TF2.4 slot-variable API is gone under Keras 3) and the reference data
feed (its tfio/torchaudio pipeline cannot run here). A silent bug in either
would corrupt the whole parity record, so both are pinned here:

  (a) the in-graph TF AdaBelief vs the known-good optax twin
      (seld_tpu/train/optimizers.py::adabelief — itself formula-parity
      tested against utils.py:99-247) on identical gradient streams;
  (b) the numpy feed's windowing vs seld_tpu's window_clips, and its
      batch semantics (consecutive windows, ragged tail kept, batch-level
      shuffle) vs SeldDataset's epoch coverage on the same clips.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # TF import

tf = pytest.importorskip("tensorflow")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_parity_ref():
    spec = importlib.util.spec_from_file_location(
        "parity_ref", os.path.join(REPO, "scripts", "parity_ref.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


parity_ref = _load_parity_ref()


def test_tf_adabelief_matches_optax_twin():
    """100 steps of identical synthetic gradients through parity_ref's
    in-graph TF AdaBelief and the optax adabelief (no AGC, no flatten) must
    produce matching parameter trajectories to fp32 tolerance."""
    import jax
    import jax.numpy as jnp
    import optax

    from seld_tpu.train.optimizers import adabelief

    rng = np.random.RandomState(0)
    shapes = [(7, 5), (5,), (3, 4, 2), (11,)]
    init = [rng.randn(*s).astype(np.float32) for s in shapes]

    # deterministic, step-dependent gradient stream shared by both sides
    def grads_at(t):
        r = np.random.RandomState(1000 + t)
        return [r.randn(*s).astype(np.float32) * 0.1 for s in shapes]

    lr = 1e-3

    # --- TF side: parity_ref's in-graph implementation -------------------
    tvars = [tf.Variable(v) for v in init]
    lr_var = tf.Variable(lr, trainable=False)
    apply_fn, (slot_m, slot_v, step_t) = parity_ref.make_tf_adabelief(
        tvars, lr_var)
    for t in range(100):
        apply_fn([tf.constant(g) for g in grads_at(t)])
    tf_params = [np.asarray(v) for v in tvars]

    # --- optax side: the known-good twin ---------------------------------
    tx = adabelief(lr, agc_clip=None)
    params = [jnp.asarray(v) for v in init]
    state = tx.init(params)
    for t in range(100):
        updates, state = tx.update([jnp.asarray(g) for g in grads_at(t)],
                                   state, params)
        params = optax.apply_updates(params, updates)
    jax_params = [np.asarray(p) for p in params]

    for tp, jp, s in zip(tf_params, jax_params, shapes):
        np.testing.assert_allclose(tp, jp, rtol=1e-4, atol=1e-6,
                                   err_msg=f"shape {s}")
    # the trajectories actually moved (both sides far from init)
    assert max(np.abs(tp - i).max()
               for tp, i in zip(tf_params, init)) > 1e-3


def _fake_clips(n_clips, label_frames, n_classes=4, mult=5, seed=0):
    rng = np.random.RandomState(seed)
    xs = [rng.randn(label_frames * mult, 8, 3).astype(np.float32)
          for _ in range(n_clips)]
    ys = [rng.rand(label_frames, 4 * n_classes).astype(np.float32)
          for _ in range(n_clips)]
    return xs, ys


def test_make_windows_matches_window_clips():
    """parity_ref.make_windows (the numpy replay of data_loader.py:141-156)
    must produce exactly the same window tensors as seld_tpu's
    window_clips on DCASE-shaped clips (label frames divisible by the
    window, as every real and synthetic clip here is)."""
    from seld_tpu.data.loader import window_clips

    xs, ys = _fake_clips(n_clips=3, label_frames=120)
    X_ref, Y_ref = parity_ref.make_windows(xs, ys, label_window=60)
    X_our, Y_our = window_clips(xs, ys, label_window_size=60)
    np.testing.assert_array_equal(X_ref, X_our)
    np.testing.assert_array_equal(Y_ref, Y_our)


def test_batch_index_iter_semantics():
    """The reference feed's epoch structure (data_loader.py:132-168):
    loop_time full passes IN WINDOW ORDER, batches of consecutive windows,
    ragged tail kept, shuffle at batch level only."""
    n, loop, batch = 10, 3, 4
    rng = np.random.RandomState(0)
    batches = list(parity_ref.batch_index_iter(n, loop, batch, rng))

    # tail kept: total yielded == every window exactly loop times
    flat = np.concatenate(batches)
    assert len(flat) == n * loop
    counts = np.bincount(flat, minlength=n)
    np.testing.assert_array_equal(counts, np.full(n, loop))

    # batch-level shuffle of CONSECUTIVE runs: sorting batches by their
    # position in the tiled order reconstructs tile(arange(n), loop)
    order = np.concatenate([np.arange(n)] * loop)
    # reconstruct by matching each batch to its unique start offset
    starts = list(range(0, n * loop, batch))
    remaining = {s: order[s:s + batch] for s in starts}
    for b in batches:
        match = [s for s, exp in remaining.items()
                 if len(exp) == len(b) and np.array_equal(exp, b)]
        assert match, f"batch {b} is not a consecutive run of the epoch order"
        del remaining[match[0]]
    assert not remaining


def test_feed_epoch_coverage_matches_selddataset():
    """Same clips through both feeds: identical window CONTENT, and — when
    the batch size divides the epoch (as in every recorded parity run:
    640 windows * loop 2 / batch 32) — the identical per-epoch multiset of
    windows. Documented intentional difference: SeldDataset shuffles at
    sample level and drops a ragged tail; the reference shuffles batch-order
    only and keeps the tail (loader.py module docstring)."""
    from seld_tpu.data.loader import SeldDataset

    xs, ys = _fake_clips(n_clips=4, label_frames=120, seed=3)
    loop, batch = 2, 8
    X_ref, Y_ref = parity_ref.make_windows(xs, ys, label_window=60)
    ds = SeldDataset.from_clips(xs, ys, batch_size=batch, loop_time=loop,
                                label_window_size=60)
    np.testing.assert_array_equal(ds.x, X_ref)
    np.testing.assert_array_equal(ds.y, Y_ref)

    n = X_ref.shape[0]
    assert (n * loop) % batch == 0  # the recorded parity-run regime

    # reference-side epoch: multiset of window ids, recovered exactly
    rng = np.random.RandomState(0)
    ref_ids = np.concatenate(
        list(parity_ref.batch_index_iter(n, loop, batch, rng)))

    # our-side epoch: recover window ids by content lookup
    key = {X_ref[i].tobytes(): i for i in range(n)}
    our_ids = []
    for xb, yb in ds:
        assert xb.shape[0] == batch
        for row in xb:
            our_ids.append(key[row.tobytes()])
    np.testing.assert_array_equal(
        np.bincount(ref_ids, minlength=n),
        np.bincount(np.asarray(our_ids), minlength=n))


def test_tolerance_verdict_fields():
    """parity_run's stated-tolerance verdict: rel deltas, worst-case, and
    the non-degeneracy gate requiring F >= 0.2 on BOTH sides."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from parity_run import tolerance_verdict

    ours = {"ER": 0.50, "F": 0.45, "DER": 20.0, "DERF": 0.40}
    ref = {"ER": 0.505, "F": 0.45, "DER": 20.1, "DERF": 0.40}
    v = tolerance_verdict(ours, ref, 0.01)
    assert v["within_tolerance"] and v["non_degenerate"]
    assert abs(v["per_metric"]["ER"]["rel_delta"] - 0.005 / 0.505) < 1e-3

    # one degenerate side kills the non-degeneracy claim even at delta 0
    v2 = tolerance_verdict({"ER": 1.0, "F": 0.0, "DER": 180.0, "DERF": 0.0},
                           {"ER": 1.0, "F": 0.0, "DER": 180.0, "DERF": 0.0},
                           0.01)
    assert v2["within_tolerance"] and not v2["non_degenerate"]

    # out-of-tolerance drift is flagged
    v3 = tolerance_verdict({"ER": 0.6, "F": 0.3, "DER": 25.0, "DERF": 0.35},
                           {"ER": 0.5, "F": 0.3, "DER": 25.0, "DERF": 0.35},
                           0.01)
    assert not v3["within_tolerance"]
    assert v3["max_rel_delta"] >= 0.19
