"""Training-core tests: optimizer parity, AGC, sharded train step, SWA,
checkpoint round-trip with optimizer state."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from seld_tpu.config import get_model_config
from seld_tpu.models import build_model
from seld_tpu.parallel import make_mesh, shard_batch, replicate
from seld_tpu.train import losses as L
from seld_tpu.train import metrics as M
from seld_tpu.train.optimizers import (
    adabelief, adaptive_clip_grad, scale_by_adabelief_ref, unitwise_norm)
from seld_tpu.train.steps import make_train_step, make_eval_step, l2_kernel_penalty
from seld_tpu.train.train_state import TrainState, SWAState
from seld_tpu.train.checkpoint import save_checkpoint, restore_checkpoint


def test_adabelief_matches_reference_formula():
    """One manual step vs the TF reference update rule (utils.py:157-182)."""
    g = jnp.asarray([0.5, -1.0, 2.0])
    p = jnp.asarray([1.0, 1.0, 1.0])
    tx = scale_by_adabelief_ref()
    state = tx.init(p)
    updates, _ = tx.update(g, state)

    b1, b2, eps = 0.9, 0.999, 1e-7
    m = (1 - b1) * np.asarray(g)
    v = (1 - b2) * (np.asarray(g) - m) ** 2
    lr_corr = np.sqrt(1 - b2) / (1 - b1)
    expected = lr_corr * m / (np.sqrt(v) + eps)
    np.testing.assert_allclose(np.asarray(updates), expected, rtol=1e-5)


def test_unitwise_norm_conventions():
    assert unitwise_norm(jnp.ones(5)).shape == ()
    assert unitwise_norm(jnp.ones((4, 8))).shape == (1, 8)
    assert unitwise_norm(jnp.ones((3, 3, 4, 8))).shape == (1, 1, 1, 8)


def test_agc_clips_large_grads_only():
    params = {"w": jnp.ones((4, 4))}
    small = {"w": jnp.full((4, 4), 1e-5)}
    big = {"w": jnp.full((4, 4), 10.0)}
    out_small = adaptive_clip_grad(params, small)
    out_big = adaptive_clip_grad(params, big)
    np.testing.assert_allclose(np.asarray(out_small["w"]),
                               np.asarray(small["w"]))
    # clipped to clip_factor * ||p|| ratio
    ratio = np.linalg.norm(np.asarray(out_big["w"]), axis=0) / \
        np.linalg.norm(np.asarray(params["w"]), axis=0)
    np.testing.assert_allclose(ratio, 0.01, rtol=1e-4)


def test_l2_kernel_penalty_excludes_rnn():
    params = {
        "Dense_0": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)},
        "GRU_0": {"kernel": jnp.ones((2, 6)),
                  "recurrent_kernel": jnp.ones((2, 6))},
    }
    pen = float(l2_kernel_penalty(params, 0.5))
    assert pen == pytest.approx(0.5 * 4.0)  # only Dense kernel (4 ones)


def _tiny_state(seed=0, lr=1e-3, agc_clip=None, n_classes=4):
    cfg = {
        "FIRST": "simple_conv_block",
        "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
        "SECOND": "bidirectional_GRU_block",
        "SECOND_ARGS": {"units": [8]},
        "SED": "simple_dense_block",
        "SED_ARGS": {"units": [8]},
        "DOA": "simple_dense_block",
        "DOA_ARGS": {"units": [8]},
        "n_classes": n_classes,
    }
    model = build_model("seldnet", (20, 16, 7), cfg)
    x = jnp.zeros((2, 20, 16, 7))
    variables = model.init({"params": jax.random.PRNGKey(seed)}, x, train=False)
    tx = optax.inject_hyperparams(
        lambda learning_rate: adabelief(learning_rate, agc_clip=agc_clip)
    )(learning_rate=lr)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx,
        rng=jax.random.PRNGKey(seed + 1))
    return state, n_classes


def _synthetic_batch(rng, B=8, T=20, C=4):
    x = rng.randn(B, T, 16, 7).astype(np.float32)
    sed = (rng.rand(B, T // 5, C) < 0.3).astype(np.float32)
    doa = rng.randn(B, T // 5, 3 * C).astype(np.float32)
    doa = np.clip(doa, -1, 1) * np.repeat(sed, 3, axis=-1)
    return jnp.asarray(x), (jnp.asarray(sed), jnp.asarray(doa))


def test_train_step_decreases_loss():
    state, C = _tiny_state(lr=5e-3)
    step = make_train_step(
        sed_loss_fn=lambda y, p: L.sed_loss_with_weights(y, p),
        doa_loss_fn=L.MMSE,
        loss_weights=(1.0, 10.0), l2=1e-4, metric_block_size=2,
        donate=False)
    rng = np.random.RandomState(0)
    x, y = _synthetic_batch(rng, C=C)
    mstate = M.init_state(C)

    first = None
    for i in range(30):
        state, mstate, (sloss, dloss) = step(state, mstate, x, y)
        total = float(sloss) + 10.0 * float(dloss)
        if first is None:
            first = total
    assert total < first * 0.9, (first, total)
    assert int(state.step) == 30


def test_bf16_loss_trajectory_matches_fp32():
    """Mixed precision (bf16 compute, fp32 master params) must track the
    fp32 loss curve — the guard for shipping bf16 as the bench/production
    configuration (round-2 perf work, BASELINE.md)."""
    rng = np.random.RandomState(0)
    x, y = _synthetic_batch(rng, C=4)

    def run(compute_dtype):
        state, C = _tiny_state(lr=5e-3)
        step = make_train_step(
            sed_loss_fn=lambda yy, p: L.sed_loss_with_weights(yy, p),
            doa_loss_fn=L.MMSE,
            loss_weights=(1.0, 10.0), l2=1e-4, metric_block_size=2,
            donate=False, compute_dtype=compute_dtype)
        mstate = M.init_state(C)
        losses = []
        for _ in range(25):
            state, mstate, (sloss, dloss) = step(state, mstate, x, y)
            losses.append(float(sloss) + 10.0 * float(dloss))
        return np.asarray(losses)

    l32 = run(None)
    l16 = run(jnp.bfloat16)
    # same qualitative curve: both strictly improving and within a few
    # percent of each other at every step
    assert l16[-1] < l16[0] * 0.9
    np.testing.assert_allclose(l16, l32, rtol=0.05)


def test_train_step_sharded_8_devices():
    mesh = make_mesh("data:8")
    assert mesh.devices.size == 8

    state, C = _tiny_state()
    step = make_train_step(
        sed_loss_fn=lambda y, p: L.sed_loss_with_weights(y, p),
        doa_loss_fn=L.MMSE, loss_weights=(1.0, 10.0),
        metric_block_size=2, donate=False)

    rng = np.random.RandomState(1)
    x, y = _synthetic_batch(rng, B=16, C=C)
    with mesh:
        state_r = replicate(state, mesh)
        mstate = replicate(M.init_state(C), mesh)
        xb = shard_batch(x, mesh)
        yb = shard_batch(y, mesh)
        state2, mstate2, (sloss, dloss) = step(state_r, mstate, xb, yb)
    assert np.isfinite(float(sloss)) and np.isfinite(float(dloss))

    # parity with unsharded execution
    state3, mstate3, (sloss1, dloss1) = step(state, M.init_state(C), x, y)
    assert float(sloss) == pytest.approx(float(sloss1), rel=1e-4)
    assert float(dloss) == pytest.approx(float(dloss1), rel=1e-4)
    a = jax.tree_util.tree_leaves(state2.params)
    b = jax.tree_util.tree_leaves(state3.params)
    for l1, l2 in zip(a, b):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=5e-4)


def test_eval_step_and_metrics():
    state, C = _tiny_state()
    estep = make_eval_step(
        sed_loss_fn=lambda y, p: L.sed_loss_with_weights(y, p),
        doa_loss_fn=L.MMSE, metric_block_size=2)
    rng = np.random.RandomState(2)
    x, y = _synthetic_batch(rng, C=C)
    mstate, (sloss, dloss) = estep(state, M.init_state(C), x, y)
    ER, F, DE, DE_F = M.result(mstate)
    assert np.isfinite(float(ER))


def test_lr_get_set():
    state, _ = _tiny_state(lr=1e-3)
    assert state.get_lr() == pytest.approx(1e-3)
    state = state.set_lr(5e-4)
    assert state.get_lr() == pytest.approx(5e-4)


def test_swa_running_average():
    p1 = {"w": jnp.asarray([1.0, 2.0])}
    p2 = {"w": jnp.asarray([3.0, 4.0])}
    swa = SWAState.create(p1)
    assert not swa.available
    swa = swa.update(p1).update(p2)
    np.testing.assert_allclose(np.asarray(swa.avg_params["w"]), [2.0, 3.0])
    assert swa.available
    # schedule: start 80 freq 2 (trainv2.py:245-246)
    assert swa.should_update(80, 80, 2)
    assert not swa.should_update(81, 80, 2)
    assert swa.should_update(82, 80, 2)
    assert not swa.should_update(79, 80, 2)


def test_checkpoint_round_trip(tmp_path):
    state, C = _tiny_state()
    step = make_train_step(
        sed_loss_fn=lambda y, p: L.sed_loss_with_weights(y, p),
        doa_loss_fn=L.MMSE, metric_block_size=2, donate=False)
    rng = np.random.RandomState(3)
    x, y = _synthetic_batch(rng, C=C)
    state, _, _ = step(state, M.init_state(C), x, y)
    swa = SWAState.create(state.params).update(state.params)

    path = save_checkpoint(str(tmp_path), "bestscore_0.5", state, swa,
                           extra={"best_score": 0.5})
    fresh, _ = _tiny_state(seed=42)
    restored, swa_r, extra = restore_checkpoint(path, fresh, SWAState.create(fresh.params))

    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
    assert int(restored.step) == 1
    assert extra["best_score"] == 0.5
    assert float(swa_r.count) == 1.0
    # optimizer state survives (count in adabelief state)
    restored_leaves = jax.tree_util.tree_leaves(restored.opt_state)
    orig_leaves = jax.tree_util.tree_leaves(state.opt_state)
    assert len(restored_leaves) == len(orig_leaves)


def test_keep_best_only(tmp_path):
    state, _ = _tiny_state()
    save_checkpoint(str(tmp_path), "bestscore_0.9", state)
    save_checkpoint(str(tmp_path), "bestscore_0.5", state, keep_best_only=True)
    import os
    names = os.listdir(tmp_path)
    assert names == ["bestscore_0.5"]


def test_multistep_matches_k_single_steps():
    """make_train_multistep(k) must be semantically identical to k single
    steps: same params, same metric state, losses stacked [k]."""
    from seld_tpu.train.steps import make_train_multistep

    kwargs = dict(
        sed_loss_fn=lambda y, p: L.sed_loss_with_weights(y, p),
        doa_loss_fn=L.MMSE,
        loss_weights=(1.0, 10.0), l2=1e-4, metric_block_size=2,
        donate=False)
    k = 3
    rng = np.random.RandomState(7)
    batches = [_synthetic_batch(rng, C=4) for _ in range(k)]

    state_a, C = _tiny_state(lr=5e-3, seed=11)
    step = make_train_step(**kwargs)
    mstate_a = M.init_state(C)
    losses_a = []
    for x, y in batches:
        state_a, mstate_a, l = step(state_a, mstate_a, x, y)
        losses_a.append([float(v) for v in l])

    state_b, _ = _tiny_state(lr=5e-3, seed=11)
    mstep = make_train_multistep(steps_per_call=k, **kwargs)
    xs = jnp.stack([b[0] for b in batches])
    ys = (jnp.stack([b[1][0] for b in batches]),
          jnp.stack([b[1][1] for b in batches]))
    state_b, mstate_b, (sl, dl) = mstep(state_b, M.init_state(C), xs, ys)

    assert int(state_b.step) == k
    np.testing.assert_allclose(np.stack([sl, dl], 1),
                               np.asarray(losses_a), rtol=1e-5, atol=1e-6)
    # atol covers the conv-bias-before-BN degenerate direction: its gradient
    # is analytically zero (BN absorbs the bias), so its value is pure
    # cancellation noise that reassociates differently between compilations
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(mstate_a),
                    jax.tree_util.tree_leaves(mstate_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_eval_step_padded_batch_matches_unpadded():
    """Zero-padded eval batches with static n_valid slicing must produce
    exactly the unpadded metric state and losses (the pad-or-shard fix for
    non-divisible clip batches on a device mesh)."""
    state, C = _tiny_state(lr=1e-3, seed=3)
    step = make_eval_step(
        sed_loss_fn=lambda y, p: L.sed_loss_with_weights(y, p),
        doa_loss_fn=L.MMSE, metric_block_size=2)
    rng = np.random.RandomState(5)
    x, (sed, doa) = _synthetic_batch(rng, B=10, C=C)

    m_ref, (sl_ref, dl_ref) = step(state, M.init_state(C), x, (sed, doa))

    pad = 6  # 10 -> 16 divides an 8-device mesh
    xp = jnp.asarray(np.pad(np.asarray(x), ((0, pad), (0, 0), (0, 0), (0, 0))))
    sp = jnp.asarray(np.pad(np.asarray(sed), ((0, pad), (0, 0), (0, 0))))
    dp = jnp.asarray(np.pad(np.asarray(doa), ((0, pad), (0, 0), (0, 0))))
    m_pad, (sl, dl) = step(state, M.init_state(C), xp, (sp, dp), n_valid=10)

    np.testing.assert_allclose(float(sl), float(sl_ref), rtol=1e-6)
    np.testing.assert_allclose(float(dl), float(dl_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m_pad),
                    jax.tree_util.tree_leaves(m_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_fused_metrics_step_matches_split():
    """fuse_metrics=True (one dispatch) must equal the split two-jit step."""
    rng = np.random.RandomState(9)
    x, y = _synthetic_batch(rng, C=4)
    kwargs = dict(sed_loss_fn=lambda yy, p: L.sed_loss_with_weights(yy, p),
                  doa_loss_fn=L.MMSE, loss_weights=(1.0, 10.0),
                  metric_block_size=2, donate=False)

    sa, C = _tiny_state(seed=21)
    step_a = make_train_step(**kwargs)
    sb, _ = _tiny_state(seed=21)
    step_b = make_train_step(fuse_metrics=True, **kwargs)
    ma, mb = M.init_state(C), M.init_state(C)
    for _ in range(3):
        sa, ma, la = step_a(sa, ma, x, y)
        sb, mb, lb = step_b(sb, mb, x, y)
    np.testing.assert_allclose([float(v) for v in la],
                               [float(v) for v in lb], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ma),
                    jax.tree_util.tree_leaves(mb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_restore_without_swa_into_swa_template(tmp_path):
    """A checkpoint saved without SWA restores gracefully into an
    SWA-bearing template (Trainer.resume always passes one)."""
    state, C = _tiny_state(seed=31)
    save_checkpoint(str(tmp_path), "noswa", state, swa=None)
    swa_template = SWAState.create(state.params, state.batch_stats)
    restored, new_swa, _ = restore_checkpoint(
        str(tmp_path / "noswa"), state, swa_template)
    assert new_swa is None
    assert int(restored.step) == int(state.step)


def test_keep_best_only_deletes_prefix_named_previous(tmp_path):
    """'bestscore_0.41' must delete an older 'bestscore_0.4123' (exact-path
    match, not startswith)."""
    import os
    state, _ = _tiny_state(seed=32)
    save_checkpoint(str(tmp_path), "bestscore_0.4123", state)
    save_checkpoint(str(tmp_path), "bestscore_0.41", state,
                    keep_best_only=True)
    remaining = sorted(os.listdir(tmp_path))
    assert "bestscore_0.41" in remaining
    assert "bestscore_0.4123" not in remaining


def test_msle_handles_negative_doa_targets():
    """keras-parity epsilon clamp: cartesian DOA components hit exactly -1
    (log1p(-1) = -inf without the clamp)."""
    y = jnp.asarray([[-1.0, 0.5, -0.25]])
    p = jnp.asarray([[0.1, -0.9, 0.3]])
    v = float(L.get_doa_loss("MSLE")(y, p))
    assert np.isfinite(v)
