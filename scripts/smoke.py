#!/usr/bin/env python3
"""60-second health check of the critical path on synthetic data.

    SELD_PLATFORM=cpu python scripts/smoke.py

Covers: zoo config -> model build -> SPMD train steps (loss decreases) ->
streaming metrics -> sliding-window inference -> DCASE CSV round trip ->
official scorer. Exits non-zero on any failure.
"""
import os
import sys
import time

if os.environ.get("SELD_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    t0 = time.time()
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from seld_tpu.inference import ensemble_outputs, evaluate_clips_official
    from seld_tpu.models import build_model
    from seld_tpu.train import losses as L
    from seld_tpu.train import metrics as M
    from seld_tpu.train.optimizers import adabelief
    from seld_tpu.train.steps import make_train_step
    from seld_tpu.train.train_state import TrainState
    from seld_tpu.utils import io

    n_classes = 4
    cfg = {"FIRST": "simple_conv_block",
           "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
           "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
           "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
           "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
           "n_classes": n_classes}
    model = build_model("seldnet", (50, 16, 7), cfg)
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 50, 16, 7)),
        train=False)
    print(f"[{time.time()-t0:5.1f}s] model built + init")

    tx = optax.inject_hyperparams(
        lambda learning_rate: adabelief(learning_rate, agc_clip=0.01)
    )(learning_rate=3e-3)
    state = TrainState.create(apply_fn=model.apply, params=v["params"],
                              batch_stats=v.get("batch_stats"), tx=tx,
                              rng=jax.random.PRNGKey(1))
    step = make_train_step(
        sed_loss_fn=lambda y, p: L.sed_loss_with_weights(y, p),
        doa_loss_fn=L.MMSE, loss_weights=(1.0, 10.0),
        metric_block_size=5, donate=False)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 50, 16, 7), jnp.float32)
    sed = jnp.asarray((rng.rand(8, 10, n_classes) < 0.2), jnp.float32)
    doa = jnp.repeat(sed, 3, -1) * 0.5
    ms = M.init_state(n_classes)
    losses = []
    for _ in range(10):
        state, ms, (sl, dl) = step(state, ms, x, (sed, doa))
        losses.append(float(sl) + 10 * float(dl))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    er = float(M.result(ms)[0])
    assert np.isfinite(er)
    print(f"[{time.time()-t0:5.1f}s] train steps ok "
          f"(loss {losses[0]:.3f} -> {losses[-1]:.3f}, ER {er:.3f})")

    clip = jnp.asarray(rng.randn(250, 16, 7), jnp.float32)
    outs = ensemble_outputs(model.apply, state.variables, [clip],
                            win_size=50, step_size=5, batch_size=16)
    assert outs[0][0].shape == (50, n_classes)
    print(f"[{time.time()-t0:5.1f}s] sliding-window inference ok")

    with tempfile.TemporaryDirectory() as d:
        gt_sed = (rng.rand(50, n_classes) < 0.2).astype(np.float32)
        gt_doa = np.repeat(gt_sed, 3, -1) * 0.5
        io.write_answer(d, "clip.csv", gt_sed, gt_doa)
        seld, mv = evaluate_clips_official(
            [(jnp.asarray(gt_sed), jnp.asarray(gt_doa))], ["clip"], d,
            os.path.join(d, "out"), thresholds=0.5, n_classes=n_classes,
            gt_polar=False)
        assert abs(seld) < 1e-3, seld
    print(f"[{time.time()-t0:5.1f}s] official scorer round trip ok")
    print(f"SMOKE PASS in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
