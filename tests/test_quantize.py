"""Weight-only quantized serving artifacts (seld_tpu.inference.quantize).

The reference serves f32 hdf5 through a live TF process and has no
quantization story; these pin the TPU-native one: int8 per-output-channel
(bounded reconstruction error, ~4x smaller baked constants) and bf16 casts,
dequantized INSIDE the exported StableHLO program."""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.inference.export import (export_window_forward, save_exported,
                                       load_exported)
from seld_tpu.inference.quantize import (QTensor, quantize_tree,
                                         dequantize_tree, quantized_apply,
                                         quantization_report)
from seld_tpu.models import build_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = {
    "FIRST": "simple_conv_block",
    "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
    "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [128]},
    "SED": "simple_dense_block", "SED_ARGS": {"units": [32]},
    "DOA": "simple_dense_block", "DOA_ARGS": {"units": [32]},
    "n_classes": 4,
}


def _model(input_shape=(50, 16, 7), seed=0):
    model = build_model("seldnet", input_shape, TINY)
    variables = model.init({"params": jax.random.PRNGKey(seed)},
                           jnp.zeros((1, *input_shape)), train=False)
    return model, variables


def test_int8_error_bound_and_structure():
    """Eligible leaves become QTensors with per-element reconstruction
    error <= scale/2; 1-d (bias/BN) leaves pass through bit-identical."""
    _, variables = _model()
    qtree = quantize_tree(variables, "int8", min_size=64)
    deq = dequantize_tree(qtree)

    flat_w = jax.tree_util.tree_leaves_with_path(variables)
    flat_q = {jax.tree_util.keystr(p): q for p, q in
              jax.tree_util.tree_leaves_with_path(
                  qtree, is_leaf=lambda x: isinstance(x, QTensor))}
    flat_d = {jax.tree_util.keystr(p): d for p, d in
              jax.tree_util.tree_leaves_with_path(deq)}
    n_q = 0
    for path, w in flat_w:
        key = jax.tree_util.keystr(path)
        q, d = flat_q[key], flat_d[key]
        assert d.dtype == w.dtype
        if w.ndim >= 2 and w.size >= 64:
            assert isinstance(q, QTensor) and q.q.dtype == jnp.int8
            n_q += 1
            scale = np.asarray(q.scale)  # broadcast over last axis
            err = np.abs(np.asarray(w, np.float32)
                         - np.asarray(d, np.float32))
            assert np.all(err <= scale / 2 + 1e-7), key
        else:
            assert not isinstance(q, QTensor)
            np.testing.assert_array_equal(np.asarray(d), np.asarray(w)), key
    assert n_q >= 4  # conv + GRU kernels + heads actually quantized

    rep = quantization_report(variables, qtree)
    assert rep["n_quantized_leaves"] == n_q
    assert rep["bytes_after"] < 0.5 * rep["bytes_before"]
    assert rep["max_abs_error"] > 0


def test_quantized_apply_matches_fake_quant_exactly():
    """quantized_apply == apply(dequantize(quantize(v))) bit-for-bit (same
    ops, same order), and stays close to the f32 model."""
    model, variables = _model()
    x = jnp.asarray(np.random.RandomState(0).randn(3, 50, 16, 7),
                    jnp.float32)
    fn, qtree = quantized_apply(model.apply, variables, "int8")
    got = fn(x, train=False)
    want = model.apply(dequantize_tree(qtree), x, train=False)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    f32 = model.apply(variables, x, train=False)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(f32)):
        # sigmoid/tanh heads; per-channel weight-only int8 stays close
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=0.1)
        assert np.max(np.abs(np.asarray(g) - np.asarray(w))) > 0  # not f32


@pytest.mark.parametrize("mode,max_ratio,atol",
                         [("int8", 0.45, 0.1), ("bfloat16", 0.72, 0.05)])
def test_quantized_window_export(tmp_path, mode, max_ratio, atol):
    """The exported artifact bakes the QUANTIZED constants (file shrinks by
    the weight ratio), matches the fake-quantized live model tightly, and
    the f32 model loosely."""
    model, variables = _model()
    f32_path = save_exported(
        export_window_forward(model, variables, (50, 16, 7)),
        str(tmp_path / "f32.shlo"))
    q_path = save_exported(
        export_window_forward(model, variables, (50, 16, 7), quantize=mode),
        str(tmp_path / f"{mode}.shlo"), extra_meta={"quantize": mode})
    f32_size = os.path.getsize(f32_path)
    q_size = os.path.getsize(q_path)
    assert q_size < max_ratio * f32_size, (q_size, f32_size)

    art = load_exported(q_path)
    assert art.meta["quantize"] == mode
    x = np.random.RandomState(1).randn(4, 50, 16, 7).astype(np.float32)
    got = art.call(x)
    live = model.apply(dequantize_tree(quantize_tree(variables, mode)),
                       jnp.asarray(x), train=False)
    f32 = model.apply(variables, jnp.asarray(x), train=False)
    for g, l, f in zip(jax.tree_util.tree_leaves(got),
                       jax.tree_util.tree_leaves(live),
                       jax.tree_util.tree_leaves(f32)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(l),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(f), atol=atol)


def test_quantized_ensemble_and_clip_exports(tmp_path):
    """quantize= flows through the ensemble and trunk-once clip units."""
    from seld_tpu.config import get_model_config
    from seld_tpu.inference.export import (export_window_ensemble,
                                           export_clip_fast)

    model_a, var_a = _model(seed=0)
    model_b, var_b = _model(seed=7)
    ens = save_exported(
        export_window_ensemble([(model_a.apply, var_a),
                                (model_b.apply, var_b)],
                               (50, 16, 7), quantize="int8"),
        str(tmp_path / "ens.shlo"))
    art = load_exported(ens)
    x = np.random.RandomState(2).randn(2, 50, 16, 7).astype(np.float32)
    got = art.call(x)
    outs = [m.apply(dequantize_tree(quantize_tree(v, "int8")),
                    jnp.asarray(x), train=False)
            for m, v in ((model_a, var_a), (model_b, var_b))]
    for i, g in enumerate(got):
        want = (np.asarray(outs[0][i], np.float32)
                + np.asarray(outs[1][i], np.float32)) / 2
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-5)

    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    ct = build_model("conv_temporal", (50, 16, 7), cfg)
    var_ct = ct.init({"params": jax.random.PRNGKey(0)},
                     jnp.zeros((1, 50, 16, 7)), train=False)
    clip = save_exported(
        export_clip_fast(ct, var_ct, 200, (50, 16, 7), win_size=50,
                         step_size=5, time_down=5, quantize="int8"),
        str(tmp_path / "clip.shlo"))
    from seld_tpu.inference.ensemble import _predict_clip_fast
    xc = np.random.RandomState(3).randn(200, 16, 7).astype(np.float32)
    got = load_exported(clip).call(xc)
    want = _predict_clip_fast(
        dequantize_tree(quantize_tree(var_ct, "int8")), jnp.asarray(xc),
        apply_fn=ct.apply, win_size=50, step_size=5, batch_size=1 << 30,
        time_down=5)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_export_cli_quantize(tmp_path):
    """CLI journey: --quantize int8 prints the size report and --verify
    passes against the fake-quantized live model."""
    from seld_tpu.train.checkpoint import save_checkpoint
    from seld_tpu.train.train_state import TrainState
    import optax

    model, variables = _model()
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=optax.adam(1e-3), rng=jax.random.PRNGKey(0))
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), "weights", state)

    import json
    mc = dict(TINY)
    mc.pop("n_classes")
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(mc))

    env = dict(os.environ, SELD_PLATFORM="cpu", PYTHONPATH=REPO)
    out = tmp_path / "art_q.shlo"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/export_model.py"),
         "--ckpt", ckpt, "--model", "seldnet",
         "--model_config", str(cfg_path), "--out", str(out),
         "--n_classes", "4", "--win_size", "50", "--n_freq", "16",
         "--quantize", "int8", "--verify"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "quantize int8: weights" in r.stdout
    assert "verify: artifact matches the live model" in r.stdout
    art = load_exported(str(out))
    assert art.meta["quantize"] == "int8"
