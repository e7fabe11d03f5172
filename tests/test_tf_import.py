"""Trained-checkpoint import (seld_tpu.compat.keras_h5).

The reference ships its results as legacy Keras HDF5 checkpoints
(`SWA_best_*.hdf5`, trainv2.py:366-369, served by evaluator.py:57 /
make_answer.py:62). These tests pin the importer three ways:

1. (fast) the legacy-h5 reader and the per-base creation-order alignment,
   including its failure modes, on hand-built structures;
2. (heavy) a genuine Keras-written legacy file (keras legacy_h5_format
   writer) round-trips through a flax twin with equal outputs — the format
   anchor, including a branched two-head graph where `layer_names` order
   need not match creation order;
3. (heavy) the full conv_temporal architecture: reference block factories
   executed eagerly (same machinery as test_tf_parity), their weights
   written to a legacy h5, imported via the public API *and* the
   scripts/import_tf_weights.py CLI, outputs equal the executing reference.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seld_tpu.compat import (align_entries, flax_call_order,
                             import_keras_weights, read_legacy_h5)
from seld_tpu.compat.keras_h5 import H5Layer

REF_PATH = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

needs_ref = pytest.mark.skipif(not os.path.isdir(REF_PATH),
                               reason="reference tree not available")


# ---------------------------------------------------------------------------
# fast: name parsing / reader / alignment errors (no TF required)
# ---------------------------------------------------------------------------
def _conv_layer(name, ci=4, co=8, k=3, rank=4):
    kshape = (k, k, ci, co) if rank == 4 else (k, ci, co)
    return H5Layer(name, [(f"{name}/kernel", np.zeros(kshape, np.float32)),
                          (f"{name}/bias", np.zeros(co, np.float32))])


def test_h5layer_parsing_and_subkinds():
    c = _conv_layer("conv2d_3")
    assert (c.base, c.index, c.kind) == ("conv2d", 3, "conv")
    assert c.subkind() == ("conv", 4)
    assert _conv_layer("conv1d", rank=3).subkind() == ("conv", 3)
    assert _conv_layer("conv2d").index == 0  # unsuffixed = first created

    mha = H5Layer("multi_head_attention__1",
                  [("q/query_kernel", np.zeros((2, 4, 8), np.float32))])
    assert (mha.base, mha.index) == ("multi_head_attention_", 1)
    assert mha.subkind() == ("mha", "plain")
    rel = H5Layer("rel_position_multi_head_attention",
                  [("r/pos_kernel", np.zeros((2, 4, 8), np.float32))])
    assert rel.subkind() == ("mha", "rel")

    gru = H5Layer("bidirectional_2", [
        ("b/forward_gru/gru_cell/kernel", np.zeros((4, 18), np.float32)),
        ("b/forward_gru/gru_cell/recurrent_kernel",
         np.zeros((6, 18), np.float32)),
        ("b/forward_gru/gru_cell/bias", np.zeros((2, 18), np.float32)),
        ("b/backward_gru/gru_cell/kernel", np.zeros((4, 18), np.float32)),
        ("b/backward_gru/gru_cell/recurrent_kernel",
         np.zeros((6, 18), np.float32)),
        ("b/backward_gru/gru_cell/bias", np.zeros((2, 18), np.float32))])
    assert gru.subkind() == ("rnn", 2, 3)  # bidirectional GRU
    lstm = H5Layer("lstm", [
        ("l/kernel", np.zeros((4, 24), np.float32)),
        ("l/recurrent_kernel", np.zeros((6, 24), np.float32)),
        ("l/bias", np.zeros((24,), np.float32))])
    assert lstm.subkind() == ("rnn", 1, 4)

    with pytest.raises(ValueError, match="unsupported Keras layer"):
        H5Layer("embedding_1", [("e/embeddings", np.zeros((4, 4)))])


def test_read_legacy_h5_formats(tmp_path):
    import h5py

    # keras-2 style: model_weights nesting, ':0' suffixes, weightless layers
    path = str(tmp_path / "full_model.hdf5")
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")
        root.attrs["layer_names"] = np.array(
            [b"input_1", b"conv2d", b"activation", b"dense_1"])
        root.create_group("input_1")
        root.create_group("activation")
        g = root.create_group("conv2d")
        g.attrs["weight_names"] = np.array(
            [b"conv2d/kernel:0", b"conv2d/bias:0"])
        g.create_dataset("conv2d/kernel:0", data=np.ones((3, 3, 4, 8), "f4"))
        g.create_dataset("conv2d/bias:0", data=np.zeros(8, "f4"))
        g = root.create_group("dense_1")
        g.attrs["weight_names"] = np.array([b"dense_1/kernel:0"])
        g.create_dataset("dense_1/kernel:0", data=np.ones((8, 2), "f4"))

    layers = read_legacy_h5(path)
    assert [l.name for l in layers] == ["conv2d", "dense_1"]
    assert layers[0].payload[0].shape == (3, 3, 4, 8)
    assert len(layers[1].payload) == 1  # use_bias=False dense

    bad = str(tmp_path / "not_legacy.h5")
    with h5py.File(bad, "w") as f:
        f.create_group("layers")  # keras-3 .weights.h5 shape
    with pytest.raises(ValueError, match="layer_names"):
        read_legacy_h5(bad)


def test_align_error_modes():
    import flax.linen as fnn
    from seld_tpu.models.layers import Conv

    class M(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            return Conv(8, (3, 3))(x)

    m = M()
    x = jnp.zeros((1, 4, 4, 4))
    variables = m.init(jax.random.PRNGKey(0), x)
    order = flax_call_order(m, variables, x)
    assert order and order[0][0] == "conv"

    conv = _conv_layer("conv2d_5")
    extra = H5Layer("dense",
                    [("d/kernel", np.zeros((8, 2), "f4")),
                     ("d/bias", np.zeros(2, "f4"))])
    with pytest.raises(ValueError, match="left unmapped.*dense"):
        align_entries(variables, order, [conv, extra])
    with pytest.raises(ValueError, match="no remaining layer"):
        align_entries(variables, order, [extra])
    # wrong conv rank is a different subkind, not a silent mis-map
    with pytest.raises(ValueError, match="no remaining layer"):
        align_entries(variables, order, [_conv_layer("conv1d", rank=3)])
    entries = align_entries(variables, order, [conv])
    assert entries[0][0] == "conv" and len(entries[0][1]) == 2


def test_align_pops_per_base_creation_order():
    """Two convs created out of file order: suffix sort must win."""
    import flax.linen as fnn
    from seld_tpu.models.layers import Conv

    class M(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            return Conv(8, (3, 3))(Conv(4, (3, 3))(x))

    m = M()
    x = jnp.zeros((1, 4, 4, 4))
    variables = m.init(jax.random.PRNGKey(0), x)
    order = flax_call_order(m, variables, x)
    first = _conv_layer("conv2d_2", ci=4, co=4)
    second = _conv_layer("conv2d_10", ci=4, co=8)
    # file lists them reversed; alignment must still map by creation index
    entries = align_entries(variables, order, [second, first])
    assert entries[0][1][0].shape == (3, 3, 4, 4)
    assert entries[1][1][0].shape == (3, 3, 4, 8)


def _ln(name, gamma, beta):
    return H5Layer(name, [(f"{name}/gamma", np.asarray(gamma, "f4")),
                          (f"{name}/beta", np.asarray(beta, "f4"))])


def test_discarded_preln_layernorms_auto_dropped():
    """The reference's pre-LN attention_block creates LayerNorms whose
    outputs it discards (modules.py:560-568) — they get zero gradient and
    stay bit-exact at init in any trained checkpoint. Exactly those must be
    dropped automatically; ambiguity must be a hard error."""
    import flax.linen as fnn

    class M(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            return fnn.LayerNorm(epsilon=1e-3)(x)

    m = M()
    x = jnp.zeros((1, 4, 8))
    variables = m.init(jax.random.PRNGKey(0), x)
    order = flax_call_order(m, variables, x)

    used = _ln("layer_normalization_3", np.full(8, 0.7), np.full(8, 0.2))
    unused0 = _ln("layer_normalization_1", np.ones(8), np.zeros(8))
    unused1 = _ln("layer_normalization_7", np.ones(8), np.zeros(8))
    entries = align_entries(variables, order, [unused0, used, unused1])
    assert len(entries) == 1
    np.testing.assert_array_equal(entries[0][1][0], np.full(8, 0.7, "f4"))

    # two excess but only one at exact init -> refuse to guess
    trained = _ln("layer_normalization_9", np.full(8, 1.1), np.zeros(8))
    with pytest.raises(ValueError, match="cannot identify"):
        align_entries(variables, order, [unused0, used, trained])


# ---------------------------------------------------------------------------
# heavy: genuine Keras legacy files round-trip with equal outputs
# ---------------------------------------------------------------------------
def _randomize_keras_weights(model, seed=0):
    rng = np.random.RandomState(seed)
    for v in model.weights:
        lo, hi = (0.5, 1.5) if "variance" in v.name else (-0.4, 0.4)
        v.assign(rng.uniform(lo, hi, v.shape).astype("float32"))


@pytest.mark.heavy
def test_keras_written_legacy_file_roundtrip(tmp_path):
    """Standard-layer two-head functional model, saved by keras' own legacy
    h5 writer, imported into a flax twin: outputs equal."""
    keras = pytest.importorskip("keras")
    import h5py
    from keras.src.legacy.saving import legacy_h5_format

    import flax.linen as fnn
    from seld_tpu.models.layers import BatchNorm, Conv, GRU

    inp = keras.Input((12, 8, 5))
    h = keras.layers.Conv2D(16, 3, padding="same")(inp)
    h = keras.layers.BatchNormalization()(h)
    h = keras.layers.ReLU()(h)
    h = keras.layers.Conv2D(8, 3, strides=(1, 2), padding="same")(h)
    h = keras.layers.Reshape((12, 32))(h)
    h = keras.layers.Conv1D(24, 3, padding="same")(h)
    h = keras.layers.LayerNormalization()(h)
    h = keras.layers.Bidirectional(
        keras.layers.GRU(10, return_sequences=True), merge_mode="concat")(h)
    sed = keras.layers.Dense(3, activation="sigmoid")(h)
    doa = keras.layers.Dense(9, activation="tanh")(h)
    model = keras.Model(inp, [sed, doa])
    _randomize_keras_weights(model)

    path = str(tmp_path / "weights.h5")
    with h5py.File(path, "w") as f:  # bare save_weights layout (no nesting)
        legacy_h5_format.save_weights_to_hdf5_group(f, model)

    class Twin(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            x = Conv(16, (3, 3))(x)
            x = BatchNorm()(x, train=train)
            x = fnn.relu(x)
            x = Conv(8, (3, 3), strides=(1, 2))(x)
            x = x.reshape(x.shape[0], x.shape[1], -1)
            x = Conv(24, (3,))(x)
            x = fnn.LayerNorm(epsilon=1e-3)(x)
            x = GRU(10, bidirectional=True, merge_mode="concat")(x)
            return (jax.nn.sigmoid(fnn.Dense(3)(x)),
                    jnp.tanh(fnn.Dense(9)(x)))

    twin = Twin()
    x = np.random.RandomState(1).randn(2, 12, 8, 5).astype(np.float32)
    variables = twin.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = import_keras_weights(twin, variables, path, jnp.asarray(x))

    out_tf = model(x, training=False)
    out_fx = twin.apply(variables, jnp.asarray(x))
    for a, b in zip(out_tf, out_fx):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# heavy: the full conv_temporal architecture + CLI
# ---------------------------------------------------------------------------
def _write_legacy_h5_from_layers(path, created, nested=True):
    """Emulate the keras-2 legacy layout from eagerly-created layers (the
    functional reference builders don't run under keras 3, so the real
    writer can't be used for the full architecture)."""
    import h5py

    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights") if nested else f
        names = []
        for lyr in created:
            if getattr(lyr, "_seld_wrapped", False):
                continue  # weights live on the Bidirectional wrapper
            ws = lyr.weights
            if not ws:
                continue
            names.append(lyr.name)
            g = root.create_group(lyr.name)
            wnames, seen = [], set()
            for v in ws:
                if type(lyr).__name__ == "Bidirectional":
                    # keras weight order: all forward then all backward
                    d = "backward" if v.name in seen else "forward"
                    seen.add(v.name)
                    key = f"{lyr.name}/{d}_gru/gru_cell/{v.name}:0"
                else:
                    key = f"{lyr.name}/{v.name}:0"
                wnames.append(key)
                g.create_dataset(key, data=np.asarray(v))
            g.attrs["weight_names"] = np.array([w.encode() for w in wnames])
        root.attrs["layer_names"] = np.array([n.encode() for n in names])


@pytest.mark.heavy
@needs_ref
def test_import_pre_ln_attention_block(tmp_path):
    """End-to-end auto-drop: the reference pre-LN attention_block's two
    discarded LayerNorms (at exact init, as after any training) are removed
    automatically and the remaining weights map correctly."""
    tf = pytest.importorskip("tensorflow")
    monkeypatch = pytest.MonkeyPatch()
    sys.path.insert(0, REF_PATH)
    try:
        import layers as ref_layers
        import modules as ref_modules
        from test_tf_parity import TFRecorder

        from seld_tpu.models.modules import attention_block

        cfg = {"key_dim": 8, "n_head": 2, "kernel_size": 5,
               "ff_kernel_size": 3, "ff_multiplier": 2, "ff_factor0": 0.5,
               "ff_factor1": 0.5, "use_glu": True,
               "layer_norm_in_front": True, "dropout_rate": 0.0,
               "abs_pos_encoding": True}
        rec = TFRecorder(monkeypatch, [ref_layers, ref_modules], seed=21)
        tf.random.set_seed(21)
        x = np.random.RandomState(9).randn(2, 10, 16).astype(np.float32)
        out_tf = np.asarray(
            ref_modules.attention_block(dict(cfg))(tf.constant(x)))

        # reset the two DISCARDED LayerNorms (creation order: 1st and 4th,
        # test_tf_parity._unused_preln_indices) to exact init, as any
        # trained checkpoint has them (zero grad; the reference's L2 touches
        # kernels only, utils.py:343-350)
        lns = [l for l in rec.created
               if type(l).__name__ == "LayerNormalization"]
        assert len(lns) == 4
        for l in (lns[0], lns[3]):
            d = l.get_weights()[0].shape
            l.set_weights([np.ones(d, "f4"), np.zeros(d, "f4")])

        h5_path = str(tmp_path / "preln.hdf5")
        _write_legacy_h5_from_layers(h5_path, rec.created)
    finally:
        monkeypatch.undo()
        sys.path.remove(REF_PATH)

    model = attention_block(dict(cfg))
    xj = jnp.asarray(x)
    variables = model.init({"params": jax.random.PRNGKey(0)}, xj,
                           train=False)
    imported = import_keras_weights(model, variables, h5_path, xj)
    out_fx = model.apply(imported, xj, train=False)
    np.testing.assert_allclose(np.asarray(out_fx), out_tf, atol=5e-5,
                               rtol=1e-4)


CFG = {
    "n_classes": 4,
    "filters": 8, "first_kernel_size": 3, "first_pool_size": [5, 2],
    "BLOCK0": "mother_stage",
    "BLOCK0_ARGS": dict(depth=2, filters0=0, filters1=12, filters2=0,
                        kernel_size0=0, kernel_size1=3, kernel_size2=0,
                        connect0=[1], connect1=[1, 0], connect2=[1, 0, 1],
                        strides=[1, 3]),
    "BLOCK1": "simple_dense_stage",
    "BLOCK1_ARGS": {"depth": 1, "units": 16, "dense_activation": "relu",
                    "dropout_rate": 0.0},
    "BLOCK2": "conformer_encoder_stage",
    "BLOCK2_ARGS": {"depth": 2, "key_dim": 4, "n_head": 2, "kernel_size": 5,
                    "multiplier": 2, "pos_encoding": "basic",
                    "dropout_rate": 0.0},
    "SED": "conformer_encoder_stage",
    "SED_ARGS": {"depth": 1, "key_dim": 8, "n_head": 2, "kernel_size": 3,
                 "multiplier": 2, "pos_encoding": "basic",
                 "dropout_rate": 0.0},
    "DOA": "bidirectional_GRU_stage",
    "DOA_ARGS": {"depth": 2, "units": 12},
}


@pytest.mark.heavy
@needs_ref
def test_import_conv_temporal_checkpoint(tmp_path):
    """Reference conv_temporal executed eagerly -> legacy h5 -> imported via
    the library API and the CLI -> outputs equal the reference's."""
    tf = pytest.importorskip("tensorflow")
    monkeypatch = pytest.MonkeyPatch()
    sys.path.insert(0, REF_PATH)
    try:
        import layers as ref_layers
        import modules as ref_modules
        from test_tf_parity import TFRecorder, _tf_maxpool

        from seld_tpu.models import build_model
        from seld_tpu.train.checkpoint import load_variables

        rec = TFRecorder(monkeypatch,
                         [ref_layers, ref_modules], seed=11)
        tf.random.set_seed(11)
        x = np.random.RandomState(4).randn(2, 20, 12, 5).astype(np.float32)
        xt = tf.constant(x)
        h = ref_layers.conv2d_bn(CFG["filters"], CFG["first_kernel_size"],
                                 padding="same", activation="relu")(xt)
        h = _tf_maxpool(h, CFG["first_pool_size"])
        for block in ("BLOCK0", "BLOCK1", "BLOCK2"):
            h = getattr(ref_modules, CFG[block])(
                dict(CFG[f"{block}_ARGS"]))(h)
        sed = getattr(ref_modules, CFG["SED"])(dict(CFG["SED_ARGS"]))(h)
        sed = ref_modules.Dense(CFG["n_classes"], activation="sigmoid")(sed)
        doa = getattr(ref_modules, CFG["DOA"])(dict(CFG["DOA_ARGS"]))(h)
        doa = ref_modules.Dense(3 * CFG["n_classes"],
                                activation="tanh")(doa)
        out_tf = [np.asarray(sed), np.asarray(doa)]

        h5_path = str(tmp_path / "SWA_best_0.30253.hdf5")
        _write_legacy_h5_from_layers(h5_path, rec.created, nested=True)
    finally:
        monkeypatch.undo()
        sys.path.remove(REF_PATH)

    # library API
    model = build_model("conv_temporal", (20, 12, 5), dict(CFG))
    xj = jnp.asarray(x)
    variables = model.init({"params": jax.random.PRNGKey(0)}, xj,
                           train=False)
    imported = import_keras_weights(model, variables, h5_path, xj)
    out_fx = model.apply(imported, xj, train=False)
    for a, b in zip(out_tf, out_fx):
        np.testing.assert_allclose(np.asarray(b), a, atol=1e-4, rtol=1e-4)

    # CLI -> orbax -> inference-style load_variables
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(CFG, f)
    out_dir = str(tmp_path / "imported_ckpt")
    env = dict(os.environ, SELD_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/import_tf_weights.py"),
         "--weights", h5_path, "--model_config", cfg_path,
         "--input_shape", "20,12,5", "--n_classes", "4", "--out", out_dir],
        capture_output=True, text=True, env=env, timeout=600)
    assert res.returncode == 0, res.stderr
    assert "params)" in res.stdout

    restored = load_variables(out_dir, variables)
    out_cli = model.apply(restored, xj, train=False)
    for a, b in zip(out_tf, out_cli):
        np.testing.assert_allclose(np.asarray(b), a, atol=1e-4, rtol=1e-4)
