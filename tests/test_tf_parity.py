"""Weight-mapped numerical parity against the reference TF implementation.

For each nontrivial layer/block, the REFERENCE code from /root/reference is
executed (eagerly, TF 2.x) with randomized weights, the created Keras layers
are recorded in creation order, their weights are mapped into the flax twin,
and forward outputs are asserted equal in eval mode.

This pins the subtlest re-implementations to numbers, not readings:
  - conv2d_bn                      /root/reference/layers.py:14-38
  - MultiHeadAttention_            layers.py:102-329
  - RelPositionMultiHeadAttention  layers.py:332-392 (relative_shift)
  - mother_block wiring            modules.py:184-298
  - bidirectional_GRU_block        modules.py:302-319 (merge_mode='mul')
  - transformer_encoder_block      modules.py:379-407
  - conformer_encoder_block        modules.py:410-508 (FFN residual topology)
  - attention_block                modules.py:511-635 (pre-LN quirks)
  - full seldnet / conv_temporal   models.py:18-32, :54-78

Mechanics: the reference's factory closures create Keras layers at call time;
we monkeypatch the layer constructors in the reference module namespaces to
(a) record instances in creation order and (b) inject random initializers so
biases / BN stats are nontrivial. Keras 3 (TF 2.21) breaks the reference's
custom MHA call path by auto-passing a mask tuple — a thin subclass forces
mask=None (the reference never uses masks). Reference *functional* model
builders don't run under Keras 3 (raw tf ops on KerasTensors), so the
full-model tests reproduce the ~10-line model skeletons (models.py:18-32,
:54-78) eagerly with the reference block factories unchanged.
"""
import os
import sys

import numpy as np
import pytest

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as fnn  # noqa: E402

REF_PATH = "/root/reference"

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF_PATH),
                       reason="reference tree not available"),
    pytest.mark.heavy,  # compile-heavy: excluded from `make test-fast`
]


# ---------------------------------------------------------------------------
# reference import
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_PATH)
    import layers as ref_layers  # noqa: F401
    import modules as ref_modules  # noqa: F401
    yield {"layers": ref_layers, "modules": ref_modules}
    sys.path.remove(REF_PATH)


def _fix_mask(cls):
    """Keras 3 auto-collects input masks into a tuple and passes it to call();
    the reference's custom MHA assumes mask=None. Restore that contract."""
    class Fixed(cls):
        def call(self, inputs, training=False, mask=None, **kwargs):
            return super().call(inputs, training=training, mask=None)
    Fixed.__name__ = cls.__name__
    return Fixed


class TFRecorder:
    """Patches Keras layer constructors inside the reference namespaces to
    record instances in creation order and randomize initializers."""

    def __init__(self, monkeypatch, namespaces, seed=0):
        self.created = []
        self._seed = seed

        def rand(lo=-0.4, hi=0.4):
            self._seed += 1
            return tf.keras.initializers.RandomUniform(lo, hi, seed=self._seed)

        overrides = {
            "Conv2D": lambda: {"bias_initializer": rand()},
            "Conv1D": lambda: {"bias_initializer": rand()},
            "Dense": lambda: {"bias_initializer": rand()},
            "GRU": lambda: {"bias_initializer": rand()},
            "LSTM": lambda: {},
            "BatchNormalization": lambda: {
                "beta_initializer": rand(),
                "gamma_initializer": rand(0.6, 1.4),
                "moving_mean_initializer": rand(),
                "moving_variance_initializer": rand(0.5, 1.5)},
            "LayerNormalization": lambda: {
                "beta_initializer": rand(),
                "gamma_initializer": rand(0.6, 1.4)},
            "MultiHeadAttention": lambda: {"bias_initializer": rand()},
            "MultiHeadAttention_": lambda: {"bias_initializer": rand()},
            "RelPositionMultiHeadAttention":
                lambda: {"bias_initializer": rand()},
        }

        created = self.created

        def wrap(cls, name):
            def ctor(*args, **kwargs):
                for k, v in overrides.get(name, lambda: {})().items():
                    kwargs.setdefault(k, v)
                obj = cls(*args, **kwargs)
                created.append(obj)
                return obj
            return ctor

        def wrap_bidirectional(cls):
            def ctor(layer, *args, **kwargs):
                layer._seld_wrapped = True  # weights live on the wrapper
                obj = cls(layer, *args, **kwargs)
                created.append(obj)
                return obj
            return ctor

        import keras
        base = {
            "Conv2D": keras.layers.Conv2D,
            "Conv1D": keras.layers.Conv1D,
            "Dense": keras.layers.Dense,
            "GRU": keras.layers.GRU,
            "LSTM": keras.layers.LSTM,
            "BatchNormalization": keras.layers.BatchNormalization,
            "LayerNormalization": keras.layers.LayerNormalization,
            "MultiHeadAttention": keras.layers.MultiHeadAttention,
        }
        for ns in namespaces:
            for name, cls in base.items():
                if hasattr(ns, name):
                    monkeypatch.setattr(ns, name, wrap(cls, name))
            if hasattr(ns, "Bidirectional"):
                monkeypatch.setattr(ns, "Bidirectional",
                                    wrap_bidirectional(keras.layers.Bidirectional))
            for name in ("MultiHeadAttention_",
                         "RelPositionMultiHeadAttention"):
                # never patch the defining module (layers.py): the classes
                # resolve `super(Name, self)` through its globals at runtime
                cls = getattr(ns, name, None)
                if cls is not None and cls.__module__ != ns.__name__:
                    monkeypatch.setattr(ns, name, wrap(_fix_mask(cls), name))

    def entries(self, drop=()):
        """(kind, payload) per weight-bearing layer, creation order."""
        out = []
        for lyr in self.created:
            if getattr(lyr, "_seld_wrapped", False):
                continue
            name = type(lyr).__name__
            if name in ("Conv2D", "Conv1D"):
                out.append(("conv", lyr.get_weights()))
            elif name == "Dense":
                out.append(("dense", lyr.get_weights()))
            elif name == "BatchNormalization":
                out.append(("bn", lyr.get_weights()))
            elif name == "LayerNormalization":
                out.append(("ln", lyr.get_weights()))
            elif name in ("GRU", "LSTM"):
                out.append(("rnn", lyr.get_weights()))
            elif name == "Bidirectional":
                out.append(("rnn", lyr.get_weights()))
            elif name == "MultiHeadAttention":
                # standard keras MHA maps onto our per-head-kernel MHA
                out.append(("mha", tuple(lyr.get_weights())))
            elif name in ("MultiHeadAttention_",
                          "RelPositionMultiHeadAttention"):
                out.append(("mha", {w.name.split("/")[-1].split(":")[0]:
                                    w.numpy() for w in lyr.weights}))
        return [e for i, e in enumerate(out) if i not in set(drop)]


# ---------------------------------------------------------------------------
# flax side: call-order capture + weight injection — the shared mapping core
# lives in seld_tpu.compat.keras_h5 (it also powers the user-facing trained
# checkpoint importer, scripts/import_tf_weights.py); this suite anchors its
# numerical correctness against the executing reference
# ---------------------------------------------------------------------------
from seld_tpu.compat.keras_h5 import (  # noqa: E402
    flax_call_order, get_subtree as _get_subtree,
    set_mapped_weights as load_tf_weights)


def run_parity(monkeypatch, ref, tf_fn, flax_model, x, atol=2e-5,
               drop_tf=(), tf_out_index=None, apply_kwargs=None):
    """Run reference eagerly with recorded/randomized layers, map weights into
    the flax twin, compare eval-mode outputs."""
    rec = TFRecorder(monkeypatch, [ref["layers"], ref["modules"]])
    tf.random.set_seed(7)
    out_tf = tf_fn(rec, tf.constant(x))
    if tf_out_index is not None:
        out_tf = out_tf[tf_out_index]
    tf_entries = rec.entries(drop=drop_tf)

    apply_kwargs = apply_kwargs or {"train": False}
    variables = flax_model.init({"params": jax.random.PRNGKey(0)},
                                jnp.asarray(x), **apply_kwargs)
    order = flax_call_order(flax_model, variables, jnp.asarray(x),
                            **apply_kwargs)
    # keep only weight-bearing leaves actually present in params
    order = [(k, p) for k, p in order
             if _get_subtree(variables["params"], p)]
    variables = load_tf_weights(variables, order, tf_entries)
    out_fx = flax_model.apply(variables, jnp.asarray(x), **apply_kwargs)

    if isinstance(out_tf, (list, tuple)):
        for a, b in zip(out_tf, out_fx):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=atol, rtol=1e-4)
    else:
        np.testing.assert_allclose(np.asarray(out_fx), np.asarray(out_tf),
                                   atol=atol, rtol=1e-4)
    return variables


# ---------------------------------------------------------------------------
# the x inputs
# ---------------------------------------------------------------------------
def _x4d(b=2, t=12, f=8, c=5, seed=0):
    return np.random.RandomState(seed).randn(b, t, f, c).astype(np.float32)


def _x3d(b=2, t=10, d=16, seed=0):
    return np.random.RandomState(seed).randn(b, t, d).astype(np.float32)


# ---------------------------------------------------------------------------
# layer-level parity
# ---------------------------------------------------------------------------
def test_conv2d_bn(monkeypatch, ref):
    from seld_tpu.models.layers import Conv2DBN

    def tf_fn(rec, x):
        return ref["layers"].conv2d_bn(16, 3, strides=(1, 2))(x)

    run_parity(monkeypatch, ref, tf_fn, Conv2DBN(16, 3, strides=(1, 2)),
               _x4d())


def test_multi_head_attention(monkeypatch, ref):
    from seld_tpu.models.layers import MultiHeadAttention

    class Wrap(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            return MultiHeadAttention(4, 8, use_bias=True)(
                x, x, x, deterministic=not train)

    def tf_fn(rec, x):
        mha = ref["modules"].MultiHeadAttention_(4, 8, use_bias=True)
        return mha((x, x, x))

    run_parity(monkeypatch, ref, tf_fn, Wrap(), _x3d())


def test_rel_position_multi_head_attention(monkeypatch, ref):
    from seld_tpu.models.layers import (RelPositionMultiHeadAttention,
                                        basic_pos_encoding)

    class Wrap(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            pos = basic_pos_encoding(x.shape[1], x.shape[2], x.dtype)
            return RelPositionMultiHeadAttention(4, 8, use_bias=True)(
                x, x, x, pos, deterministic=not train)

    def tf_fn(rec, x):
        pos = ref["layers"].basic_pos_encoding(x.shape)(x)
        mha = ref["modules"].RelPositionMultiHeadAttention(4, 8, use_bias=True)
        return mha((x, x, x, pos))

    run_parity(monkeypatch, ref, tf_fn, Wrap(), _x3d(seed=3))


def test_basic_pos_encoding_values(ref):
    from seld_tpu.models.layers import basic_pos_encoding
    x = tf.constant(_x3d(1, 20, 24))
    enc_tf = np.asarray(ref["layers"].basic_pos_encoding(x.shape)(x))
    enc_fx = np.asarray(basic_pos_encoding(20, 24))
    np.testing.assert_allclose(enc_fx, enc_tf, atol=1e-6)


def test_bidirectional_gru_mul(monkeypatch, ref):
    from seld_tpu.models.modules import bidirectional_GRU_block

    def tf_fn(rec, x):
        return ref["modules"].bidirectional_GRU_block({"units": [12, 8]})(x)

    run_parity(monkeypatch, ref, tf_fn,
               bidirectional_GRU_block({"units": [12, 8]}), _x4d(c=3))


def test_rnn_block_lstm_concat(monkeypatch, ref):
    from seld_tpu.models.modules import RNN_block
    cfg = {"units": 10, "rnn_type": "LSTM", "merge_mode": "concat"}

    def tf_fn(rec, x):
        return ref["modules"].RNN_block(dict(cfg))(x)

    run_parity(monkeypatch, ref, tf_fn, RNN_block(dict(cfg)), _x3d())


def test_rnn_block_unidirectional_gru(monkeypatch, ref):
    from seld_tpu.models.modules import RNN_block
    cfg = {"units": 10, "bidirectional": False}

    def tf_fn(rec, x):
        return ref["modules"].RNN_block(dict(cfg))(x)

    run_parity(monkeypatch, ref, tf_fn, RNN_block(dict(cfg)), _x3d(seed=5))


def test_simple_dense_block(monkeypatch, ref):
    from seld_tpu.models.modules import simple_dense_block
    cfg = {"units": [24, 12], "dense_activation": "relu"}

    def tf_fn(rec, x):
        return ref["modules"].simple_dense_block(dict(cfg))(x)

    run_parity(monkeypatch, ref, tf_fn, simple_dense_block(dict(cfg)),
               _x4d())


# ---------------------------------------------------------------------------
# mother_block wiring (modules.py:184-298)
# ---------------------------------------------------------------------------
MOTHER_CONFIGS = [
    # full three-conv residual chain
    dict(filters0=8, filters1=12, filters2=16, kernel_size0=3, kernel_size1=3,
         kernel_size2=1, connect0=[1], connect1=[1, 1], connect2=[1, 1, 1]),
    # strided second conv with cross-connects
    dict(filters0=8, filters1=12, filters2=16, kernel_size0=3, kernel_size1=3,
         kernel_size2=1, connect0=[1], connect1=[1, 0], connect2=[0, 1, 1],
         strides=(1, 2)),
    # skipped conv0, concat path for conv2 (SS5's shape: f0=0, f2=0)
    dict(filters0=0, filters1=12, filters2=0, kernel_size0=0, kernel_size1=3,
         kernel_size2=0, connect0=[1], connect1=[1, 0], connect2=[1, 0, 1],
         strides=(1, 3)),
    # squeeze-excitation
    dict(filters0=8, filters1=12, filters2=16, kernel_size0=3, kernel_size1=3,
         kernel_size2=1, connect0=[0], connect1=[0, 1], connect2=[0, 0, 1],
         squeeze_ratio=0.5),
    # concat second layer (filters1 == 0; connect2[2] must be 0 then)
    dict(filters0=8, filters1=0, filters2=16, kernel_size0=3, kernel_size1=0,
         kernel_size2=3, connect0=[1], connect1=[1, 1], connect2=[0, 1, 0]),
]


@pytest.mark.parametrize("cfg", MOTHER_CONFIGS,
                         ids=["full", "strided", "ss5-shape", "se", "concat1"])
def test_mother_block(monkeypatch, ref, cfg):
    from seld_tpu.models.modules import mother_block

    def tf_fn(rec, x):
        return ref["modules"].mother_block(dict(cfg))(x)

    run_parity(monkeypatch, ref, tf_fn, mother_block(dict(cfg)), _x4d())


def test_mother_stage_depth2(monkeypatch, ref):
    from seld_tpu.models.modules import mother_stage
    cfg = dict(MOTHER_CONFIGS[2], depth=2)

    def tf_fn(rec, x):
        return ref["modules"].mother_stage(dict(cfg))(x)

    run_parity(monkeypatch, ref, tf_fn, mother_stage(dict(cfg)), _x4d())


# ---------------------------------------------------------------------------
# attention-family blocks
# ---------------------------------------------------------------------------
def test_transformer_encoder_block(monkeypatch, ref):
    from seld_tpu.models.modules import transformer_encoder_block
    cfg = {"n_head": 2, "key_dim": 8, "ff_multiplier": 2, "kernel_size": 3,
           "dropout_rate": 0.0}

    def tf_fn(rec, x):
        return ref["modules"].transformer_encoder_block(dict(cfg))(x)

    run_parity(monkeypatch, ref, tf_fn, transformer_encoder_block(dict(cfg)),
               _x3d(), atol=5e-5)


@pytest.mark.parametrize("pos_mode", ["absolute", "relative"])
def test_conformer_encoder_block(monkeypatch, ref, pos_mode):
    from seld_tpu.models.modules import conformer_encoder_block
    cfg = {"key_dim": 8, "n_head": 2, "kernel_size": 5, "multiplier": 2,
           "dropout_rate": 0.0, "pos_encoding": "basic", "pos_mode": pos_mode}

    def tf_fn(rec, x):
        return ref["modules"].conformer_encoder_block(dict(cfg))(x)

    run_parity(monkeypatch, ref, tf_fn, conformer_encoder_block(dict(cfg)),
               _x3d(), atol=5e-5)


def test_attention_block_post_ln(monkeypatch, ref):
    from seld_tpu.models.modules import attention_block
    cfg = {"key_dim": 8, "n_head": 2, "kernel_size": 5, "ff_kernel_size": 3,
           "ff_multiplier": 2, "ff_factor0": 0.5, "ff_factor1": 0.5,
           "use_glu": True, "dropout_rate": 0.0, "abs_pos_encoding": True}

    def tf_fn(rec, x):
        return ref["modules"].attention_block(dict(cfg))(x)

    run_parity(monkeypatch, ref, tf_fn, attention_block(dict(cfg)), _x3d(),
               atol=5e-5)


def test_attention_block_pre_ln_no_ff(monkeypatch, ref):
    """pre-LN path without FF modules (no discarded-LN quirk)."""
    from seld_tpu.models.modules import attention_block
    cfg = {"key_dim": 8, "n_head": 2, "kernel_size": 5, "ff_kernel_size": 0,
           "ff_multiplier": 0, "ff_factor0": 0, "ff_factor1": 0,
           "use_glu": True, "layer_norm_in_front": True, "dropout_rate": 0.0}

    def tf_fn(rec, x):
        return ref["modules"].attention_block(dict(cfg))(x)

    run_parity(monkeypatch, ref, tf_fn, attention_block(dict(cfg)), _x3d(),
               atol=5e-5)


def test_attention_block_pre_ln_with_ff(monkeypatch, ref):
    """pre-LN WITH FF: the reference creates LayerNorms whose outputs are
    discarded (modules.py:560-568 applies the FF convs to x, not ln(x)) —
    our twin doesn't create them, so drop those TF entries (indices of the
    1st and 4th LayerNorm: entry 0, and the LN opening the second FF)."""
    from seld_tpu.models.modules import attention_block
    cfg = {"key_dim": 8, "n_head": 2, "kernel_size": 5, "ff_kernel_size": 3,
           "ff_multiplier": 2, "ff_factor0": 0.5, "ff_factor1": 0.5,
           "use_glu": True, "layer_norm_in_front": True, "dropout_rate": 0.0,
           "abs_pos_encoding": True}

    def tf_fn(rec, x):
        return ref["modules"].attention_block(dict(cfg))(x)

    # creation order: LN(unused) C C MHA LN(attn) LN(glu) C C BN C LN(unused)
    # C C -> weight-bearing entry list below; find the unused LNs by position
    rec_probe = []

    def tf_probe(rec, x):
        out = ref["modules"].attention_block(dict(cfg))(x)
        rec_probe.extend(type(l).__name__ for l in rec.created)
        return out

    # entry indices of unused LNs: first LN entry overall, and the LN entry
    # immediately before the last two convs (second FF)
    run_parity(monkeypatch, ref, tf_probe, attention_block(dict(cfg)),
               _x3d(), atol=5e-5, drop_tf=_unused_preln_indices())


def _unused_preln_indices():
    """Weight-bearing entry indices of the two discarded pre-LN LayerNorms in
    attention_block(lnif=True, ff0>0, ff1>0, glu, depthwise, abs-pos).

    Entry order: [LN*, conv, conv, LN, mha, LN, conv(glu), conv(dw), bn,
    conv(pw), LN*, conv, conv] -> drop 0 and 10."""
    return (0, 10)


# ---------------------------------------------------------------------------
# full models (skeletons reproduced eagerly; block factories unchanged)
# ---------------------------------------------------------------------------
def _tf_maxpool(x, pool_size):
    return tf.nn.max_pool2d(x, ksize=[1, *pool_size, 1],
                            strides=[1, *pool_size, 1], padding="SAME")


SMALL_SELDNET_CFG = {
    "n_classes": 4,
    "FIRST": "mother_stage",
    "FIRST_ARGS": dict(MOTHER_CONFIGS[1], depth=1),
    "SECOND": "bidirectional_GRU_block",
    "SECOND_ARGS": {"units": [12]},
    "SED": "simple_dense_block", "SED_ARGS": {"units": [16]},
    "DOA": "simple_dense_block", "DOA_ARGS": {"units": [16]},
}


def test_seldnet_full(monkeypatch, ref):
    """models.py:18-32: FIRST -> SECOND -> SED/DOA heads."""
    from seld_tpu.models import build_model
    cfg = SMALL_SELDNET_CFG
    mod = ref["modules"]

    def tf_fn(rec, x):
        h = mod.mother_stage(dict(cfg["FIRST_ARGS"]))(x)
        h = mod.bidirectional_GRU_block(dict(cfg["SECOND_ARGS"]))(h)
        sed = mod.simple_dense_block(dict(cfg["SED_ARGS"]))(h)
        sed = mod.Dense(cfg["n_classes"], activation="sigmoid")(sed)
        doa = mod.simple_dense_block(dict(cfg["DOA_ARGS"]))(h)
        doa = mod.Dense(3 * cfg["n_classes"], activation="tanh")(doa)
        return [sed, doa]

    model = build_model("seldnet", (12, 8, 5), dict(cfg))
    run_parity(monkeypatch, ref, tf_fn, model, _x4d(), atol=5e-5)


def test_conv_temporal_ss5_like_full(monkeypatch, ref):
    """models.py:54-78 with an SS5-shaped config (scaled down): stem conv+pool,
    mother_stage, dense stage, conformer stages, biGRU DOA head.

    SS5.json ships pos_encoding=null which crashes the reference conformer
    (modules.py:445-449 reads an unbound `encoding` when pos_mode='absolute');
    the parity config uses pos_encoding='basic' on both sides."""
    from seld_tpu.models import build_model
    mod = ref["modules"]

    cfg = {
        "n_classes": 4,
        "filters": 8, "first_kernel_size": 3, "first_pool_size": [5, 2],
        "BLOCK0": "mother_stage",
        "BLOCK0_ARGS": dict(depth=2, filters0=0, filters1=12, filters2=0,
                            kernel_size0=0, kernel_size1=3, kernel_size2=0,
                            connect0=[1], connect1=[1, 0],
                            connect2=[1, 0, 1], strides=[1, 3]),
        "BLOCK1": "simple_dense_stage",
        "BLOCK1_ARGS": {"depth": 1, "units": 16, "dense_activation": "relu",
                        "dropout_rate": 0.0},
        "BLOCK2": "conformer_encoder_stage",
        "BLOCK2_ARGS": {"depth": 2, "key_dim": 4, "n_head": 2,
                        "kernel_size": 5, "multiplier": 2,
                        "pos_encoding": "basic", "dropout_rate": 0.0},
        "SED": "conformer_encoder_stage",
        "SED_ARGS": {"depth": 1, "key_dim": 8, "n_head": 2, "kernel_size": 3,
                     "multiplier": 2, "pos_encoding": "basic",
                     "dropout_rate": 0.0},
        "DOA": "bidirectional_GRU_stage",
        "DOA_ARGS": {"depth": 2, "units": 12},
    }

    def tf_fn(rec, x):
        import layers as ref_layers
        h = ref_layers.conv2d_bn(cfg["filters"], cfg["first_kernel_size"],
                                 padding="same", activation="relu")(x)
        h = _tf_maxpool(h, cfg["first_pool_size"])
        for block in ("BLOCK0", "BLOCK1", "BLOCK2"):
            h = getattr(mod, cfg[block])(dict(cfg[f"{block}_ARGS"]))(h)
        sed = getattr(mod, cfg["SED"])(dict(cfg["SED_ARGS"]))(h)
        sed = mod.Dense(cfg["n_classes"], activation="sigmoid")(sed)
        doa = getattr(mod, cfg["DOA"])(dict(cfg["DOA_ARGS"]))(h)
        doa = mod.Dense(3 * cfg["n_classes"], activation="tanh")(doa)
        return [sed, doa]

    model = build_model("conv_temporal", (20, 12, 5), dict(cfg))
    x = _x4d(b=2, t=20, f=12, c=5)
    run_parity(monkeypatch, ref, tf_fn, model, x, atol=1e-4)


# ---------------------------------------------------------------------------
# mcs_aug (CGMM mask estimation) golden parity
# ---------------------------------------------------------------------------
def test_cgmm_mask_aug_matches_reference_mcs_aug(ref):
    """cgmm_mask_aug vs the EXECUTING reference mcs_aug
    (/root/reference/transforms.py:202-291): same f64 EM — covariance init,
    6-step jitter stabilization, likelihoods, lambda masks — same masked
    output, on the seed pattern of the reference's transforms_test.py:97-100.

    Reference quirk (documented, not replicated): transforms.py never
    imports `math`, so tf_cond (:208) raises NameError and mcs_aug cannot
    run as shipped — its own transforms_test.py:97-102 would crash too (the
    import was evidently lost in a revision). `math` is injected into the
    module namespace here to execute the intended semantics (math.inf).
    """
    import math

    import transforms as ref_tfm
    ref_tfm.math = math

    from seld_tpu.data.transforms import cgmm_mask_aug

    rng = np.random.RandomState(100)
    # small but non-trivial: 2 clips, 12 frames, 5 freq bins, 4 channels
    x = rng.randn(2, 12, 5, 4).astype(np.float32)
    y = rng.rand(2, 12, 8).astype(np.float32)

    for iters in (1, 3):
        ref_x, ref_y = ref_tfm.mcs_aug(iteration=iters)(
            tf.constant(x), tf.constant(y))
        ours = cgmm_mask_aug(x, iterations=iters)
        np.testing.assert_array_equal(np.asarray(ref_y), y)
        np.testing.assert_allclose(ours, np.asarray(ref_x),
                                   rtol=1e-5, atol=1e-6)
