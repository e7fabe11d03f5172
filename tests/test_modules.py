"""Block shape-harness tests (reference pattern: modules_test.py:330-350 —
build each block from a config dict, run a zeros batch, assert output shape).
"""
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from `make test-fast`
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.config.registry import get_block


B, T, F, C = 2, 20, 16, 7


def block_test(name, args, in_shape, out_shape=None, train=False):
    block = get_block(name)(args)
    x = jnp.zeros(in_shape)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = block.init(rngs, x, train=False)
    out = block.apply(variables, x, train=False,
                      rngs={"dropout": jax.random.PRNGKey(2)},
                      mutable=["batch_stats"])[0]
    if out_shape is not None:
        assert tuple(out.shape) == tuple(out_shape), \
            f"{name}: {out.shape} != {out_shape}"
    assert np.all(np.isfinite(np.asarray(out)))
    if train:
        out2 = block.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])[0]
        assert out2.shape == out.shape
    return out


# ----------------------------- mother block -------------------------------
def test_mother_block_basic():
    args = dict(filters0=8, filters1=8, filters2=8,
                kernel_size0=3, kernel_size1=3, kernel_size2=3,
                connect0=[1], connect1=[1, 1], connect2=[1, 1, 1])
    block_test("mother_block", args, (B, T, F, C), (B, T, F, 8), train=True)


def test_mother_block_strides_and_concat():
    # SS5's BLOCK0 shape: skipped 1st/3rd convs, strided 2nd, concat output
    args = dict(depth=2, filters0=0, filters1=96, filters2=0,
                kernel_size0=0, kernel_size1=3, kernel_size2=0,
                connect0=[1], connect1=[1, 0], connect2=[1, 0, 1],
                strides=[1, 3])
    out = block_test("mother_stage", args, (B, T, 12, C))
    # freq: ceil(12/3)=4; channels: C + 96 after first rep, then (C+96) + 96
    assert out.shape == (B, T, 4, C + 96 + 96)


def test_mother_block_se():
    args = dict(filters0=0, filters1=8, filters2=8,
                kernel_size0=0, kernel_size1=3, kernel_size2=3,
                connect0=[1], connect1=[1, 0], connect2=[0, 0, 1],
                squeeze_ratio=0.5)
    block_test("mother_block", args, (B, T, F, C), (B, T, F, 8))


@pytest.mark.parametrize("bad", [
    dict(filters0=8, kernel_size0=0),                       # mismatched skip
    dict(filters0=0, kernel_size0=0, connect1=[1, 1]),      # link to skipped
    dict(filters0=0, kernel_size0=0, connect0=[0]),         # zero inputs
    dict(filters1=0, kernel_size1=0, strides=(1, 2),
         connect1=[1, 0], connect2=[1, 0, 0]),              # strides w/o conv1
])
def test_mother_block_validation(bad):
    args = dict(filters0=8, filters1=8, filters2=8,
                kernel_size0=3, kernel_size1=3, kernel_size2=3,
                connect0=[1], connect1=[1, 1], connect2=[1, 1, 1],
                strides=(1, 1))
    args.update(bad)
    with pytest.raises(ValueError):
        get_block("mother_block")(args)


# ------------------------------ rnn / dense -------------------------------
def test_bidirectional_gru_block():
    out = block_test("bidirectional_GRU_block", {"units": [16, 16]},
                     (B, T, F, C), (B, T, 16), train=True)


def test_bidirectional_gru_stage():
    block_test("bidirectional_GRU_stage", {"depth": 2, "units": 16},
               (B, T, 32), (B, T, 16))


@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
@pytest.mark.parametrize("merge", ["mul", "concat", "ave"])
def test_rnn_block(rnn_type, merge):
    width = 32 if merge == "concat" else 16
    block_test("RNN_block", {"units": 16, "rnn_type": rnn_type,
                             "merge_mode": merge},
               (B, T, 8), (B, T, width))


def test_rnn_block_unidirectional():
    block_test("RNN_block", {"units": 16, "bidirectional": False},
               (B, T, 8), (B, T, 16))


def test_simple_dense_block_3d():
    block_test("simple_dense_block", {"units": [32], "dropout_rate": 0.5},
               (B, T, 8), (B, T, 32), train=True)


def test_simple_dense_block_2d():
    block_test("simple_dense_block", {"units": [32, 8]}, (B, 16), (B, 8))


def test_simple_dense_stage():
    block_test("simple_dense_stage",
               {"depth": 2, "units": 24, "dense_activation": "relu"},
               (B, T, F, C), (B, T, 24))


# ------------------------------ attention ---------------------------------
def test_transformer_encoder_block():
    block_test("transformer_encoder_block",
               {"n_head": 2, "key_dim": 8, "ff_multiplier": 2, "kernel_size": 3},
               (B, T, 16), (B, T, 16), train=True)


@pytest.mark.parametrize("pos_encoding,pos_mode", [
    ("basic", "absolute"), ("rff", "absolute"),
    ("basic", "relative"), (None, "absolute"),  # SS5 case
])
def test_conformer_encoder_block(pos_encoding, pos_mode):
    block_test("conformer_encoder_block",
               {"key_dim": 8, "n_head": 2, "kernel_size": 4,
                "multiplier": 2, "pos_encoding": pos_encoding,
                "pos_mode": pos_mode},
               (B, T, 16), (B, T, 16), train=True)


def test_conformer_encoder_stage_depth():
    block_test("conformer_encoder_stage",
               {"depth": 2, "key_dim": 8, "n_head": 2, "kernel_size": 4,
                "multiplier": 2, "pos_encoding": None},
               (B, T, F, C), (B, T, F * C))


@pytest.mark.parametrize("kwargs", [
    dict(),                                      # rel-pos default
    dict(abs_pos_encoding=True),
    dict(use_glu=True, layer_norm_in_front=True),
    dict(kernel_size=0),                         # no depthwise conv
    dict(ff_factor0=0.0),
])
def test_attention_block(kwargs):
    args = {"key_dim": 8, "n_head": 2, "kernel_size": 4, "ff_kernel_size": 3,
            "ff_multiplier": 2.0, "ff_factor0": 0.5, "ff_factor1": 0.5}
    args.update(kwargs)
    block_test("attention_block", args, (B, T, 16), (B, T, 16), train=True)


def test_attention_block_validation():
    args = {"key_dim": 8, "n_head": 2, "kernel_size": 4, "ff_kernel_size": 3,
            "ff_multiplier": 2.0, "ff_factor0": 0.0, "ff_factor1": 0.0}
    with pytest.raises(ValueError):
        get_block("attention_block")(args)
    with pytest.raises(ValueError):
        get_block("attention_block")(
            {**args, "ff_kernel_size": 0, "ff_multiplier": 0,
             "pos_encoding": None})


def test_attention_stage():
    block_test("attention_stage",
               {"depth": 2, "key_dim": 8, "n_head": 2, "kernel_size": 0,
                "ff_kernel_size": 3, "ff_multiplier": 2.0,
                "ff_factor0": 0.5, "ff_factor1": 0.5},
               (B, T, 16), (B, T, 16))


# --------------------------- legacy conv families -------------------------
def test_simple_conv_block():
    out = block_test("simple_conv_block",
                     {"filters": [16, 16, 16],
                      "pool_size": [[5, 4], [1, 4], [1, 2]]},
                     (B, 300, 64, 7))
    assert out.shape == (B, 60, 2, 16)


def test_cond_conv_block():
    block_test("cond_conv_block",
               {"filters": [8], "pool_size": [[2, 2]], "dropout_rate": 0.1},
               (B, T, F, C), (B, T // 2, F // 2, 8), train=True)


def test_another_conv_block():
    block_test("another_conv_block",
               {"filters": 16, "depth": 2, "pool_size": [1, 4]},
               (B, T, F, C), (B, T, F // 4, 16))


def test_res_basic_stage():
    block_test("res_basic_stage",
               {"filters": 16, "depth": 2, "strides": [1, 2]},
               (B, T, F, C), (B, T, F // 2, 16), train=True)


def test_res_bottleneck_stage():
    block_test("res_bottleneck_stage",
               {"filters": 8, "depth": 2, "strides": [1, 2]},
               (B, T, F, C), (B, T, F // 2, 32))


def test_dense_net_stage_schema():
    out = block_test("dense_net_block",
                     {"growth_rate": 8, "depth": 3, "strides": [1, 2],
                      "bottleneck_ratio": 2, "reduction_ratio": 0.5},
                     (B, T, F, C))
    assert out.shape == (B, T, F // 2, (C + 3 * 8) // 2)


def test_dense_net_body_schema():
    out = block_test("dense_net_block",
                     {"filters": 16, "block_num": [2, 2]},
                     (B, 100, 64, 7))
    assert out.shape[0] == B and out.shape[1] == 20


def test_resnet50_block():
    out = block_test("resnet50_block", {"filters": 8, "block_num": [2, 2]},
                     (B, 100, 64, 7))
    assert out.shape == (B, 20, 16, 8 * 2 * 4)


def test_xception_block():
    out = block_test("xception_block", {"filters": 8, "block_num": 2},
                     (B, 100, 64, 7))
    assert out.shape == (B, 20, 8, 32)


def test_identity_block():
    block_test("identity_block", {}, (B, T, F, C), (B, T, F, C))


def test_unknown_block_raises():
    with pytest.raises(KeyError):
        get_block("no_such_block")


def test_gru_matches_torch_numerics():
    """Map weights into torch.nn.GRU and demand identical outputs.

    Keras/our gate order is (z, r, h) with h' = z*h + (1-z)*hh; torch uses
    (r, z, n) with h' = (1-z)*n + z*h — same recurrence, permuted layout.
    """
    import torch
    from seld_tpu.models.layers import GRU

    rng = np.random.RandomState(0)
    B, T, I, U = 3, 12, 5, 7
    x = rng.randn(B, T, I).astype(np.float32)

    gru = GRU(U, bidirectional=False)
    variables = gru.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(gru.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    kernel = np.asarray(p["kernel"])[0]          # [I, 3U] (z|r|h)
    rec = np.asarray(p["recurrent_kernel"])[0]   # [U, 3U]
    bias = np.asarray(p["bias"])[0]              # [2, 3U] (input, recurrent)

    def to_torch(w):  # [in, 3U] z|r|h -> torch [3U, in] r|z|n
        z, r, h = np.split(w, 3, axis=1)
        return torch.from_numpy(np.concatenate([r, z, h], axis=1).T.copy())

    tg = torch.nn.GRU(I, U, batch_first=True)
    with torch.no_grad():
        tg.weight_ih_l0.copy_(to_torch(kernel))
        tg.weight_hh_l0.copy_(to_torch(rec))
        tg.bias_ih_l0.copy_(to_torch(bias[0:1]).reshape(-1))
        tg.bias_hh_l0.copy_(to_torch(bias[1:2]).reshape(-1))
        theirs = tg(torch.from_numpy(x))[0].numpy()

    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_lstm_matches_torch_numerics():
    """Same weight-mapping check for LSTM (keras i|f|c|o vs torch i|f|g|o)."""
    import torch
    from seld_tpu.models.layers import LSTM

    rng = np.random.RandomState(1)
    B, T, I, U = 3, 10, 4, 6
    x = rng.randn(B, T, I).astype(np.float32)

    lstm = LSTM(U, bidirectional=False)
    variables = lstm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(lstm.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    kernel = np.asarray(p["kernel"])[0]          # [I, 4U] i|f|c|o
    rec = np.asarray(p["recurrent_kernel"])[0]
    bias = np.asarray(p["bias"])[0]              # [4U]

    tl = torch.nn.LSTM(I, U, batch_first=True)
    with torch.no_grad():
        tl.weight_ih_l0.copy_(torch.from_numpy(kernel.T.copy()))
        tl.weight_hh_l0.copy_(torch.from_numpy(rec.T.copy()))
        tl.bias_ih_l0.copy_(torch.from_numpy(bias.copy()))
        tl.bias_hh_l0.copy_(torch.zeros(4 * U))
        theirs = tl(torch.from_numpy(x))[0].numpy()

    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _stack_unrolled_conformer(tree, depth):
    """Map an unrolled ConformerEncoderBlock variable collection onto the
    scan_depth=True layout: per iteration the loop creates the same child
    sequence, so auto-names are f"{type}_{i*c + j}" for iteration i and
    per-iteration index j; the scan body holds f"{type}_{j}" stacked on a
    leading depth axis under the "scan" submodule."""
    import collections
    by_type = collections.defaultdict(dict)
    for name, sub in tree.items():
        t, idx = name.rsplit("_", 1)
        by_type[t][int(idx)] = sub
    out = {}
    for t, subs in by_type.items():
        c = len(subs) // depth
        assert c * depth == len(subs), (t, len(subs), depth)
        for j in range(c):
            out[f"{t}_{j}"] = jax.tree.map(
                lambda *leaves: jnp.stack(leaves),
                *[subs[i * c + j] for i in range(depth)])
    return {"scan": out}


def test_conformer_scan_depth_matches_unrolled():
    """scan_depth=True is numerically IDENTICAL to the unrolled stage given
    creation-order-mapped params: outputs match in eval and train mode, and
    the scanned BatchNorm stat updates equal each unrolled iteration's."""
    from seld_tpu.models.modules import ConformerEncoderBlock

    kw = dict(key_dim=8, n_head=2, kernel_size=4, multiplier=2,
              pos_encoding=None, dropout_rate=0.0, depth=3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 16),
                    jnp.float32)

    unrolled = ConformerEncoderBlock(**kw)
    vu = unrolled.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    scanned = ConformerEncoderBlock(**kw, scan_depth=True)
    vs = {"params": _stack_unrolled_conformer(vu["params"], kw["depth"]),
          "batch_stats": _stack_unrolled_conformer(vu["batch_stats"],
                                                   kw["depth"])}

    want = unrolled.apply(vu, x, train=False)
    got = scanned.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    want_t, mu = unrolled.apply(vu, x, train=True,
                                mutable=["batch_stats"])
    got_t, ms = scanned.apply(vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ms["batch_stats"]["scan"]["BatchNorm_0"]["mean"]),
        np.asarray(_stack_unrolled_conformer(
            mu["batch_stats"], kw["depth"])["scan"]["BatchNorm_0"]["mean"]),
        rtol=1e-6, atol=1e-6)


def test_conformer_scan_depth_trains_with_dropout():
    """Dropout rngs split per scanned iteration: a train-mode apply with a
    dropout rng runs and differs from the eval pass (masks active)."""
    from seld_tpu.models.modules import ConformerEncoderBlock

    blk = ConformerEncoderBlock(key_dim=8, n_head=2, kernel_size=4,
                                multiplier=2, pos_encoding=None,
                                dropout_rate=0.5, depth=2, scan_depth=True)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 10, 16), jnp.float32)
    v = blk.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ev = blk.apply(v, x, train=False)
    tr, _ = blk.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(7)})
    assert np.isfinite(np.asarray(tr)).all()
    assert not np.allclose(np.asarray(tr), np.asarray(ev))


def test_mother_bn_pair_batch_matches():
    """bn_pair_batch folds the main conv's BN and the strided skip
    projection's BN into one concat-BN-split: outputs and updated stats are
    numerically identical given channel-concatenated BN params (per-channel
    statistics are unaffected by batching the reduction)."""
    from seld_tpu.models.modules import MotherStage

    cfg = {"depth": 2, "filters0": 0, "filters1": 24, "filters2": 0,
           "kernel_size0": 0, "kernel_size1": 3, "kernel_size2": 0,
           "connect0": [1], "connect1": [1, 0], "connect2": [1, 0, 1],
           "strides": [1, 3]}
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 9, 24),
                    jnp.float32)

    plain = MotherStage(dict(cfg))
    vp = plain.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    batched = MotherStage(dict(cfg, bn_pair_batch=True))

    def to_batched(tree):
        out = jax.tree.map(lambda a: a, tree)  # deep copy of the dicts
        for blk in out.values():       # both blocks project their skip
            pair = [blk.pop("BatchNorm_0"), blk.pop("BatchNorm_1")]
            blk["BatchNorm_0"] = jax.tree.map(
                lambda *leaves: jnp.concatenate(leaves), *pair)
        return out

    vb = {"params": to_batched(vp["params"]),
          "batch_stats": to_batched(vp["batch_stats"])}

    want = plain.apply(vp, x, train=False)
    got = batched.apply(vb, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    want_t, mp = plain.apply(vp, x, train=True, mutable=["batch_stats"])
    got_t, mb = batched.apply(vb, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mb["batch_stats"]["MotherBlock_0"]["BatchNorm_0"]["mean"]),
        np.asarray(to_batched(
            mp["batch_stats"])["MotherBlock_0"]["BatchNorm_0"]["mean"]),
        rtol=1e-5, atol=1e-6)


def test_mother_bn_pair_batch_mixed_skips_bit_exact():
    """With a DIRECT (shape-matching) skip and a PROJECTED skip in the same
    block, bn_pair_batch must keep the unrolled fp-addition order — outputs
    are bit-exact, not just close."""
    from seld_tpu.models.modules import MotherBlock

    # input 24ch: layer1 (f0=16) output mismatches -> projected skip;
    # raw input x matches the f1=24 main conv -> direct skip
    cfg = {"depth": 1, "filters0": 16, "filters1": 24, "filters2": 0,
           "kernel_size0": 3, "kernel_size1": 3, "kernel_size2": 0,
           "connect0": [0], "connect1": [1, 1], "connect2": [0, 0, 1],
           "strides": [1, 1]}
    x = jnp.asarray(np.random.RandomState(2).randn(2, 12, 8, 24),
                    jnp.float32)

    plain = MotherBlock(dict(cfg), (1, 1))
    vp = plain.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    batched = MotherBlock(dict(cfg, bn_pair_batch=True), (1, 1))

    def to_batched(tree):
        out = jax.tree.map(lambda a: a, tree)
        pair = [out.pop("BatchNorm_1"), out.pop("BatchNorm_2")]
        out["BatchNorm_1"] = jax.tree.map(
            lambda *leaves: jnp.concatenate(leaves), *pair)
        return out

    vb = {"params": to_batched(vp["params"]),
          "batch_stats": to_batched(vp["batch_stats"])}
    want = np.asarray(plain.apply(vp, x, train=False))
    got = np.asarray(batched.apply(vb, x, train=False))
    np.testing.assert_array_equal(got, want)
