"""Config-dict-driven block factories (flax.linen).

TPU-native re-design of the reference's module layer (modules.py). Every
factory takes a plain config dict (the JSON architecture DSL,
models.py:24-29 in the reference) and returns a linen module whose
``__call__(x, train: bool)`` applies the block. Factories validate configs
eagerly (same ValueErrors as the reference) so NAS rejection sampling works.

Blocks with 2D ([B, T, F, C]) outputs:
  mother_stage/mother_block      modules.py:15-43,184-298 (NAS super-block)
  simple_conv_block              (stale-config family, SURVEY §2 gap list)
  cond_conv_block, another_conv_block, dense_net_block, res_basic_stage,
  res_bottleneck_stage, resnet50_block, xception_block  (same gap list)

Blocks with 1D ([B, T, D]) outputs:
  bidirectional_GRU_stage/block  modules.py:46-61,302-319
  RNN_stage/block                modules.py:64-83,322-347
  simple_dense_stage/block       modules.py:86-103,350-376
  transformer_encoder_stage/block modules.py:106-126,379-407
  conformer_encoder_stage/block  modules.py:129-152,410-508
  attention_stage/block          modules.py:155-180,511-635
  identity_block                 modules.py:639-642

Known reference quirks handled deliberately:
  - conformer block with pos_encoding=None + pos_mode='absolute' (the SS5
    config!) reads an unbound `encoding` in the reference (modules.py:446-450);
    here "None" cleanly means "no positional encoding".
  - attention_block applies its FF convs to `x`, not the pre-LayerNormed
    branch, when layer_norm_in_front=True (modules.py:560-565) — replicated
    for NAS-search parity.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seld_tpu.ops.dropout import Dropout

from seld_tpu.config.registry import register_block
from seld_tpu.ops.pooling import max_pool
from seld_tpu.models.layers import (
    BatchNorm,
    Conv,
    Conv2DBN,
    GRU,
    LSTM,
    MultiHeadAttention,
    RelPositionMultiHeadAttention,
    RFFPosEncoding,
    basic_pos_encoding,
    force_1d,
    get_activation,
    glorot,
    zeros_init,
)


def _layer_norm():
    """LayerNorm with the Keras default epsilon (1e-3, vs flax's 1e-6) —
    required for numerical parity with the reference attention blocks
    (caught by tests/test_tf_parity.py)."""
    return nn.LayerNorm(epsilon=1e-3)


def _tuple2(v) -> Tuple[int, int]:
    if isinstance(v, (int, float)):
        return (int(v), int(v))
    v = tuple(int(i) for i in v)
    return v * 2 if len(v) == 1 else v


def _conv(filters, kernel, strides=(1, 1), groups=1, use_bias=True):
    return Conv(filters, _tuple2(kernel), strides=_tuple2(strides),
                padding="SAME", feature_group_count=groups,
                use_bias=use_bias)


def _conv1d(filters, kernel, groups=1, use_bias=True):
    return Conv(filters, (int(kernel),), padding="SAME",
                feature_group_count=groups, use_bias=use_bias)


def _dense(units, use_bias=True):
    return nn.Dense(units, use_bias=use_bias, kernel_init=glorot(),
                    bias_init=zeros_init)


# --------------------------------------------------------------------------
#                               MOTHER BLOCK
# --------------------------------------------------------------------------
def _validate_mother_config(c: dict) -> None:
    """Reference-identical validation (modules.py:202-222)."""
    f0, f1, f2 = c["filters0"], c["filters1"], c["filters2"]
    k0, k1, k2 = c["kernel_size0"], c["kernel_size1"], c["kernel_size2"]
    connect0, connect1, connect2 = c["connect0"], c["connect1"], c["connect2"]
    strides = _tuple2(c.get("strides", (1, 1)))

    if (f0 == 0) != (k0 == 0):
        raise ValueError("0) skipped layer must have 0 filters, 0 kernel size")
    if (f1 == 0) != (k1 == 0):
        raise ValueError("1) skipped layer must have 0 filters, 0 kernel size")
    if (f2 == 0) != (k2 == 0):
        raise ValueError("2) skipped layer must have 0 filters, 0 kernel size")

    if f0 == 0 and max(connect1[1], connect2[1]):
        raise ValueError("cannot link skipped layer (first layer)")
    if f1 == 0 and connect2[2] > 0:
        raise ValueError("cannot link skipped layer (second layer)")

    if (f0 != 0) + sum(connect0) == 0:
        raise ValueError("cannot pass zero inputs to the second layer")
    if (f1 != 0) + sum(connect1) == 0:
        raise ValueError("cannot pass zero inputs to the third layer")
    if (f2 != 0) + sum(connect2) == 0:
        raise ValueError("cannot pass zero inputs to the final output")

    if f1 == 0 and strides != (1, 1):
        raise ValueError("if strides are set, the second layer must be active")


class MotherBlock(nn.Module):
    """NAS super-block: <=3 convs with arbitrary skip/concat wiring + SE."""
    config: Dict[str, Any]
    strides: Tuple[int, int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.config
        f0, f1, f2 = c["filters0"], c["filters1"], c["filters2"]
        k0, k1, k2 = c["kernel_size0"], c["kernel_size1"], c["kernel_size2"]
        connect0, connect1, connect2 = c["connect0"], c["connect1"], c["connect2"]
        strides = self.strides
        act = get_activation(c.get("activation", "relu"))
        squeeze_ratio = c.get("squeeze_ratio", 0)
        se_act = get_activation(c.get("se_activation", "relu"))

        def bn(z):
            return BatchNorm()(z, train=train)

        outputs = [x]

        # first layer (never strided)
        if f0 > 0:
            out = bn(_conv(f0, k0)(outputs[-1]))
            if connect0[0] == 1:
                skip = outputs[-1]
                if skip.shape[-3:] != out.shape[-3:]:
                    skip = bn(_conv(f0, 1)(skip))
                out = out + skip
            out = act(out)
        else:
            out = outputs[-1]
        outputs.append(out)

        # second layer (applies strides)
        if f1 > 0 and c.get("bn_pair_batch", False):
            # perf probe (BASELINE.md round 3): fold the main conv's BN and
            # every shape-projecting skip BN into ONE stat reduction by
            # concatenating along channels — per-channel stats are
            # unaffected, so numerics are exact; only the param layout
            # changes (one wide BN), which is why this is opt-in.
            main = _conv(f1, k1, strides=strides)(outputs[-1])
            raws, terms = [main], []   # terms: ("bn", idx) | ("raw", skip),
            for i in range(len(connect1)):         # in the unrolled order
                if connect1[i] == 1:
                    skip = outputs[i]
                    if skip.shape[-3:] != main.shape[-3:]:
                        raws.append(_conv(f1, 1, strides=strides)(skip))
                        terms.append(("bn", len(raws) - 1))
                    else:
                        terms.append(("raw", skip))
            if len(raws) > 1:
                parts = jnp.split(bn(jnp.concatenate(raws, axis=-1)),
                                  len(raws), axis=-1)
            else:
                parts = [bn(main)]
            # accumulate in the same index order as the unrolled path so
            # fp addition order (and thus numerics) match exactly
            out = parts[0]
            for kind, v in terms:
                out = out + (parts[v] if kind == "bn" else v)
            out = act(out)
        elif f1 > 0:
            out = bn(_conv(f1, k1, strides=strides)(outputs[-1]))
            for i in range(len(connect1)):
                if connect1[i] == 1:
                    skip = outputs[i]
                    if skip.shape[-3:] != out.shape[-3:]:
                        skip = bn(_conv(f1, 1, strides=strides)(skip))
                    out = out + skip
            out = act(out)
        else:
            out = jnp.concatenate(
                [outputs[i] for i in range(len(connect1)) if connect1[i] == 1],
                axis=-1)
        outputs.append(out)

        # third layer (never strided)
        if f2 > 0:
            out = bn(_conv(f2, k2)(outputs[-1]))
            for i in range(len(connect2)):
                if connect2[i] == 1:
                    skip = outputs[i]
                    if skip.shape[-3:] != out.shape[-3:]:
                        skip = bn(_conv(
                            f2, 1,
                            strides=(1, 1) if i == 2 else strides)(skip))
                    out = out + skip
            out = act(out)
        else:
            selected = []
            for i in range(len(connect2)):
                if connect2[i] == 1:
                    skip = outputs[i]
                    if connect2[-1] == 1 and strides != (1, 1) and i < 2:
                        # align pre-stride tensors with the strided branch
                        skip = _conv(skip.shape[-1], 1, strides=strides)(skip)
                    selected.append(skip)
            out = jnp.concatenate(selected, axis=-1)

        # squeeze and excitation
        if squeeze_ratio > 0:
            se_filters = int(squeeze_ratio * out.shape[-1])
            se = jnp.mean(out, axis=(-3, -2), keepdims=True)
            se = se_act(_conv(se_filters, 1)(se))
            se = jax.nn.sigmoid(_conv(out.shape[-1], 1)(se))
            out = se * out

        return out


class MotherStage(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.config
        depth = c["depth"]
        strides = _tuple2(c.get("strides", (1, 1)))
        for i in range(depth):
            x = MotherBlock(c, strides if i == 0 else (1, 1))(x, train=train)
        return x


@register_block("mother_block")
def mother_block(model_config: dict):
    _validate_mother_config(model_config)
    return MotherBlock(dict(model_config),
                       _tuple2(model_config.get("strides", (1, 1))))


@register_block("mother_stage")
def mother_stage(model_config: dict):
    _validate_mother_config(model_config)
    return MotherStage(dict(model_config))


# --------------------------------------------------------------------------
#                        RNN / DENSE 1D BLOCKS
# --------------------------------------------------------------------------
class BidirectionalGRUBlock(nn.Module):
    """force_1d then stacked biGRUs merged multiplicatively (modules.py:302-319)."""
    units: Tuple[int, ...]
    dropout_rate: float = 0.0
    unroll: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = force_1d(x)
        for u in self.units:
            # reference GRU blocks pass recurrent_dropout=dropout_rate
            # (modules.py:313-314)
            x = GRU(u, bidirectional=True, merge_mode="mul",
                    dropout=self.dropout_rate,
                    recurrent_dropout=self.dropout_rate,
                    unroll=self.unroll)(x, deterministic=not train)
        return x


@register_block("bidirectional_GRU_block")
def bidirectional_GRU_block(model_config: dict):
    return BidirectionalGRUBlock(tuple(model_config["units"]),
                                 model_config.get("dropout_rate", 0.0),
                                 model_config.get("unroll", 1))


@register_block("bidirectional_GRU_stage")
def bidirectional_GRU_stage(model_config: dict):
    depth = model_config["depth"]
    units = model_config["units"]
    return BidirectionalGRUBlock((units,) * depth,
                                 model_config.get("dropout_rate", 0.0),
                                 model_config.get("unroll", 1))


class RNNBlock(nn.Module):
    units: int
    bidirectional: bool = True
    merge_mode: str = "mul"
    rnn_type: str = "GRU"
    dropout_rate: float = 0.0
    depth: int = 1
    unroll: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = force_1d(x)
        cls = GRU if self.rnn_type == "GRU" else LSTM
        for _ in range(self.depth):
            # recurrent_dropout=dropout_rate as in reference modules.py:338
            x = cls(self.units, bidirectional=self.bidirectional,
                    merge_mode=self.merge_mode, dropout=self.dropout_rate,
                    recurrent_dropout=self.dropout_rate,
                    unroll=self.unroll)(x, deterministic=not train)
        return x


@register_block("RNN_block")
def RNN_block(model_config: dict):
    return RNNBlock(
        units=model_config["units"],
        bidirectional=model_config.get("bidirectional", True),
        merge_mode=model_config.get("merge_mode", "mul"),
        rnn_type=model_config.get("rnn_type", "GRU"),
        dropout_rate=model_config.get("dropout_rate", 0.0),
        unroll=model_config.get("unroll", 1),
    )


@register_block("RNN_stage")
def RNN_stage(model_config: dict):
    return RNNBlock(
        units=model_config["units"],
        bidirectional=model_config.get("bidirectional", True),
        merge_mode=model_config.get("merge_mode", "mul"),
        rnn_type=model_config.get("rnn_type", "GRU"),
        dropout_rate=model_config.get("dropout_rate", 0.0),
        depth=model_config["depth"],
        unroll=model_config.get("unroll", 1),
    )


class SimpleDenseBlock(nn.Module):
    """Dense for 2D inputs, Conv1D for 3D (modules.py:350-376)."""
    units: Tuple[int, ...]
    kernel_size: int = 1
    activation: Optional[str] = None
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = force_1d(x)
        act = get_activation(self.activation)
        for u in self.units:
            if x.ndim == 2:
                x = _dense(u)(x)
            else:
                x = _conv1d(u, self.kernel_size)(x)
            if act:
                x = act(x)
            if self.dropout_rate > 0:
                x = Dropout(self.dropout_rate)(x, deterministic=not train)
        return x


@register_block("simple_dense_block")
def simple_dense_block(model_config: dict):
    return SimpleDenseBlock(
        units=tuple(model_config["units"]),
        kernel_size=model_config.get("kernel_size", 1),
        activation=model_config.get("dense_activation", None),
        dropout_rate=model_config.get("dropout_rate", 0.0),
    )


@register_block("simple_dense_stage")
def simple_dense_stage(model_config: dict):
    # Reference quirk (modules.py:86-103): the stage OVERWRITES
    # 'dense_activation' with the 'activation' key (default None), so a
    # config carrying only 'dense_activation' — like SS5.json's BLOCK1 —
    # runs a LINEAR dense stage. Replicated exactly; verified by the
    # weight-mapped TF parity test (tests/test_tf_parity.py).
    depth = model_config["depth"]
    return SimpleDenseBlock(
        units=(model_config["units"],) * depth,
        kernel_size=model_config.get("kernel_size", 1),
        activation=model_config.get("activation", None),
        dropout_rate=model_config.get("dropout_rate", 0.0),
    )


# --------------------------------------------------------------------------
#                       ATTENTION-FAMILY 1D BLOCKS
# --------------------------------------------------------------------------
class TransformerEncoderBlock(nn.Module):
    """Post-LN transformer encoder with Conv1D FFN (modules.py:379-407)."""
    n_head: int
    key_dim: int
    ff_multiplier: float
    kernel_size: int
    activation: str = "relu"
    dropout_rate: float = 0.1
    depth: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = force_1d(x)
        det = not train
        act = get_activation(self.activation)
        d_model = x.shape[-1]
        for _ in range(self.depth):
            attn = MultiHeadAttention(self.n_head, self.key_dim,
                                      output_size=d_model,
                                      dropout=self.dropout_rate,
                                      use_bias=True)(x, x, x, deterministic=det)
            attn = Dropout(self.dropout_rate)(attn, deterministic=det)
            x = _layer_norm()(x + attn)

            ffn = _conv1d(int(self.ff_multiplier * d_model), self.kernel_size)(x)
            ffn = act(ffn)
            ffn = Dropout(self.dropout_rate)(ffn, deterministic=det)
            ffn = _conv1d(d_model, self.kernel_size)(ffn)
            ffn = Dropout(self.dropout_rate)(ffn, deterministic=det)
            x = _layer_norm()(x + ffn)
        return x


@register_block("transformer_encoder_block")
def transformer_encoder_block(model_config: dict):
    return TransformerEncoderBlock(
        n_head=model_config["n_head"],
        key_dim=model_config["key_dim"],
        ff_multiplier=model_config["ff_multiplier"],
        kernel_size=model_config["kernel_size"],
        activation=model_config.get("activation", "relu"),
        dropout_rate=model_config.get("dropout_rate", 0.1),
    )


@register_block("transformer_encoder_stage")
def transformer_encoder_stage(model_config: dict):
    cfg = dict(model_config)
    return TransformerEncoderBlock(
        n_head=cfg["n_head"],
        key_dim=cfg["key_dim"],
        ff_multiplier=cfg["ff_multiplier"],
        kernel_size=cfg["kernel_size"],
        activation=cfg.get("activation", "relu"),
        dropout_rate=cfg.get("dropout_rate", 0.1),
        depth=cfg["depth"],
    )


def _conformer_ffn(m, x, act, det, emb):
    ffn = _layer_norm()(x)
    ffn = act(_dense(int(m.multiplier * emb))(ffn))
    ffn = Dropout(m.dropout_rate)(ffn, deterministic=det)
    ffn = _dense(emb)(ffn)
    return Dropout(m.dropout_rate)(ffn, deterministic=det)


def _conformer_iter(m, x, train):
    """One conformer iteration, creating children on `m` — shared by the
    unrolled block (N copies, default) and the scanned body (one copy,
    depth-stacked params). Child creation order is identical to round-2's
    inline loop, so unrolled param names are unchanged."""
    det = not train
    act = get_activation(m.activation)
    emb = x.shape[-1]
    time = x.shape[-2]

    # half-step FFN
    x = x + m.ffn_factor * _conformer_ffn(m, x, act, det, emb)

    # positional encoding
    encoding = None
    if m.pos_encoding == "basic":
        encoding = basic_pos_encoding(time, emb, x.dtype)
    elif m.pos_encoding == "rff":
        encoding = RFFPosEncoding(emb)(time, x.dtype)

    if m.pos_mode == "absolute" and encoding is not None:
        x = x + encoding

    # MHSA
    attn_in = _layer_norm()(x)
    if m.pos_mode == "relative":
        if encoding is None:
            raise ValueError(
                "relative pos mode requires a positional encoding")
        attn = RelPositionMultiHeadAttention(
            m.n_head, m.key_dim, use_bias=m.use_bias,
            dropout=m.dropout_rate)(
                attn_in, attn_in, attn_in, encoding, deterministic=det)
    else:
        attn = MultiHeadAttention(
            m.n_head, m.key_dim, use_bias=m.use_bias,
            dropout=m.dropout_rate)(
                attn_in, attn_in, attn_in, deterministic=det)
    attn = Dropout(m.dropout_rate)(attn, deterministic=det)
    x = attn + x

    # conv module: pointwise-GLU -> depthwise -> BN -> swish -> pointwise
    conv = _layer_norm()(x)
    conv = _conv1d(2 * emb, 1)(conv)
    conv_1, conv_2 = jnp.split(conv, 2, axis=-1)
    conv = conv_1 * jax.nn.sigmoid(conv_2)
    conv = _conv1d(emb, m.kernel_size, groups=emb)(conv)
    conv = BatchNorm()(conv, train=train)
    conv = jax.nn.silu(conv)
    conv = _conv1d(emb, 1)(conv)
    conv = Dropout(m.dropout_rate)(conv, deterministic=det)
    conv = conv + x

    # final half-step FFN off the conv output, residual to pre-conv x
    # (reference adds ffn(conv) to x, modules.py:497-504)
    ffn = _conformer_ffn(m, conv, act, det, emb)
    return _layer_norm()(x + m.ffn_factor * ffn)


class ConformerScanBody(nn.Module):
    """One conformer iteration as a scan body (params gain a leading depth
    axis under nn.scan; see ConformerEncoderBlock.scan_depth)."""
    key_dim: int
    n_head: int
    kernel_size: int
    activation: str
    dropout_rate: float
    multiplier: float
    ffn_factor: float
    pos_encoding: Optional[str]
    pos_mode: str
    use_bias: bool
    train: bool

    @nn.compact
    def __call__(self, x, _):
        return _conformer_iter(self, x, self.train), None


class ConformerEncoderBlock(nn.Module):
    """Conformer block: FFN/2 -> MHSA -> GLU+depthwise conv -> FFN/2
    (modules.py:410-508).

    scan_depth=True compiles ONE block body and `lax.scan`s it over the
    depth (params stacked on a leading axis) instead of unrolling N
    structurally identical copies — a compile-time/op-count lever for deep
    stacks. Opt-in: the param tree changes shape (not checkpoint- or
    TF-import-compatible with the unrolled form), and at SS5 depths the
    step-rate effect measured ~0 on the chip (BASELINE.md round 3)."""
    key_dim: int = 36
    n_head: int = 4
    kernel_size: int = 32
    activation: str = "swish"
    dropout_rate: float = 0.1
    multiplier: float = 4
    ffn_factor: float = 0.5
    pos_encoding: Optional[str] = "basic"
    pos_mode: str = "absolute"
    use_bias: bool = True
    depth: int = 1
    scan_depth: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = force_1d(x)
        if self.scan_depth:
            # depth == 1 also scans (length-1) so the param-tree layout is
            # a function of the flag alone, not of depth crossing 1 -> 2
            body = nn.scan(
                ConformerScanBody,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth)(
                    key_dim=self.key_dim, n_head=self.n_head,
                    kernel_size=self.kernel_size, activation=self.activation,
                    dropout_rate=self.dropout_rate,
                    multiplier=self.multiplier, ffn_factor=self.ffn_factor,
                    pos_encoding=self.pos_encoding, pos_mode=self.pos_mode,
                    use_bias=self.use_bias, train=train, name="scan")
            x, _ = body(x, None)
            return x
        for _ in range(self.depth):
            x = _conformer_iter(self, x, train)
        return x


def _conformer_kwargs(model_config: dict) -> dict:
    return dict(
        key_dim=model_config.get("key_dim", 36),
        n_head=model_config.get("n_head", 4),
        kernel_size=model_config.get("kernel_size", 32),
        activation=model_config.get("activation", "swish"),
        dropout_rate=model_config.get("dropout_rate", 0.1),
        multiplier=model_config.get("multiplier", 4),
        ffn_factor=model_config.get("ffn_factor", 0.5),
        pos_encoding=model_config.get("pos_encoding", "basic"),
        pos_mode=model_config.get("pos_mode", "absolute"),
        use_bias=model_config.get("use_bias", True),
    )


@register_block("conformer_encoder_block")
def conformer_encoder_block(model_config: dict):
    return ConformerEncoderBlock(**_conformer_kwargs(model_config))


@register_block("conformer_encoder_stage")
def conformer_encoder_stage(model_config: dict):
    return ConformerEncoderBlock(**_conformer_kwargs(model_config),
                                 depth=model_config["depth"],
                                 scan_depth=model_config.get("scan_depth",
                                                             False))


class AttentionBlock(nn.Module):
    """Generalized attention block with toggleable FF/GLU/depthwise/pre-LN
    (modules.py:511-635)."""
    key_dim: int
    n_head: int
    kernel_size: int
    ff_kernel_size: int
    ff_multiplier: float
    ff_factor0: float
    ff_factor1: float
    activation: str = "swish"
    pos_encoding: Optional[str] = "basic"
    abs_pos_encoding: bool = False
    layer_norm_in_front: bool = False
    use_glu: bool = False
    use_bias: bool = False
    dropout_rate: float = 0.1
    depth: int = 1

    def _ff(self, x, act, det, d_model):
        # NOTE: reference applies the convs to x even when a pre-LN branch was
        # computed (modules.py:560-568) — replicated for search-space parity.
        ff = _conv1d(int(self.ff_multiplier * d_model), self.ff_kernel_size)(x)
        ff = act(ff)
        ff = Dropout(self.dropout_rate)(ff, deterministic=det)
        ff = _conv1d(d_model, self.ff_kernel_size)(ff)
        return Dropout(self.dropout_rate)(ff, deterministic=det)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = force_1d(x)
        det = not train
        act = get_activation(self.activation)
        d_model = x.shape[-1]
        time = x.shape[-2]

        for _ in range(self.depth):
            # first FF
            if self.ff_factor0 > 0:
                x = x + self.ff_factor0 * self._ff(x, act, det, d_model)
                if not self.layer_norm_in_front:
                    x = _layer_norm()(x)

            # positional encoding
            if self.pos_encoding == "basic":
                encoding = basic_pos_encoding(time, d_model, x.dtype)
            elif self.pos_encoding == "rff":
                encoding = RFFPosEncoding(d_model)(time, x.dtype)
            else:
                encoding = jnp.zeros((1, time, d_model), x.dtype)

            # MHSA
            attn_in = _layer_norm()(x) if self.layer_norm_in_front else x
            if self.abs_pos_encoding:
                x = x + encoding
                attn = MultiHeadAttention(
                    self.n_head, self.key_dim, use_bias=self.use_bias,
                    dropout=self.dropout_rate)(
                        attn_in, attn_in, attn_in, deterministic=det)
            else:
                attn = RelPositionMultiHeadAttention(
                    self.n_head, self.key_dim, use_bias=self.use_bias,
                    dropout=self.dropout_rate)(
                        attn_in, attn_in, attn_in, encoding, deterministic=det)
            x = Dropout(self.dropout_rate)(attn, deterministic=det) + x
            if not self.layer_norm_in_front:
                x = _layer_norm()(x)

            # GLU
            conv = x
            if self.use_glu:
                if self.layer_norm_in_front:
                    conv = _layer_norm()(conv)
                conv = _conv1d(2 * d_model, 1)(conv)
                conv_1, conv_2 = jnp.split(conv, 2, axis=-1)
                conv = conv_1 * jax.nn.sigmoid(conv_2)

            # depthwise conv
            if self.kernel_size > 0:
                if self.layer_norm_in_front and not self.use_glu:
                    conv = _layer_norm()(conv)
                conv = _conv1d(d_model, self.kernel_size, groups=d_model)(conv)
                conv = BatchNorm()(conv, train=train)
                conv = jax.nn.silu(conv)
                conv = _conv1d(d_model, 1)(conv)
                x = x + Dropout(self.dropout_rate)(conv, deterministic=det)
                if not self.layer_norm_in_front:
                    x = _layer_norm()(x)
            else:
                x = conv

            # second FF
            if self.ff_factor1 > 0:
                x = x + self.ff_factor1 * self._ff(x, act, det, d_model)
                if not self.layer_norm_in_front:
                    x = _layer_norm()(x)
        return x


def _attention_kwargs(model_config: dict) -> dict:
    ff_factor0 = model_config["ff_factor0"]
    ff_factor1 = model_config["ff_factor1"]
    ff_kernel_size = model_config["ff_kernel_size"]
    ff_multiplier = model_config["ff_multiplier"]
    pos_encoding = model_config.get("pos_encoding", "basic")
    abs_pos_encoding = model_config.get("abs_pos_encoding", False)

    if ff_factor0 < 0 or ff_factor1 < 0:
        raise ValueError("ff_factor0, ff_factor1 >= 0 must hold")
    if ff_factor0 == 0 and ff_factor1 == 0:
        if ff_kernel_size > 0:
            raise ValueError("if FF modules are not used, "
                             "ff_kernel must be set to 0")
        if ff_multiplier > 0:
            raise ValueError("if FF modules are not used, "
                             "ff_multiplier must be set to 0")
    if not abs_pos_encoding and pos_encoding is None:
        raise ValueError("relative pos encoding demands any types of encoding "
                         "except the null one")

    return dict(
        key_dim=model_config["key_dim"],
        n_head=model_config["n_head"],
        kernel_size=model_config["kernel_size"],
        ff_kernel_size=ff_kernel_size,
        ff_multiplier=ff_multiplier,
        ff_factor0=ff_factor0,
        ff_factor1=ff_factor1,
        activation=model_config.get("activation", "swish"),
        pos_encoding=pos_encoding,
        abs_pos_encoding=abs_pos_encoding,
        layer_norm_in_front=model_config.get("layer_norm_in_front", False),
        use_glu=model_config.get("use_glu", False),
        use_bias=model_config.get("use_bias", False),
        dropout_rate=model_config.get("dropout_rate", 0.1),
    )


@register_block("attention_block")
def attention_block(model_config: dict):
    return AttentionBlock(**_attention_kwargs(model_config))


@register_block("attention_stage")
def attention_stage(model_config: dict):
    return AttentionBlock(**_attention_kwargs(model_config),
                          depth=model_config["depth"])


# --------------------------------------------------------------------------
#                      LEGACY CONV FAMILIES (SURVEY §2 gap)
# --------------------------------------------------------------------------
class SimpleConvBlock(nn.Module):
    """Classic SELDnet conv stack: [conv3x3-BN-relu-maxpool-dropout] x N."""
    filters: Tuple[int, ...]
    pool_size: Tuple[Tuple[int, int], ...]
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f, pool in zip(self.filters, self.pool_size):
            x = Conv2DBN(f, 3, activation="relu")(x, train=train)
            x = max_pool(x, _tuple2(pool), strides=_tuple2(pool))
            if self.dropout_rate > 0:
                x = Dropout(self.dropout_rate)(x, deterministic=not train)
        return x


@register_block("simple_conv_block")
def simple_conv_block(model_config: dict):
    return SimpleConvBlock(
        filters=tuple(model_config["filters"]),
        pool_size=tuple(_tuple2(p) for p in model_config["pool_size"]),
        dropout_rate=model_config.get("dropout_rate", 0.0),
    )


class CondConvBlock(nn.Module):
    """Conditionally-parameterized conv stack (CondConv, arXiv 1904.04971).

    Per-sample sigmoid routing over `num_experts` conv kernels; since conv is
    linear, the expert mix is computed as a mix of expert outputs.
    """
    filters: Tuple[int, ...]
    pool_size: Tuple[Tuple[int, int], ...]
    dropout_rate: float = 0.0
    num_experts: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f, pool in zip(self.filters, self.pool_size):
            route = jnp.mean(x, axis=(1, 2))                   # [B, C]
            route = jax.nn.sigmoid(_dense(self.num_experts)(route))  # [B, K]
            experts = jnp.stack(
                [_conv(f, 3)(x) for _ in range(self.num_experts)], axis=-1)
            x = jnp.einsum("bhwck,bk->bhwc", experts, route)
            x = BatchNorm()(x, train=train)
            x = jax.nn.relu(x)
            x = max_pool(x, _tuple2(pool), strides=_tuple2(pool))
            if self.dropout_rate > 0:
                x = Dropout(self.dropout_rate)(x, deterministic=not train)
        return x


@register_block("cond_conv_block")
def cond_conv_block(model_config: dict):
    return CondConvBlock(
        filters=tuple(model_config["filters"]),
        pool_size=tuple(_tuple2(p) for p in model_config["pool_size"]),
        dropout_rate=model_config.get("dropout_rate", 0.0),
        num_experts=model_config.get("num_experts", 4),
    )


class AnotherConvBlock(nn.Module):
    """depth x [conv3x3-BN-relu] then maxpool (conv_temp.json BLOCK1 schema)."""
    filters: int
    depth: int
    pool_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.depth):
            x = Conv2DBN(self.filters, 3, activation="relu")(x, train=train)
        return max_pool(x, _tuple2(self.pool_size),
                           strides=_tuple2(self.pool_size))


@register_block("another_conv_block")
def another_conv_block(model_config: dict):
    return AnotherConvBlock(model_config["filters"], model_config["depth"],
                            _tuple2(model_config["pool_size"]))


class ResBasicStage(nn.Module):
    """ResNet-v1 basic stage: depth blocks, strided projection on the first."""
    filters: int
    depth: int
    strides: Tuple[int, int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            strides = self.strides if i == 0 else (1, 1)
            shortcut = x
            out = Conv2DBN(self.filters, 3, strides=strides,
                           activation="relu")(x, train=train)
            out = BatchNorm()(_conv(self.filters, 3)(out), train=train)
            if shortcut.shape[-3:] != out.shape[-3:]:
                shortcut = BatchNorm()(
                    _conv(self.filters, 1, strides=strides)(shortcut),
                    train=train)
            x = jax.nn.relu(out + shortcut)
        return x


@register_block("res_basic_stage")
def res_basic_stage(model_config: dict):
    return ResBasicStage(model_config["filters"], model_config["depth"],
                         _tuple2(model_config["strides"]))


class ResBottleneckStage(nn.Module):
    """ResNet bottleneck stage: 1x1 -> 3x3 -> 1x1 (x expansion)."""
    filters: int
    depth: int
    strides: Tuple[int, int]
    bottleneck_ratio: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.filters * self.bottleneck_ratio
        for i in range(self.depth):
            strides = self.strides if i == 0 else (1, 1)
            shortcut = x
            out = Conv2DBN(self.filters, 1, activation="relu")(x, train=train)
            out = Conv2DBN(self.filters, 3, strides=strides,
                           activation="relu")(out, train=train)
            out = BatchNorm()(_conv(out_ch, 1)(out), train=train)
            if shortcut.shape[-3:] != out.shape[-3:]:
                shortcut = BatchNorm()(
                    _conv(out_ch, 1, strides=strides)(shortcut), train=train)
            x = jax.nn.relu(out + shortcut)
        return x


@register_block("res_bottleneck_stage")
def res_bottleneck_stage(model_config: dict):
    return ResBottleneckStage(
        model_config["filters"], model_config["depth"],
        _tuple2(model_config["strides"]),
        model_config.get("bottleneck_ratio", 4))


class DenseNetStage(nn.Module):
    """One DenseNet stage (growth_rate schema, conv_temp.json BLOCK2):
    depth x [BN-relu-1x1(bottleneck) -> BN-relu-3x3(growth), concat], then a
    reduction transition with strided average pool."""
    growth_rate: int
    depth: int
    strides: Tuple[int, int]
    bottleneck_ratio: float = 4.0
    reduction_ratio: Optional[float] = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.depth):
            out = jax.nn.relu(BatchNorm()(x, train=train))
            out = _conv(int(self.bottleneck_ratio * self.growth_rate), 1,
                        use_bias=False)(out)
            out = jax.nn.relu(BatchNorm()(out, train=train))
            out = _conv(self.growth_rate, 3, use_bias=False)(out)
            x = jnp.concatenate([x, out], axis=-1)
        if self.reduction_ratio is not None:
            x = jax.nn.relu(BatchNorm()(x, train=train))
            x = _conv(int(x.shape[-1] * self.reduction_ratio), 1,
                      use_bias=False)(x)
            strides = _tuple2(self.strides)
            if strides != (1, 1):
                x = nn.avg_pool(x, strides, strides=strides)
        return x


class DenseNetBody(nn.Module):
    """DenseNet-121-style body (filters + block_num schema, dense_gru.json):
    stem conv + time-pool, then len(block_num) dense stages with transitions."""
    filters: int
    block_num: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2DBN(self.filters, 7, activation="relu")(x, train=train)
        x = max_pool(x, (5, 2), strides=(5, 2))
        growth = max(self.filters // 2, 8)
        for i, depth in enumerate(self.block_num):
            last = i == len(self.block_num) - 1
            x = DenseNetStage(
                growth_rate=growth, depth=depth, strides=(1, 2),
                reduction_ratio=None if last else 0.5)(x, train=train)
        x = jax.nn.relu(BatchNorm()(x, train=train))
        return x


@register_block("dense_net_block")
def dense_net_block(model_config: dict):
    if "block_num" in model_config:
        return DenseNetBody(model_config["filters"],
                            tuple(model_config["block_num"]))
    return DenseNetStage(
        growth_rate=model_config["growth_rate"],
        depth=model_config["depth"],
        strides=_tuple2(model_config.get("strides", (1, 1))),
        bottleneck_ratio=model_config.get("bottleneck_ratio", 4.0),
        reduction_ratio=model_config.get("reduction_ratio", 0.5),
    )


class ResNet50Body(nn.Module):
    """ResNet50-style body (resnet50_gru.json): stem + 4 bottleneck stages."""
    filters: int
    block_num: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2DBN(self.filters, 7, activation="relu")(x, train=train)
        x = max_pool(x, (5, 2), strides=(5, 2))
        for i, depth in enumerate(self.block_num):
            x = ResBottleneckStage(
                self.filters * (2 ** i), depth,
                (1, 1) if i == 0 else (1, 2))(x, train=train)
        return x


@register_block("resnet50_block")
def resnet50_block(model_config: dict):
    return ResNet50Body(model_config["filters"],
                        tuple(model_config["block_num"]))


class SeparableConvBN(nn.Module):
    filters: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(x.shape[-1], self.kernel_size, groups=x.shape[-1],
                  use_bias=False)(x)
        x = _conv(self.filters, 1, use_bias=False)(x)
        return BatchNorm()(x, train=train)


class XceptionBody(nn.Module):
    """Xception-style body (xception_gru.json): stem + entry reductions +
    block_num middle-flow residual separable-conv blocks."""
    filters: int
    block_num: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2DBN(self.filters, 3, activation="relu")(x, train=train)
        x = max_pool(x, (5, 2), strides=(5, 2))
        width = self.filters * 4

        # entry: two strided separable reductions with conv shortcuts
        for f in (self.filters * 2, width):
            shortcut = BatchNorm()(_conv(f, 1, strides=(1, 2))(x), train=train)
            out = jax.nn.relu(SeparableConvBN(f)(x, train=train))
            out = SeparableConvBN(f)(out, train=train)
            out = max_pool(out, (1, 3), strides=(1, 2), padding="SAME")
            x = out + shortcut

        # middle flow
        for _ in range(self.block_num):
            out = x
            for _ in range(3):
                out = SeparableConvBN(width)(jax.nn.relu(out), train=train)
            x = x + out
        return jax.nn.relu(x)


@register_block("xception_block")
def xception_block(model_config: dict):
    return XceptionBody(model_config["filters"], model_config["block_num"])


# --------------------------------------------------------------------------
#                      BEYOND-PARITY: TEMPORAL CONV (SELD-TCN)
# --------------------------------------------------------------------------
class TCNStage(nn.Module):
    """Dilated temporal-conv stage (SELD-TCN, arXiv 2003.01609).

    depth x [dilated Conv1D -> BN -> (tanh x sigmoid gate) -> 1x1 residual],
    dilation doubling per block; skip connections summed and projected.
    Not in the reference — added as a beyond-parity model family; TCNs trade
    the GRU's serial scan for fully parallel convs, which TPUs prefer.
    """
    filters: int
    depth: int = 3
    kernel_size: int = 3
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = force_1d(x)
        if x.shape[-1] != self.filters:
            x = _conv1d(self.filters, 1)(x)
        skips = 0.0
        for i in range(self.depth):
            dilation = 2 ** i
            conv = nn.Conv(2 * self.filters, (self.kernel_size,),
                           padding="SAME", kernel_dilation=(dilation,),
                           kernel_init=glorot(), bias_init=zeros_init)(x)
            conv = BatchNorm()(conv, train=train)
            gate_in, gate = jnp.split(conv, 2, axis=-1)
            conv = jnp.tanh(gate_in) * jax.nn.sigmoid(gate)
            if self.dropout_rate > 0:
                conv = Dropout(self.dropout_rate)(
                    conv, deterministic=not train)
            res = _conv1d(self.filters, 1)(conv)
            skips = skips + _conv1d(self.filters, 1)(conv)
            x = x + res
        return jax.nn.relu(skips)


@register_block("tcn_stage")
def tcn_stage(model_config: dict):
    return TCNStage(
        filters=model_config["filters"],
        depth=model_config.get("depth", 3),
        kernel_size=model_config.get("kernel_size", 3),
        dropout_rate=model_config.get("dropout_rate", 0.0),
    )


# --------------------------------------------------------------------------
#                               IDENTITY
# --------------------------------------------------------------------------
class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


@register_block("identity_block")
def identity_block(model_config: dict):
    return Identity()
