"""Primitive layers (flax.linen).

TPU-first re-designs of the reference layer set (layers.py):
  - conv2d_bn                 layers.py:14-38
  - force_1d                  layers.py:41-47
  - basic/rff pos encodings   layers.py:53-83
  - MultiHeadAttention        layers.py:102-329 (per-head Q/K/V kernels)
  - RelPositionMultiHeadAttention  layers.py:332-392 (Transformer-XL shift)
plus fused GRU/LSTM recurrences (the reference leans on cuDNN via Keras;
here the input projection for the whole sequence is one large MXU matmul and
only the [B, U] @ [U, 3U] recurrence lives inside `lax.scan` — bidirectional
runs both directions in a single scan over a doubled batch).

Keras-default parity choices: glorot_uniform kernels, zero biases,
orthogonal recurrent kernels, BatchNorm(momentum=0.99, eps=1e-3).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.ops.dropout import Dropout

Dtype = Any

glorot = nn.initializers.glorot_uniform
zeros_init = nn.initializers.zeros
orthogonal = nn.initializers.orthogonal


def get_activation(name: Optional[Union[str, Callable]]) -> Optional[Callable]:
    """Keras-style activation-name resolution."""
    if name is None or callable(name):
        return name
    table = {
        "relu": jax.nn.relu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "swish": jax.nn.silu,
        "silu": jax.nn.silu,
        "gelu": jax.nn.gelu,
        "elu": jax.nn.elu,
        "softmax": jax.nn.softmax,
        "linear": None,
    }
    if name not in table:
        raise ValueError(f"unknown activation: {name!r}")
    return table[name]


def merge_bidirectional(fwd, bwd, merge_mode: str):
    """Bidirectional RNN merge (Keras Bidirectional merge_mode semantics);
    shared by the scan GRU/LSTM paths and the Pallas recurrence."""
    if merge_mode == "mul":
        return fwd * bwd
    if merge_mode == "concat":
        return jnp.concatenate([fwd, bwd], axis=-1)
    if merge_mode in ("ave", "avg"):
        return (fwd + bwd) * 0.5
    if merge_mode == "sum":
        return fwd + bwd
    raise ValueError(f"unknown merge_mode: {merge_mode!r}")


def pad_channels_for_mxu(x, kernel):
    """Zero-pad the input's channel dim and the kernel's input-channel dim
    to the fp32 sublane tile (8) on TPU — bit-identical results (the extra
    products are exact zeros) but aligned conv and conv-gradient kernels.
    Shared by layers.Conv and the fused stem (ops/stem.py) so the alignment
    rule cannot drift between the composed and fused paths."""
    if jax.default_backend() in ("tpu", "axon") and x.shape[-1] % 8:
        extra = 8 - x.shape[-1] % 8
        x = jnp.pad(x, (*((0, 0),) * (x.ndim - 1), (0, extra)))
        kernel = jnp.pad(
            kernel, (*((0, 0),) * (kernel.ndim - 2), (0, extra), (0, 0)))
    return x, kernel


class Conv(nn.Module):
    """Channels-last 1D/2D conv with MXU channel alignment.

    Drop-in replacement for flax ``nn.Conv`` at this package's call sites,
    with identical parameter names and shapes (``kernel`` [*k, in/groups,
    out], ``bias`` [out]) — checkpoints and the TF-parity weight mapping are
    unaffected. On TPU, when the per-group input channel count is not a
    multiple of 8 (the fp32 sublane tile), both the input and the kernel are
    zero-padded up to the next multiple before the conv: results are
    bit-identical (the extra products are exact zeros) but XLA's conv and
    conv-gradient kernels run on aligned shapes. Measured on the 7-channel
    DCASE stem: ~+4% whole-step throughput (BASELINE.md round-2 table).
    """
    features: int
    kernel_size: Tuple[int, ...]
    strides: Optional[Tuple[int, ...]] = None
    padding: str = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        ksize = tuple(self.kernel_size)
        in_ch = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel", glorot(),
                            (*ksize, in_ch, self.features))
        bias = (self.param("bias", zeros_init, (self.features,))
                if self.use_bias else None)
        if return_params:
            # fused ops drive the conv themselves; x was only needed for
            # shape inference
            return kernel, bias
        strides = tuple(self.strides) if self.strides else (1,) * len(ksize)

        dt = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dt)
        kernel = kernel.astype(dt)

        if self.feature_group_count == 1:
            x, kernel = pad_channels_for_mxu(x, kernel)

        if len(ksize) == 2:
            dn = ("NHWC", "HWIO", "NHWC")
        else:
            dn = ("NWC", "WIO", "NWC")
        y = jax.lax.conv_general_dilated(
            x, kernel, strides, self.padding.upper(),
            dimension_numbers=dn,
            feature_group_count=self.feature_group_count)
        if bias is not None:
            y = y + bias.astype(dt)
        return y


class BatchNorm(nn.Module):
    """BatchNorm with Keras defaults (momentum 0.99, epsilon 1e-3).

    Native implementation of flax ``nn.BatchNorm`` semantics (f32 batch
    statistics, biased variance, running update ``ra = m*ra + (1-m)*batch``,
    f32 intermediate math with the result cast back to the promoted input/
    param dtype). Implemented natively — rather than wrapping nn.BatchNorm —
    so fused ops can drive it: pass ``fused=closure`` where
    ``closure(scale, bias) -> (out, batch_mean, batch_var)`` performs the
    whole computation (e.g. the fused stem, seld_tpu.ops.stem); this module
    then only owns the parameter/running-stat bookkeeping.
    """
    momentum: float = 0.99
    epsilon: float = 1e-3
    axis: int = -1
    features: Optional[int] = None  # required for fused mode (x is None)

    @nn.compact
    def __call__(self, x, train: bool = False, fused=None):
        if self.axis != -1:
            raise NotImplementedError("channels-last only")
        c = self.features if fused is not None else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        def update_ra(mean, var):
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        if fused is not None:
            out, mean, var = fused(scale, bias)
            update_ra(mean, var)
            return out

        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=tuple(range(x.ndim - 1)))
            var = (jnp.mean(jnp.square(xf), axis=tuple(range(x.ndim - 1)))
                   - jnp.square(mean))
            update_ra(mean, var)
        else:
            mean, var = ra_mean.value, ra_var.value

        out_dtype = jnp.promote_types(x.dtype, scale.dtype)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        y = (x.astype(jnp.float32) - mean) * inv + bias.astype(jnp.float32)
        return y.astype(out_dtype)


class Conv2DBN(nn.Module):
    """Conv2D + BatchNorm + activation (layers.py:14-38).

    With ``pool`` set, a non-overlapping max pool follows the activation
    (the conv_temporal stem, reference models.py:66-67) — and in train mode
    on TPU the whole conv+BN+ReLU+pool runs through the fused op with the
    hand-scheduled backward (seld_tpu.ops.stem), worth ~2x on the stem's
    share of the SS5 step. The composed path is numerically the reference
    (identical formulas); only pool-tie gradient routing differs (see
    ops/stem.py docstring).
    """
    filters: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Union[int, Tuple[int, int]] = (1, 1)
    padding: str = "SAME"
    groups: int = 1
    use_bias: bool = True
    activation: Optional[str] = "relu"
    pool: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from seld_tpu.ops.stem import conv_bn_relu_pool, fused_stem_applicable

        ks = self.kernel_size
        ks = (ks, ks) if isinstance(ks, int) else tuple(ks)
        st = self.strides
        st = (st, st) if isinstance(st, int) else tuple(st)
        conv = Conv(self.filters, ks, strides=st,
                    padding=self.padding.upper(),
                    feature_group_count=self.groups, use_bias=self.use_bias)

        use_fused = (self.pool is not None and train and self.use_bias
                     and fused_stem_applicable(
                         x.shape, self.pool, st, self.padding, self.groups,
                         self.activation))
        if use_fused:
            kernel, cbias = conv(x, return_params=True)

            def fused(scale, bbias):
                return conv_bn_relu_pool(x, kernel, cbias, scale, bbias,
                                         tuple(self.pool), 1e-3)

            return BatchNorm(features=self.filters)(None, train=True,
                                                    fused=fused)

        x = conv(x)
        x = BatchNorm()(x, train=train)
        act = get_activation(self.activation)
        if act:
            x = act(x)
        if self.pool is not None:
            from seld_tpu.ops.pooling import max_pool
            # VALID, like Keras MaxPooling2D's default (models.py:66-67) —
            # SAME would emit an extra frame for non-divisible spatial dims
            x = max_pool(x, tuple(self.pool), strides=tuple(self.pool),
                         padding="VALID")
        return x


def force_1d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, T, F, C] -> [B, T, F*C]; passthrough for 3D (layers.py:41-47)."""
    if x.ndim == 4:
        return x.reshape(x.shape[0], x.shape[1], x.shape[2] * x.shape[3])
    return x


def basic_pos_encoding(time: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal encoding [1, time, d_model], cos/sin interleaved
    (layers.py:53-67: stack([cos, sin], -1) then flatten)."""
    k = d_model // 2
    w = np.power(10000.0, -np.arange(k) / k)[None, :]       # [1, k]
    t = np.arange(time, dtype=np.float64)[:, None]          # [time, 1]
    enc = np.stack([np.cos(w * t), np.sin(w * t)], axis=-1)  # [time, k, 2]
    return jnp.asarray(enc.reshape(1, time, 2 * k), dtype)


class RFFPosEncoding(nn.Module):
    """Random-Fourier-feature encoding [1, time, d_model] (layers.py:70-83).

    The random projection is a fixed (non-trained) draw; stored as a param
    with stop_gradient so optimizers never move it.
    """
    d_model: int

    @nn.compact
    def __call__(self, time: int, dtype=jnp.float32):
        k = self.d_model // 2
        w = self.param("w", nn.initializers.normal(1.0), (1, 1, k))
        w = jax.lax.stop_gradient(w)
        t = jnp.arange(time, dtype=dtype).reshape(1, -1, 1)
        return jnp.concatenate([jnp.cos(w * t), jnp.sin(w * t)], axis=-1)


class MultiHeadAttention(nn.Module):
    """MHA with per-head Q/K/V/projection kernels (layers.py:102-329 parity).

    Input: (query, key, value) each [..., T, I]. Per-head kernels of shape
    [H, I, S]; query is pre-scaled by 1/sqrt(S) before the logits einsum.
    """
    num_heads: int
    head_size: int
    output_size: Optional[int] = None
    dropout: float = 0.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, query, key, value, deterministic: bool = True, mask=None):
        out_size = self.output_size or value.shape[-1]
        h, s = self.num_heads, self.head_size

        qk = self.param("query_kernel", glorot(), (h, query.shape[-1], s))
        kk = self.param("key_kernel", glorot(), (h, key.shape[-1], s))
        vk = self.param("value_kernel", glorot(), (h, value.shape[-1], s))
        pk = self.param("projection_kernel", glorot(), (h, s, out_size))

        # head-major choreography: q/k/v land in [..., H, T, S] once, and
        # every later contraction treats (batch..., H) as uniform leading
        # batch dims — XLA then lowers logits/attend/proj as batched dots
        # with NO inter-op relayouts (the [..., T, H, S] form cost ~0.8
        # ms/step of layout copies around the attention family, round-3
        # trace; same math and parameters, einsum order only)
        q = jnp.einsum("...NI,HIO->...HNO", query, qk)
        k = jnp.einsum("...MI,HIO->...HMO", key, kk)
        v = jnp.einsum("...MI,HIO->...HMO", value, vk)
        if self.use_bias:
            q = q + self.param("q_bias", zeros_init, (h, s))[:, None]
            k = k + self.param("k_bias", zeros_init, (h, s))[:, None]
            v = v + self.param("v_bias", zeros_init, (h, s))[:, None]

        q = q / jnp.sqrt(jnp.asarray(s, q.dtype))
        logits = jnp.einsum("...HNO,...HMO->...HNM", q, k)
        return self._attend(logits, v, pk, out_size, deterministic, mask)

    def _attend(self, logits, v, pk, out_size, deterministic, mask):
        if mask is not None:
            if mask.ndim != logits.ndim:
                mask = mask[..., None, :, :]
            logits = logits + -1e9 * (1.0 - mask.astype(logits.dtype))
        attn = jax.nn.softmax(logits)
        attn = Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("...HNM,...HMI->...HNI", attn, v)
        out = jnp.einsum("...HNI,HIO->...NO", out, pk)
        if self.use_bias:
            out = out + self.param("projection_bias", zeros_init, (out_size,))
        return out


class RelPositionMultiHeadAttention(nn.Module):
    """Transformer-XL-style relative-position MHA (layers.py:332-392).

    Input: (query, key, value, pos) with pos [1, T_pos, P]. Logits =
    (q + u)·k + rel_shift((q + v)·pos·W_pos), scaled by 1/sqrt(S) after the
    sum — matching the reference's scaling placement, which differs from the
    absolute-position variant (it scales q before the product).
    """
    num_heads: int
    head_size: int
    output_size: Optional[int] = None
    dropout: float = 0.0
    use_bias: bool = True

    @staticmethod
    def relative_shift(x):
        # x: [B, H, N, M] -> shifted so diagonal indexing becomes relative
        b, h, n, m = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
        x = x.reshape(b, h, m + 1, n)
        return x[:, :, 1:, :].reshape(b, h, n, m)

    @nn.compact
    def __call__(self, query, key, value, pos, deterministic: bool = True,
                 mask=None):
        out_size = self.output_size or value.shape[-1]
        h, s = self.num_heads, self.head_size

        qk = self.param("query_kernel", glorot(), (h, query.shape[-1], s))
        kk = self.param("key_kernel", glorot(), (h, key.shape[-1], s))
        vk = self.param("value_kernel", glorot(), (h, value.shape[-1], s))
        pk = self.param("projection_kernel", glorot(), (h, s, out_size))
        posk = self.param("pos_kernel", glorot(), (h, pos.shape[-1], s))
        bias_u = self.param("pos_bias_u", glorot(), (h, s))
        bias_v = self.param("pos_bias_v", glorot(), (h, s))

        # head-major layout, as in MultiHeadAttention: (batch..., H) are
        # uniform leading batch dims for every contraction (no relayouts)
        q = jnp.einsum("...NI,HIO->...HNO", query, qk)
        k = jnp.einsum("...MI,HIO->...HMO", key, kk)
        v = jnp.einsum("...MI,HIO->...HMO", value, vk)
        if self.use_bias:
            q = q + self.param("q_bias", zeros_init, (h, s))[:, None]
            k = k + self.param("k_bias", zeros_init, (h, s))[:, None]
            v = v + self.param("v_bias", zeros_init, (h, s))[:, None]

        p = jnp.einsum("...MI,HIO->...HMO", pos, posk)

        logits_u = jnp.einsum("...HNO,...HMO->...HNM", q + bias_u[:, None], k)
        logits_v = jnp.einsum("...HNO,...HMO->...HNM", q + bias_v[:, None], p)
        logits_v = self.relative_shift(logits_v)
        logits = logits_u + logits_v[..., : logits_u.shape[-1]]
        logits = logits / jnp.sqrt(jnp.asarray(s, logits.dtype))

        if mask is not None:
            if mask.ndim != logits.ndim:
                mask = mask[..., None, :, :]
            logits = logits + -1e9 * (1.0 - mask.astype(logits.dtype))
        attn = jax.nn.softmax(logits)
        attn = Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("...HNM,...HMI->...HNI", attn, v)
        out = jnp.einsum("...HNI,HIO->...NO", out, pk)
        if self.use_bias:
            out = out + self.param("projection_bias", zeros_init, (out_size,))
        return out


class GRU(nn.Module):
    """Fused (bi)directional GRU over [B, T, I] -> [B, T, U*dirs or U].

    Keras GRU v2 semantics (reset_after=True): kernel [I, 3U] (z|r|h order
    follows Keras), recurrent kernel [U, 3U], bias [2, 3U]. The whole-sequence
    input projection is one [B*T, I] @ [I, 3U] MXU matmul; the scan body does
    only the [B, U] @ [U, 3U] recurrence. Bidirectional doubles the scan batch
    (fwd + time-reversed) instead of running two scans.

    merge_mode: 'mul' (reference default, modules.py:316), 'concat', 'ave', 'sum'.

    Dropout follows Keras GRU implementation=1 semantics — the mode Keras
    itself forces whenever recurrent_dropout > 0, which the reference's GRU
    blocks always set (modules.py:313-314 pass
    recurrent_dropout=dropout_rate): one Bernoulli mask per gate (z|r|h),
    constant across timesteps, sampled per direction, applied to that
    gate's input projection; recurrent_dropout applies per-gate masks to
    h_{t-1} inside the recurrence. Active recurrent dropout falls back to
    the scan path (as Keras disables cuDNN). Every shipped config uses 0.0.
    """
    units: int
    bidirectional: bool = False
    merge_mode: str = "mul"
    dropout: float = 0.0
    recurrent_dropout: float = 0.0
    unroll: int = 1
    # None = auto: fused Pallas recurrence kernel on TPU for tile-aligned
    # shapes (seld_tpu.ops.pallas.gru), lax.scan otherwise
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        u = self.units
        i = x.shape[-1]
        dirs = 2 if self.bidirectional else 1

        # batch_axis=0: glorot fans computed per direction ([I, 3U]), as
        # Keras Bidirectional initializes each direction separately — the
        # default would treat dirs as receptive field and halve the variance
        kernel = self.param("kernel", glorot(batch_axis=0),
                            (dirs, i, 3 * u))
        rec_kernel = self.param("recurrent_kernel", orthogonal(), (dirs, u, 3 * u))
        bias = self.param("bias", zeros_init, (dirs, 2, 3 * u))

        # Keras-style dropout: per-gate masks [D, 3, B, 1, I], constant
        # across the time axis (the broadcast 1)
        gate_masks = None
        if self.dropout > 0.0 and not deterministic:
            keep = 1.0 - self.dropout
            gate_masks = (jax.random.bernoulli(
                self.make_rng("dropout"), keep,
                (dirs, 3, x.shape[0], 1, i)).astype(x.dtype) / keep)
        rec_masks = None
        if self.recurrent_dropout > 0.0 and not deterministic:
            keep = 1.0 - self.recurrent_dropout
            rec_masks = (jax.random.bernoulli(
                self.make_rng("dropout"), keep,
                (dirs, 3, x.shape[0], u)).astype(x.dtype) / keep)

        use_pallas = self.use_pallas
        if use_pallas is None:
            import os
            from seld_tpu.ops.pallas.gru import pallas_gru_applicable
            use_pallas = (os.environ.get("SELD_NO_PALLAS_GRU", "0") != "1"
                          and jax.default_backend() in ("tpu", "axon")
                          and pallas_gru_applicable(x.shape[0], u))
        if rec_masks is not None:
            use_pallas = False  # recurrence is masked inside the step
        if use_pallas:
            from seld_tpu.ops.pallas.gru import gru_forward
            return gru_forward(x, kernel, rec_kernel, bias,
                               bidirectional=self.bidirectional,
                               merge_mode=self.merge_mode,
                               gate_masks=gate_masks)

        b, t, _ = x.shape
        if self.bidirectional:
            x2 = jnp.stack([x, x[:, ::-1]], axis=0)         # [2, B, T, I]
        else:
            x2 = x[None]                                    # [1, B, T, I]

        # one big input projection for all timesteps / both directions
        if gate_masks is None:
            x_proj = jnp.einsum("dbti,dik->dbtk", x2, kernel)
        else:
            # masks are time-constant, so the d=1 (time-reversed) direction
            # needs no mask reversal
            x_proj = jnp.concatenate([
                jnp.einsum("dbti,diu->dbtu", x2 * gate_masks[:, g],
                           kernel[:, :, g * u:(g + 1) * u])
                for g in range(3)], axis=-1)
        x_proj = x_proj + bias[:, None, None, 0]
        # recurrent bias (applied to h @ rec_kernel each step)
        rec_bias = bias[:, None, 1]                          # [D, 1, 3U]

        x_proj = jnp.moveaxis(x_proj, 2, 0)                 # [T, D, B, 3U]

        def step(h, xp):
            # h: [D, B, U]; xp: [D, B, 3U]
            if rec_masks is None:
                hp = jnp.einsum("dbu,duk->dbk", h, rec_kernel) + rec_bias
            else:
                hp = jnp.concatenate([
                    jnp.einsum("dbu,duk->dbk", h * rec_masks[:, g],
                               rec_kernel[:, :, g * u:(g + 1) * u])
                    for g in range(3)], axis=-1) + rec_bias
            xz, xr, xh = jnp.split(xp, 3, axis=-1)
            hz, hr, hh = jnp.split(hp, 3, axis=-1)
            z = jax.nn.sigmoid(xz + hz)
            r = jax.nn.sigmoid(xr + hr)
            hcand = jnp.tanh(xh + r * hh)
            h_new = z * h + (1.0 - z) * hcand
            return h_new, h_new

        h0 = jnp.zeros((dirs, b, u), x.dtype)
        _, hs = jax.lax.scan(step, h0, x_proj,
                             unroll=self.unroll)           # [T, D, B, U]
        hs = jnp.moveaxis(hs, 0, 2)                         # [D, B, T, U]

        if not self.bidirectional:
            return hs[0]
        fwd, bwd = hs[0], hs[1][:, ::-1]
        return merge_bidirectional(fwd, bwd, self.merge_mode)


class LSTM(nn.Module):
    """Fused (bi)directional LSTM, Keras gate order (i|f|c|o), unit forget
    bias. Dropout follows Keras implementation=1 semantics: one mask per
    gate, constant across timesteps, per direction; recurrent_dropout masks
    h_{t-1} per gate inside the recurrence (as in GRU above)."""
    units: int
    bidirectional: bool = False
    merge_mode: str = "mul"
    dropout: float = 0.0
    recurrent_dropout: float = 0.0
    unroll: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        u = self.units
        i = x.shape[-1]
        dirs = 2 if self.bidirectional else 1

        def forget_one_bias(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            return b.at[..., u:2 * u].set(1.0)

        kernel = self.param("kernel", glorot(batch_axis=0),  # per-direction fans
                            (dirs, i, 4 * u))
        rec_kernel = self.param("recurrent_kernel", orthogonal(), (dirs, u, 4 * u))
        bias = self.param("bias", forget_one_bias, (dirs, 4 * u))

        gate_masks = None
        if self.dropout > 0.0 and not deterministic:
            keep = 1.0 - self.dropout
            gate_masks = (jax.random.bernoulli(
                self.make_rng("dropout"), keep,
                (dirs, 4, x.shape[0], 1, i)).astype(x.dtype) / keep)
        rec_masks = None
        if self.recurrent_dropout > 0.0 and not deterministic:
            keep = 1.0 - self.recurrent_dropout
            rec_masks = (jax.random.bernoulli(
                self.make_rng("dropout"), keep,
                (dirs, 4, x.shape[0], u)).astype(x.dtype) / keep)

        b, t, _ = x.shape
        x2 = jnp.stack([x, x[:, ::-1]], axis=0) if self.bidirectional else x[None]
        if gate_masks is None:
            x_proj = jnp.einsum("dbti,dik->dbtk", x2, kernel)
        else:
            x_proj = jnp.concatenate([
                jnp.einsum("dbti,diu->dbtu", x2 * gate_masks[:, g],
                           kernel[:, :, g * u:(g + 1) * u])
                for g in range(4)], axis=-1)
        x_proj = x_proj + bias[:, None, None]
        x_proj = jnp.moveaxis(x_proj, 2, 0)                 # [T, D, B, 4U]

        def step(carry, xp):
            h, c = carry
            if rec_masks is None:
                hp = jnp.einsum("dbu,duk->dbk", h, rec_kernel)
            else:
                hp = jnp.concatenate([
                    jnp.einsum("dbu,duk->dbk", h * rec_masks[:, g],
                               rec_kernel[:, :, g * u:(g + 1) * u])
                    for g in range(4)], axis=-1)
            gates = xp + hp
            gi, gf, gc, go = jnp.split(gates, 4, axis=-1)
            gi, gf, go = jax.nn.sigmoid(gi), jax.nn.sigmoid(gf), jax.nn.sigmoid(go)
            c_new = gf * c + gi * jnp.tanh(gc)
            h_new = go * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        init = (jnp.zeros((dirs, b, u), x.dtype), jnp.zeros((dirs, b, u), x.dtype))
        _, hs = jax.lax.scan(step, init, x_proj, unroll=self.unroll)
        hs = jnp.moveaxis(hs, 0, 2)

        if not self.bidirectional:
            return hs[0]
        fwd, bwd = hs[0], hs[1][:, ::-1]
        return merge_bidirectional(fwd, bwd, self.merge_mode)
