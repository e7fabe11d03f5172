"""Model builders (reference models.py).

Each model is a flax module built from a JSON-style model_config dict whose
block names dispatch through the registry — the same architecture DSL as the
reference (models.py:24-29). All SELD models output (sed [B, T', C],
doa [B, T', 3C]).

  - seldnet        models.py:18-32
  - seldnet_v1     models.py:35-51  (doa gated by tiled sed, then tanh)
  - conv_temporal  models.py:54-78  (stem conv+pool, sorted BLOCK0..N) — the
                                     NAS/challenge model
  - vad_architecture                models.py:81-102
  - spectro_temporal_attention_based_VAD  models.py:105-163
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from seld_tpu.ops.dropout import Dropout

from seld_tpu.ops.pooling import max_pool
from seld_tpu.config.registry import register_model, get_block, get_model
from seld_tpu.models.layers import BatchNorm, Conv2DBN, force_1d
from seld_tpu.utils import sorted_block_keys
from seld_tpu.models import modules  # noqa: F401  (registers blocks)


def _apply_block(name: str, args: dict, x, train: bool):
    return get_block(name)(args)(x, train=train)


class SELDHeads(nn.Module):
    """Shared SED/DOA head structure: block -> Dense(sigmoid) / Dense(tanh)."""
    model_config: Dict[str, Any]
    n_classes: int
    gate_doa_with_sed: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.model_config
        sed = _apply_block(cfg["SED"], cfg["SED_ARGS"], x, train)
        sed = nn.Dense(self.n_classes, kernel_init=nn.initializers.glorot_uniform(),
                       name="sed_out")(sed)
        sed = jax.nn.sigmoid(sed)

        doa = _apply_block(cfg["DOA"], cfg["DOA_ARGS"], x, train)
        doa = nn.Dense(3 * self.n_classes,
                       kernel_init=nn.initializers.glorot_uniform(),
                       name="doa_out")(doa)
        doa = jnp.tanh(doa)

        if self.gate_doa_with_sed:
            doa = jnp.tanh(doa * jnp.concatenate([sed] * 3, axis=-1))
        return sed, doa


class SELDNet(nn.Module):
    """FIRST -> SECOND body + SED/DOA heads (models.py:18-32)."""
    model_config: Dict[str, Any]
    gate_doa_with_sed: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.model_config
        n_classes = cfg.get("n_classes", 14)
        x = _apply_block(cfg["FIRST"], cfg["FIRST_ARGS"], x, train)
        x = _apply_block(cfg["SECOND"], cfg["SECOND_ARGS"], x, train)
        return SELDHeads(cfg, n_classes, self.gate_doa_with_sed)(x, train=train)


def _time_local_block(name: str, args: dict) -> bool:
    """Blocks that are translation-equivariant along time with stride 1 —
    computable once on a full clip and windowed afterwards (the fast
    inference split, seld_tpu.inference.ensemble)."""
    if name in ("simple_dense_stage", "simple_dense_block", "identity_block"):
        return True
    if name == "mother_stage":
        strides = args.get("strides", (1, 1))
        if (strides[0] if hasattr(strides, "__len__") else strides) != 1:
            return False
        # squeeze-and-excitation global-average-pools over TIME
        # (modules.py se = mean over (-3, -2)) — clip-global statistics
        # differ from per-window ones on every frame, so SE blocks are not
        # window-local even at stride 1
        return not args.get("squeeze_ratio", 0)
    return False


def conv_temporal_trunk_blocks(cfg: Dict[str, Any]) -> int:
    """Number of leading BLOCKs (after the stem) in the time-local trunk."""
    blocks = sorted_block_keys(cfg)
    n = 0
    for block in blocks:
        if not _time_local_block(cfg[block], cfg.get(f"{block}_ARGS", {})):
            break
        n += 1
    return n


class ConvTemporal(nn.Module):
    """Stem conv+pool then sorted BLOCK0..N + heads (models.py:54-78).

    stage: "full" (default) runs everything; "trunk" runs the stem + the
    leading time-local blocks and returns their features; "head" consumes
    trunk features and runs the remaining blocks + heads. The split powers
    the fast sliding-window inference path (trunk computed once per clip;
    see seld_tpu.inference.ensemble). In "head" mode the skipped modules
    are still CONSTRUCTED (never called) so flax auto-names line up with
    the full model's parameter tree.
    """
    model_config: Dict[str, Any]

    @nn.compact
    def __call__(self, x, train: bool = False, stage: str = "full"):
        cfg = self.model_config
        filters = cfg.get("filters", 32)
        first_kernel_size = cfg.get("first_kernel_size", 7)
        first_pool_size = tuple(cfg.get("first_pool_size", [5, 1]))
        n_classes = cfg.get("n_classes", 14)
        n_trunk = conv_temporal_trunk_blocks(cfg) if stage != "full" else -1

        stem = Conv2DBN(filters, first_kernel_size, padding="SAME",
                        activation="relu", pool=first_pool_size)
        if stage != "head":
            # stem conv+BN+ReLU+pool — fused backward on TPU (ops/stem.py)
            x = stem(x, train=train)

        blocks = sorted_block_keys(cfg)
        # construct every block up front so flax auto-names are identical
        # across stages regardless of which subset is called
        mods = [get_block(cfg[b])(cfg[f"{b}_ARGS"]) for b in blocks]
        for i, mod in enumerate(mods):
            if stage == "trunk" and i >= n_trunk:
                continue
            if stage == "head" and i < n_trunk:
                continue
            x = mod(x, train=train)
        if stage == "trunk":
            return x

        return SELDHeads(cfg, n_classes)(x, train=train)


class VADArchitecture(nn.Module):
    """Config-driven VAD MLP/conv (models.py:81-102)."""
    model_config: Dict[str, Any]

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.model_config
        flatten = cfg.get("flatten", True)
        last_unit = cfg.get("last_unit", 1)

        if flatten:
            x = x.reshape(x.shape[0], -1)

        blocks = sorted_block_keys(cfg)
        for block in blocks:
            x = _apply_block(cfg[block], cfg[f"{block}_ARGS"], x, train)

        if x.ndim == 4:
            x = force_1d(x)
        x = nn.Dense(last_unit,
                     kernel_init=nn.initializers.glorot_uniform())(x)
        x = jax.nn.sigmoid(x)
        if x.shape[-1] == 1:
            x = x[..., 0]
        return x


class SpectroTemporalAttentionVAD(nn.Module):
    """Spectro-temporal attention VAD (models.py:105-163).

    Returns (frame_probs, pipe_probs, attention_score).
    """
    model_config: Dict[str, Any]

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.model_config
        T = cfg.get("T", 4)
        Nc = cfg.get("Nc", 16)
        fc = cfg.get("fc", 3)
        Np = cfg.get("Np", 256)
        Nt = cfg.get("Nt", 128)
        H = cfg.get("H", 4)
        dropout_rate = cfg.get("dropout_rate", 0.5)
        det = not train

        if x.ndim == 3:
            x = x[..., None]

        # spectral attention: gated conv stages with freq pooling
        for i in range(T):
            lin = Conv2DBN(Nc * (2 ** i), fc, activation=None)(x, train=train)
            gate = Conv2DBN(Nc * (2 ** i), fc, activation="sigmoid")(x, train=train)
            x = lin * gate
            x = max_pool(x, (1, 2), strides=(1, 2))
        x = x.reshape(x.shape[0], x.shape[1], -1)

        # pipe net
        for _ in range(2):
            x = nn.Dense(Np, kernel_init=nn.initializers.glorot_uniform())(x)
            x = BatchNorm()(x, train=train)
            x = jax.nn.relu(x)
            x = Dropout(dropout_rate)(x, deterministic=det)
        pipe = jax.nn.sigmoid(
            nn.Dense(1, kernel_init=nn.initializers.glorot_uniform())(x))

        # temporal attention
        def dense_nb(units, z):
            return nn.Dense(units, use_bias=False,
                            kernel_init=nn.initializers.glorot_uniform())(z)

        query = dense_nb(Nt, jnp.mean(x, axis=-2))
        query = jax.nn.sigmoid(BatchNorm()(query, train=train))
        key = jax.nn.sigmoid(BatchNorm()(dense_nb(Nt, x), train=train))
        value = jax.nn.sigmoid(BatchNorm()(dense_nb(Nt, x), train=train))

        scale = 1.0 / jnp.sqrt(jnp.asarray(Nt, x.dtype))
        query = query.reshape(*query.shape[:-1], Nt // H, H)
        key = key.reshape(*key.shape[:-1], Nt // H, H)
        value = value.reshape(*value.shape[:-1], Nt // H, H)

        score = jnp.sum(query[:, None, ...] * key, axis=-2) * scale  # [B, T, H]
        x = value * jax.nn.softmax(score[..., None, :], axis=-3)
        x = x.reshape(*x.shape[:-2], Nt)
        score = jax.nn.softmax(jnp.sum(score, axis=-1), axis=-1)

        # post net
        x = nn.Dense(Np, kernel_init=nn.initializers.glorot_uniform())(x)
        x = BatchNorm()(x, train=train)
        x = jax.nn.relu(x)
        x = Dropout(dropout_rate)(x, deterministic=det)
        x = jax.nn.sigmoid(
            nn.Dense(1, kernel_init=nn.initializers.glorot_uniform())(x))

        return x, pipe, score


class ACCDOA(nn.Module):
    """Activity-coupled cartesian DOA model (arXiv 2006.12014).

    Beyond-parity addition: a single 3C-vector head replaces the SED/DOA
    dual heads — activity is the vector magnitude, direction is the vector.
    Output adapts to the framework's (sed, doa) contract, so every loss,
    metric, trainer, and inference path works unchanged: the DCASE label
    format (cartesian * activity) IS the ACCDOA target, and UNMASKED MSE on
    the doa term is exactly the ACCDOA objective — train with
    `--doa_loss MSE --loss_weight 0,1`. Do NOT use MMSE here: it masks
    inactive frames, and with the SED weight at 0 nothing then drives the
    vector magnitude to zero on silence, so the activity stream saturates
    (measured round 5: a 96-epoch MMSE/0,1 chip run pinned val seld ~17
    with wall-to-wall insertions; the MSE objective is what makes
    ||v|| < threshold mean silence, arXiv 2006.12014 eq. 2).
    """
    model_config: Dict[str, Any]

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.model_config
        n_classes = cfg.get("n_classes", 14)
        filters = cfg.get("filters", 32)
        first_kernel_size = cfg.get("first_kernel_size", 7)
        first_pool_size = tuple(cfg.get("first_pool_size", [5, 1]))

        # stem conv+BN+ReLU+pool — fused backward on TPU (ops/stem.py)
        x = Conv2DBN(filters, first_kernel_size, padding="SAME",
                     activation="relu", pool=first_pool_size)(x, train=train)
        blocks = sorted_block_keys(cfg)
        for block in blocks:
            x = _apply_block(cfg[block], cfg[f"{block}_ARGS"], x, train)

        x = force_1d(x)
        vec = nn.Dense(3 * n_classes,
                       kernel_init=nn.initializers.glorot_uniform(),
                       name="accdoa_out")(x)
        vec = jnp.tanh(vec)

        # adapt to (sed, doa): activity = ||v_c||, clipped into [0, 1]
        v3 = vec.reshape(*vec.shape[:-1], 3, n_classes)
        sed = jnp.minimum(jnp.linalg.norm(v3, axis=-2), 1.0)
        return sed, vec


@register_model("accdoa")
def accdoa(input_shape, model_config: dict):
    return ACCDOA(dict(model_config))


@register_model("seldnet")
def seldnet(input_shape, model_config: dict):
    return SELDNet(dict(model_config), gate_doa_with_sed=False)


@register_model("seldnet_v1")
def seldnet_v1(input_shape, model_config: dict):
    return SELDNet(dict(model_config), gate_doa_with_sed=True)


@register_model("conv_temporal")
def conv_temporal(input_shape, model_config: dict):
    return ConvTemporal(dict(model_config))


@register_model("vad_architecture")
def vad_architecture(input_shape, model_config: dict):
    return VADArchitecture(dict(model_config))


@register_model("spectro_temporal_attention_based_VAD")
def spectro_temporal_attention_based_VAD(input_shape, model_config: dict):
    return SpectroTemporalAttentionVAD(dict(model_config))


def build_model(name: str, input_shape: Sequence[int], model_config: dict):
    """Reference entry point `getattr(models, config.model)(input_shape, cfg)`."""
    return get_model(name)(tuple(input_shape), model_config)
