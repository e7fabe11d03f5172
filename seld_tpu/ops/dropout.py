"""TPU-fast dropout.

Flax's ``nn.Dropout`` draws a float uniform per element (PRNG bits ->
bitcast/scale to float -> compare) and the reference's Keras layers do the
equivalent. On the SS5 train step the dropout family (three conformer stages
at rate 0.1, reference modules.py:410 default) costs ~0.9 ms of the 14 ms
step: disabling every dropout measures 19,254 windows/s vs 18,075 shipped
(round-3 probe, BASELINE.md).

This module keeps the semantics but generates HALF the random bits and skips
the int->float conversion chain: draw raw uint16 PRNG words and compare
against a static integer threshold.

    keep' = round(keep * 65536) / 65536        # |keep' - keep| <= 2^-17
    mask  = bits_u16 < round(keep * 65536)
    out   = where(mask, x / keep', 0)

Probability quantization at 2^-16 granularity is finer than anything the
training process can resolve (float32-uniform comparison itself quantizes
the threshold to the nearest f32, ~6e-8 for keep=0.9; u16 is ~8e-6 —
both orders of magnitude below run-to-run loss noise), and the applied
scale uses the *achieved* keep probability so E[out] == x exactly.

The fast path is TPU-only by default (the RNG stream differs from
nn.Dropout's, so CPU golden tests keep flax behavior); SELD_FAST_DROPOUT=0/1
forces it off/on. Falls back to flax semantics for rates 0/1 and the
broadcast-dims feature (unused in this package).
"""
from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp


def fast_dropout_enabled() -> bool:
    mode = os.environ.get("SELD_FAST_DROPOUT", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.default_backend() in ("tpu", "axon")


class Dropout(nn.Module):
    """Drop-in for ``nn.Dropout`` at this package's call sites (rate
    positional, ``deterministic`` kwarg, 'dropout' rng collection)."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0 or not fast_dropout_enabled():
            return nn.Dropout(self.rate)(
                x, deterministic=deterministic,
                rng=self.make_rng("dropout"))

        thr = int(round((1.0 - self.rate) * 65536))
        # clamp both ends: rate ~0 rounds keep to 65536 (drop ~2^-16 instead
        # of 0), rate ~1 rounds keep to 0 (which would divide by zero —
        # keep 2^-16 instead); both are within the documented quantization
        thr = max(1, min(thr, 65535))
        key = self.make_rng("dropout")
        # bit-drawing layout (perf experiment, BASELINE.md round 3): XLA
        # assigns rng-bit-generator an rng-native tiling and inserts a
        # relayout copy toward each consumer (~0.21 ms/step total on SS5).
        layout = os.environ.get("SELD_FAST_DROPOUT_LAYOUT", "nd")
        if layout == "flat":
            bits = jax.random.bits(key, (x.size,), jnp.uint16).reshape(x.shape)
        elif layout == "u32" and x.size % 2 == 0:
            w = jax.random.bits(key, (x.size // 2,), jnp.uint32)
            bits = jax.lax.bitcast_convert_type(w, jnp.uint16).reshape(x.shape)
        else:
            bits = jax.random.bits(key, x.shape, jnp.uint16)
        inv = jnp.asarray(65536.0 / thr, x.dtype)
        return jnp.where(bits < jnp.uint16(thr), x * inv,
                         jnp.zeros((), x.dtype))
