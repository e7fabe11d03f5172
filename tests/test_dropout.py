"""Fast-dropout unit tests (seld_tpu/ops/dropout.py).

The fast path draws uint16 PRNG words and compares against a static integer
threshold instead of flax's float-uniform path (reference Keras dropout:
modules.py:410 default rate 0.1). Semantics contract: exact passthrough when
deterministic/rate 0, elements are either 0 or x/keep', achieved keep
probability within binomial noise of the requested rate, and E[out] == x.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.ops import dropout as fd


@pytest.fixture
def force_fast(monkeypatch):
    monkeypatch.setenv("SELD_FAST_DROPOUT", "1")


def _apply(rate, x, key, deterministic=False):
    mod = fd.Dropout(rate)
    return mod.apply({}, x, deterministic=deterministic,
                     rngs={"dropout": key})


def test_deterministic_passthrough(force_fast):
    x = jnp.arange(24.0).reshape(4, 6)
    out = _apply(0.3, x, jax.random.PRNGKey(0), deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_rate_zero_passthrough(force_fast):
    x = jnp.ones((8, 8))
    out = _apply(0.0, x, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_rate_one_zeroes(force_fast):
    x = jnp.ones((8, 8))
    out = _apply(1.0, x, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.zeros_like(x))


def test_values_are_zero_or_scaled(force_fast):
    rate = 0.1
    x = jnp.full((256, 256), 3.0)
    out = np.asarray(_apply(rate, x, jax.random.PRNGKey(3)))
    thr = round((1 - rate) * 65536)
    scaled = 3.0 * np.float32(65536.0 / thr)
    assert set(np.unique(out)).issubset({np.float32(0.0), scaled})


@pytest.mark.parametrize("rate", [0.05, 0.1, 0.3, 0.5])
def test_keep_fraction_and_mean(force_fast, rate):
    n = 1 << 20
    x = jnp.ones((n,), jnp.float32)
    out = np.asarray(_apply(rate, x, jax.random.PRNGKey(7)))
    kept = float((out > 0).mean())
    # binomial std for n=2^20 is ~5e-4; allow 6 sigma
    assert abs(kept - (1 - rate)) < 6 * np.sqrt(rate * (1 - rate) / n)
    # achieved-keep scaling => mean preserved to the same tolerance
    assert abs(float(out.mean()) - 1.0) < 5e-3


@pytest.mark.parametrize("layout", ["flat", "u32"])
def test_layout_variants_keep_semantics(force_fast, monkeypatch, layout):
    # perf-experiment bit layouts (BASELINE.md round 3, both measured
    # slower and left opt-in) must keep the distributional contract
    monkeypatch.setenv("SELD_FAST_DROPOUT_LAYOUT", layout)
    rate = 0.1
    n = 1 << 18
    out = np.asarray(_apply(rate, jnp.ones((4, n // 4)), jax.random.PRNGKey(7)))
    kept = float((out > 0).mean())
    assert abs(kept - (1 - rate)) < 6 * np.sqrt(rate * (1 - rate) / n)
    thr = round((1 - rate) * 65536)
    assert set(np.unique(out)).issubset(
        {np.float32(0.0), np.float32(65536.0 / thr)})


def test_mean_preserved_bf16(force_fast):
    # the conformer stages run bf16; the inverse-keep scale is applied in
    # the input dtype
    x = jnp.ones((1 << 18,), jnp.bfloat16)
    out = _apply(0.1, x, jax.random.PRNGKey(9))
    assert out.dtype == jnp.bfloat16
    assert abs(float(jnp.mean(out.astype(jnp.float32))) - 1.0) < 2e-2


def test_grad_flows(force_fast):
    x = jnp.ones((128,))

    def loss(x):
        return jnp.sum(_apply(0.2, x, jax.random.PRNGKey(11)))

    g = np.asarray(jax.grad(loss)(x))
    thr = round(0.8 * 65536)
    scale = np.float32(65536.0 / thr)
    assert set(np.unique(g)).issubset({np.float32(0.0), scale})


def test_fallback_matches_flax(monkeypatch):
    # SELD_FAST_DROPOUT=0 routes through flax nn.Dropout with the same
    # 'dropout' rng collection -> bit-identical to the flax layer
    monkeypatch.setenv("SELD_FAST_DROPOUT", "0")
    import flax.linen as nn
    x = jnp.arange(1024.0).reshape(32, 32)
    key = jax.random.PRNGKey(5)
    ours = _apply(0.25, x, key)
    ref = nn.Dropout(0.25).apply({}, x, deterministic=False,
                                 rngs={"dropout": key})
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_auto_mode_off_on_cpu():
    # golden/TF-parity tests rely on flax RNG semantics on CPU
    assert not fd.fast_dropout_enabled() or jax.default_backend() != "cpu"


def test_rate_just_below_one_no_crash(force_fast):
    # thr = round(keep * 65536) rounds to 0 for keep < 2^-17; must clamp to
    # 1 (drop all but ~2^-16) instead of dividing by zero at trace time
    x = jnp.ones((1 << 16,))
    out = np.asarray(_apply(0.9999999, x, jax.random.PRNGKey(0)))
    assert np.isfinite(out).all()
    kept = (out > 0).sum()
    assert kept <= 8  # expect ~1 of 65536 kept
    if kept:
        np.testing.assert_allclose(out[out > 0], 65536.0, rtol=1e-6)
