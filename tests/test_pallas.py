"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
real TPU by bench/driver)."""
import numpy as np
import jax.numpy as jnp
import pytest

from seld_tpu.ops import extract_features
from seld_tpu.ops.pallas.frontend import fused_foa_frontend


def test_fused_frontend_matches_reference_path():
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(4, 24000).astype(np.float32))

    fused = fused_foa_frontend(wav, interpret=True)
    reference = extract_features(wav, mode="foa", method="fft")

    assert fused.shape == reference.shape == (51, 64, 7)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(reference),
                               atol=2e-2, rtol=1e-3)


def test_fused_frontend_nonmultiple_tile():
    rng = np.random.RandomState(1)
    wav = jnp.asarray(rng.randn(4, 12000).astype(np.float32))
    out = fused_foa_frontend(wav, tile_t=16, interpret=True)
    ref = extract_features(wav, mode="foa", method="fft")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=1e-3)


def test_fused_frontend_rejects_bad_channels():
    with pytest.raises(ValueError):
        fused_foa_frontend(jnp.zeros((2, 4800)), interpret=True)


def test_fused_frontend_2d_matches_reference_path():
    from seld_tpu.ops.pallas.frontend import fused_foa_frontend_2d
    rng = np.random.RandomState(2)
    wav = jnp.asarray(rng.randn(4, 24000).astype(np.float32))
    fused = fused_foa_frontend_2d(wav, interpret=True)
    reference = extract_features(wav, mode="foa", method="fft")
    assert fused.shape == reference.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(reference),
                               atol=2e-2, rtol=1e-3)
