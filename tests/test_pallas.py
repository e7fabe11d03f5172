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


def test_gather_rows_interpret_exact():
    from seld_tpu.ops.pallas.gather import gather_rows
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(17, 6, 64).astype(np.float32))  # row=384=3*128
    ids = jnp.asarray(rng.randint(0, 17, 9).astype(np.int32))
    got = gather_rows(x, ids, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x)[np.asarray(ids)])


def test_gather_rows_bf16_4d_interpret_exact():
    from seld_tpu.ops.pallas.gather import gather_rows
    import ml_dtypes
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(11, 30, 64, 4).astype(ml_dtypes.bfloat16))
    ids = jnp.asarray(rng.randint(0, 11, 8).astype(np.int32))
    got = gather_rows(x, ids, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x)[np.asarray(ids)])


def test_gather_rows_packed_dma_interpret_exact():
    from seld_tpu.ops.pallas import gather as G
    rng = np.random.RandomState(6)
    x = rng.randn(19, 6, 5, 7).astype(np.float32)  # row=210 -> 2 lane-rows -> rp=8
    assert G.packed_rows(x.shape[1:]) == 8
    xp = G.pack_rows(x)
    assert xp.shape == (19, 8, 128)
    ids = jnp.asarray(rng.randint(0, 19, 12).astype(np.int32))
    for k in (1, 5, 16):
        got = G.gather_rows(jnp.asarray(xp), ids, inflight=k, interpret=True)
        want = xp[np.asarray(ids)]
        np.testing.assert_array_equal(np.asarray(got), want)
    un = G.unpack_rows(jnp.asarray(want), x.shape[1:])
    np.testing.assert_array_equal(np.asarray(un), x[np.asarray(ids)])


def test_pack_rows_already_tile_exact_is_view_shaped():
    from seld_tpu.ops.pallas import gather as G
    rng = np.random.RandomState(8)
    x = rng.randn(3, 8, 128).astype(np.float32)  # row=1024, exact
    xp = G.pack_rows(x)
    assert xp.shape == (3, 8, 128)
    np.testing.assert_array_equal(xp, x)
    np.testing.assert_array_equal(
        np.asarray(G.unpack_rows(jnp.asarray(xp), (8, 128))), x)


def test_gather_rows_unaligned_falls_back_to_xla():
    from seld_tpu.ops.pallas.gather import gather_rows
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(7, 60, 48).astype(np.float32))  # row=2880, not %128
    ids = jnp.asarray(rng.randint(0, 7, 5).astype(np.int32))
    got = gather_rows(x, ids)  # CPU backend -> XLA path regardless
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x)[np.asarray(ids)])
