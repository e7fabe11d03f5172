"""Property-based tests (hypothesis) for the numeric core."""
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from `make test-fast`
import numpy as np
import jax
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from seld_tpu.utils.coords import cartesian_to_polar, polar_to_cartesian
from seld_tpu.inference.ensemble import overlap_add, sliding_windows
from seld_tpu.data import transforms as T
from seld_tpu.train import metrics as M

finite = st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False)


@settings(max_examples=50, deadline=None)
@given(st.floats(-179.9, 179.9), st.floats(-89.9, 89.9))
def test_polar_cartesian_round_trip_property(azi, ele):
    cart = polar_to_cartesian(np.array([azi, ele]))
    assert abs(np.linalg.norm(cart) - 1.0) < 1e-6
    back = cartesian_to_polar(cart)
    assert abs(back[0] - azi) < 1e-4
    assert abs(back[1] - ele) < 1e-4


@settings(max_examples=20, deadline=None)
@given(st.integers(2, 6), st.integers(3, 10), st.integers(1, 3))
def test_overlap_add_inverts_sliding_windows(n_win_hint, length, step):
    """overlap_add(sliding_windows(x)) / counts == x on covered frames."""
    total = length + step * n_win_hint
    x = np.random.RandomState(0).rand(total, 2).astype(np.float32)
    w = sliding_windows(jnp.asarray(x), length, step)
    counts = overlap_add(jnp.ones((w.shape[0], length, 1)), step)
    recon = np.asarray(overlap_add(w, step) / counts)
    covered = (w.shape[0] - 1) * step + length
    np.testing.assert_allclose(recon, x[:covered], atol=1e-5)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2 ** 31 - 1), st.integers(1, 6))
def test_batch_mask_only_zeroes(seed, n_mask):
    x = jnp.asarray(np.random.RandomState(1).rand(1, 100, 8, 3) + 0.5)
    out = np.asarray(T.batch_mask(jax.random.PRNGKey(seed), x, axis=-3,
                                  max_mask_size=20, n_mask=n_mask,
                                  period=100))
    orig = np.asarray(x)
    # every element is either untouched or exactly zero
    assert np.all((out == orig) | (out == 0.0))


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2 ** 31 - 1))
def test_foa_aug_is_isometry(seed):
    """The spatial aug preserves IV magnitudes and label vector norms."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 20, 8, 7).astype(np.float32))
    y4 = np.zeros((2, 10, 4, 4), np.float32)
    y4[..., 0, :] = (rng.rand(2, 10, 4) < 0.5)
    vec = rng.randn(2, 10, 3, 4).astype(np.float32)
    y4[..., 1:, :] = vec
    y = jnp.asarray(y4.reshape(2, 10, 16))

    x2, y2 = T.foa_intensity_vec_aug(jax.random.PRNGKey(seed), x, y)
    iv_norm_before = np.linalg.norm(np.asarray(x)[..., 4:7], axis=-1)
    iv_norm_after = np.linalg.norm(np.asarray(x2)[..., 4:7], axis=-1)
    np.testing.assert_allclose(iv_norm_after, iv_norm_before, atol=1e-5)

    v_before = np.linalg.norm(y4[..., 1:, :], axis=-2)
    v_after = np.linalg.norm(
        np.asarray(y2).reshape(2, 10, 4, 4)[..., 1:, :], axis=-2)
    np.testing.assert_allclose(np.sort(v_after, -1), np.sort(v_before, -1),
                               atol=1e-5)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2 ** 31 - 1))
def test_metric_update_order_invariant(seed):
    """Accumulating two batches in either order gives the same state."""
    rng = np.random.RandomState(seed % 10000)

    def batch():
        sed = (rng.rand(2, 20, 5) < 0.2).astype(np.float32)
        doa = rng.randn(2, 20, 15).astype(np.float32) * sed.repeat(3, -1)
        pred_sed = rng.rand(2, 20, 5).astype(np.float32)
        pred_doa = rng.randn(2, 20, 15).astype(np.float32)
        return ((jnp.asarray(sed), jnp.asarray(doa)),
                (jnp.asarray(pred_sed), jnp.asarray(pred_doa)))

    b1, b2 = batch(), batch()
    s_a = M.update(M.update(M.init_state(5), *b1, block_size=10), *b2,
                   block_size=10)
    s_b = M.update(M.update(M.init_state(5), *b2, block_size=10), *b1,
                   block_size=10)
    for k in s_a:
        np.testing.assert_allclose(np.asarray(s_a[k]), np.asarray(s_b[k]),
                                   rtol=1e-5, err_msg=k)
