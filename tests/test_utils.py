"""Unit tests for seld_tpu.utils (reference parity: utils_test.py:7-23,
feature_extractor_test.py:8-46)."""
import numpy as np
import pytest

from seld_tpu.utils import (
    safe_div,
    safe_tuple,
    dict_add,
    force_1d_shape,
    cartesian_to_polar,
    polar_to_cartesian,
)


def test_safe_div_no_nan():
    out = safe_div(np.float32(1.0), np.float32(0.0))
    assert np.isfinite(out)
    assert out == pytest.approx(1e8)


def test_safe_div_jnp():
    import jax.numpy as jnp
    out = safe_div(jnp.ones(3), jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(out)))


def test_dict_add():
    assert dict_add({"a": 1, "b": 2}, {"b": 3, "c": 4}) == {"a": 1, "b": 5, "c": 4}


def test_safe_tuple():
    assert safe_tuple(3) == (3, 3)
    assert safe_tuple((4,)) == (4, 4)
    assert safe_tuple((1, 2)) == (1, 2)
    assert safe_tuple(5, length=3) == (5, 5, 5)
    with pytest.raises(ValueError):
        safe_tuple((1, 2, 3), length=2)


def test_force_1d_shape():
    assert force_1d_shape([60, 8, 16]) == [60, 128]
    assert force_1d_shape([60, 128]) == [60, 128]
    with pytest.raises(ValueError):
        force_1d_shape([60, 8, 16, 2])


def test_polar_cartesian_round_trip():
    polar = np.array([[0.0, 0.0], [90.0, 0.0], [0.0, 90.0], [-45.0, 30.0]])
    cart = polar_to_cartesian(polar)
    # unit sphere
    np.testing.assert_allclose(np.linalg.norm(cart, axis=-1), 1.0, atol=1e-6)
    back = cartesian_to_polar(cart)
    np.testing.assert_allclose(back[..., :2], polar, atol=1e-4)

    # hand-checked values (feature_extractor_test.py style)
    np.testing.assert_allclose(
        polar_to_cartesian(np.array([0.0, 0.0])), [1.0, 0.0, 0.0], atol=1e-7)
    np.testing.assert_allclose(
        polar_to_cartesian(np.array([90.0, 0.0])), [0.0, 1.0, 0.0], atol=1e-7)
    np.testing.assert_allclose(
        polar_to_cartesian(np.array([0.0, 90.0])), [0.0, 0.0, 1.0], atol=1e-7)
