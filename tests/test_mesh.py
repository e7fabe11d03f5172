"""Mesh-spec parsing and placement helper tests."""
import jax
import numpy as np
import pytest

from seld_tpu.parallel import make_mesh, parse_mesh_spec, shard_batch, replicate
from seld_tpu.parallel.mesh import host_init


def test_parse_mesh_spec():
    assert parse_mesh_spec("data:-1", 8) == {"data": 8}
    assert parse_mesh_spec("data:4,model:2", 8) == {"data": 4, "model": 2}
    assert parse_mesh_spec("data:-1,model:2", 8) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        parse_mesh_spec("data:3", 8)
    with pytest.raises(ValueError):
        parse_mesh_spec("a:-1,b:-1", 8)
    with pytest.raises(ValueError):
        parse_mesh_spec("data:-1,model:3", 8)


def test_make_mesh_multi_axis():
    mesh = make_mesh("data:4,model:2")
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)


def test_shard_and_replicate():
    mesh = make_mesh("data:8")
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    xs = shard_batch(x, mesh)
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), x)
    xr = replicate({"w": x}, mesh)
    assert xr["w"].sharding.is_fully_replicated


def test_host_init_runs_on_cpu():
    import jax.numpy as jnp
    out = host_init(lambda k: jax.random.normal(k, (8, 8)),
                    jax.random.PRNGKey(0))
    assert out.shape == (8, 8)
    assert out.devices().pop().platform == "cpu"
