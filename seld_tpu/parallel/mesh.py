"""jax.sharding.Mesh construction and data-parallel sharding helpers.

Design (SURVEY §2 "distributed communication backend", §5): pure SPMD data
parallelism over ICI is the right scope for these model sizes (<=3M params),
but the mesh is general — `parse_mesh_spec` accepts multi-axis specs
("data:4,model:2") so tensor axes can be added without touching callers.
Gradient reduction is left to GSPMD: params are replicated, batches sharded
on the 'data' axis, and XLA inserts the psum/all-reduce over ICI.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_spec(spec: str, n_devices: Optional[int] = None
                    ) -> Dict[str, int]:
    """'data:-1' or 'data:4,model:2' -> {axis: size}; -1 = all remaining."""
    if n_devices is None:
        n_devices = len(jax.devices())
    axes: Dict[str, int] = {}
    wildcard = None
    for part in spec.split(","):
        name, _, size = part.strip().partition(":")
        size = int(size) if size else -1
        if size == -1:
            if wildcard is not None:
                raise ValueError(f"only one -1 axis allowed in {spec!r}")
            wildcard = name
            axes[name] = -1
        else:
            axes[name] = size
    fixed = int(np.prod([s for s in axes.values() if s != -1]))
    if wildcard is not None:
        if n_devices % fixed != 0:
            raise ValueError(
                f"{n_devices} devices not divisible by fixed axes {axes}")
        axes[wildcard] = n_devices // fixed
    elif fixed != n_devices:
        raise ValueError(f"mesh {axes} does not cover {n_devices} devices")
    return axes


def make_mesh(spec: str = "data:-1",
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    axes = parse_mesh_spec(spec, len(devices))
    names = tuple(axes)
    shape = tuple(axes[n] for n in names)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shard_count(sharding: NamedSharding) -> int:
    """Number of distinct shards along the leading (batch) dim — the product
    of the mesh axes the dim is sharded over, NOT the total device count
    (a data:4,model:2 mesh shards batches 4 ways, over 8 devices)."""
    spec = sharding.spec
    if not len(spec) or spec[0] is None:
        return 1
    axes = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
    return int(np.prod([sharding.mesh.shape[a] for a in axes]))


def put_sharded(x, sharding: NamedSharding):
    """device_put with DCN (multi-host) awareness.

    Single-process: a plain sharded device_put. Multi-process: the host
    array is this process's slice of the global batch (strided loading,
    data_loader-equivalent split by jax.process_index()), so assemble a
    global jax.Array from process-local data; for a replicated spec the
    local array is the full value on every host.
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Put every leaf with its leading dim sharded over `axis`.

    This is the host->HBM boundary: the per-host numpy batch lands directly
    as one sharded global array (no per-device Python loop).
    """
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: put_sharded(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: put_sharded(x, sharding), tree)


def host_init(init_fn, *args, **kwargs):
    """Run a (possibly jitted) initializer on the host CPU backend.

    Model/optimizer init graphs are many small ops (plus QR for orthogonal
    initializers) that compile/execute poorly through a remote TPU tunnel;
    initializing on CPU and transferring the resulting pytree once is both
    faster and more robust. Returns host-resident arrays — follow with
    `replicate(...)`/`device_put` to place them.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cpu_args = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, cpu) if hasattr(x, "dtype") else x,
            (args, kwargs))
        args, kwargs = cpu_args
        return jax.jit(init_fn)(*args, **kwargs)
