"""Device mesh & sharding helpers (the reference has no distributed layer;
this is the TPU-native mesh/collectives component per SURVEY §5)."""

from seld_tpu.parallel.mesh import (
    make_mesh,
    parse_mesh_spec,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from seld_tpu.parallel.partitioning import tp_param_specs, shard_tree

__all__ = [
    "make_mesh",
    "parse_mesh_spec",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "tp_param_specs",
    "shard_tree",
]
