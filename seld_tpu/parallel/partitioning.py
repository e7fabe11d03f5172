"""Tensor-parallel parameter sharding rules for a multi-axis device mesh.

The SELD models are small enough that pure data parallelism is the right
production scope (SURVEY §2/§5) — but the mesh layer is general, and this
module provides the 'model' axis story: annotate parameter shardings, let
GSPMD insert the collectives (the scaling-book recipe; no manual
collective calls anywhere).

Rules (by parameter path and shape):
  - Dense/Conv `kernel` [..., I, O]: shard the output-feature dim over the
    model axis when divisible — weight-stationary column parallelism; XLA
    all-gathers or reduce-scatters activations as needed.
  - Per-head attention kernels [H, I, O] (`query_kernel` etc.): shard the
    head dim — classic head parallelism (H=4 heads over model=2|4).
  - GRU/LSTM kernels: replicated. The fused Pallas recurrence declares its
    weights replicated in its partition spec (ops/pallas/gru.py), so
    sharding them would just bounce through an all-gather every step.
  - biases, BatchNorm/LayerNorm scales, positional tables: replicated.

Use `tp_param_specs` to derive the spec tree and `shard_tree` to place it.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_HEAD_KERNELS = ("query_kernel", "key_kernel", "value_kernel",
                 "projection_kernel", "pos_kernel")


def tp_param_specs(params, mesh: Mesh, axis: str = "model",
                   min_dim: int = 2):
    """PartitionSpec pytree for tensor-parallel parameter sharding."""
    size = mesh.shape[axis]

    def spec_for(path, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leaf_name = names[-1] if names else ""
        if any(n.startswith(("GRU_", "LSTM_")) for n in names):
            return P()
        if leaf_name in _HEAD_KERNELS and leaf.ndim == 3:
            if leaf.shape[0] % size == 0 and leaf.shape[0] >= min_dim:
                return P(axis)
            return P()
        if leaf_name == "kernel" and leaf.ndim >= 2:
            if leaf.shape[-1] % size == 0 and leaf.shape[-1] >= min_dim:
                return P(*([None] * (leaf.ndim - 1)), axis)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [spec_for(path, leaf) for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_tree(tree, mesh: Mesh, specs=None, axis: str = "model"):
    """device_put `tree` with per-leaf NamedShardings (default: TP specs)."""
    if specs is None:
        specs = tp_param_specs(tree, mesh, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)
