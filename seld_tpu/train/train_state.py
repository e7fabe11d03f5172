"""Functional training state (params / batch stats / optimizer / RNG / SWA).

Replaces the reference's implicit Keras state (model weights + optimizer
slots + SWA's host-side weight copy, swa.py:5-33) with one explicit pytree
that jit-donates, shards, and checkpoints as a unit — including optimizer
state, whose loss on resume is a known deficiency of the reference
(SURVEY §5: include_optimizer=False at train.py:377-380).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array

    apply_fn: Any = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx, rng):
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            rng=rng,
            apply_fn=apply_fn,
            tx=tx,
        )

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v

    def get_lr(self) -> Optional[float]:
        hp = getattr(self.opt_state, "hyperparams", None)
        if hp and "learning_rate" in hp:
            return float(hp["learning_rate"])
        return None

    def set_lr(self, lr: float) -> "TrainState":
        hp = getattr(self.opt_state, "hyperparams", None)
        if hp is None or "learning_rate" not in hp:
            raise ValueError("optimizer was not built with inject_hyperparams")
        hp = dict(hp)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return self.replace(opt_state=self.opt_state._replace(hyperparams=hp))


@struct.dataclass
class SWAState:
    """Running average of params AND batch stats (swa.py parity: the
    reference averages model.get_weights(), which includes BatchNorm moving
    statistics — swa.py:14-32). Captured every `freq` epochs past
    `start_epoch`."""
    avg_params: Any
    count: jnp.ndarray
    avg_batch_stats: Any = None

    @classmethod
    def create(cls, params, batch_stats=None):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        bs = (jax.tree_util.tree_map(jnp.zeros_like, batch_stats)
              if batch_stats is not None else None)
        return cls(avg_params=zeros, count=jnp.zeros([], jnp.float32),
                   avg_batch_stats=bs)

    def update(self, params, batch_stats=None) -> "SWAState":
        new_count = self.count + 1.0

        def avg_into(a, p):
            return a + (p - a) / new_count

        avg = jax.tree_util.tree_map(avg_into, self.avg_params, params)
        bs = self.avg_batch_stats
        if bs is not None and batch_stats is not None:
            bs = jax.tree_util.tree_map(avg_into, bs, batch_stats)
        return SWAState(avg_params=avg, count=new_count, avg_batch_stats=bs)

    def should_update(self, epoch: int, start_epoch: int, freq: int) -> bool:
        return epoch >= start_epoch and (epoch - start_epoch) % freq == 0

    @property
    def available(self) -> bool:
        return float(self.count) > 0
