"""Compiled train/eval steps.

One jitted SPMD step replaces the reference's @tf.function graphs
(train.py:22-44, trainv2.py:23-66): forward (train mode, mutable batch
stats) -> dual loss (+ L2 kernel regularization) -> grads -> AGC -> optimizer
update, with the streaming metric state updated in-graph so no tensor leaves
the device during an epoch. Under a data-sharded batch GSPMD inserts the
gradient all-reduce over ICI automatically.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from seld_tpu.train import metrics as M
from seld_tpu.train.train_state import TrainState


def l2_kernel_penalty(params, l2: float) -> jnp.ndarray:
    """l2 * sum(w^2) over kernel leaves (trainv2.py:247: keras l1_l2(l2=1e-3)
    applied to every layer exposing kernel_regularizer — conv/dense/attention
    kernels; recurrent kernels excluded as in the reference)."""
    if l2 == 0.0:
        return jnp.zeros([], jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = jnp.zeros([], jnp.float32)
    for path, leaf in flat:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leaf_name = names[-1] if names else ""
        in_rnn = any(n.startswith(("GRU_", "LSTM_")) for n in names)
        if in_rnn or leaf_name == "recurrent_kernel":
            continue
        if "kernel" in leaf_name:
            total = total + jnp.sum(jnp.square(leaf))
    return l2 * total


def _make_update_step(sed_loss_fn, doa_loss_fn, loss_weights, l2,
                      compute_dtype):
    """The un-jitted single-batch update: (state, x, y) -> (state, preds,
    (sed_loss, doa_loss))."""
    w_sed, w_doa = loss_weights

    def cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if a.dtype == jnp.float32 else a, tree)

    def update_step(state: TrainState, x, y):
        rng, step_rng = jax.random.split(state.rng)
        sed_y, doa_y = y
        if compute_dtype is not None:
            x = x.astype(compute_dtype)

        def loss_fn(params):
            # master params stay fp32; compute in compute_dtype (grads flow
            # back through the cast and accumulate fp32 in the optimizer)
            variables = {"params": cast(params)}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            (sed_p, doa_p), mutated = state.apply_fn(
                variables, x, train=True,
                rngs={"dropout": step_rng},
                mutable=["batch_stats"])
            sed_p = sed_p.astype(jnp.float32)
            doa_p = doa_p.astype(jnp.float32)
            sloss = sed_loss_fn(sed_y, sed_p)
            dloss = doa_loss_fn(doa_y, doa_p)
            loss = w_sed * sloss + w_doa * dloss
            loss = loss + l2_kernel_penalty(params, l2)
            return loss, (sloss, dloss, mutated.get("batch_stats"),
                          (sed_p, doa_p))

        grads, (sloss, dloss, new_stats, preds) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)

        state = state.replace(step=state.step + 1, params=params,
                              batch_stats=new_stats, opt_state=opt_state,
                              rng=rng)
        return state, preds, (sloss, dloss)

    return update_step


def make_train_step(*,
                    sed_loss_fn: Callable,
                    doa_loss_fn: Callable,
                    loss_weights: Tuple[float, float] = (1.0, 1000.0),
                    l2: float = 0.0,
                    doa_threshold: float = 20.0,
                    metric_block_size: int = 10,
                    compute_dtype=None,
                    donate: bool = True,
                    fuse_metrics: bool = False):
    """Build a jitted train step.

    sed_loss_fn(y, p) and doa_loss_fn(y, p) must return scalars.
    Step signature: (state, metric_state, x, y) -> (state, metric_state,
    (sed_loss, doa_loss)); y = (sed, doa).
    """
    update_step = _make_update_step(sed_loss_fn, doa_loss_fn, loss_weights,
                                    l2, compute_dtype)

    def metric_step(metric_state, y, preds):
        return M.update(metric_state, y, preds,
                        doa_threshold=doa_threshold,
                        block_size=metric_block_size)

    if fuse_metrics:
        # one dispatch per step; XLA optimization passes scale superlinearly
        # on the fused graph (~4x the split compile time), amortized by the
        # persistent compilation cache
        def fused(state: TrainState, metric_state, x, y):
            state, preds, losses = update_step(state, x, y)
            return state, metric_step(metric_state, y, preds), losses
        return jax.jit(fused, donate_argnums=(0, 1) if donate else ())

    # Two jits by default: XLA's optimization passes scale superlinearly on
    # the fused update+metrics graph (measured 283s fused vs ~65s split for
    # SS5 on v5e), and the split costs one extra on-device dispatch per step
    # with no host transfer.
    update_jit = jax.jit(update_step, donate_argnums=(0,) if donate else ())
    metric_jit = jax.jit(metric_step, donate_argnums=(0,) if donate else ())

    def step(state: TrainState, metric_state, x, y):
        state, preds, losses = update_jit(state, x, y)
        metric_state = metric_jit(metric_state, y, preds)
        return state, metric_state, losses

    return step


def make_train_multistep(*,
                         steps_per_call: int,
                         sed_loss_fn: Callable,
                         doa_loss_fn: Callable,
                         loss_weights: Tuple[float, float] = (1.0, 1000.0),
                         l2: float = 0.0,
                         doa_threshold: float = 20.0,
                         metric_block_size: int = 10,
                         compute_dtype=None,
                         donate: bool = True,
                         unroll: int = 1):
    """k optimizer updates per dispatch (Keras' steps_per_execution, which the
    reference's per-batch @tf.function loop lacks; trainv2.py:31-55).

    Batches arrive stacked: x [k, B, ...], y = (sed [k, B, ...], doa [k, B,
    ...]). A lax.scan runs k full update steps back-to-back on-device, then
    ONE metric update folds the k stacked predictions in — amortizing both
    the host dispatch gap and the metric pass. Semantics are identical to
    calling the single step k times (one update per batch, fresh RNG per
    step); only the dispatch granularity changes.

    Returns step(state, metric_state, xs, ys) -> (state, metric_state,
    (sed_losses [k], doa_losses [k])).
    """
    if steps_per_call < 1:
        raise ValueError("steps_per_call must be >= 1")
    if not 1 <= int(unroll) <= steps_per_call:
        raise ValueError(f"unroll={unroll!r} must be in [1, steps_per_call]")
    unroll = int(unroll)
    update_step = _make_update_step(sed_loss_fn, doa_loss_fn, loss_weights,
                                    l2, compute_dtype)

    def scan_steps(state: TrainState, xs, ys):
        def body(st, batch):
            x, y = batch
            st, preds, losses = update_step(st, x, y)
            return st, (preds, losses)
        state, (preds, losses) = jax.lax.scan(body, state, (xs, ys),
                                              unroll=unroll)
        return state, preds, losses

    def fold(a):  # [k, B, ...] -> [k*B, ...]
        return a.reshape(a.shape[0] * a.shape[1], *a.shape[2:])

    def metric_step(metric_state, ys, preds):
        y_flat = jax.tree_util.tree_map(fold, ys)
        p_flat = jax.tree_util.tree_map(fold, preds)
        return M.update(metric_state, y_flat, p_flat,
                        doa_threshold=doa_threshold,
                        block_size=metric_block_size)

    scan_jit = jax.jit(scan_steps, donate_argnums=(0,) if donate else ())
    metric_jit = jax.jit(metric_step, donate_argnums=(0,) if donate else ())

    def step(state: TrainState, metric_state, xs, ys):
        state, preds, losses = scan_jit(state, xs, ys)
        metric_state = metric_jit(metric_state, ys, preds)
        return state, metric_state, losses

    return step


def make_train_epoch(*,
                     sed_loss_fn: Callable,
                     doa_loss_fn: Callable,
                     n_classes: int,
                     mesh=None,
                     axis: str = "data",
                     loss_weights: Tuple[float, float] = (1.0, 1000.0),
                     l2: float = 0.0,
                     doa_threshold: float = 20.0,
                     metric_block_size: int = 10,
                     compute_dtype=None,
                     donate: bool = True,
                     augment_fn: Callable = None,
                     fuse_metrics: bool = False):
    """One dispatch per EPOCH: lax.scan over a device-resident dataset.

    Companion to `data.device_dataset.DeviceDataset`: the windowed split
    (x_all [N, ...], y_all [N, T, 4C] combined sed+doa) and the epoch's
    index matrix (idx_all [steps, B], per-shard local rows) already live in
    HBM, so the entire epoch — gather, optional augment, forward/backward/
    update, metric accumulation — runs as ONE compiled program. The host's
    only involvement per epoch is the idx_all staging and the final scalar
    fetches; per-STEP dispatch overhead (0.5-6 ms each through a remote
    link) disappears entirely.

    The per-item gather runs under jax.shard_map over the mesh's `axis`
    (each device reads its local shard; no collectives), composing with
    GSPMD for the update itself. Semantics per step are identical to
    make_train_step (one optimizer update per batch, fresh dropout key per
    step); augment keys are split from `aug_rng` inside the scan, so the
    augment stream differs from the host loop's per-step host splits.

    Like make_train_multistep, the scan carries updates only and ONE
    metric pass folds the stacked (post-augment) labels + predictions —
    the fused update+metrics graph compiles ~4x slower (round-2
    measurement). fuse_metrics=True accumulates the metric state INSIDE
    the scan instead: no [steps, B, ...] label/pred stacking, which the
    round-3 chip profile measured at ~1.6 ms/step of pure copies
    (dynamic-update-slice + copy families) — worth the compile when the
    epoch program is reused across hundreds of epochs.

    Returns epoch(state, metric_state, x_all, y_all, idx_all, aug_rng) ->
    (state, metric_state, (sed_losses [steps], doa_losses [steps])).
    """
    update_step = _make_update_step(sed_loss_fn, doa_loss_fn, loss_weights,
                                    l2, compute_dtype)
    if mesh is not None:
        spec = jax.sharding.PartitionSpec(axis)
        gather = jax.shard_map(
            lambda xs, ys, ids: (xs[ids], ys[ids]),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=(spec, spec))
    else:
        def gather(xs, ys, ids):
            return xs[ids], ys[ids]

    def make_scan(with_metrics):
        """One scan body for both variants: metric state rides the carry
        (fused) or None threads through and the per-step (y, preds) stack
        out for the post-scan fold."""
        def scan_fn(state: TrainState, metric_state, x_all, y_all, idx_all,
                    aug_rng):
            def body(carry, idx_row):
                st, ms, rng = carry
                xb, yb = gather(x_all, y_all, idx_row)
                if augment_fn is not None:
                    rng, k = jax.random.split(rng)
                    xb, yb = augment_fn(k, xb, yb)
                y = (yb[..., :n_classes], yb[..., n_classes:])
                st, preds, losses = update_step(st, xb, y)
                if with_metrics:
                    ms = M.update(ms, y, preds, doa_threshold=doa_threshold,
                                  block_size=metric_block_size)
                    return (st, ms, rng), losses
                return (st, ms, rng), (y, preds, losses)
            (state, metric_state, _), out = jax.lax.scan(
                body, (state, metric_state, aug_rng), idx_all)
            return state, metric_state, out
        return scan_fn

    if fuse_metrics:
        return jax.jit(make_scan(True),
                       donate_argnums=(0, 1) if donate else ())

    def fold(a):  # [steps, B, ...] -> [steps*B, ...]
        return a.reshape(a.shape[0] * a.shape[1], *a.shape[2:])

    def metric_step(metric_state, ys, preds):
        return M.update(metric_state, jax.tree_util.tree_map(fold, ys),
                        jax.tree_util.tree_map(fold, preds),
                        doa_threshold=doa_threshold,
                        block_size=metric_block_size)

    scan_jit = jax.jit(make_scan(False), donate_argnums=(0,) if donate else ())
    metric_jit = jax.jit(metric_step, donate_argnums=(0,) if donate else ())

    def epoch(state: TrainState, metric_state, x_all, y_all, idx_all,
              aug_rng):
        state, _, (ys, preds, losses) = scan_jit(
            state, None, x_all, y_all, idx_all, aug_rng)
        metric_state = metric_jit(metric_state, ys, preds)
        return state, metric_state, losses

    return epoch


def make_eval_step(*,
                   sed_loss_fn: Callable,
                   doa_loss_fn: Callable,
                   doa_threshold: float = 20.0,
                   metric_block_size: int = 10,
                   return_preds: bool = False,
                   compute_dtype=None):
    """Jitted eval step: (state, metric_state, x, y[, n_valid]) ->
    (metric_state, (sed_loss, doa_loss)[, preds]).

    n_valid (static): when eval batches are zero-padded so their leading dim
    divides the mesh's data axis (e.g. 10-window clips padded to 16 on an
    8-device mesh), the forward runs on the padded batch but predictions and
    labels are statically sliced back to the first n_valid rows before
    losses and metric accumulation — padding never contaminates scores.
    """
    import functools

    @functools.partial(jax.jit, static_argnames=("n_valid",),
                       donate_argnums=(1,))
    def step(state: TrainState, metric_state, x, y, n_valid=None):
        sed_y, doa_y = y
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        sed_p, doa_p = state.apply_fn(state.variables, x, train=False)
        sed_p = sed_p.astype(jnp.float32)
        doa_p = doa_p.astype(jnp.float32)
        if n_valid is not None:
            sed_p, doa_p = sed_p[:n_valid], doa_p[:n_valid]
            sed_y, doa_y = sed_y[:n_valid], doa_y[:n_valid]
        sloss = sed_loss_fn(sed_y, sed_p)
        dloss = doa_loss_fn(doa_y, doa_p)
        metric_state = M.update(metric_state, (sed_y, doa_y), (sed_p, doa_p),
                                doa_threshold=doa_threshold,
                                block_size=metric_block_size)
        if return_preds:
            return metric_state, (sloss, dloss), (sed_p, doa_p)
        return metric_state, (sloss, dloss)

    return step


def make_forward_fn():
    """Plain jitted inference forward: (state, x) -> model outputs."""
    def forward(state: TrainState, x):
        return state.apply_fn(state.variables, x, train=False)
    return jax.jit(forward)
