"""Pallas kernel for the fused stem backward's single full-resolution pass.

The conv_temporal stem (reference models.py:54-78: conv2d_bn + MaxPooling2D)
is ~95% of SS5's forward FLOPs and, in round 2's trace, its backward was
~5.9 ms of a 16.6 ms step (BASELINE.md): select-and-scatter pool routing, a
BN+ReLU recompute feeding it, two dgamma/dbeta reduction passes, and a wgrad
conv that re-reads an f32 copy of the activation. The v2 redesign
(seld_tpu.ops.stem) needs exactly ONE full-resolution pass beyond the wgrad
conv — computing dy (the gradient w.r.t. the conv output) — because
dgamma/dbeta are recoverable from the saved pool-max on 32x-smaller tensors.

This kernel is that pass: read y [B,T,F,C] + dpooled [B,T/pt,F/pf,C], write
dy [B,T,F,C], recomputing BN-normalize, ReLU mask, and pool routing
in-register (equality against the in-window max, count-normalized tie
splitting) and folding the BN-backward correction terms in. dbias partials
(sum of dy) fall out for free.

Layout: operands are passed as [T, F, C, B] transposed views. XLA produces
the stem activation batch-minor ({0,3,2,1}: B on lanes, C on sublanes), so
the transpose into the kernel's row-major operand is a bitcast, not a copy —
and B=256 lanes / C=32 sublanes are exactly the tile-friendly axes for the
elementwise work.

Grid: (T/pt, F/fb) with fb a multiple of the pool width; the pool window
never straddles blocks, so routing is block-local. Reductions for dbias
keep C on sublanes ([C, 1] blocks) to avoid cross-layout transposes.

SPMD: the pallas_call is wrapped in jax.experimental.custom_partitioning so
GSPMD/Shardy shard it over the batch (lane) axis instead of all-gathering
around an opaque custom-call on multi-chip meshes: dy partitions with its
operands; the dbias reduction is computed per shard and psum'd over the
batch mesh axes inside the partition body.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _dy_kernel(y_ref, dp_ref, par_ref, dy_ref, dbias_ref, *, pf: int):
    y = y_ref[...]                                 # [pt, fb, C, B]
    par = par_ref[...].astype(jnp.float32)         # [6, C, 1]
    mean, inv, gamma, beta, dgn, dbn = (par[i] for i in range(6))
    scale = gamma * inv
    shift = beta - mean * scale

    # routing must replicate the forward's pooled values bit-for-bit: the
    # affine runs in the storage dtype exactly as the forward did, then
    # upcasts to f32 for max/compare (exact, and the VPU lacks bf16 compare)
    bno = (y * scale.astype(y.dtype)
           + shift.astype(y.dtype)).astype(jnp.float32)
    pt, fb, c, b = y.shape
    bno6 = bno.reshape(pt, fb // pf, pf, c, b)
    m = jnp.max(bno6, axis=(0, 2), keepdims=True)
    eq = jnp.logical_and(bno6 == m, bno6 > 0).astype(jnp.float32)
    cnt = jnp.sum(eq, axis=(0, 2), keepdims=True)
    dp = dp_ref[...].astype(jnp.float32)           # [1, fb/pf, C, B]
    dyr = (eq * (dp[:, :, None] / jnp.maximum(cnt, 1.0))
           ).reshape(pt, fb, c, b)

    xhat = (y.astype(jnp.float32) - mean) * inv
    dy = (inv * gamma) * (dyr - dbn - xhat * dgn)
    dy_ref[...] = dy.astype(dy_ref.dtype)
    # dbias partial: reduce majors first, then lanes, keeping C on sublanes
    dbias_ref[0, 0] = jnp.sum(jnp.sum(dy, axis=(0, 1)), axis=1,
                              keepdims=True)


def _pick_fblock(f: int, pf: int, per_f_bytes: int,
                 budget: int = None) -> int:
    """Largest divisor of f that is a multiple of pf within the VMEM
    budget (block bytes = fb * per_f_bytes). Default 2 MiB fits the 16 MiB
    scoped-vmem limit with double buffering; SELD_STEM_VMEM_BUDGET_MB can
    raise it alongside --xla_tpu_scoped_vmem_limit_kib."""
    if budget is None:
        import os
        budget = int(float(os.environ.get(
            "SELD_STEM_VMEM_BUDGET_MB", "2")) * (1 << 20))
    best = pf
    for fb in range(pf, f + 1, pf):
        if f % fb == 0 and fb * per_f_bytes <= budget:
            best = fb
    return best


def _dy_call(y_t, dp_t, par, pt: int, pf: int, interpret: bool):
    """(y_t [T,F,C,B], dp_t [TL,FL,C,B], par [6,C,1]) ->
    (dy_t [T,F,C,B], dbias [C] f32). Shapes may be per-shard."""
    t, f, c, bsz = y_t.shape
    fb = _pick_fblock(f, pf, pt * c * bsz * y_t.dtype.itemsize)
    grid = (t // pt, f // fb)

    # y is dead after this pass (wgrad reads x + dy; dgamma/dbeta read the
    # pooled max), so dy aliases y's HBM buffer (the VMEM blocks stay
    # separate; only the HBM allocation is shared)
    dy_t, dbias_p = pl.pallas_call(
        functools.partial(_dy_kernel, pf=pf),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pt, fb, c, bsz), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, fb // pf, c, bsz), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((6, c, 1), lambda i, j: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((pt, fb, c, bsz), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, c, 1), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, f, c, bsz), y_t.dtype),
            jax.ShapeDtypeStruct((t // pt, f // fb, c, 1), jnp.float32),
        ],
        input_output_aliases={0: 0},
        # no cross-block state: both grid dims may execute in any order,
        # letting Mosaic pipeline the 240-block grid more aggressively
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(y_t, dp_t, par)
    # fold grid partials immediately: the public shape must not depend on
    # the (shard-size-dependent) block choice
    return dy_t, jnp.sum(dbias_p[..., 0], axis=(0, 1))


@functools.lru_cache(maxsize=None)
def _sharded_dy(pt: int, pf: int, interpret: bool):
    """custom_partitioning wrapper: batch (last dim) shards, everything else
    replicates; dbias is psum'd over the batch mesh axes."""

    @custom_partitioning
    def fn(y_t, dp_t, par):
        return _dy_call(y_t, dp_t, par, pt, pf, interpret)

    def infer(mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        baxis = spec[3] if len(spec) > 3 else None
        return (NamedSharding(mesh, P(None, None, None, baxis)),
                NamedSharding(mesh, P()))

    def partition(mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        baxis = spec[3] if len(spec) > 3 else None
        data_sh = NamedSharding(mesh, P(None, None, None, baxis))
        rep = NamedSharding(mesh, P())

        def lower_fn(y_t, dp_t, par):
            dy_t, dbias = _dy_call(y_t, dp_t, par, pt, pf, interpret)
            if baxis is not None:
                dbias = jax.lax.psum(dbias, baxis)
            return dy_t, dbias

        return (mesh, lower_fn, (data_sh, rep), (data_sh, data_sh, rep))

    fn.def_partition(
        infer_sharding_from_operands=infer, partition=partition,
        # factors: batch b ties operands to dy and is contracted out of
        # dbias; every other dim is an independent factor
        sharding_rule="t f c b, u v c b, p c q -> t f c b, c")
    return fn


def stem_dy(y, dpooled, params6, pool, *, interpret: bool = False):
    """dy + dbias for the fused stem backward.

    Args:
      y:       [B, T, F, C] conv output (+bias), storage dtype.
      dpooled: [B, T/pt, F/pf, C] cotangent of the pooled output.
      params6: [6, C] f32 rows: mean, rsqrt(var+eps), gamma, beta,
               dgamma/n, dbeta/n.
      pool:    (pt, pf); both must divide T/F.

    Returns (dy [B, T, F, C] in y.dtype, dbias [C] f32).
    """
    pt, pf = pool
    y_t = jnp.transpose(y, (1, 2, 3, 0))
    dp_t = jnp.transpose(dpooled, (1, 2, 3, 0))
    if jax.device_count() > 1:
        dy_t, dbias = _sharded_dy(pt, pf, interpret)(y_t, dp_t,
                                                     params6[:, :, None])
    else:
        # single device: skip the partitioning wrapper (measured ~2% cost
        # from the extra call boundary on the one-chip bench path)
        dy_t, dbias = _dy_call(y_t, dp_t, params6[:, :, None], pt, pf,
                               interpret)
    return jnp.transpose(dy_t, (3, 0, 1, 2)), dbias


def stem_dy_applicable(y_shape, pool) -> bool:
    """TPU tile friendliness: C on sublanes, B on lanes — per device (the
    batch may shard over a mesh)."""
    bsz, t, f, c = y_shape
    pt, pf = pool
    return (t % pt == 0 and f % pf == 0
            and c % 8 == 0 and bsz % (8 * jax.device_count()) == 0)
