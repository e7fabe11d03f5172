"""Row-gather for the device-resident feed as a Pallas TPU kernel.

STATUS — measured-null variant, NOT in the production path. The
device-resident feed (`seld_tpu/data/device_dataset.py`,
`train/steps.py::make_train_epoch`) materializes each batch from the
HBM-staged windowed split with `x_all[ids]`; round-3 traces attributed
~1-2 ms/step to that gather, and this kernel (plus a tile-packed staging
layout) was built to attack it. The round-4 in-loop microbenchmark
(B=256 x [300,64,7] rows, real v5e, best-of-3, fori_loop so tunnel RPC
is excluded) killed the attack honestly:

    bf16  XLA gather, logical layout      0.649 ms  (212 GB/s)
    bf16  XLA gather, packed  (+unpack)   0.718 ms
    bf16  DMA ring (this file) (+unpack)  0.846 ms
    bf16  contiguous-copy floor, same B   0.645 ms  (213 GB/s)
    f32   XLA logical 1.112 / packed+unpack 1.364 / DMA+unpack 1.386

XLA's gather on the LOGICAL layout already runs at the chip's measured
contiguous-copy floor (~210-225 GB/s for read+write this session; DMA
inflight 4..48 and sequential ids all land on the same floor) — random
row gathers at 263 KB granularity have no bandwidth penalty, so there is
nothing for a custom kernel to win, and any packed layout pays a real
unpack copy (pallas_call outputs can't fuse into consumers; XLA's own
gather+slice+reshape DOES fuse and still loses to logical). The shipped
feed keeps `x_all[ids]`; with it, `--epoch_scan --fuse_metrics` measures
17.1k w/s end-to-end at 200-step epochs vs the 18.3k no-feed ceiling —
the residual ~0.9 ms/step IS this copy floor (BASELINE.md feed table).

Kept (tested, correct on TPU + interpret) because the two kernel shapes
are the canonical scalar-prefetch / DMA-ring gathers and the packed-row
helpers are reusable; `gather_rows` remains the entry point if a future
geometry (tiny rows, where per-row descriptor overhead dominates XLA's
gather) needs it.

No VJP: the gather feeds *data* (stop-gradient by construction), never
parameters. Reference counterpart: the host-side numpy fancy-index batch
assembly (data_loader.py:132-168).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _tpu_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:  # backend not initialized / unavailable
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_lanes(x, ids, *, interpret=False):
    """x [n, r, 128] -> x[ids] via one dynamic-block copy per output row."""
    x, ids = _align_vma(x, ids)
    n, r, lanes = x.shape

    def kernel(ids_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ids.shape[0],),
            in_specs=[pl.BlockSpec((1, r, lanes),
                                   lambda i, idr: (idr[i], 0, 0))],
            out_specs=pl.BlockSpec((1, r, lanes), lambda i, idr: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((ids.shape[0], r, lanes), x.dtype,
                                       vma=_out_vma(x, ids)),
        interpret=interpret,
    )(ids, x)


def _out_vma(x, ids):
    """Output varying-over-mesh-axes set: under shard_map (check_vma=True)
    pallas_call's out_shape must state it; the gather output varies over
    every axis either input varies over (frozenset() outside shard_map)."""
    return jax.typeof(x).vma | jax.typeof(ids).vma


def _align_vma(x, ids):
    """Lift both operands to the union of their varying axes — shard_map's
    check_vma requires a primitive's operands to agree (e.g. data-sharded
    rows gathered by replicated ids)."""
    union = _out_vma(x, ids)
    x = jax.lax.pcast(x, tuple(union - jax.typeof(x).vma), to="varying")
    ids = jax.lax.pcast(ids, tuple(union - jax.typeof(ids).vma), to="varying")
    return x, ids


@functools.partial(jax.jit, static_argnames=("inflight", "interpret"))
def _gather_dma(x, ids, *, inflight=16, interpret=False):
    """x [n, r, lanes] -> x[ids] as direct HBM->HBM row DMAs, `inflight`
    copies in flight on a round-robin semaphore ring.

    The pipelined-block variant (`_gather_lanes`) keeps only 2 row copies
    in flight (double buffering) and round-trips VMEM (measured 1.7 ms /
    81 GB/s for the B=256 feature-row batch); this one issues direct
    HBM->HBM copies and matches XLA's gather at the contiguous-copy floor
    (~0.6 ms / 230 GB/s raw, identical for inflight 4..48 and for
    sequential ids) — see the module docstring for why that makes it a
    measured null rather than a win.
    """
    x, ids = _align_vma(x, ids)
    n, r, lanes = x.shape
    b = ids.shape[0]
    k = min(inflight, b)

    def kernel(ids_ref, x_ref, o_ref, sems):
        def dma(i):
            return pltpu.make_async_copy(
                x_ref.at[ids_ref[i]], o_ref.at[i],
                sems.at[jax.lax.rem(i, k)])

        for j in range(k):  # warm up: fill the in-flight window
            dma(j).start()

        def body(i, carry):
            @pl.when(i + k < b)
            def _():
                dma(i + k).start()
            dma(i).wait()
            return carry

        jax.lax.fori_loop(0, b, body, 0)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((k,))],
        ),
        out_shape=jax.ShapeDtypeStruct((b, r, lanes), x.dtype,
                                       vma=_out_vma(x, ids)),
        interpret=interpret,
    )(ids, x)


_SUBLANES = 8


def packed_rows(row_shape) -> int:
    """Sublane rows (dim 1 of the packed [N, rp, 128] layout) for a logical
    per-item shape — rows padded up to a whole number of (8, 128) tiles so
    an HBM row slice is tile-exact (Mosaic rejects non-8-aligned slices:
    the physical layout pads dim 1 to a multiple of 8, so a contiguous
    unaligned row does not exist in HBM)."""
    row = 1
    for d in row_shape:
        row *= d
    r = -(-row // _LANES)
    return -(-r // _SUBLANES) * _SUBLANES


def pack_rows(x: "np.ndarray"):
    """Host-side: [N, ...] -> [N, rp, 128] zero-padded packed layout.

    Stage THIS with put_sharded and gather with gather_rows; recover the
    logical batch with unpack_rows. Padding overhead for the SELD feature
    row (300*64*7 = 134400 -> 1056*128) is 0.57% of HBM.
    """
    import numpy as np
    n = x.shape[0]
    row = int(np.prod(x.shape[1:]))
    rp = packed_rows(x.shape[1:])
    flat = np.ascontiguousarray(x).reshape(n, row)
    if rp * _LANES == row:
        return flat.reshape(n, rp, _LANES)
    out = np.zeros((n, rp, _LANES), x.dtype)
    out.reshape(n, -1)[:, :row] = flat
    return out


def unpack_rows(xb, row_shape):
    """[B, rp, 128] packed batch -> [B, *row_shape]. One slice+reshape —
    XLA fuses it into the consumer (augment / input cast) when that
    consumer is a fusion."""
    b = xb.shape[0]
    row = 1
    for d in row_shape:
        row *= d
    return xb.reshape(b, -1)[:, :row].reshape(b, *row_shape)


def gather_rows(x, ids, *, inflight=16, interpret=False):
    """`x[ids]` along axis 0 at memcpy bandwidth (TPU), XLA gather otherwise.

    Usable inside jit/scan/shard_map (pure local op). `ids` must be 1-D
    integer. Path selection by row geometry:
      - packed rows ([N, r, 128] with r % 8 == 0, e.g. from pack_rows):
        direct HBM->HBM row DMAs with `inflight` copies in flight — the
        bandwidth path.
      - lane-aligned rows (elements % 128 == 0): dynamic-block pipeline
        gather (correct everywhere, DMA-latency-bound at 2 in flight).
      - anything else / non-TPU backends: XLA gather.
    """
    row = 1
    for d in x.shape[1:]:
        row *= d
    if not (interpret or _tpu_backend()) or row % _LANES or x.ndim < 2:
        return x[ids]
    ids = ids.astype(jnp.int32)
    r = row // _LANES
    if x.ndim == 3 and x.shape[2] == _LANES and r % _SUBLANES == 0:
        return _gather_dma(x, ids, inflight=inflight, interpret=interpret)
    out = _gather_lanes(x.reshape(x.shape[0], r, _LANES), ids,
                        interpret=interpret)
    return out.reshape(ids.shape[0], *x.shape[1:])
