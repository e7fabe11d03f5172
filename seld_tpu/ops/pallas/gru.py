"""Fused (bi)directional GRU recurrence as Pallas TPU kernels.

The reference's hot recurrence is Keras' cuDNN biGRU (modules.py:302-319).
Round-1 re-design ran it as `lax.scan` over a doubled batch; profiling showed
~5% of the SS5 train step in the scan's while-loop plus layout copies for the
stack/reverse/moveaxis choreography (docs/STATUS.md). This kernel removes all
of it:

  - ONE pallas_call per direction-set: grid = (D, T), sequential on the core,
    with the hidden state carried in VMEM scratch across grid steps —
    no while-loop dispatch, no per-step HBM round trip for h.
  - The big input projection x @ W stays OUTSIDE the kernel (one large MXU
    matmul XLA already does optimally); the kernel consumes x_proj
    [D, T, B, 3U] (input bias folded in).
  - Direction handling lives in the BlockSpec index maps (d=0 ascending,
    d=1 descending time), so both directions' outputs land REAL-TIME aligned
    in hs[D, T, B, U] and the merge is a plain elementwise op — the
    stack/reverse copies of the scan path disappear.
  - Training: custom VJP with a second Pallas kernel that runs BPTT in scan-
    reverse order per direction, recomputing gates from (h_prev, x_proj)
    instead of saving them (HBM traffic beats re-FLOPs here), accumulating
    dRk/dRb in VMEM scratch, and emitting dx_proj so XLA chains the input
    projection's backward as a single big matmul.

Gate math follows Keras GRU v2 semantics (reset_after=True, z|r|h order),
matching seld_tpu.models.layers.GRU's scan path bit-for-bit in fp32 (tested
in interpret mode on CPU and against torch goldens).

Applicability: B % 8 == 0 and U % 128 == 0 (fp32 tile alignment). The scan
path remains the fallback for other shapes and non-TPU backends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _gates(xp, hp, h):
    """Keras reset_after GRU cell: xp/hp [B, 3U] with z|r|h layout."""
    u = h.shape[-1]
    xz, xr, xh = xp[:, :u], xp[:, u:2 * u], xp[:, 2 * u:]
    hz, hr, hh = hp[:, :u], hp[:, u:2 * u], hp[:, 2 * u:]
    z = jax.nn.sigmoid(xz + hz)
    r = jax.nn.sigmoid(xr + hr)
    hcand = jnp.tanh(xh + r * hh)
    return z, r, hcand, hh


def _fwd_kernel(xp_ref, rk_ref, rb_ref, out_ref, h_scr):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]
    # compute in f32 regardless of storage dtype (bf16 inputs upcast here)
    hp = (jnp.dot(h, rk_ref[0].astype(jnp.float32),
                  preferred_element_type=jnp.float32)
          + rb_ref[0].astype(jnp.float32))
    xp = xp_ref[0, 0].astype(jnp.float32)
    z, r, hcand, _ = _gates(xp, hp, h)
    h_new = z * h + (1.0 - z) * hcand
    h_scr[:] = h_new
    out_ref[0, 0] = h_new.astype(out_ref.dtype)


def _bwd_kernel(xp_ref, hprev_ref, g_ref, rk_ref, rb_ref,
                dxp_ref, drk_ref, drb_ref, dh_scr, drk_scr, drb_scr):
    s = pl.program_id(1)
    t_steps = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        drk_scr[:] = jnp.zeros_like(drk_scr)
        drb_scr[:] = jnp.zeros_like(drb_scr)

    # h_prev is zero at the scan start (s == t_steps - 1 processes scan t=0)
    h_prev = jnp.where(s == t_steps - 1, 0.0,
                       hprev_ref[0, 0].astype(jnp.float32))
    rk = rk_ref[0].astype(jnp.float32)
    hp = (jnp.dot(h_prev, rk, preferred_element_type=jnp.float32)
          + rb_ref[0].astype(jnp.float32))
    xp = xp_ref[0, 0].astype(jnp.float32)
    z, r, hcand, hh = _gates(xp, hp, h_prev)

    dh = dh_scr[:] + g_ref[0, 0].astype(jnp.float32)
    dz = dh * (h_prev - hcand)
    da_h = dh * (1.0 - z) * (1.0 - hcand * hcand)   # pre-tanh
    dr = da_h * hh
    da_z = dz * z * (1.0 - z)
    da_r = dr * r * (1.0 - r)

    dxp = jnp.concatenate([da_z, da_r, da_h], axis=-1)
    dhp = jnp.concatenate([da_z, da_r, da_h * r], axis=-1)
    dxp_ref[0, 0] = dxp.astype(dxp_ref.dtype)

    dh_prev = dh * z + jnp.dot(dhp, rk.T, preferred_element_type=jnp.float32)
    dh_scr[:] = dh_prev
    drk_scr[:] += jnp.dot(h_prev.T, dhp, preferred_element_type=jnp.float32)
    drb_scr[:] += jnp.sum(dhp, axis=0, keepdims=True)

    @pl.when(s == t_steps - 1)
    def _():
        drk_ref[0] = drk_scr[:].astype(drk_ref.dtype)
        drb_ref[0] = drb_scr[:].astype(drb_ref.dtype)


def _t_index(d, s, t_steps):
    """Real-time index for scan step s: d=0 ascends, d=1 descends."""
    return jnp.where(d == 0, s, t_steps - 1 - s)


def _interpret() -> bool:
    """Plain jaxpr interpretation off-TPU (works inside custom_partitioning
    lower_fns, unlike force_tpu_interpret_mode's effectful callbacks)."""
    return jax.default_backend() not in ("tpu", "axon")


def _gru_scan_ref(x_proj, rec_kernel, rec_bias):
    """Pure-JAX `lax.scan` with the kernel's exact layout and fp32 gate math.

    Per-shard fallback: the custom_partitioning lower_fns run with concrete
    per-shard shapes, so when GSPMD hands a partition whose batch shard is
    not sublane-aligned (e.g. an 8-way shard of a small eval batch), the
    impl drops to this scan for that compilation instead of rejecting the
    Pallas path globally. d=1 runs the recurrence in descending time with
    states landing at their true t (scan reverse=True), matching the
    kernel's real-time-indexed output.
    """
    def run(xp, rk, rb, reverse):
        def step(h, xp_t):
            hp = jnp.dot(h, rk, preferred_element_type=jnp.float32) + rb
            z, r, hcand, _ = _gates(xp_t.astype(jnp.float32), hp, h)
            h_new = z * h + (1.0 - z) * hcand
            return h_new, h_new

        h0 = jnp.zeros((xp.shape[1], rk.shape[0]), jnp.float32)
        _, hs = jax.lax.scan(step, h0, xp, reverse=reverse)
        return hs

    rk = rec_kernel.astype(jnp.float32)
    rb = rec_bias.astype(jnp.float32)
    outs = [run(x_proj[0], rk[0], rb[0], False)]
    if x_proj.shape[0] == 2:
        outs.append(run(x_proj[1], rk[1], rb[1], True))
    return jnp.stack(outs, axis=0).astype(x_proj.dtype)


def _gru_scan_bwd_ref(x_proj, rec_kernel, rec_bias, g):
    _, vjp = jax.vjp(_gru_scan_ref, x_proj, rec_kernel, rec_bias)
    return vjp(g)


def _gru_scan_fwd_impl(x_proj, rec_kernel, rec_bias):
    d, t, b, k = x_proj.shape
    u = k // 3
    if b % 8:  # per-shard sublane misalignment: identical-semantics scan
        return _gru_scan_ref(x_proj, rec_kernel, rec_bias)

    grid = (d, t)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, b, k),
                         lambda di, s: (di, _t_index(di, s, t), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u, k), lambda di, s: (di, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda di, s: (di, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, b, u),
                               lambda di, s: (di, _t_index(di, s, t), 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, t, b, u), x_proj.dtype),
        scratch_shapes=[pltpu.VMEM((b, u), jnp.float32)],
        interpret=_interpret(),
    )(x_proj, rec_kernel, rec_bias[:, None])


def _gru_scan_bwd_impl(x_proj, rec_kernel, rec_bias, hs, g):
    d, t, b, k = x_proj.shape
    u = k // 3
    if b % 8:  # mirror the forward's per-shard fallback (same shardings)
        return _gru_scan_bwd_ref(x_proj, rec_kernel, rec_bias, g)

    def t_cur(di, s):
        # backward processes scan order reversed: scan position p = t-1-s
        return _t_index(di, t - 1 - s, t)

    def t_prev(di, s):
        # h_{p-1} in scan order; clamped at the boundary (kernel zeroes it)
        p = t - 1 - s
        prev_fwd = jnp.maximum(p - 1, 0)          # d=0: real t = p-1
        prev_bwd = jnp.minimum(t - p, t - 1)      # d=1: real t = t-1-(p-1)
        return jnp.where(di == 0, prev_fwd, prev_bwd)

    grid = (d, t)
    dxp, drk, drb = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, b, k), lambda di, s: (di, t_cur(di, s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b, u), lambda di, s: (di, t_prev(di, s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b, u), lambda di, s: (di, t_cur(di, s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u, k), lambda di, s: (di, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda di, s: (di, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, b, k), lambda di, s: (di, t_cur(di, s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u, k), lambda di, s: (di, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda di, s: (di, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, t, b, k), x_proj.dtype),
            jax.ShapeDtypeStruct((d, u, k), rec_kernel.dtype),
            jax.ShapeDtypeStruct((d, 1, k), rec_bias.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, u), jnp.float32),
            pltpu.VMEM((u, k), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
        ],
        interpret=_interpret(),
    )(x_proj, hs, g, rec_kernel, rec_bias[:, None])
    return dxp, drk, drb[:, 0]


# --------------------------------------------------------------------------
# SPMD: custom_partitioning wrappers so GSPMD/Shardy shard the recurrence
# over the batch axis (dim 2) on device meshes instead of all-gathering
# around an opaque custom-call. The recurrence is embarrassingly parallel in
# batch; dRk/dRb are per-shard partial sums psum'd in the partition body.
# Single-device paths call the impls directly (no wrapper overhead).
# --------------------------------------------------------------------------

def _batch_axis(arg_shape, dim=2):
    spec = arg_shape.sharding.spec
    return spec[dim] if len(spec) > dim else None


@functools.lru_cache(maxsize=None)
def _sharded_fwd():
    @custom_partitioning
    def fn(x_proj, rec_kernel, rec_bias):
        return _gru_scan_fwd_impl(x_proj, rec_kernel, rec_bias[:, 0])

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(None, None, _batch_axis(arg_shapes[0])))

    def partition(mesh, arg_shapes, result_shape):
        baxis = _batch_axis(arg_shapes[0])
        data = NamedSharding(mesh, P(None, None, baxis))
        rep = NamedSharding(mesh, P())

        def lower_fn(x_proj, rec_kernel, rec_bias):
            return _gru_scan_fwd_impl(x_proj, rec_kernel, rec_bias[:, 0])

        return mesh, lower_fn, data, (data, rep, rep)

    fn.def_partition(infer_sharding_from_operands=infer, partition=partition,
                     sharding_rule="d t b k, d u k, d o k -> d t b u")
    return fn


@functools.lru_cache(maxsize=None)
def _sharded_bwd():
    @custom_partitioning
    def fn(x_proj, rec_kernel, rec_bias, hs, g):
        return _gru_scan_bwd_impl(x_proj, rec_kernel, rec_bias[:, 0], hs, g)

    def infer(mesh, arg_shapes, result_shape):
        baxis = _batch_axis(arg_shapes[0])
        return (NamedSharding(mesh, P(None, None, baxis)),
                NamedSharding(mesh, P()), NamedSharding(mesh, P()))

    def partition(mesh, arg_shapes, result_shape):
        baxis = _batch_axis(arg_shapes[0])
        data = NamedSharding(mesh, P(None, None, baxis))
        rep = NamedSharding(mesh, P())

        def lower_fn(x_proj, rec_kernel, rec_bias, hs, g):
            dxp, drk, drb = _gru_scan_bwd_impl(
                x_proj, rec_kernel, rec_bias[:, 0], hs, g)
            if baxis is not None:
                drk = jax.lax.psum(drk, baxis)
                drb = jax.lax.psum(drb, baxis)
            return dxp, drk, drb

        return (mesh, lower_fn, (data, rep, rep),
                (data, rep, rep, data, data))

    fn.def_partition(
        infer_sharding_from_operands=infer, partition=partition,
        sharding_rule=("d t b k, d u k, d o k, d t b u, d t b u"
                       " -> d t b k, d u k, d k"))
    return fn


@jax.custom_vjp
def gru_scan(x_proj, rec_kernel, rec_bias):
    """Fused GRU recurrence.

    Args:
      x_proj:     [D, T, B, 3U] input projection incl. input bias
                  (z|r|h gate layout, Keras order)
      rec_kernel: [D, U, 3U]
      rec_bias:   [D, 3U] recurrent bias (reset_after)

    Returns hs [D, T, B, U] — REAL-time indexed for both directions (d=1 ran
    the recurrence in descending time; its states land at their true t).
    """
    if jax.device_count() > 1:
        return _sharded_fwd()(x_proj, rec_kernel, rec_bias[:, None])
    return _gru_scan_fwd_impl(x_proj, rec_kernel, rec_bias)


def _gru_scan_vjp_fwd(x_proj, rec_kernel, rec_bias):
    hs = gru_scan(x_proj, rec_kernel, rec_bias)
    return hs, (x_proj, rec_kernel, rec_bias, hs)


def _gru_scan_vjp_bwd(res, g):
    x_proj, rec_kernel, rec_bias, hs = res
    if jax.device_count() > 1:
        dxp, drk, drb = _sharded_bwd()(x_proj, rec_kernel,
                                       rec_bias[:, None], hs, g)
        return dxp, drk, drb
    return _gru_scan_bwd_impl(x_proj, rec_kernel, rec_bias, hs, g)


gru_scan.defvjp(_gru_scan_vjp_fwd, _gru_scan_vjp_bwd)


def pallas_gru_applicable(batch: int, units: int) -> bool:
    """fp32 tile alignment: lanes want 3U % 128 == 0 via U % 128; sublanes
    want per-shard B % 8 == 0. The batch may shard over a mesh axis, but the
    partition lower_fns fall back to an identical-semantics lax.scan when a
    shard is misaligned, so global B % 8 == 0 suffices: a replicated batch
    runs whole on each device, and an n-way shard either stays aligned or
    drops to the scan per-shard (correct either way)."""
    if not isinstance(batch, (int, np.integer)):
        return False  # symbolic batch (jax.export polymorphism): scan path
    return batch % 8 == 0 and units % 128 == 0


def gru_forward(x, kernel, rec_kernel, bias, *, bidirectional: bool,
                merge_mode: str = "mul", gate_masks=None):
    """Full GRU layer forward on the Pallas path.

    x [B, T, I]; kernel [D, I, 3U]; rec_kernel [D, U, 3U]; bias [D, 2, 3U];
    gate_masks [D, 3, B, 1, I] or None (Keras-style per-gate input dropout,
    time-constant — see layers.GRU).
    Returns [B, T, U*dirs] ('concat') or [B, T, U] (other merges) matching
    seld_tpu.models.layers.GRU.
    """
    # one big MXU matmul for all timesteps/directions; bias[.., 0] = input
    if gate_masks is None:
        x_proj = jnp.einsum("bti,dik->dtbk", x, kernel)
    else:
        u = rec_kernel.shape[1]
        x_proj = jnp.concatenate([
            jnp.einsum("dbti,diu->dtbu", x[None] * gate_masks[:, g],
                       kernel[:, :, g * u:(g + 1) * u])
            for g in range(3)], axis=-1)
    x_proj = x_proj + bias[:, None, None, 0]
    hs = gru_scan(x_proj, rec_kernel, bias[:, 1])      # [D, T, B, U]
    hs = jnp.moveaxis(hs, 2, 1)                        # [D, B, T, U]
    if not bidirectional:
        return hs[0]
    from seld_tpu.models.layers import merge_bidirectional
    return merge_bidirectional(hs[0], hs[1], merge_mode)
