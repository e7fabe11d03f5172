"""AOT serving artifacts via jax.export (StableHLO).

The reference serves by loading Keras hdf5 checkpoints into a live TF
process (evaluator.py:53-58, make_answer.py) — the model-building Python
must ship with the weights. The TPU-native serving story is ahead-of-time
export: the jitted forward is traced ONCE, parameters are baked into the
program as constants, and the result is one serialized StableHLO artifact
loadable in any process — no flax, no model zoo, no checkpoint directory —
and callable under `jax.jit` on the platform(s) it was exported for.

Two serving units:

- ``window``: ``[b, win, F, C] -> (sed [b, t, C], doa [b, t, 3C])`` with a
  SYMBOLIC batch dimension — one artifact serves every batch size (the
  reference's per-window `model.predict` unit, params.py window geometry).
- ``clip`` (conv_temporal only): ``[T, F, C] -> (sed [L, C], doa [L, 3C])``
  — the trunk-once fast sliding-window predictor (inference/ensemble.py)
  for a fixed clip length; the bulk-scoring unit (~5 ms per 60 s clip on
  v5e, BASELINE.md round 3). Window starts are clip-static, so the clip
  length is baked (DCASE 60 s clips: T=3000).

Portability notes, recorded in the artifact's sidecar meta:
- An artifact runs on the platforms listed at export time (default: the
  exporting backend).
- Pallas kernels only bake into artifacts traced with STATIC shapes on a
  TPU backend: the ``clip`` unit, or ``window`` with an explicit
  ``batch=N`` (tile-aligned). A SYMBOLIC-batch window export always takes
  the portable scan-GRU path (`pallas_gru_applicable` rejects symbolic
  dims), as does any CPU export.
- jax guarantees artifact compatibility >= 1 month of jaxlib releases for
  custom-call-free programs; Pallas (Mosaic) custom calls narrow that
  window and are TPU-only. The meta records the exporting jax version.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

_META_SUFFIX = ".meta.json"


def _maybe_quantize_vars(apply_fn, variables, quantize: Optional[str]):
    """Swap (apply_fn, variables) for a dequantizing apply + quantized tree.

    All export units call ``apply_fn(variables, x, ...)`` with the tree
    held opaquely, so weight-only quantization (inference/quantize.py) is a
    pure substitution: the traced program bakes int8 words + scales as its
    constants and dequantizes on device.
    """
    if not quantize:
        return apply_fn, variables
    from seld_tpu.inference.quantize import quantize_tree, wrap_dequant
    return wrap_dequant(apply_fn), quantize_tree(variables, quantize)


def export_window_forward(model, variables, input_shape: Sequence[int], *,
                          batch: Optional[int] = None,
                          dtype=jnp.float32,
                          platforms: Optional[Sequence[str]] = None,
                          mesh=None, batch_axis: str = "data",
                          quantize: Optional[str] = None):
    """Export the per-window forward.

    Args:
      model: a built flax model (seld_tpu.models.build_model output).
      variables: its full variable dict (params [+ batch_stats]) — baked
        into the artifact as constants.
      input_shape: per-window feature shape, e.g. (300, 64, 7).
      batch: None (default) exports a SYMBOLIC batch dimension — one
        artifact serves every batch size, always via the portable scan
        GRU. An int exports that fixed batch; on a TPU backend a
        tile-aligned batch (B % 8 == 0) bakes the Pallas GRU kernel, so
        the artifact matches live serving speed (TPU-only artifact).
      dtype: input dtype the artifact accepts (bf16 halves feed bytes).
      platforms: lowering platforms, e.g. ("cpu", "tpu"); None = current.
      mesh: a `jax.sharding.Mesh` exports an SPMD artifact: the batch dim
        is sharded over `batch_axis` and the serving process runs one
        dispatch across all mesh devices (GSPMD inserts any collectives).
        Requires a static `batch` divisible by the mesh size; callers
        `jax.device_put` the global batch with the same sharding (the
        artifact records `nr_devices` and refuses other device counts).
      batch_axis: mesh axis name the batch shards over.
      quantize: None (f32 weights), "int8" (per-channel weight-only — the
        artifact bakes int8 words + scales, ~4x smaller), or "bfloat16"
        (2x). See inference/quantize.py; dequant runs inside the artifact.

    Returns a jax.export.Exported.
    """
    apply_fn, variables = _maybe_quantize_vars(model.apply, variables,
                                               quantize)

    def fwd(x):
        return apply_fn(variables, x, train=False)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        if not batch:
            raise ValueError("SPMD export needs a static batch "
                             "(symbolic dims cannot shard)")
        if batch % mesh.devices.size:
            raise ValueError(f"batch {batch} must divide over the "
                             f"{mesh.devices.size}-device mesh")
        s = NamedSharding(mesh, PartitionSpec(batch_axis))
        fn = jax.jit(fwd, in_shardings=(s,), out_shardings=(s, s))
    else:
        fn = jax.jit(fwd)
    b = batch if batch else jexport.symbolic_shape("b")[0]
    spec = jax.ShapeDtypeStruct((b, *input_shape), dtype)
    return jexport.export(
        fn, platforms=tuple(platforms) if platforms else None)(spec)


def export_clip_fast(model, variables, clip_frames: int,
                     input_shape: Sequence[int], *,
                     win_size: int = 300, step_size: int = 5,
                     time_down: Optional[int] = None,
                     dtype=jnp.float32,
                     platforms: Optional[Sequence[str]] = None,
                     quantize: Optional[str] = None):
    """Export the trunk-once fast sliding-window clip predictor.

    One call scores a whole fixed-length clip: the time-local trunk runs
    once, all windows flow through the sequence head in one chunk, and the
    overlap-add normalization happens inside the artifact. conv_temporal
    only (needs the trunk/head stage split, models.py).
    """
    from seld_tpu.inference.ensemble import _predict_clip_fast

    if time_down is None:
        raise ValueError("pass time_down (conv_temporal: "
                         "first_pool_size[0], e.g. 5)")
    apply_fn, variables = _maybe_quantize_vars(model.apply, variables,
                                               quantize)

    def fwd(x):
        return _predict_clip_fast(
            variables, x, apply_fn=apply_fn, win_size=win_size,
            step_size=step_size, batch_size=1 << 30, time_down=time_down)

    spec = jax.ShapeDtypeStruct((clip_frames, *input_shape[1:]), dtype)
    return jexport.export(
        jax.jit(fwd),
        platforms=tuple(platforms) if platforms else None)(spec)


def export_window_ensemble(members, input_shape: Sequence[int], *,
                           batch: Optional[int] = None,
                           dtype=jnp.float32,
                           platforms: Optional[Sequence[str]] = None,
                           quantize: Optional[str] = None):
    """Export an N-model ensemble per-window forward as ONE artifact.

    The reference serves ensembles by loading every member into a live TF
    process and averaging outputs in Python (make_answer.py:133-140,
    evaluator.py:89-103). Here all members' weights bake into a single
    StableHLO program whose one dispatch returns the averaged
    (sed, doa) — XLA schedules the member forwards back-to-back on
    device with no host round trip between them.

    Args:
      members: sequence of (apply_fn, variables) — architectures may
        differ; every member must accept the same input geometry and emit
        the same output geometry.
    """
    members = [_maybe_quantize_vars(f, v, quantize) for f, v in members]

    def fwd(x):
        seds, doas = [], []
        for apply_fn, variables in members:
            s, d = apply_fn(variables, x, train=False)
            # average in f32 (reference averages in TF f32 regardless of
            # member compute dtype)
            seds.append(s.astype(jnp.float32))
            doas.append(d.astype(jnp.float32))
        n = float(len(members))
        return sum(seds) / n, sum(doas) / n

    b = batch if batch else jexport.symbolic_shape("b")[0]
    spec = jax.ShapeDtypeStruct((b, *input_shape), dtype)
    return jexport.export(
        jax.jit(fwd),
        platforms=tuple(platforms) if platforms else None)(spec)


def export_clip_fast_ensemble(members, clip_frames: int,
                              input_shape: Sequence[int], *,
                              win_size: int = 300, step_size: int = 5,
                              time_downs: Sequence[int],
                              dtype=jnp.float32,
                              platforms: Optional[Sequence[str]] = None,
                              quantize: Optional[str] = None):
    """Export an N-model ensemble trunk-once clip scorer as ONE artifact.

    Each member runs its own trunk-once fast sliding-window pass
    (`_predict_clip_fast`) and the overlap-added label sequences are
    averaged inside the artifact — the whole make_answer.py ensemble
    journey (windows -> members -> overlap-add -> average) in a single
    dispatch per clip. `time_downs[i]` is member i's total trunk time
    stride (conv_temporal: first_pool_size[0]); members may disagree as
    long as each divides step_size.
    """
    from seld_tpu.inference.ensemble import _predict_clip_fast

    if len(time_downs) != len(members):
        raise ValueError("need one time_down per member")
    members = [_maybe_quantize_vars(f, v, quantize) for f, v in members]

    def fwd(x):
        seds, doas = [], []
        for (apply_fn, variables), td in zip(members, time_downs):
            s, d = _predict_clip_fast(
                variables, x, apply_fn=apply_fn, win_size=win_size,
                step_size=step_size, batch_size=1 << 30, time_down=td)
            seds.append(s)  # _predict_clip_fast already returns f32
            doas.append(d)
        n = float(len(members))
        return sum(seds) / n, sum(doas) / n

    spec = jax.ShapeDtypeStruct((clip_frames, *input_shape[1:]), dtype)
    return jexport.export(
        jax.jit(fwd),
        platforms=tuple(platforms) if platforms else None)(spec)


def export_streaming(apply_fn, variables, feat_shape, out_dir: str, *,
                     win_size: int = 300, step_size: int = 5,
                     time_down: int = 5, chunk: int = 10,
                     halo: Optional[int] = None, dtype=jnp.float32,
                     n_streams: int = 1,
                     platforms: Optional[Sequence[str]] = None,
                     quantize: Optional[str] = None) -> str:
    """Export the real-time streaming engine as an artifact BUNDLE.

    Writes `<out_dir>/{bootstrap,step,finalize}.shlo` (the engine's three
    fixed-shape device steps, params baked in) plus `meta.json` with the
    geometry and the trunk halo MEASURED here at export time.
    `StreamingSELD.from_exported(out_dir)` then serves live feeds with no
    model code in the process. All shapes are static (streaming is
    fixed-geometry by design), so a TPU export bakes the Pallas kernels.
    """
    from seld_tpu.inference.streaming import StreamingSELD

    apply_fn, variables = _maybe_quantize_vars(apply_fn, variables, quantize)
    engine = StreamingSELD(apply_fn, variables, feat_shape,
                           win_size=win_size, step_size=step_size,
                           time_down=time_down, chunk=chunk, halo=halo,
                           dtype=dtype, n_streams=n_streams)
    plats = tuple(platforms) if platforms else None
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    feats_lf = jax.ShapeDtypeStruct(
        (n_streams, engine.l_f, *engine.feat_shape), dtype)
    chunk_spec = jax.ShapeDtypeStruct(
        (n_streams, engine.chunk_f, *engine.feat_shape), dtype)

    # the step/finalize signatures take the bootstrap's state pytree;
    # recover its avals without running the model
    state_avals, _ = jax.eval_shape(engine._boot, feats_lf, i32, i32)

    os.makedirs(out_dir, exist_ok=True)
    save_exported(
        jexport.export(jax.jit(engine._boot), platforms=plats)(
            feats_lf, i32, i32),
        os.path.join(out_dir, "bootstrap.shlo"))
    save_exported(
        jexport.export(jax.jit(engine._step), platforms=plats)(
            state_avals, chunk_spec, i32, i32, i32),
        os.path.join(out_dir, "step.shlo"))
    save_exported(
        jexport.export(jax.jit(engine._fin), platforms=plats)(
            state_avals, feats_lf, i32, i32, i32, i32),
        os.path.join(out_dir, "finalize.shlo"))
    meta = {
        "format": "seld_tpu.streaming_bundle/v1",
        "jax_version": jax.__version__,
        "feat_shape": list(engine.feat_shape),
        "win_size": win_size, "step_size": step_size,
        "time_down": time_down, "chunk": chunk, "halo": engine.halo_t,
        "dtype": jnp.dtype(dtype).name, "n_streams": n_streams,
        "l_f": engine.l_f,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def save_exported(exported, path: str,
                  extra_meta: Optional[Dict[str, Any]] = None) -> str:
    """Serialize `exported` to `path` plus a human-readable sidecar
    `<path>.meta.json` (shapes, dtypes, platforms, jax version)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    meta = {
        "format": "jax.export/stablehlo",
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "nr_devices": exported.nr_devices,
        "bytes": len(data),
    }
    meta.update(extra_meta or {})
    with open(path + _META_SUFFIX, "w") as f:
        json.dump(meta, f, indent=2)
    return path


class LoadedArtifact:
    """A deserialized serving artifact: `call(x)` under jit, plus meta."""

    def __init__(self, exported, meta: Dict[str, Any]):
        self.exported = exported
        self.meta = meta
        self.call = jax.jit(exported.call)

    @property
    def platforms(self) -> Tuple[str, ...]:
        return tuple(self.exported.platforms)


def load_exported(path: str) -> LoadedArtifact:
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    meta_path = path + _META_SUFFIX
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return LoadedArtifact(exported, meta)
