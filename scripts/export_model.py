#!/usr/bin/env python3
"""Export a trained checkpoint as an AOT serving artifact (StableHLO).

The reference's serving unit is a live TF process re-building the model
around Keras hdf5 weights (evaluator.py:53-58); this exports the jitted
forward ONCE with the weights baked in, producing a single file any process
can load with `seld_tpu.inference.load_exported` (or raw
jax.export.deserialize) — no model zoo, no flax, no checkpoint directory.

    # one artifact serves every batch size (symbolic batch dim):
    python scripts/export_model.py --ckpt <orbax dir> --model_config SS5 \
        --out ./ss5_window.shlo

    # whole-clip bulk scorer (trunk-once fast path, fixed 60 s geometry):
    python scripts/export_model.py --ckpt <orbax dir> --model_config SS5 \
        --unit clip --out ./ss5_clip.shlo

Export ON the deployment platform by default (a TPU export bakes the
Pallas GRU custom call and is TPU-only; --platforms cpu,tpu from a CPU
host exports a portable scan-path artifact).
"""
import argparse
import os
import sys

if os.environ.get("SELD_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seld_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir "
                    "(trainer output or scripts/import_tf_weights.py); "
                    "comma-separate N checkpoints to bake an N-model "
                    "ensemble (averaged outputs, make_answer.py:133-140) "
                    "into one artifact (window/clip units)")
    ap.add_argument("--model", default="conv_temporal",
                    help="comma list broadcast across ensemble members")
    ap.add_argument("--model_config", required=True,
                    help="zoo name or a model-config JSON path; comma list "
                         "broadcast across ensemble members")
    ap.add_argument("--out", required=True, help="artifact file to write")
    ap.add_argument("--unit", default="window",
                    choices=["window", "clip", "stream"],
                    help="window: [b, win, F, C] forward with symbolic "
                         "batch; clip: fixed-length trunk-once clip scorer; "
                         "stream: real-time engine bundle (--out becomes a "
                         "directory; serve via StreamingSELD.from_exported)."
                         " clip/stream are conv_temporal only")
    ap.add_argument("--batch", type=int, default=0,
                    help="window unit: 0 (default) = symbolic batch (one "
                         "artifact, every batch size, portable scan GRU); "
                         "N = static batch — on TPU a tile-aligned N bakes "
                         "the Pallas GRU kernel (TPU-only artifact)")
    ap.add_argument("--n_classes", type=int, default=12)
    ap.add_argument("--win_size", type=int, default=300)
    ap.add_argument("--n_freq", type=int, default=64)
    ap.add_argument("--n_chan", type=int, default=7,
                    help="7 foa / 10 mic / 17 joint")
    ap.add_argument("--step_size", type=int, default=5,
                    help="clip unit: window stride in feature frames")
    ap.add_argument("--clip_frames", type=int, default=3000,
                    help="clip unit: fixed clip length (3000 = 60 s DCASE)")
    ap.add_argument("--chunk", type=int, default=10,
                    help="stream unit: label frames per dispatch (10 = 1 s)")
    ap.add_argument("--n_streams", type=int, default=1,
                    help="stream unit: lockstep streams per dispatch")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--quantize", default="none",
                    choices=["none", "int8", "bfloat16"],
                    help="weight-only quantization of the baked constants: "
                         "int8 = per-output-channel symmetric (~4x smaller "
                         "artifact), bfloat16 = cast weights (~2x). "
                         "Activations/compute keep the model dtype; dequant "
                         "runs inside the artifact (inference/quantize.py)")
    ap.add_argument("--data_parallel", type=int, default=0,
                    help="window unit: export an SPMD artifact sharded "
                         "over this many devices (batch must divide it; "
                         "callers device_put the global batch)")
    ap.add_argument("--platforms", default="",
                    help="comma list, e.g. cpu,tpu; empty = current backend")
    ap.add_argument("--verify", action="store_true",
                    help="reload the artifact and check it matches the live "
                         "model on random input")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seld_tpu.config import resolve_model_config
    from seld_tpu.inference.export import (export_window_forward,
                                           export_clip_fast,
                                           export_window_ensemble,
                                           export_clip_fast_ensemble,
                                           save_exported, load_exported)
    from seld_tpu.models import build_model
    from seld_tpu.train.checkpoint import load_variables

    ckpts = [c.strip() for c in args.ckpt.split(",") if c.strip()]

    def broadcast(value, name):
        items = [v.strip() for v in value.split(",") if v.strip()]
        if len(items) == 1:
            return items * len(ckpts)
        if len(items) != len(ckpts):
            raise SystemExit(f"--{name}: {len(items)} values for "
                             f"{len(ckpts)} checkpoints")
        return items

    model_names = broadcast(args.model, "model")
    config_names = broadcast(args.model_config, "model_config")
    if args.unit in ("clip", "stream") and set(model_names) != \
            {"conv_temporal"}:
        raise SystemExit(f"--unit {args.unit} needs the trunk/head stage "
                         "split (conv_temporal only)")
    if args.unit == "stream" and len(ckpts) > 1:
        raise SystemExit("--unit stream serves one engine per checkpoint; "
                         "export each member separately")
    if args.data_parallel and args.unit != "window":
        raise SystemExit(f"--data_parallel is a window-unit option; "
                         f"--unit {args.unit} artifacts are single-device")

    input_shape = (args.win_size, args.n_freq, args.n_chan)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 or None)

    members, time_downs = [], []
    for name, cfg_name, ckpt in zip(model_names, config_names, ckpts):
        member_config = resolve_model_config(cfg_name)
        member_config["n_classes"] = args.n_classes
        member = build_model(name, input_shape, member_config)
        template = member.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, *input_shape)), train=False)
        members.append((member,
                        load_variables(os.path.abspath(ckpt.rstrip("/")),
                                       template)))
        time_downs.append(member_config.get("first_pool_size", [5, 4])[0])

    # verify compares against the FAKE-quantized live model (live_members):
    # dequant o quant is op-identical to what the artifact computes, so the
    # standard compile-divergence tolerance still applies. quantize_tree is
    # deterministic, so this report loop's qtree is bit-identical to the
    # one the export call bakes below (the export functions re-run it).
    quantize = None if args.quantize == "none" else args.quantize
    live_members = members
    if quantize:
        from seld_tpu.inference.quantize import (dequantize_tree,
                                                 quantization_report,
                                                 quantize_tree)
        live_members = []
        for m, v in members:
            qtree = quantize_tree(v, quantize)
            rep = quantization_report(v, qtree)
            print(f"quantize {quantize}: weights "
                  f"{rep['bytes_before'] / 1e6:.2f} -> "
                  f"{rep['bytes_after'] / 1e6:.2f} MB, "
                  f"{rep['n_quantized_leaves']} leaves, "
                  f"max |w - deq(q(w))| = {rep['max_abs_error']:.3e}")
            live_members.append((m, dequantize_tree(qtree)))

    model, variables = members[0]
    model_config = resolve_model_config(config_names[0])
    model_config["n_classes"] = args.n_classes
    time_down = time_downs[0]
    if args.unit == "stream":
        from seld_tpu.inference.export import export_streaming
        from seld_tpu.inference.streaming import StreamingSELD

        bundle = export_streaming(
            model.apply, variables, input_shape[1:], args.out,
            win_size=args.win_size, step_size=args.step_size,
            time_down=time_down, chunk=args.chunk, dtype=dtype,
            n_streams=args.n_streams, platforms=platforms,
            quantize=quantize)
        print(f"exported stream bundle: {bundle} "
              f"(serve via StreamingSELD.from_exported)")
        if args.verify:
            live = StreamingSELD(
                model.apply, live_members[0][1], input_shape[1:],
                win_size=args.win_size, step_size=args.step_size,
                time_down=time_down, chunk=args.chunk, dtype=dtype,
                n_streams=args.n_streams)
            exp = StreamingSELD.from_exported(bundle)
            rng = np.random.RandomState(0)
            x = rng.randn(args.n_streams, 2 * live.l_f + live.chunk_f,
                          *input_shape[1:]).astype(np.float32)
            gl = list(live.push(x)) + list(live.finalize())
            ge = list(exp.push(x)) + list(exp.finalize())
            assert len(gl) == len(ge) and gl
            for (sl, dl), (se, de) in zip(gl, ge):
                np.testing.assert_allclose(np.asarray(se, np.float32),
                                           np.asarray(sl, np.float32),
                                           rtol=1e-3, atol=5e-3)
                np.testing.assert_allclose(np.asarray(de, np.float32),
                                           np.asarray(dl, np.float32),
                                           rtol=1e-3, atol=5e-3)
            print("verify: exported stream engine matches the live engine")
        return

    if args.unit == "window":
        mesh = None
        if args.data_parallel:
            if len(members) > 1:
                raise SystemExit("--data_parallel supports single-model "
                                 "window exports")
            from jax.sharding import Mesh
            devs = jax.devices()
            if len(devs) < args.data_parallel:
                raise SystemExit(f"--data_parallel {args.data_parallel}: "
                                 f"only {len(devs)} devices visible")
            mesh = Mesh(np.asarray(devs[:args.data_parallel]), ("data",))
        if len(members) == 1:
            exported = export_window_forward(
                model, variables, input_shape, batch=args.batch or None,
                dtype=dtype, platforms=platforms, mesh=mesh,
                quantize=quantize)
        else:
            exported = export_window_ensemble(
                [(m.apply, v) for m, v in members], input_shape,
                batch=args.batch or None, dtype=dtype, platforms=platforms,
                quantize=quantize)
    else:
        if len(members) == 1:
            exported = export_clip_fast(
                model, variables, args.clip_frames, input_shape,
                win_size=args.win_size, step_size=args.step_size,
                time_down=time_down, dtype=dtype, platforms=platforms,
                quantize=quantize)
        else:
            exported = export_clip_fast_ensemble(
                [(m.apply, v) for m, v in members], args.clip_frames,
                input_shape, win_size=args.win_size,
                step_size=args.step_size, time_downs=time_downs,
                dtype=dtype, platforms=platforms, quantize=quantize)

    save_exported(exported, args.out, extra_meta={
        "unit": args.unit, "model": args.model,
        "model_config": args.model_config, "n_classes": args.n_classes,
        "ckpt": ",".join(os.path.abspath(c.rstrip("/")) for c in ckpts),
        "n_members": len(members),
        "input_dtype": args.dtype,
        "quantize": args.quantize,
    })
    size = os.path.getsize(args.out)
    print(f"exported {args.unit} artifact: {args.out} "
          f"({size / 1e6:.2f} MB, platforms {list(exported.platforms)})")

    if args.verify:
        art = load_exported(args.out)
        rng = np.random.RandomState(0)
        if args.unit == "window":
            x = rng.randn(args.batch or 3, *input_shape).astype(np.float32)
            outs = [m.apply(v, jnp.asarray(x, dtype), train=False)
                    for m, v in live_members]
        else:
            x = rng.randn(args.clip_frames, args.n_freq,
                          args.n_chan).astype(np.float32)
            from seld_tpu.inference.ensemble import _predict_clip_fast
            outs = [_predict_clip_fast(
                        v, jnp.asarray(x, dtype), apply_fn=m.apply,
                        win_size=args.win_size, step_size=args.step_size,
                        batch_size=1 << 30, time_down=td)
                    for (m, v), td in zip(live_members, time_downs)]
        want = tuple(
            sum(jnp.asarray(o[i], jnp.float32) for o in outs) / len(outs)
            for i in range(2))
        xin = jnp.asarray(x, dtype)
        if args.data_parallel and args.unit == "window":
            from jax.sharding import NamedSharding, PartitionSpec
            xin = jax.device_put(np.asarray(xin),
                                 NamedSharding(mesh, PartitionSpec("data")))
        got = art.call(xin)
        # atol-dominant: two independent XLA compilations of the same math
        # legitimately differ at ~3e-3 on TPU (default matmul precision,
        # measured on SS5); the failure mode this guards — wrong/missing
        # baked weights — is O(1) on the sigmoid/tanh heads
        for g, w in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(g, np.float32),
                                       np.asarray(w, np.float32),
                                       rtol=1e-3, atol=5e-3)
        print("verify: artifact matches the live model")


if __name__ == "__main__":
    main()
