#!/usr/bin/env python3
"""Serve exported SELD artifacts over HTTP — zero model code at runtime.

The deployment pair to scripts/export_model.py: export once, then

    # bulk scoring (window or clip artifact):
    python scripts/serve.py --artifact ss5_clip.shlo --port 8765

    # live streams (bundle dir from --unit stream), or both at once:
    python scripts/serve.py --artifact ss5_clip.shlo --bundle ss5_stream/

    # client (stdlib): seld_tpu.serving.client.SELDClient
    #   sed, doa = SELDClient(port=8765).score(x)        # one dispatch
    #   SELDClient().stream_push("mic0", feats_chunk)    # live session

Protocol: npy request bodies, npz responses (see seld_tpu/serving/server.py
module docstring for the route table). The process needs jax + numpy +
seld_tpu.serving only — no flax, no checkpoint, no model zoo.
"""
import argparse
import os
import sys

if os.environ.get("SELD_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default="",
                    help="default window/clip .shlo "
                         "(scripts/export_model.py), served by /v1/score")
    ap.add_argument("--model", action="append", default=[],
                    metavar="NAME=PATH",
                    help="additional named artifact, served by "
                         "/v1/score?model=NAME (repeatable); GET /v1/models "
                         "lists them, POST /v1/reload hot-swaps all from "
                         "their files")
    ap.add_argument("--bundle", default="",
                    help="streaming bundle dir (--unit stream output)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--max_sessions", type=int, default=64)
    ap.add_argument("--batch_window_ms", type=float, default=0.0,
                    help="> 0: micro-batch concurrent /v1/score requests on "
                         "a window artifact — coalesce for up to this many "
                         "ms into one device dispatch")
    ap.add_argument("--max_batch", type=int, default=32,
                    help="dispatch once this many rows are queued")
    ap.add_argument("--no_bucket_pad", action="store_true",
                    help="disable power-of-two padding of coalesced "
                         "symbolic-batch dispatches (unbounded compile "
                         "variants under variable load)")
    ap.add_argument("--warmup_buckets", default="",
                    help="CSV of batch sizes to pre-compile at startup "
                         "(symbolic window artifact + batching), e.g. "
                         "'1,8,32' — keeps first-request latency flat")
    ap.add_argument("--cache_dir", default="",
                    help="persistent XLA compilation cache dir (daemon "
                         "restarts skip recompiles)")
    ap.add_argument("--warmup", action="store_true",
                    help="run one dummy dispatch per unit before binding "
                         "(first compile off the request path)")
    args = ap.parse_args()
    if not args.artifact and not args.bundle and not args.model:
        ap.error("need --artifact, --model and/or --bundle")
    named = {}
    for spec in args.model:
        if "=" not in spec:
            ap.error(f"--model wants NAME=PATH, got {spec!r}")
        name, path = spec.split("=", 1)
        if name in named or name == "default":
            ap.error(f"duplicate --model name {name!r}")
        named[name] = path

    if args.cache_dir:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(args.cache_dir))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from seld_tpu.serving import SELDServer, serve

    service = SELDServer(artifact=args.artifact or None,
                         artifacts=named or None,
                         bundle=args.bundle or None,
                         max_sessions=args.max_sessions,
                         batch_window_ms=args.batch_window_ms,
                         max_batch=args.max_batch,
                         bucket_pad=not args.no_bucket_pad)
    if args.warmup or args.warmup_buckets:
        import numpy as np
        for name, slot in service._slots.items():
            avals = slot.artifact.exported.in_avals
            shape = tuple(3 if not isinstance(d, int) else d
                          for d in avals[0].shape)
            if args.warmup:
                service.score(np.zeros(shape, avals[0].dtype), model=name)
                print(f"warmup: score[{name}] {shape} ok", flush=True)
            if not args.warmup_buckets:
                continue
            if slot.meta.get("unit") != "window":
                # clip artifacts have no batch axis to bucket
                print(f"warmup: score[{name}] is a "
                      f"{slot.meta.get('unit', 'score')} unit; "
                      f"--warmup_buckets skipped", flush=True)
                continue
            for b in filter(None, args.warmup_buckets.split(",")):
                bshape = (int(b), *shape[1:])
                service.score(np.zeros(bshape, avals[0].dtype), model=name)
                print(f"warmup: score[{name}] {bshape} ok", flush=True)
        if args.warmup and service._stream_template is not None:
            t = service._stream_template
            # enough chunks that finalize() accepts the clip (>= one window)
            k = max(1, -(-(t.twin - t.l_f // t.time_down) // t.chunk_t))
            x = np.zeros((t.n_streams, t.l_f + k * t.chunk_f,
                          *t.feat_shape), np.float32)
            service.stream_push("_warmup", x)
            service.stream_finalize("_warmup")  # warms all three steps
            print("warmup: stream ok", flush=True)

    httpd = serve(service, args.host, args.port)
    units = service.health()["units"]
    print(f"serving {units} on http://{args.host}:{httpd.server_address[1]}",
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.close()
        httpd.server_close()


if __name__ == "__main__":
    main()
