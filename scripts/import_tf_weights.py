#!/usr/bin/env python3
"""Import a trained reference Keras checkpoint for TPU serving.

The reference publishes its trained models as legacy HDF5 files saved by
`tf.keras.models.save_model(model, f'SWA_best_{score}.hdf5',
include_optimizer=False)` (reference trainv2.py:366-369) and serves them via
evaluator.py / make_answer.py / search_best.py. This tool maps such a file
onto the flax twin and writes an orbax checkpoint every inference tool here
accepts (make_answer.py --models, predict_wav.py, stream_demo):

    python scripts/import_tf_weights.py \
        --weights saved_model/..._v_0/SWA_best_0.34466397762298584.hdf5 \
        --model_config SS5 --out ./imported/ss5_swa

    python scripts/make_answer.py --data <feat dir> \
        --models SS5:./imported/ss5_swa ...

Requires h5py only (no TensorFlow import).
"""
import argparse
import json
import os
import sys

if os.environ.get("SELD_PLATFORM"):  # e.g. SELD_PLATFORM=cpu
    import jax
    jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True,
                    help="legacy Keras .hdf5 file (full-model or "
                         "weights-only)")
    ap.add_argument("--model", default="conv_temporal")
    ap.add_argument("--model_config", required=True,
                    help="model config name (zoo / ./model_config) or a "
                         ".json path — must match the checkpoint's "
                         "architecture")
    ap.add_argument("--input_shape", default="300,64,7",
                    help="feature input shape T,F,C (reference "
                         "evaluator.py:74)")
    ap.add_argument("--n_classes", type=int, default=12)
    ap.add_argument("--out", required=True, help="orbax checkpoint dir")
    ap.add_argument("--drop", nargs="*", default=(),
                    help="h5 layer names to force-ignore (normally "
                         "unnecessary: the pre-LN attention_block's "
                         "discarded LayerNorms are auto-detected)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from seld_tpu.compat import import_keras_weights
    from seld_tpu.config import resolve_model_config
    from seld_tpu.models import build_model

    out = os.path.abspath(args.out)
    if os.path.exists(out):  # fail fast, before the expensive import
        raise SystemExit(f"{out} already exists")

    input_shape = tuple(int(v) for v in args.input_shape.split(","))
    model_config = resolve_model_config(args.model_config)
    model_config["n_classes"] = args.n_classes
    model = build_model(args.model, input_shape, model_config)
    x = jnp.zeros((1, *input_shape), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    variables = import_keras_weights(model, variables, args.weights, x,
                                     drop=args.drop)

    n_params = sum(int(np.prod(a.shape))
                   for a in jax.tree_util.tree_leaves(variables["params"]))
    tree = {"params": variables["params"]}
    if variables.get("batch_stats") is not None:
        tree["batch_stats"] = variables["batch_stats"]
    ocp.PyTreeCheckpointer().save(out, tree)
    with open(out + ".meta.json", "w") as f:
        json.dump({"imported_from": os.path.abspath(args.weights),
                   "model": args.model, "model_config": args.model_config,
                   "input_shape": list(input_shape),
                   "n_classes": args.n_classes}, f)
    print(f"imported {args.weights} -> {out} ({n_params:,} params)")


if __name__ == "__main__":
    main()
