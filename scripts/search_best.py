#!/usr/bin/env python3
"""Per-class SED threshold search over a (possibly ensembled) model set on
the validation split (reference: search_best.py).

    python scripts/search_best.py --data <feat_label dir> \
        --models SS5:<ckpt1> SS5:<ckpt2> --ans_path <metadata_dev dir> \
        [--fast] [--bf16]

Averages the models' sliding-window outputs on dev-val (reference
search_best.py:124-131), runs the greedy per-class threshold search
(`seld_tpu.inference.search_thresholds`, the search_best/analyzer sweep
machinery), and prints the searched table both human-readable and as a
comma-separated string ready for `make_answer.py --thresholds`.
"""
import argparse
import json
import os
import sys

if os.environ.get("SELD_PLATFORM"):  # e.g. SELD_PLATFORM=cpu
    import jax
    jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seld_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()

from glob import glob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="feat_label dir")
    ap.add_argument("--models", nargs="+", required=True,
                    help="<model_config>:<orbax checkpoint dir> entries")
    ap.add_argument("--model", default="conv_temporal")
    ap.add_argument("--ans_path", required=True,
                    help="metadata_dev dir (ground-truth CSVs)")
    ap.add_argument("--output_path", default="./search_best_out")
    ap.add_argument("--mode", default="val", choices=["val", "test"])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--n_classes", type=int, default=12)
    ap.add_argument("--fast", action="store_true",
                    help="trunk-once sliding window (conv_temporal)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--quantize", default="none",
                    choices=["none", "int8", "bfloat16"],
                    help="search thresholds on the weight-only-quantized "
                         "deployment numerics (dequantize(quantize(w)), "
                         "op-identical to a --quantize exported artifact)")
    ap.add_argument("--verbose", action="store_true",
                    help="print per-class progress")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from seld_tpu.config import resolve_model_config
    from seld_tpu.data.loader import SPLITS, load_seldnet_data
    from seld_tpu.inference import (average_ensemble, ensemble_outputs,
                                    search_thresholds)
    from seld_tpu.models import build_model
    from seld_tpu.train.checkpoint import load_variables

    feat_dir = os.path.join(args.data, "foa_dev_norm")
    label_dir = os.path.join(args.data, "foa_dev_label")
    xs, _ = load_seldnet_data(feat_dir, label_dir, mode=args.mode)
    names = sorted(os.path.splitext(os.path.basename(f))[0]
                   for f in glob(os.path.join(feat_dir, "*.npy"))
                   if int(os.path.basename(f)[4]) in SPLITS[args.mode])

    outs = []
    for spec in args.models:
        config_path, ckpt_path = spec.split(":", 1)
        model_config = resolve_model_config(config_path)
        model_config["n_classes"] = args.n_classes
        model = build_model(args.model, (300, 64, 7), model_config)
        template = model.init({"params": jax.random.PRNGKey(0)},
                              jnp.zeros((1, 300, 64, 7)), train=False)
        variables = load_variables(os.path.abspath(ckpt_path.rstrip("/")),
                                   template)
        if args.quantize != "none":
            from seld_tpu.inference.quantize import (dequantize_tree,
                                                     quantize_tree)
            variables = dequantize_tree(quantize_tree(variables,
                                                      args.quantize))
        if args.bf16:
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, variables)
            xs = [jnp.asarray(x, jnp.bfloat16) for x in xs]
        if args.fast and args.model != "conv_temporal":
            raise SystemExit("--fast supports conv_temporal only")
        time_down = model_config.get("first_pool_size", [5, 1])[0]
        outs.append(ensemble_outputs(model.apply, variables, xs,
                                     batch_size=args.batch, fast=args.fast,
                                     time_down=time_down))
    outputs = average_ensemble(outs)

    gt_dir = os.path.join(args.ans_path, f"dev-{args.mode}")
    thresholds, best = search_thresholds(
        outputs, names, gt_dir, args.output_path,
        n_classes=args.n_classes, verbose=args.verbose)
    table = ",".join(f"{t:.2f}" for t in thresholds)
    print(f"best {args.mode} SELD with searched thresholds: {best:.5f}")
    print(f"--thresholds {table}")
    print("THRESHOLDS_JSON:" + json.dumps(
        {"thresholds": [float(t) for t in thresholds], "best": float(best)}))


if __name__ == "__main__":
    main()
