#!/usr/bin/env python3
"""Ensemble inference + DCASE submission writer (reference: make_answer.py,
evaluator.py).

    python scripts/make_answer.py --data <feat_label dir> --mode test \
        --models cfg1.json:ckpt1 cfg2.json:ckpt2 --output_path ./answer \
        [--submit] [--ans_path <metadata_dev dir>]

Each --models entry is `<model_config>:<checkpoint_dir>`; checkpoints are
orbax dirs saved by this framework.
"""
import argparse
import os
import sys

if os.environ.get("SELD_PLATFORM"):  # e.g. SELD_PLATFORM=cpu for local runs
    import jax
    jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seld_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()

from glob import glob

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--mode", default="test", choices=["train", "val", "test"])
    ap.add_argument("--models", nargs="+", required=True)
    ap.add_argument("--model", default="conv_temporal")
    ap.add_argument("--output_path", default="./make_answer_out")
    ap.add_argument("--ans_path", default=None)
    ap.add_argument("--submit", action="store_true",
                    help="write eval-split submission CSVs (no scoring)")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--n_classes", type=int, default=12)
    ap.add_argument("--thresholds", default="class",
                    help="'class' (per-class table), a float, or a "
                         "comma-separated per-class list")
    ap.add_argument("--class_wise", action="store_true",
                    help="also print per-class recall/precision "
                         "(evaluator.py CLASS_WISE_EVAL)")
    ap.add_argument("--fast", action="store_true",
                    help="trunk-once sliding window (4x+, near-exact: conv "
                         "edge effects at window boundaries)")
    ap.add_argument("--clip_batch", type=int, default=1,
                    help="--fast: equal-length clips stacked per head "
                         "chunk (amortizes the sequence head)")
    ap.add_argument("--quantize", default="none",
                    choices=["none", "int8", "bfloat16"],
                    help="score with weight-only-quantized members "
                         "(dequantize(quantize(w)) — op-identical to what "
                         "a --quantize exported artifact computes), to "
                         "measure the deployment score delta before "
                         "shipping a quantized artifact")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 params + activations for inference "
                         "(default fp32 = reference numerics)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seld_tpu.config import resolve_model_config
    from seld_tpu.train.checkpoint import load_variables
    from seld_tpu.data.loader import load_seldnet_data, SPLITS
    from seld_tpu.inference import (ensemble_outputs, average_ensemble,
                                    evaluate_clips_official,
                                    DEFAULT_CLASS_THRESHOLDS)
    from seld_tpu.models import build_model
    from seld_tpu.utils import io

    if args.submit:
        # eval split: no fold digits in filenames, load everything
        # (make_answer.py load_test_data, search_best.py:68-81)
        feat_dir = os.path.join(args.data, "foa_eval_norm")
        files = sorted(glob(os.path.join(feat_dir, "*.npy")))
        xs = [np.load(f).astype("float32") for f in files]
        if xs and xs[0].ndim == 2:
            xs = [np.transpose(x.reshape(x.shape[0], -1, 64), (0, 2, 1))
                  for x in xs]
        name_list = [os.path.splitext(os.path.basename(f))[0] for f in files]
    else:
        if args.ans_path is None:
            raise SystemExit("--ans_path (metadata_dev dir) is required for "
                             "scoring mode; use --submit to skip scoring")
        feat_dir = os.path.join(args.data, "foa_dev_norm")
        label_dir = os.path.join(args.data, "foa_dev_label")
        xs, ys = load_seldnet_data(feat_dir, label_dir, mode=args.mode)
        name_list = sorted(glob(os.path.join(feat_dir, "*.npy")))
        name_list = [os.path.splitext(os.path.basename(f))[0]
                     for f in name_list
                     if int(os.path.basename(f)[4]) in SPLITS[args.mode]]

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
            raise SystemExit("--fast supports conv_temporal only (it needs "
                             "the model's trunk/head split)")
        # the trunk's time downsampling comes from THIS model's config;
        # _predict_clip_fast re-validates it against the trunk output length
        time_down = model_config.get("first_pool_size", [5, 1])[0]
        outs.append(ensemble_outputs(model.apply, variables, xs,
                                     batch_size=args.batch, fast=args.fast,
                                     time_down=time_down,
                                     clip_batch=args.clip_batch))
    outputs = average_ensemble(outs)

    if args.thresholds == "class":
        if args.n_classes > len(DEFAULT_CLASS_THRESHOLDS):
            raise SystemExit(
                f"--thresholds class provides {len(DEFAULT_CLASS_THRESHOLDS)}"
                f" per-class values; pass a scalar for "
                f"--n_classes {args.n_classes}")
        thresholds = DEFAULT_CLASS_THRESHOLDS[: args.n_classes]
    elif "," in args.thresholds:
        # per-class table, e.g. from inference.search_thresholds
        thresholds = np.asarray([float(v) for v in
                                 args.thresholds.split(",")], np.float32)
        if thresholds.shape[0] != args.n_classes:
            raise SystemExit(f"--thresholds lists {thresholds.shape[0]} "
                             f"values for --n_classes {args.n_classes}")
    else:
        thresholds = float(args.thresholds)

    if args.submit:
        os.makedirs(args.output_path, exist_ok=True)
        for name, (sed, doa) in zip(name_list, outputs):
            io.write_answer(args.output_path, name + ".csv",
                            np.asarray(sed) > thresholds, np.asarray(doa))
        print(f"wrote {len(outputs)} submission CSVs to {args.output_path}")
        return

    gt_dir = os.path.join(args.ans_path, f"dev-{args.mode}")
    seld, (er, f, le, lr) = evaluate_clips_official(
        outputs, name_list, gt_dir, args.output_path,
        thresholds=thresholds, n_classes=args.n_classes)
    print(f"ensemble outputs\nER: {er:4f}, F: {f:4f}, DER: {le:4f}, "
          f"DERF: {lr:4f}, SELD: {seld:4f}")

    if args.class_wise:
        # per-class recall/precision from the streaming metric
        # (evaluator.py:106-122)
        from seld_tpu.data.transforms import split_total_labels_to_sed_doa
        from seld_tpu.train import metrics as SM
        m = SM.SELDMetrics(n_classes=args.n_classes)
        for (sed, doa), y in zip(outputs, ys):
            y_sed, y_doa = split_total_labels_to_sed_doa(None, y[:sed.shape[0]])[1]
            m.update_states((jnp.asarray(y_sed)[None], jnp.asarray(y_doa)[None]),
                            ((jnp.asarray(sed) > thresholds)[None].astype(float),
                             jnp.asarray(doa)[None]))
        recall, precision = m.class_result()
        for c in range(args.n_classes):
            print(f"class {c}: recall {float(recall[c]):.4f} "
                  f"precision {float(precision[c]):.4f}")


if __name__ == "__main__":
    main()
