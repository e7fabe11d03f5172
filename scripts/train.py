#!/usr/bin/env python3
"""SELD training entry point (reference: trainv2.py main, train.py main).

Usage mirrors the reference:
    python scripts/train.py --name exp0 --model conv_temporal \
        --model_config SS5 --doa_loss MMSE --abspath <data root> \
        --use_tfm --use_acs [--agc true] [--label_smoothing 0.2]

Expects the DCASE2021 feat_label layout under <abspath>:
    DCASE2021/feat_label/foa_dev_norm/*.npy
    DCASE2021/feat_label/foa_dev_label/*.npy
    metadata_dev/dev-test/*.csv        (for ensemble eval ground truth)
"""
import os
import sys

if os.environ.get("SELD_PLATFORM"):  # e.g. SELD_PLATFORM=cpu for local runs
    import jax
    jax.config.update("jax_platforms", os.environ["SELD_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seld_tpu.utils.profiling import enable_compilation_cache, configure_fast_rng
# NOTE: global config mutations (compile-cache dir, default PRNG) happen in
# main(), not at import — tests import this module for its helpers
# (tfm_profile/build_augment), and an import-time PRNG flip silently
# rewrote every later golden RNG stream in the importing process (3 suite
# failures); the cache-dir flip would likewise redirect the test process's
# compile cache.

from glob import glob

import jax
import numpy as np

from seld_tpu.config import get_param
from seld_tpu.data import transforms as T
from seld_tpu.data.loader import (SeldDataset, load_joint_seldnet_data,
                                  load_seldnet_data)
from seld_tpu.train.trainer import SELDTrainer


def tfm_profile(config):
    """(time_size, freq_size, time_n_mask, freq_n_mask) for the active loop.

    v2/challenge (--swa on): the reference hardcodes 6/8 x 10/6 and ignores
    the size flags (trainv2.py:136-137). v1 (--swa off): flag sizes, one
    mask each (train.py:158-159)."""
    if getattr(config, "swa", True):
        return 6, 8, 10, 6
    return config.time_mask_size, config.freq_mask_size, 1, 1


def build_augment(config):
    """--use_tfm masking follows the selected loop exactly.

    v2 / challenge (--swa on): random_ups_and_downs + hardcoded sizes 6/8
    with n_mask 10/6 (trainv2.py:133-138 — the flags are IGNORED there).
    v1 (--swa off): --time_mask_size/--freq_mask_size with n_mask 1 and no
    gain aug (train.py:156-160). Blending v1 sizes (24/16, sized for ONE
    mask) with v2 counts (10/6, sized for 6/8) masks ~72% of all frames and
    collapses SED training to the no-detection prior — measured, see
    docs/STATUS.md round-3 'aug over-masking' note."""
    fns = []
    if getattr(config, "use_tfm", False):
        t_size, f_size, t_n, f_n = tfm_profile(config)
        if getattr(config, "swa", True):
            fns.append(T.random_ups_and_downs)
        fns.append(lambda k, x, y: (T.batch_mask(
            k, x, axis=-3, max_mask_size=t_size, n_mask=t_n,
            period=config.tfm_period), y))
        fns.append(lambda k, x, y: (T.batch_mask(
            k, x, axis=-2, max_mask_size=f_size, n_mask=f_n,
            period=config.tfm_period), y))
    if getattr(config, "use_acs", False):
        # FOA-only path: --use_acs = IV-channel spatial aug
        # (train.py:164-165); the joint 17ch path swaps full FOA+MIC
        # channel sets instead (train.py:178-208)
        fns.append(T.acs_aug if getattr(config, "use_both", False)
                   else T.foa_intensity_vec_aug)
    return T.compose(*fns) if fns else None


def build_datasets(config):
    """Dataset assembly for the three source modes.

    default:    offline-normalized .npy FOA features (reference layout)
    --from_wav: raw foa_dev wavs through the on-device front-end —
                features never touch disk (SURVEY §7 steps 2-3)
    --use_both: joint FOA+MIC 17-channel features for acs_aug
                (reference train.py get_both_dataset, :178-208)

    Returns ({split: SeldDataset}, test_xs full clips for ensemble eval).
    """
    path = os.path.join(config.abspath, "DCASE2021/feat_label/")

    feat_dtype = None
    if getattr(config, "bf16", False):
        import ml_dtypes
        feat_dtype = ml_dtypes.bfloat16  # cast once at build: halves host
        # RAM + transfer and removes the step's input convert+relayout

    if getattr(config, "from_wav", False):
        # wav-native covers all three journeys (features never touch disk):
        # foa 7ch, mic 10ch (--wav_mode mic), joint 17ch (--use_both)
        from seld_tpu.data.wav_pipeline import make_wav_datasets
        wav_mode = getattr(config, "wav_mode", "foa")
        use_both = getattr(config, "use_both", False)
        wav_dir = os.path.join(
            config.abspath, "foa_dev" if use_both or wav_mode == "foa"
            else "mic_dev")
        mic_dir = os.path.join(config.abspath, "mic_dev") if use_both else None
        meta_dir = os.path.join(config.abspath, "metadata_dev")
        datasets, splits, stats = make_wav_datasets(
            wav_dir, meta_dir, batch=config.batch, mode=wav_mode,
            mic_dir=mic_dir, loop_time=config.loop_time, n_classes=12,
            feature_dtype=feat_dtype)
        # persist the train-split normalizer with the run: a wav-native
        # checkpoint is unservable without it (scripts/predict_wav.py)
        norm_dir = os.path.join("./saved_model", config.name)
        os.makedirs(norm_dir, exist_ok=True)
        np.savez(os.path.join(norm_dir, "normalizer.npz"),
                 mean=np.asarray(stats[0]), std=np.asarray(stats[1]))
        return datasets, list(splits["test"][0])

    load = (
        (lambda mode: load_joint_seldnet_data(path, mode=mode,
                                              n_freq_bins=64))
        if getattr(config, "use_both", False) else
        (lambda mode: load_seldnet_data(os.path.join(path, "foa_dev_norm"),
                                        os.path.join(path, "foa_dev_label"),
                                        mode=mode, n_freq_bins=64)))
    datasets = {}
    test_xs = None
    for mode in ("train", "val", "test"):
        x, y = load(mode)
        if mode == "test":
            test_xs = x
        datasets[mode] = SeldDataset.from_clips(
            x, y, batch_size=config.batch, train=mode == "train",
            loop_time=config.loop_time, feature_dtype=feat_dtype)
    return datasets, test_xs


def main():
    enable_compilation_cache()
    configure_fast_rng()
    config, model_config = get_param()
    if config.resume and getattr(config, "init_from", ""):
        raise ValueError("--resume restores this run's full training state; "
                         "--init_from starts a fresh fine-tune from external "
                         "weights — pick one")

    datasets, test_xs = build_datasets(config)

    if getattr(config, "use_both", False):
        n_ch = 17
    elif (getattr(config, "from_wav", False)
          and getattr(config, "wav_mode", "foa") == "mic"):
        n_ch = 10
    else:
        n_ch = 7
    trainer = SELDTrainer(config, model_config, n_classes=12,
                          input_shape=(300, 64, n_ch))
    trainer.set_augment(build_augment(config))
    if config.resume:
        if trainer.resume():
            print(f"resumed from epoch {trainer.start_epoch}")
        else:
            raise ValueError("the model does not exist, cannot be resumed")
    elif getattr(config, "init_from", ""):
        # fine-tune journey: imported reference weights (or any weights-only
        # checkpoint) with a fresh optimizer/schedule
        trainer.init_from(config.init_from)
        print(f"initialized params from {config.init_from}")

    # periodic full-clip ensemble eval against the official scorer
    gt_dir = os.path.join(config.ans_path, "dev-test")
    eval_fn = None
    if os.path.exists(gt_dir):
        names = sorted(os.path.splitext(os.path.basename(f))[0]
                       for f in glob(os.path.join(gt_dir, "*.csv")))

        def eval_fn(tr, epoch):
            seld, mv = tr.evaluate_ensemble(
                test_xs, names, gt_dir, config.output_path, epoch)
            print(f"ensemble @ {epoch}: ER {mv[0]:.4f} F {mv[1]:.4f} "
                  f"LE {mv[2]:.4f} LR {mv[3]:.4f} SELD {seld:.4f}")

    trainset = datasets["train"]
    if getattr(config, "use_tdm", False) and config.tdm_epoch != 0:
        # TDM: rebuild the train set from raw wavs with pasted bank events on
        # a growing-overlap curriculum (train.py:278-289,341-356)
        wav_dir = os.path.join(config.abspath, "foa_dev")
        meta_dir = os.path.join(config.abspath, "metadata_dev")
        if os.path.isdir(wav_dir) and os.path.isdir(meta_dir):
            from seld_tpu.data.loader import load_wav_clips
            from seld_tpu.data.tdm import build_event_banks
            from seld_tpu.data.tdm_pipeline import (TDMCurriculum,
                                                    make_tdm_trainset)
            wavs, wav_labels = load_wav_clips(wav_dir, meta_dir, "train",
                                              n_classes=12)
            banks = build_event_banks(list(zip(wavs, wav_labels)),
                                      n_classes=12)
            curriculum = TDMCurriculum()
            tdm_rng = np.random.RandomState(7)
            cache = {}

            def trainset(epoch):
                if epoch % config.tdm_epoch == 0 or "ds" not in cache:
                    curriculum.advance(epoch)
                    cache["ds"] = make_tdm_trainset(
                        wavs, wav_labels, banks, tdm_rng, config.batch,
                        curriculum, loop_time=config.loop_time)
                return cache["ds"]
        else:
            print(f"use_tdm: raw wav dirs not found under {config.abspath}; "
                  "falling back to the static train set")

    if getattr(config, "epoch_scan", False) and not getattr(
            config, "device_data", False):
        raise ValueError("--epoch_scan requires --device_data (the epoch "
                         "scan gathers from the HBM-resident dataset)")
    if getattr(config, "fuse_metrics", False) and not getattr(
            config, "epoch_scan", False):
        raise ValueError("--fuse_metrics only applies to the --epoch_scan "
                         "path (metrics accumulate inside the epoch scan)")
    if getattr(config, "device_data", False):
        # stage the (possibly TDM-rebuilt) windowed train split in HBM once;
        # each step then feeds a ~1 KB index vector instead of the ~72 MB
        # feature batch (see seld_tpu/data/device_dataset.py)
        from seld_tpu.data.device_dataset import DeviceDataset

        def to_device_ds(ds, train=True, batch_size=None, tag=""):
            if batch_size is None:
                batch_size = config.batch if train else ds.batch_size
            dev = DeviceDataset(
                ds.x, ds.y, batch_size, trainer.mesh, train=train,
                loop_time=config.loop_time if train else 1)
            label = (f"eval windows ({tag}, batch {batch_size})" if tag
                     else f"windows ({dev.hbm_bytes() / 1e9:.2f} GB) in HBM")
            print(f"device_data: staged {dev.n_windows} {label}")
            return dev

        from seld_tpu.parallel.mesh import batch_shard_count, batch_sharding
        n_shards = batch_shard_count(batch_sharding(trainer.mesh))
        # eval epochs (whole-clip batches, deterministic) also run
        # device-resident: DeviceDataset stages eval rows pre-permuted so
        # batches reassemble in dataset order on any shard count. When the
        # per-clip window count doesn't divide over the shards, group
        # multiple clips per eval batch (streaming metrics are row-order
        # invariant; rows stay in dataset order either way).
        for split in ("val", "test"):
            ds = datasets[split]
            wpc = ds.batch_size  # windows per clip (host eval batch)
            eval_b, n = wpc, ds.x.shape[0]
            while eval_b % n_shards and eval_b < n:
                eval_b += wpc
            if eval_b % n_shards == 0 and n % eval_b == 0:
                datasets[split] = to_device_ds(
                    ds, train=False, batch_size=eval_b, tag=split)
            else:
                print(f"device_data: {split} eval stays host-fed "
                      f"({n} windows not batchable as a multiple of "
                      f"{wpc} windows/clip over {n_shards} shards)")

        if callable(trainset):
            provider, dcache = trainset, {}

            def trainset(epoch):
                ds = provider(epoch)
                if dcache.get("src") is not ds:
                    dcache.pop("dev", None)  # free HBM before restaging
                    dcache["src"] = ds
                    dcache["dev"] = to_device_ds(ds)
                return dcache["dev"]
        else:
            trainset = to_device_ds(trainset)

    result = trainer.fit(trainset, datasets["val"], datasets["test"],
                         eval_fn=eval_fn,
                         eval_every=getattr(config, "eval_every", 10))
    print(f"best val seld score: {result['best_score']:.5f}")

    # final SWA evaluation + save (trainv2.py:362-369)
    if float(trainer.swa.count) > 0 and eval_fn is not None:
        seld, _ = trainer.evaluate_ensemble(
            test_xs, names, gt_dir, config.output_path,
            result["last_epoch"], params=trainer.swa_params(),
            batch_stats=trainer.swa_batch_stats())
        from seld_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(trainer.workdir, f"SWA_best_{seld:.5f}",
                        trainer.state.replace(params=trainer.swa_params()),
                        trainer.swa)
        print(f"SWA seld score: {seld:.5f}")


if __name__ == "__main__":
    main()
