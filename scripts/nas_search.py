#!/usr/bin/env python3
"""Random-search NAS driver CLI (reference: nas_seldnet.py, nas_vad.py).

SELD search:
    python scripts/nas_search.py --task seld --name 2021_1 \
        --dataset_path <feat_label dir> --n_samples 256 \
        --min_flops 400000000 --max_flops 480000000

VAD search:
    python scripts/nas_search.py --task vad --name vad_1 \
        --vad_pairs pairs.npz --n_samples 256 \
        --min_flops 500000 --max_flops 600000

Resumable: re-running with the same --name continues from the last
completed sample (results JSON is the source of truth).
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
    ap.add_argument("--task", default="seld", choices=["seld", "vad"])
    ap.add_argument("--name", required=True)
    ap.add_argument("--results_dir", default=".")
    ap.add_argument("--n_samples", type=int, default=256)
    ap.add_argument("--n_blocks", type=int, default=4)
    ap.add_argument("--min_flops", type=int, default=400_000_000)
    ap.add_argument("--max_flops", type=int, default=480_000_000)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--n_repeat", type=int, default=50)
    ap.add_argument("--proxy", default="reference",
                    choices=["reference", "trainer"],
                    help="candidate training recipe: 'reference' = the "
                         "reference's NAS proxy (adam, plain BCE+MSE "
                         "1:1000); 'trainer' = the challenge trainer "
                         "recipe (AdaBelief+AGC, class-weighted losses, "
                         "L2) — required for a discriminative search on "
                         "synthetic data (see search.py docstring)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n_classes", type=int, default=12)
    ap.add_argument("--dataset_path", default="")
    ap.add_argument("--vad_pairs", default="")
    ap.add_argument("--eval_device", default="",
                    help="'cpu' evaluates candidates on the host backend "
                         "(TPU NAS is compile-dominated)")
    ap.add_argument("--device_data", action="store_true",
                    help="seld task: stage the train/test splits in HBM "
                         "once; candidates gather batches on device "
                         "(single-device; excludes --eval_device cpu / "
                         "--parallel)")
    ap.add_argument("--parallel", type=int, default=0,
                    help="evaluate N candidates concurrently, one per "
                         "device (0 = serial reference behavior)")
    args = ap.parse_args()

    from seld_tpu.nas.search import (RandomSearch, train_and_eval_candidate,
                                     SELD_SEARCH_SPACE_2D,
                                     SELD_SEARCH_SPACE_1D)

    train_config = {
        "n_blocks": args.n_blocks, "min_flops": args.min_flops,
        "max_flops": args.max_flops, "batch_size": args.batch_size,
        "n_repeat": args.n_repeat, "lr": args.lr,
        "first_pool_size": [5, 2], "n_classes": args.n_classes,
        "proxy": args.proxy,
    }

    if args.task == "seld":
        from seld_tpu.data.loader import SeldDataset, load_seldnet_data
        x, y = load_seldnet_data(
            os.path.join(args.dataset_path, "foa_dev_norm"),
            os.path.join(args.dataset_path, "foa_dev_label"), mode="train")
        trainset = SeldDataset.from_clips(x, y, batch_size=args.batch_size,
                                          loop_time=args.n_repeat)
        x, y = load_seldnet_data(
            os.path.join(args.dataset_path, "foa_dev_norm"),
            os.path.join(args.dataset_path, "foa_dev_label"), mode="test")
        testset = SeldDataset.from_clips(x, y, batch_size=args.batch_size,
                                         train=False)
        input_shape = (300, 64, 7)

        if args.device_data:
            # stage the splits in HBM ONCE — every sampled candidate then
            # trains from the resident arrays (the per-candidate cost
            # becomes compile + the 1-epoch proxy fit, no re-feeding)
            if args.eval_device == "cpu" or args.parallel:
                raise SystemExit("--device_data stages on the default "
                                 "backend; it cannot combine with "
                                 "--eval_device cpu or --parallel")
            from seld_tpu.data.device_dataset import DeviceDataset
            from seld_tpu.parallel.mesh import make_mesh
            # candidates train single-device; pin the staging mesh to ONE
            # device so a multi-device host doesn't shard the resident
            # splits away from where the candidate state lives
            import jax
            mesh1 = make_mesh("data:1", devices=jax.devices()[:1])
            trainset = DeviceDataset(trainset.x, trainset.y,
                                     args.batch_size, mesh1,
                                     loop_time=args.n_repeat)
            testset = DeviceDataset(testset.x, testset.y,
                                    testset.batch_size, mesh1, train=False)

        search = RandomSearch(
            args.name, train_config, results_dir=args.results_dir,
            n_blocks=args.n_blocks, input_shape=input_shape,
            min_flops=args.min_flops, max_flops=args.max_flops,
            n_classes=args.n_classes)

        def evaluate(model_config, device=args.eval_device or None):
            return train_and_eval_candidate(
                model_config, input_shape, trainset, testset,
                n_classes=args.n_classes, lr=args.lr, proxy=args.proxy,
                device=device)

    elif args.proxy != "reference":
        raise SystemExit("--proxy is a seld-task knob (the VAD candidate "
                         "trainer is VADTrainer); drop it for --task vad")

    if args.task != "seld":  # vad
        from seld_tpu.data.vad import VadDataset, DEFAULT_WINDOW
        from seld_tpu.train.vad import VADTrainer
        from seld_tpu.nas.sampler import vad_architecture_sampler
        from seld_tpu.nas.complexity import vad_architecture_complexity

        data = np.load(args.vad_pairs, allow_pickle=True)
        pairs = list(data["pairs"]) if "pairs" in data else list(data)
        split = max(1, int(len(pairs) * 0.8))
        trainset = VadDataset(pairs[:split], batch_size=args.batch_size,
                              n_repeat=args.n_repeat)
        valset = VadDataset(pairs[split:] or pairs[:1],
                            batch_size=args.batch_size, train=False)
        input_shape = (len(DEFAULT_WINDOW), 80, 1)

        space_2d = dict(SELD_SEARCH_SPACE_2D)
        space_1d = {"simple_dense_block": {
            "units": [[16], [24], [32], [48], [64], [96], [128]],
            "dense_activation": [None, "relu"]}}
        search = RandomSearch(
            args.name, train_config, results_dir=args.results_dir,
            sampler=vad_architecture_sampler,
            search_space_2d=space_2d, search_space_1d=space_1d,
            n_blocks=args.n_blocks, input_shape=input_shape,
            min_flops=args.min_flops, max_flops=args.max_flops)

        def evaluate(model_config):
            # flatten False + last_unit 1 (nas_vad.py:203-204): the conv
            # body keeps the 7-frame context axis and Dense(1) squeezes to
            # per-frame probabilities [B, 7]
            import contextlib
            import jax as _jax
            ctx = (_jax.default_device(_jax.devices(args.eval_device)[0])
                   if args.eval_device else contextlib.nullcontext())
            cfg = {"flatten": False, "last_unit": 1, **model_config}
            with ctx:  # --eval_device applies to the serial path too
                trainer = VADTrainer(cfg, input_shape, lr=args.lr)
                result = trainer.fit(trainset, valset, epochs=1,
                                     verbose=False)
            cx = vad_architecture_complexity(cfg, list(input_shape))[0]
            return {"val_auc": result["best_val_auc"], **cx}

    if args.parallel:
        import jax
        devs = jax.devices(args.eval_device or None)
        if args.task == "vad":
            def evaluate_on(cfg, device, _inner=evaluate):
                with jax.default_device(device):
                    return _inner(cfg)
        else:
            def evaluate_on(cfg, device):
                return evaluate(cfg, device=device)
        search.run_parallel(args.n_samples, evaluate_on,
                            workers=args.parallel, devices=devs)
    else:
        search.run(args.n_samples, evaluate)
    print(f"done: {search.n_done} samples in {search.path}")


if __name__ == "__main__":
    main()
