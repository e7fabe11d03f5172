"""SELD training loops.

`SELDTrainer` is the TPU-native equivalent of both reference entry points,
selected explicitly by the `--swa` switch (not blended):
  - `--swa off` = train.py main (:264-390, v1): Adam + BCE/focal +
    selectable DOA loss, optional AGC, lr-decay-on-plateau over the WHOLE
    schedule, early stop, best-checkpoint save — no weight averaging
  - `--swa on` (default) = trainv2.py main (:240-369, the challenge loop):
    AdaBelief + always-on AGC, class weights, label smoothing,
    MMSE_with_cls_weights, L2 1e-3, SWA (start 80, freq 2, lr halved at
    start, plateau decay stops once SWA engages), periodic full-clip
    sliding-window ensemble eval scored by the official metric

One compiled SPMD step does forward/loss/grad/update/metrics on device;
epochs stream sharded batches through a double-buffered host iterator.
Checkpoints carry optimizer state (resume is exact, unlike the reference).
"""
from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seld_tpu.data.loader import DeviceIterator
from seld_tpu.models import build_model
from seld_tpu.parallel import make_mesh, batch_sharding, replicate
from seld_tpu.train import losses as L
from seld_tpu.train import metrics as M
from seld_tpu.train.checkpoint import (latest_best, restore_checkpoint,
                                       save_checkpoint)
from seld_tpu.train.optimizers import adabelief, adam
from seld_tpu.train.steps import make_eval_step, make_train_step
from seld_tpu.train.train_state import SWAState, TrainState
from seld_tpu.utils.logging import ScalarLogger


class SELDTrainer:
    def __init__(self, config, model_config: dict, *,
                 n_classes: Optional[int] = None,
                 input_shape=(300, 64, 7),
                 mesh=None,
                 optimizer: str = "adabelief",
                 use_class_weights: bool = True,
                 train_samples: Optional[np.ndarray] = None,
                 workdir: str = "./saved_model",
                 logdir: str = "./tensorboard_log",
                 metric_block_size: int = 10):
        self.config = config
        self.model_config = dict(model_config)
        self.n_classes = n_classes or self.model_config.get("n_classes", 14)
        self.model_config["n_classes"] = self.n_classes
        self.input_shape = tuple(input_shape)
        self.mesh = mesh or make_mesh(getattr(config, "mesh", "data:-1"))
        self.workdir = os.path.join(workdir, config.name)
        self.logger = ScalarLogger(os.path.join(logdir, config.name))
        self.metric_block_size = metric_block_size

        # losses (trainv2.py:291-297)
        if use_class_weights:
            samples = (jnp.asarray(train_samples, jnp.float32)
                       if train_samples is not None
                       else L.DCASE2021_TRAIN_SAMPLES)
            if samples.shape[-1] != self.n_classes:
                raise ValueError("train_samples does not match n_classes")
            self.cls_weights = L.class_weights_from_samples(samples)
        else:
            self.cls_weights = None

        smoothing = getattr(config, "label_smoothing", 0.0)
        sed_kind = getattr(config, "sed_loss", "BCE")
        focal_a = getattr(config, "focal_a", 0.25)
        focal_g = getattr(config, "focal_g", 2.0)

        def sed_loss(y, p):
            return L.sed_loss_with_weights(
                y, p, self.cls_weights, label_smoothing=smoothing,
                kind=sed_kind, focal_alpha=focal_a, focal_gamma=focal_g)

        doa_kind = getattr(config, "doa_loss", "MMSE")
        if doa_kind == "MMSE" and self.cls_weights is not None:
            def doa_loss(y, p):
                return L.MMSE_with_cls_weights(y, p, self.cls_weights)
        else:
            doa_loss = L.get_doa_loss(doa_kind)
        self.sed_loss, self.doa_loss = sed_loss, doa_loss

        self.loss_weights = tuple(
            float(w) for w in str(getattr(config, "loss_weight", "1,1000")
                                  ).split(","))

        if getattr(config, "model", "") == "accdoa":
            # ACCDOA (arXiv 2006.12014, beyond parity): a single
            # activity-coupled vector head; the model emits
            # (clipped vector norms, vectors) so the metric stack works
            # unchanged (norm > threshold is the ACCDOA decision rule),
            # but the objective is MSE on the vectors only — the derived
            # "sed" output gets no loss (BCE on norms can emit log(0))
            self.sed_loss = lambda y, p: jnp.zeros([], jnp.float32)
            self.doa_loss = L.get_doa_loss(
                getattr(config, "doa_loss", "MSE") or "MSE")
            if not hasattr(config, "loss_weight"):
                self.loss_weights = (0.0, 1.0)
            else:
                self.loss_weights = (0.0, self.loss_weights[1])
        agc = getattr(config, "agc", True)
        self.agc_clip = (0.01 if agc is True else float(agc)) if agc else None
        self.l2 = float(getattr(config, "l2", 1e-3))

        # model + state
        model = build_model(config.model, self.input_shape, self.model_config)
        self.model = model
        rng = jax.random.PRNGKey(getattr(config, "seed", 0))
        init_rng, state_rng = jax.random.split(rng)
        dummy = jnp.zeros((2, *self.input_shape))
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": init_rng}, dummy, train=False)

        lr = float(getattr(config, "lr", 1e-3))
        opt_factory = adabelief if optimizer == "adabelief" else adam
        tx = optax.inject_hyperparams(
            lambda learning_rate: opt_factory(
                learning_rate, agc_clip=self.agc_clip))(learning_rate=lr)
        self.state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats"), tx=tx, rng=state_rng)
        self.swa = SWAState.create(self.state.params,
                                   self.state.batch_stats)

        # compiled steps; augment applied outside (already device-resident)
        compute_dtype = (jnp.bfloat16 if getattr(config, "bf16", False)
                         else None)
        self.train_step = make_train_step(
            sed_loss_fn=self.sed_loss, doa_loss_fn=self.doa_loss,
            loss_weights=self.loss_weights, l2=self.l2,
            doa_threshold=getattr(config, "lad_doa_thresh", 20),
            metric_block_size=metric_block_size, donate=True,
            compute_dtype=compute_dtype)
        self.eval_step = make_eval_step(
            sed_loss_fn=self.sed_loss, doa_loss_fn=self.doa_loss,
            doa_threshold=getattr(config, "lad_doa_thresh", 20),
            metric_block_size=metric_block_size,
            compute_dtype=compute_dtype)

        self.best_score = np.inf
        self.start_epoch = 0
        self._augment: Optional[Callable] = None
        self._augment_raw: Optional[Callable] = None
        self._aug_rng = jax.random.PRNGKey(getattr(config, "seed", 0) + 17)
        # --epoch_scan: whole-epoch lax.scan over a device-resident dataset
        # (one dispatch per epoch; requires --device_data)
        self._use_epoch_scan = bool(getattr(config, "epoch_scan", False))
        self._epoch_step = None

        with self.mesh:
            self.state = replicate(self.state, self.mesh)
            self.swa = replicate(self.swa, self.mesh)

    # ------------------------------------------------------------------
    def set_augment(self, augment_fn: Optional[Callable]) -> None:
        """augment_fn(rng, x, y_total) -> (x, y_total), jittable."""
        self._augment = jax.jit(augment_fn) if augment_fn else None
        self._augment_raw = augment_fn
        self._epoch_step = None  # rebuild with the new augment fused in

    def _get_epoch_step(self):
        if self._epoch_step is None:
            from seld_tpu.train.steps import make_train_epoch
            self._epoch_step = make_train_epoch(
                sed_loss_fn=self.sed_loss, doa_loss_fn=self.doa_loss,
                n_classes=self.n_classes, mesh=self.mesh,
                loss_weights=self.loss_weights, l2=self.l2,
                doa_threshold=getattr(self.config, "lad_doa_thresh", 20),
                metric_block_size=self.metric_block_size,
                compute_dtype=(jnp.bfloat16
                               if getattr(self.config, "bf16", False)
                               else None),
                augment_fn=self._augment_raw,
                fuse_metrics=getattr(self.config, "fuse_metrics", False))
        return self._epoch_step

    def resume(self) -> bool:
        path = latest_best(self.workdir)
        if path is None:
            return False
        self.state, self.swa, extra = restore_checkpoint(
            path, self.state, self.swa)
        if extra:
            self.best_score = extra.get("best_score", np.inf)
            self.start_epoch = extra.get("epoch", -1) + 1
        return True

    def init_from(self, path: str) -> None:
        """Warm-start params (+ batch_stats) from a weights-only checkpoint.

        The fine-tune journey for imported reference weights
        (scripts/import_tf_weights.py): model variables come from `path`,
        while the optimizer, SWA accumulator, lr schedule, and epoch counter
        all start FRESH — unlike resume(), which restores this run's full
        training state. The SWA accumulator resets (count 0) so an averaging
        window opened later averages only fine-tuned weights.
        """
        from seld_tpu.train.checkpoint import load_variables

        template = {"params": jax.device_get(self.state.params),
                    "batch_stats": jax.device_get(self.state.batch_stats)}
        loaded = load_variables(os.path.abspath(path.rstrip("/")), template)
        bs = loaded.get("batch_stats", template["batch_stats"])
        with self.mesh:
            self.state = self.state.replace(
                params=replicate(loaded["params"], self.mesh),
                batch_stats=replicate(bs, self.mesh))
            self.swa = replicate(SWAState.create(loaded["params"], bs),
                                 self.mesh)

    # ------------------------------------------------------------------
    def _split_labels(self, y):
        if isinstance(y, tuple):
            return y
        c = self.n_classes
        return y[..., :c], y[..., c:]

    def _run_epoch(self, dataset, epoch: int, mode: str) -> Dict[str, float]:
        train = mode == "train"
        if (train and self._use_epoch_scan
                and getattr(dataset, "device_resident", False)):
            return self._run_epoch_scan(dataset, epoch, mode)
        mstate = replicate(M.init_state(self.n_classes), self.mesh)
        # device scalars collected async; converting per-step would force a
        # host sync each batch and stall the dispatch pipeline
        slosses, dlosses = [], []
        sharding = batch_sharding(self.mesh)

        # eval batches are whole clips (windows_per_clip rows); when that
        # does not divide the batch-sharding axis, zero-pad so every batch
        # shards instead of silently replicating — the eval step statically
        # slices predictions back to n_valid rows (see make_eval_step).
        # Single-process only: under multi-host SPMD the static slice would
        # keep only the first host's rows, so the replication fallback (with
        # its one-time warning) is the correct multi-host path.
        from seld_tpu.parallel.mesh import batch_shard_count
        n_shards = batch_shard_count(sharding)
        n_valid = None
        source = dataset
        if (not train and jax.process_count() == 1
                and getattr(dataset, "batch_size", 0) % n_shards):
            n_valid = dataset.batch_size
            pad = n_shards - n_valid % n_shards

            def source():
                for x, y in dataset:
                    if x.shape[0] != n_valid:  # ragged tail: replicate path
                        yield x, y
                        continue
                    widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
                    yield (np.pad(x, widths),
                           np.pad(y, ((0, pad),) + ((0, 0),) * (y.ndim - 1)))
            source = source()

        # device-resident datasets (data.device_dataset) already yield
        # sharded on-device batches from an in-HBM gather — re-staging them
        # through DeviceIterator would only add a no-op device_put thread
        feed = (dataset if getattr(dataset, "device_resident", False)
                else DeviceIterator(source, sharding=sharding))
        with self.mesh:
            for x, y in feed:
                if train and self._augment is not None:
                    self._aug_rng, k = jax.random.split(self._aug_rng)
                    x, y = self._augment(k, x, y)
                y = self._split_labels(y)
                if train:
                    self.state, mstate, (sl, dl) = self.train_step(
                        self.state, mstate, x, y)
                else:
                    valid = (n_valid if n_valid is not None
                             and x.shape[0] != n_valid else None)
                    mstate, (sl, dl) = self.eval_step(
                        self.state, mstate, x, y, n_valid=valid)
                slosses.append(sl)
                dlosses.append(dl)

        n = len(slosses)
        sloss_sum = float(jnp.sum(jnp.stack(slosses))) if n else 0.0
        dloss_sum = float(jnp.sum(jnp.stack(dlosses))) if n else 0.0
        return self._epoch_scalars(mstate, sloss_sum, dloss_sum, n, epoch,
                                   mode)

    def _run_epoch_scan(self, dataset, epoch: int, mode: str
                        ) -> Dict[str, float]:
        """Whole-epoch lax.scan over a device-resident dataset: gather +
        augment + update fused into ONE dispatch (train.steps.
        make_train_epoch); host involvement is the index staging and the
        final scalar fetches."""
        mstate = replicate(M.init_state(self.n_classes), self.mesh)
        with self.mesh:
            x_all, y_all = dataset.device_arrays
            idx_all = dataset.epoch_index_matrix()
            self._aug_rng, k = jax.random.split(self._aug_rng)
            self.state, mstate, (sl, dl) = self._get_epoch_step()(
                self.state, mstate, x_all, y_all, idx_all, k)
        return self._epoch_scalars(mstate, float(jnp.sum(sl)),
                                   float(jnp.sum(dl)), int(sl.shape[0]),
                                   epoch, mode)

    def _epoch_scalars(self, mstate, sloss_sum: float, dloss_sum: float,
                       n: int, epoch: int, mode: str) -> Dict[str, float]:
        er, f, de, de_f = [float(v) for v in M.result(mstate)]
        seld = float(M.calculate_seld_score((er, f, de, de_f)))
        scalars = {
            "ErrorRate": er, "F": f, "DoaErrorRate": de, "DoaErrorRateF": de_f,
            "sedLoss": sloss_sum / max(n, 1), "doaLoss": dloss_sum / max(n, 1),
            "seldScore": seld,
        }
        for tag, val in scalars.items():
            self.logger.add_scalar(f"{mode}/{mode}_{tag}", val, epoch)
        return scalars

    # ------------------------------------------------------------------
    def evaluate_ensemble(self, test_xs, label_names, gt_dir, output_dir,
                          epoch: int, batch_size: Optional[int] = None,
                          thresholds=0.5, params=None, batch_stats=None):
        """Full-clip sliding-window eval + official scoring
        (trainv2.py:195-237)."""
        # local import: inference depends on train.metrics (avoid a cycle)
        from seld_tpu.inference.ensemble import (ensemble_outputs,
                                                 evaluate_clips_official)
        variables = {"params": params if params is not None else
                     self.state.params}
        bs = batch_stats if batch_stats is not None else self.state.batch_stats
        if bs is not None:
            variables["batch_stats"] = bs
        outs = ensemble_outputs(
            self.model.apply, variables, test_xs,
            batch_size=batch_size or getattr(self.config, "batch", 256),
            mesh=self.mesh)
        seld, metric_values = evaluate_clips_official(
            outs, label_names, gt_dir, output_dir,
            thresholds=thresholds, n_classes=self.n_classes)
        for tag, val in zip(("ER", "F", "DER", "DERF"), metric_values):
            self.logger.add_scalar(f"ENS_T/{tag}", float(val), epoch)
        self.logger.add_scalar("ENS_T/seldScore", seld, epoch)
        return seld, metric_values

    def swa_params(self):
        return self.swa.avg_params

    def swa_batch_stats(self):
        return self.swa.avg_batch_stats

    # ------------------------------------------------------------------
    def fit(self, trainset, valset=None, testset=None, *,
            epochs: Optional[int] = None,
            eval_fn: Optional[Callable] = None,
            eval_every: int = 10,
            verbose: bool = True) -> Dict:
        cfg = self.config
        epochs = epochs or getattr(cfg, "epoch", 1000)
        # --swa off selects reference train.py (v1) semantics: no averaging,
        # no lr halving at swa_start, plateau decay over the whole schedule
        # (train.py:372-390). On (default) = trainv2.py:300,325-336.
        use_swa = bool(getattr(cfg, "swa", True))
        swa_start = getattr(cfg, "swa_start", 80)
        swa_freq = getattr(cfg, "swa_freq", 2)
        patience = getattr(cfg, "patience", 100)
        lr_patience = getattr(cfg, "lr_patience", 80)
        decay = getattr(cfg, "decay", 0.5)
        base_lr = float(getattr(cfg, "lr", 1e-3))

        early_stop, lr_decay_wait = 0, 0
        if valset is None:
            # the reference always selects checkpoints on the val split
            # (train.py:372-380); selecting on train metrics is a footgun
            import logging
            logging.getLogger("seld_tpu").warning(
                "SELDTrainer.fit: no valset given — best-checkpoint "
                "selection and early stopping will use the TRAIN-split SELD "
                "score, which rewards overfitting. Pass a valset for "
                "reference-parity model selection.")
        history: List[Dict] = []
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            if use_swa and epoch == swa_start:
                self.state = self.state.set_lr(base_lr * 0.5)  # trainv2:325-326

            if eval_fn is not None and eval_every > 0 \
                    and epoch % eval_every == 0:
                eval_fn(self, epoch)

            # trainset may be a provider fn(epoch) -> dataset (TDM rebuilds,
            # train.py:341-356). Drop last epoch's reference BEFORE calling
            # the provider: a device-resident dataset otherwise stays alive
            # in this local while the provider stages its replacement,
            # transiently doubling the dataset's HBM footprint.
            epoch_trainset = None
            epoch_trainset = (trainset(epoch) if callable(trainset)
                              else trainset)
            train_scalars = self._run_epoch(epoch_trainset, epoch, "train")
            score = train_scalars["seldScore"]
            val_scalars = None
            if valset is not None:
                val_scalars = self._run_epoch(valset, epoch, "val")
                score = val_scalars["seldScore"]
            if testset is not None:
                self._run_epoch(testset, epoch, "test")

            if use_swa and self.swa.should_update(epoch, swa_start, swa_freq):
                self.swa = self.swa.update(self.state.params,
                                           self.state.batch_stats)
            # lr + SWA count are the schedule's observable state: logged so
            # long runs (and the dress-rehearsal harness) can verify the
            # halving/decay boundaries from the scalars alone
            self.logger.add_scalar("train/lr", float(self.state.get_lr()),
                                   epoch)
            self.logger.add_scalar("train/swa_count", float(self.swa.count),
                                   epoch)

            history.append({"epoch": epoch, "train": train_scalars,
                            "val": val_scalars, "secs": time.time() - t0})
            if verbose:
                msg = (f"epoch {epoch}: train seld "
                       f"{train_scalars['seldScore']:.4f}")
                if val_scalars:
                    msg += f", val seld {val_scalars['seldScore']:.4f}"
                print(msg + f" ({time.time() - t0:.1f}s)")

            if score < self.best_score:
                self.best_score = score
                early_stop, lr_decay_wait = 0, 0
                save_checkpoint(
                    self.workdir, f"bestscore_{self.best_score:.5f}",
                    self.state, self.swa,
                    extra={"best_score": float(self.best_score),
                           "epoch": epoch},
                    keep_best_only=True)
            else:
                if (lr_decay_wait >= lr_patience and decay != 1
                        and (not use_swa or epoch < swa_start)):
                    lr = self.state.get_lr() * decay
                    self.state = self.state.set_lr(lr)  # train.py:381-385
                    lr_decay_wait = 0
                    if verbose:
                        print(f"epoch {epoch}: plateau lr decay -> {lr:.2e}")
                if early_stop >= patience:
                    break
                early_stop += 1
                lr_decay_wait += 1

        return {"history": history, "best_score": self.best_score,
                # resuming an already-completed run never enters the loop
                "last_epoch": epoch if history else self.start_epoch - 1}
