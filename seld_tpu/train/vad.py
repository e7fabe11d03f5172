"""VAD training (reference train_vad_baseline.py).

Keras `model.fit` with AUC-monitored early stopping/checkpointing becomes an
explicit compiled-step loop: BCE loss, AdaBelief, best-weights restore on
val AUC, plus full-sequence evaluation through the overlap reconstruction
(seq_to_windows / windows_to_seq).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seld_tpu.models import build_model
from seld_tpu.data.vad import (seq_to_windows, windows_to_seq,
                               preprocess_window)
from seld_tpu.train import losses as L
from seld_tpu.train.optimizers import adabelief
from seld_tpu.train.train_state import TrainState


def binary_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based ROC AUC (host-side; tf.keras.metrics.AUC parity target)."""
    labels = np.asarray(labels).reshape(-1)
    scores = np.asarray(scores).reshape(-1)
    pos = labels > 0.5
    n_pos = int(pos.sum())
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    from scipy.stats import rankdata
    ranks = rankdata(scores)  # average ranks under ties
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2)
                 / (n_pos * n_neg))


def binary_metrics(labels, scores, threshold: float = 0.5) -> Dict[str, float]:
    labels = np.asarray(labels).reshape(-1) > 0.5
    preds = np.asarray(scores).reshape(-1) > threshold
    tp = float((labels & preds).sum())
    fp = float((~labels & preds).sum())
    fn = float((labels & ~preds).sum())
    acc = float((labels == preds).mean())
    precision = tp / max(tp + fp, 1e-8)
    recall = tp / max(tp + fn, 1e-8)
    f1 = 2 * precision * recall / max(precision + recall, 1e-8)
    return {"binary_accuracy": acc, "precision": precision,
            "recall": recall, "f1": f1}


class VADTrainer:
    def __init__(self, model_config: dict, input_shape,
                 model_name: str = "vad_architecture",
                 lr: float = 1e-4, seed: int = 0):
        self.model = build_model(model_name, input_shape, model_config)
        self.model_name = model_name
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(seed)},
            jnp.zeros((2, *input_shape)), train=False)
        tx = optax.inject_hyperparams(
            lambda learning_rate: adabelief(learning_rate))(learning_rate=lr)
        self.state = TrainState.create(
            apply_fn=self.model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats"), tx=tx,
            rng=jax.random.PRNGKey(seed + 1))
        self._multi_output = model_name == "spectro_temporal_attention_based_VAD"
        self._build_steps()

    def _build_steps(self):
        multi = self._multi_output

        def train_step(state, x, y):
            rng, step_rng = jax.random.split(state.rng)

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats is not None:
                    variables["batch_stats"] = state.batch_stats
                out, mutated = state.apply_fn(
                    variables, x, train=True, rngs={"dropout": step_rng},
                    mutable=["batch_stats"])
                pred = out[0][..., 0] if multi else out
                loss = jnp.mean(L.binary_crossentropy(y, pred))
                if multi:  # auxiliary pipe-net loss (models.py:131)
                    loss = loss + jnp.mean(
                        L.binary_crossentropy(y, out[1][..., 0]))
                return loss, (mutated.get("batch_stats"), pred)

            (loss, (stats, pred)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 batch_stats=stats, opt_state=opt_state,
                                 rng=rng), loss, pred

        def predict_step(state, x):
            out = state.apply_fn(state.variables, x, train=False)
            return out[0][..., 0] if multi else out

        self.train_step = jax.jit(train_step)
        self.predict_step = jax.jit(predict_step)

    def evaluate(self, dataset) -> Dict[str, float]:
        labels, scores = [], []
        for x, y in dataset:
            pred = self.predict_step(self.state, jnp.asarray(x))
            labels.append(np.asarray(y))
            scores.append(np.asarray(pred))
        labels = np.concatenate([l.reshape(-1) for l in labels])
        scores = np.concatenate([s.reshape(-1) for s in scores])
        return {"auc": binary_auc(labels, scores),
                **binary_metrics(labels, scores)}

    def fit(self, trainset, valset=None, epochs: int = 1,
            patience: int = 16, verbose: bool = True) -> Dict:
        best_auc = -np.inf
        best_params = self.state.params
        wait = 0
        history = []
        for epoch in range(epochs):
            losses = []
            for x, y in trainset:
                self.state, loss, _ = self.train_step(
                    self.state, jnp.asarray(x), jnp.asarray(y))
                losses.append(float(loss))
            record = {"epoch": epoch, "loss": float(np.mean(losses))}
            if valset is not None:
                val = self.evaluate(valset)
                record.update({f"val_{k}": v for k, v in val.items()})
                if val["auc"] > best_auc:
                    best_auc = val["auc"]
                    best_params = self.state.params
                    wait = 0
                else:
                    wait += 1
            history.append(record)
            if verbose:
                print(record)
            # keras EarlyStopping parity: stop AFTER `patience`
            # non-improving epochs, not patience+1
            if valset is not None and wait >= patience:
                break
        if valset is not None:
            self.state = self.state.replace(params=best_params)
        return {"history": history, "best_val_auc": best_auc}

    def evaluate_sequences(self, pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
                           window, batch_size: int = 256) -> Dict[str, float]:
        """Full-sequence eval via window overlap reconstruction
        (train_vad_baseline.py:206-227)."""
        window = preprocess_window(window)
        width = int(window.max())
        labels, scores = [], []
        for feat, label in pairs:
            if len(label) <= width:  # shorter than the context window
                continue
            fw = seq_to_windows(np.asarray(feat, np.float32), window)
            preds = []
            for i in range(0, len(fw), batch_size):
                p = self.predict_step(self.state, jnp.asarray(fw[i:i + batch_size]))
                preds.append(np.asarray(p))
            preds = np.concatenate(preds, axis=0)       # [n_win, win_size]
            seq_pred = windows_to_seq(preds[..., None], window)[..., 0]
            # truncate BOTH ways: feat/label length mismatches otherwise
            # concatenate ragged arrays and crash (or misalign) in the AUC
            n = min(len(seq_pred), len(label))
            labels.append(np.asarray(label)[:n])
            scores.append(seq_pred[:n])
        labels = np.concatenate(labels)
        scores = np.concatenate(scores)
        return {"auc": binary_auc(labels, scores),
                **binary_metrics(labels, scores)}
