"""Training subsystem: losses, metrics, optimizers, loops, SWA, checkpoints."""

from seld_tpu.train import losses, metrics, official_metrics  # noqa: F401
from seld_tpu.train.optimizers import adabelief, adam, adaptive_clip_grad
from seld_tpu.train.steps import make_train_step, make_eval_step
from seld_tpu.train.train_state import TrainState, SWAState
from seld_tpu.train.checkpoint import (save_checkpoint, restore_checkpoint,
                                       load_variables, latest_best)
from seld_tpu.train.trainer import SELDTrainer
from seld_tpu.train.vad import VADTrainer

__all__ = [
    "losses", "metrics", "official_metrics",
    "adabelief", "adam", "adaptive_clip_grad",
    "make_train_step", "make_eval_step",
    "TrainState", "SWAState",
    "save_checkpoint", "restore_checkpoint", "load_variables", "latest_best",
    "SELDTrainer", "VADTrainer",
]
