"""Training subsystem: losses, metrics, optimizers, loops, SWA, checkpoints."""

from seld_tpu.train import losses, metrics, official_metrics  # noqa: F401
