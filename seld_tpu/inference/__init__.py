"""Inference tooling: sliding-window overlap-add ensembles, submissions."""

from seld_tpu.inference.ensemble import (
    sliding_windows,
    overlap_add,
    ensemble_outputs,
    average_ensemble,
    evaluate_clips_official,
    search_thresholds,
    DEFAULT_CLASS_THRESHOLDS,
)

__all__ = [
    "sliding_windows",
    "overlap_add",
    "ensemble_outputs",
    "average_ensemble",
    "evaluate_clips_official",
    "search_thresholds",
    "DEFAULT_CLASS_THRESHOLDS",
]
