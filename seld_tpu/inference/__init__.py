"""Inference tooling: sliding-window overlap-add ensembles, submissions,
real-time streaming."""

from seld_tpu.inference.ensemble import (
    sliding_windows,
    overlap_add,
    ensemble_outputs,
    average_ensemble,
    evaluate_clips_official,
    search_thresholds,
    DEFAULT_CLASS_THRESHOLDS,
)
from seld_tpu.inference.export import (export_window_forward,
                                       export_clip_fast, export_streaming,
                                       export_window_ensemble,
                                       export_clip_fast_ensemble,
                                       save_exported, load_exported)
from seld_tpu.inference.quantize import (QTensor, quantize_tree,
                                         dequantize_tree, quantized_apply,
                                         quantization_report)
from seld_tpu.inference.streaming import StreamingSELD, measure_trunk_halo
from seld_tpu.inference.streaming_wav import (StreamingFrontEnd,
                                              StreamingSELDWav)

__all__ = [
    "sliding_windows",
    "overlap_add",
    "ensemble_outputs",
    "average_ensemble",
    "evaluate_clips_official",
    "search_thresholds",
    "DEFAULT_CLASS_THRESHOLDS",
    "export_window_forward",
    "export_clip_fast",
    "export_streaming",
    "export_window_ensemble",
    "export_clip_fast_ensemble",
    "save_exported",
    "load_exported",
    "QTensor",
    "quantize_tree",
    "dequantize_tree",
    "quantized_apply",
    "quantization_report",
    "StreamingSELD",
    "measure_trunk_halo",
    "StreamingFrontEnd",
    "StreamingSELDWav",
]
