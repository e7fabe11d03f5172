"""On-device signal-processing ops (STFT, mel, FOA-IV, GCC-PHAT).

The reference extracts features offline with torch/torchaudio
(feature_extractor.py); here the whole front-end is jittable JAX so it can
run on-TPU inside the training step (raw wav in HBM -> features), with a
matmul-DFT path that keeps the hot loop on the MXU.
"""

from seld_tpu.ops.stft import hann_window, frame_signal, complex_spec, stft
from seld_tpu.ops.mel import mel_filterbank, amplitude_to_db, hz_to_mel, mel_to_hz
from seld_tpu.ops.features import (
    foa_intensity_vectors,
    gcc_features,
    extract_features,
    extract_features_batch,
    extract_features_clips,
    extract_labels,
    preprocess_features_labels,
    calculate_statistics,
    apply_normalizer,
)

__all__ = [
    "hann_window",
    "frame_signal",
    "complex_spec",
    "stft",
    "mel_filterbank",
    "amplitude_to_db",
    "hz_to_mel",
    "mel_to_hz",
    "foa_intensity_vectors",
    "gcc_features",
    "extract_features",
    "extract_features_batch",
    "extract_features_clips",
    "extract_labels",
    "preprocess_features_labels",
    "calculate_statistics",
    "apply_normalizer",
]
