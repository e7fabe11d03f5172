"""Host-side data pipeline + on-device augmentations."""

from seld_tpu.data.loader import (
    load_seldnet_data,
    window_clips,
    SeldDataset,
    DeviceIterator,
)
from seld_tpu.data import transforms  # noqa: F401

__all__ = [
    "load_seldnet_data",
    "window_clips",
    "SeldDataset",
    "DeviceIterator",
    "transforms",
]
