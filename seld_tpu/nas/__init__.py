"""NAS subsystem: analytic complexity, config samplers, search drivers,
result analysis."""

from seld_tpu.nas import complexity  # noqa: F401
from seld_tpu.nas.sampler import (
    config_sampling,
    conv_temporal_sampler,
    vad_architecture_sampler,
    search_space_sanity_check,
)

__all__ = [
    "complexity",
    "config_sampling",
    "conv_temporal_sampler",
    "vad_architecture_sampler",
    "search_space_sanity_check",
]
