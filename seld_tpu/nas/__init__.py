"""NAS subsystem: analytic complexity, config samplers, search drivers,
result analysis."""

from seld_tpu.nas import complexity  # noqa: F401
from seld_tpu.nas.sampler import (
    config_sampling,
    conv_temporal_sampler,
    vad_architecture_sampler,
    search_space_sanity_check,
    sample_constraint,
    mother_stage_postprocess,
)
from seld_tpu.nas.search import (
    RandomSearch,
    train_and_eval_candidate,
    merge_results,
)

__all__ = [
    "complexity",
    "config_sampling",
    "conv_temporal_sampler",
    "vad_architecture_sampler",
    "search_space_sanity_check",
    "sample_constraint",
    "mother_stage_postprocess",
    "RandomSearch",
    "train_and_eval_candidate",
    "merge_results",
]
