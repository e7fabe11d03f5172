"""Config subsystem: block/model registries, model-config zoo, run-config store."""

from seld_tpu.config.registry import (
    register_block,
    register_model,
    get_block,
    get_model,
    BLOCKS,
    MODELS,
)
from seld_tpu.config.zoo import (get_model_config, MODEL_CONFIGS,
                                 resolve_model_config)
from seld_tpu.config.manager import get_config, save_config, load_config
from seld_tpu.config.params import get_param

__all__ = [
    "register_block",
    "register_model",
    "get_block",
    "get_model",
    "BLOCKS",
    "MODELS",
    "get_model_config",
    "resolve_model_config",
    "MODEL_CONFIGS",
    "get_config",
    "save_config",
    "load_config",
    "get_param",
]
