"""Name -> factory registries for blocks and models.

The reference dispatches architecture configs with `getattr(modules, name)`
(models.py:24-29,70-75) — the JSON config dict *is* the architecture DSL.
Here the same contract is a pair of explicit registries: block factories take
a config dict and return a callable `fn(x, *, deterministic, rngs) -> x`
(a flax module bound by the model builder), model factories take
`(input_shape, model_config)` and return a flax module.

Registration happens at import time of seld_tpu.models.modules / .models.
"""
from __future__ import annotations

from typing import Callable, Dict

BLOCKS: Dict[str, Callable] = {}
MODELS: Dict[str, Callable] = {}


def register_block(name: str):
    def wrap(fn: Callable) -> Callable:
        if name in BLOCKS:
            raise ValueError(f"duplicate block registration: {name}")
        BLOCKS[name] = fn
        return fn
    return wrap


def register_model(name: str):
    def wrap(fn: Callable) -> Callable:
        if name in MODELS:
            raise ValueError(f"duplicate model registration: {name}")
        MODELS[name] = fn
        return fn
    return wrap


def get_block(name: str) -> Callable:
    # ensure block factories are registered
    import seld_tpu.models.modules  # noqa: F401
    if name not in BLOCKS:
        raise KeyError(f"unknown block type: {name!r}; known: {sorted(BLOCKS)}")
    return BLOCKS[name]


def get_model(name: str) -> Callable:
    import seld_tpu.models.models  # noqa: F401
    if name not in MODELS:
        raise KeyError(f"unknown model: {name!r}; known: {sorted(MODELS)}")
    return MODELS[name]
