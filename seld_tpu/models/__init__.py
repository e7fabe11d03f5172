"""Model zoo: flax layers, config-dict-driven block factories, model builders."""

from seld_tpu.models import layers, modules, models  # noqa: F401
from seld_tpu.models.models import build_model

__all__ = ["layers", "modules", "models", "build_model"]
