"""Small numeric and structural utilities (reference: utils.py, data_utils.py)."""

from seld_tpu.utils.common import (
    safe_div,
    safe_tuple,
    dict_add, sorted_block_keys,
    force_1d_shape,
    degree_to_radian,
    radian_to_degree,
    create_folder,
)
from seld_tpu.utils.coords import cartesian_to_polar, polar_to_cartesian
from seld_tpu.utils import io  # noqa: F401

__all__ = [
    "safe_div",
    "safe_tuple",
    "dict_add",
    "force_1d_shape",
    "degree_to_radian",
    "radian_to_degree",
    "create_folder",
    "cartesian_to_polar",
    "polar_to_cartesian",
    "io",
]
