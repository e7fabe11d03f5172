"""Pallas TPU kernels for the hot ops."""

from seld_tpu.ops.pallas.frontend import fused_foa_frontend, fused_foa_frontend_2d

__all__ = ["fused_foa_frontend", "fused_foa_frontend_2d"]
