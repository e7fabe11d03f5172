"""Pallas TPU kernels for the hot ops."""

from seld_tpu.ops.pallas.frontend import fused_foa_frontend

__all__ = ["fused_foa_frontend"]
