"""Pallas TPU kernels.

``fused_transfer.FusedTransfer`` is the production deploy path (the whole
packed net in one kernel); ``cin``/``conv_matmul`` are the r1 single-op
kernels, kept for standalone use and measurement (they lose in-net — see
ROADMAP "r1 Pallas findings").
"""

from .fused_transfer import FusedTransfer  # noqa: F401
