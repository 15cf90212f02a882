"""Deployable-artifact exporters (StableHLO lives in cli.py; ONNX here)."""

from .onnx import export_predictor_onnx, export_transfer_onnx  # noqa: F401
