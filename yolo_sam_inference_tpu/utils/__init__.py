"""Utility layer: logging, codecs, TIFF I/O, reporting helpers, model loading.

Mirrors the reference ``utils`` package surface (reference ``utils/__init__.py:1-20``).
"""

from .logger import setup_logger
from .mask_encoding import encode_binary_mask, decode_binary_mask
from .image_utils import save_optimized_tiff, save_mask_as_tiff, read_tiff
from .metrics_reporter import (
    calculate_summary_statistics,
    report_summary_statistics,
    report_cell_details,
)
from .model_loader import load_model_from_mlflow, load_model_from_registry
from .checkpoint import save_params, load_params

__all__ = [
    "save_params",
    "load_params",
    "setup_logger",
    "encode_binary_mask",
    "decode_binary_mask",
    "save_optimized_tiff",
    "save_mask_as_tiff",
    "read_tiff",
    "calculate_summary_statistics",
    "report_summary_statistics",
    "report_cell_details",
    "load_model_from_mlflow",
    "load_model_from_registry",
]
