"""yolo_sam_inference_tpu — a TPU-native cell analysis framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``yolo-sam-inference`` package (see /root/reference): YOLO cell detection →
SAM box-prompted segmentation → per-cell morphometrics → CSV/TIFF/HTML
reporting — designed for TPU from the start:

* one jitted program per image *batch* (not per image, not per box);
* the SAM ViT image encoder runs ONCE per image with the mask decoder
  vmapped over all detected boxes (the reference re-ran the full encoder
  per box: reference ``pipeline.py:105-110`` inside the loop at ``:170``);
* ragged detections become padded fixed-shape tensors with validity masks
  so everything stays on-device under ``jit``;
* morphometrics (area, perimeter, convex hull, circularity, deformability,
  brightness) are batched jnp ops — the convex hull is computed with
  direction-support matmuls that map onto the MXU;
* scaling is data-parallel ``jax.sharding`` over a device mesh instead of
  the reference's thread-pool model replicas (``pipeline.py:440-467``).

Public API mirrors the reference package root (reference ``__init__.py:1-22``).
"""

__version__ = "0.1.0"

from .utils.logger import setup_logger
from .utils.mask_encoding import encode_binary_mask, decode_binary_mask
from .utils.image_utils import save_optimized_tiff, save_mask_as_tiff
from .utils.metrics_reporter import (
    calculate_summary_statistics,
    report_summary_statistics,
    report_cell_details,
)
from .ops.metrics import calculate_metrics
from .utils.model_loader import load_model_from_mlflow, load_model_from_registry

_LAZY = {
    "CellSegmentationPipeline": ("yolo_sam_inference_tpu.pipeline.engine", "CellSegmentationPipeline"),
    "ParallelCellSegmentationPipeline": ("yolo_sam_inference_tpu.pipeline.engine", "ParallelCellSegmentationPipeline"),
    "ProcessingResult": ("yolo_sam_inference_tpu.pipeline.results", "ProcessingResult"),
    "BatchProcessingResult": ("yolo_sam_inference_tpu.pipeline.results", "BatchProcessingResult"),
}


def __getattr__(name):
    # Lazy pipeline imports keep `import yolo_sam_inference_tpu` light — the
    # pipeline pulls in the model stack (JAX graphs) only when actually used.
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "CellSegmentationPipeline",
    "ParallelCellSegmentationPipeline",
    "ProcessingResult",
    "BatchProcessingResult",
    "setup_logger",
    "load_model_from_mlflow",
    "load_model_from_registry",
    "calculate_summary_statistics",
    "report_summary_statistics",
    "report_cell_details",
    "calculate_metrics",
    "encode_binary_mask",
    "decode_binary_mask",
    "save_optimized_tiff",
    "save_mask_as_tiff",
    "__version__",
]
