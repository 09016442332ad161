"""Pipeline layer: the jitted batch engine and host-side runners."""

from .results import ProcessingResult, BatchProcessingResult
from .engine import CellSegmentationPipeline, ParallelCellSegmentationPipeline

__all__ = [
    "ProcessingResult",
    "BatchProcessingResult",
    "CellSegmentationPipeline",
    "ParallelCellSegmentationPipeline",
]
