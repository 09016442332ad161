"""TPU compute ops: batched morphometrics, NMS, preprocessing, attention."""

from .metrics import calculate_metrics, batched_cell_metrics, METRIC_KEYS

__all__ = ["calculate_metrics", "batched_cell_metrics", "METRIC_KEYS"]
