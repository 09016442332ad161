"""ROI gating: per-condition region-of-interest selection and cell filtering."""

from .filter import filter_cells_by_roi, load_roi_coordinates, save_roi_coordinates
from .picker import get_roi_coordinates

__all__ = [
    "filter_cells_by_roi",
    "get_roi_coordinates",
    "load_roi_coordinates",
    "save_roi_coordinates",
]
