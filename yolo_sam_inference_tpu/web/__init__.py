"""Interactive web UI for per-condition ROI selection."""

from .app import get_roi_coordinates_web, run_server

__all__ = ["get_roi_coordinates_web", "run_server"]
