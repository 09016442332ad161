"""ROI gating filter + roi_coordinates.json persistence.

Semantics parity with reference ``examples/example_project_inference.py:270-315``:
the gate keeps cells whose horizontal bbox center — computed as
``center_y = (min_y + max_y) / 2`` because the metric bbox keys carry the
regionprops row/col convention (``min_y`` is the min COLUMN) — lies within
the ROI's ``[x_min, x_max]``. This deliberate axis swap (commented in the
reference at ``:298``) is load-bearing for downstream CSV consumers, so we
reproduce it exactly.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

import pandas as pd

from ..utils.logger import setup_logger

logger = setup_logger(__name__)


def filter_cells_by_roi(
    metrics_df: pd.DataFrame, roi_coordinates: Dict[str, Dict[str, int]]
) -> pd.DataFrame:
    """Filter cell metric rows to those inside each condition's ROI."""
    required = ["condition", "min_y", "max_y"]
    missing = [c for c in required if c not in metrics_df.columns]
    if missing:
        raise ValueError(f"Missing required columns in metrics DataFrame: {missing}")

    gated = []
    for condition, roi in roi_coordinates.items():
        cond_df = metrics_df[metrics_df["condition"] == condition]
        if cond_df.empty:
            logger.warning("No data found for condition: %s", condition)
            continue
        center_y = (cond_df["min_y"] + cond_df["max_y"]) / 2
        keep = (center_y >= roi["x_min"]) & (center_y <= roi["x_max"])
        logger.info(
            "Gated %d/%d cells for condition %s", int(keep.sum()), len(cond_df), condition
        )
        gated.append(cond_df[keep])
    if not gated:
        return pd.DataFrame(columns=metrics_df.columns)
    return pd.concat(gated)


def save_roi_coordinates(rois: Dict[str, Dict[str, int]], path) -> None:
    """Persist per-condition ROIs (reference ``web/app.py:129-131``)."""
    with open(path, "w") as f:
        json.dump(rois, f, indent=2)


def load_roi_coordinates(path) -> Dict[str, Dict[str, int]]:
    with open(path) as f:
        return json.load(f)
