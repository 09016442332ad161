"""Background-subtraction cell detection (the reference's OpenCV pipeline).

Capability parity with reference ``examples/opencv_project_inference.py``:

* tunable params (threshold, dilate/erode iterations, blur kernel/sigma) —
  reference ``:123-135``;
* cached per-ROI background preprocessing — ``:138-177``;
* detect: absdiff -> blur -> threshold -> dilate/erode/open -> components —
  ``:186-225`` (device-batched here);
* per-contour metrics via the no-convex-hull variant with placeholder shape
  values — ``:30-107``;
* ROI intersection filter — ``:251-268``;
* ``pipeline_parameters.json`` snapshot per run — ``:958-961``.

The device does all dense pixel work for a whole frame batch in one jit;
the host only labels connected components and assembles rows.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    from scipy import ndimage as _ndi
except ImportError:  # pragma: no cover
    _ndi = None

import jax.numpy as jnp

from ..ops.metrics import METRIC_KEYS, batched_cell_metrics
from ..ops.morphology import classical_detect_batch, gaussian_blur
from ..utils.logger import setup_logger

logger = setup_logger(__name__)


@dataclasses.dataclass
class ClassicalParams:
    threshold: float = 10.0
    dilate_iterations: int = 2
    erode_iterations: int = 2
    blur_kernel: int = 5
    blur_sigma: float = 0.0
    min_area: float = 50.0
    max_area: float = 1e9
    metric_crop: int = 128
    batch_size: int = 16

    def to_json(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


class ClassicalPipeline:
    """Model-free detection against a per-condition background frame."""

    def __init__(self, params: Optional[ClassicalParams] = None):
        self.params = params or ClassicalParams()
        self._background_cache: Dict[str, np.ndarray] = {}

    # -- background ------------------------------------------------------------

    def preprocess_background(self, background: np.ndarray, key: str = "default") -> np.ndarray:
        """Blur-preprocess and cache a grayscale background frame
        (reference ``:138-177``)."""
        bg = np.asarray(background, dtype=np.float32)
        if bg.ndim == 3:
            bg = bg.mean(axis=2)
        blurred = np.asarray(
            gaussian_blur(jnp.asarray(bg), self.params.blur_kernel, self.params.blur_sigma)
        )
        self._background_cache[key] = blurred
        return blurred

    def get_background(self, key: str = "default") -> np.ndarray:
        if key not in self._background_cache:
            raise KeyError(f"background {key!r} not preprocessed")
        return self._background_cache[key]

    # -- detection ---------------------------------------------------------------

    def detect_masks_batch(self, frames: np.ndarray, background_key: str = "default") -> np.ndarray:
        """(B, H, W) grayscale frames -> (B, H, W) bool foreground masks (device)."""
        frames = np.asarray(frames, dtype=np.float32)
        if frames.ndim == 4:
            frames = frames.mean(axis=3)
        bg = self.get_background(background_key)
        p = self.params
        masks = classical_detect_batch(
            jnp.asarray(frames),
            jnp.asarray(bg),
            threshold=p.threshold,
            blur_kernel=p.blur_kernel,
            blur_sigma=p.blur_sigma,
            dilate_iterations=p.dilate_iterations,
            erode_iterations=p.erode_iterations,
        )
        return np.asarray(masks)

    def extract_components(
        self, mask: np.ndarray
    ) -> List[Tuple[np.ndarray, Tuple[int, int]]]:
        """Connected components of one mask -> [(crop_mask, (row0, col0))].

        Host-side labeling (sequential by nature); crops are fixed-size
        windows for the device metrics kernel.
        """
        if _ndi is None:  # pragma: no cover
            raise RuntimeError("scipy required for component labeling")
        labels, n = _ndi.label(mask)
        out = []
        cm = self.params.metric_crop
        h, w = mask.shape
        cm = min(cm, h, w)
        slices = _ndi.find_objects(labels)
        for i, sl in enumerate(slices, start=1):
            if sl is None:
                continue
            area = int((labels[sl] == i).sum())
            if not (self.params.min_area <= area <= self.params.max_area):
                continue
            cy = (sl[0].start + sl[0].stop) / 2
            cx = (sl[1].start + sl[1].stop) / 2
            r0 = int(np.clip(round(cy) - cm // 2, 0, h - cm))
            c0 = int(np.clip(round(cx) - cm // 2, 0, w - cm))
            crop = labels[r0 : r0 + cm, c0 : c0 + cm] == i
            out.append((crop, (r0, c0)))
        return out

    # -- full image API -------------------------------------------------------------

    def process_images(
        self,
        frames: np.ndarray,
        background: Optional[np.ndarray] = None,
        background_key: str = "default",
        roi: Optional[Dict[str, int]] = None,
        return_masks: bool = False,
    ) -> Any:
        """Process a batch of frames -> per-frame lists of cell-metric dicts.

        Metrics use the classical variant: placeholder hull values
        (circularity = deformability = 0.5, area_ratio = 1 — reference
        ``:82-88``); a cell is kept only if its bbox intersects the ROI
        (reference ``:251-268``). With ``return_masks=True`` also returns
        the raw post-morphology masks and the kept-components-only masks
        (both (B, H, W) bool) for the side-by-side visualizations
        (reference ``:527-583``).
        """
        frames = np.asarray(frames)
        if background is not None:
            self.preprocess_background(background, background_key)
        masks = self.detect_masks_batch(frames, background_key)

        gray_batch = frames.astype(np.float32)
        if gray_batch.ndim == 4:
            gray_batch = gray_batch.mean(axis=3)

        results: List[List[Dict[str, Any]]] = []
        h, w = masks.shape[1:]
        cm = min(self.params.metric_crop, h, w)
        filtered = (np.zeros_like(masks, dtype=bool) if return_masks else None)
        for b in range(masks.shape[0]):
            comps = self.extract_components(masks[b])
            if not comps:
                results.append([])
                continue
            crops = np.stack([c for c, _ in comps])
            offs = np.asarray([o for _, o in comps], dtype=np.int32)
            mets = batched_cell_metrics(
                jnp.asarray(crops),
                jnp.asarray(gray_batch[b]),
                offsets=jnp.asarray(offs),
                image_shape=(h, w),
            )
            mets = {k: np.asarray(v) for k, v in mets.items()}
            rows = []
            for i in range(crops.shape[0]):
                row = {k: float(mets[k][i]) for k in METRIC_KEYS}
                for key in ("area", "convex_hull_area", "mask_x_length",
                            "mask_y_length", "min_x", "min_y", "max_x", "max_y"):
                    row[key] = int(round(row[key]))
                # classical placeholders (reference :82-88)
                row["circularity"] = 0.5
                row["deformability"] = 0.5
                row["area_ratio"] = 1.0
                if roi is not None and not _bbox_intersects_roi(row, roi):
                    continue
                rows.append(row)
                if filtered is not None:
                    r0, c0 = offs[i]
                    filtered[b, r0 : r0 + cm, c0 : c0 + cm] |= crops[i]
            results.append(rows)
        if return_masks:
            return results, masks.astype(bool), filtered
        return results

    def save_parameters(self, path) -> None:
        """``pipeline_parameters.json`` snapshot (reference ``:958-961``)."""
        with open(path, "w") as f:
            json.dump(self.to_parameters_dict(), f, indent=2)

    def to_parameters_dict(self) -> Dict[str, Any]:
        return {"pipeline": "classical_background_subtraction", **self.params.to_json()}


def _bbox_intersects_roi(row: Dict[str, Any], roi: Dict[str, int]) -> bool:
    """bbox/ROI intersection in the metric row/col convention: rows (min_x)
    against roi y, cols (min_y) against roi x (reference ``:251-268``)."""
    rows_overlap = row["min_x"] <= roi.get("y_max", 10**9) and row["max_x"] >= roi.get("y_min", 0)
    cols_overlap = row["min_y"] <= roi.get("x_max", 10**9) and row["max_y"] >= roi.get("x_min", 0)
    return rows_overlap and cols_overlap
