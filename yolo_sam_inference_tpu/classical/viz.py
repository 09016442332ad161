"""Side-by-side visualizations for the classical (background-subtraction)
pipeline.

Capability parity with reference
``examples/opencv_project_inference.py::save_visualization`` (``:527-583``):
a two-panel PNG — "All Contours" (every post-morphology foreground pixel,
red overlay) next to "ROI Contours" (area+ROI-filtered components, blue
overlay) — with the ROI rectangle drawn in green on both panels and a text
block showing the kept-contour count and average deformability. The
reference drew with OpenCV; here the overlay blend is vectorized numpy
and the rectangle/text go through PIL's ImageDraw (no GUI dependency on
the drawing path — cv2 stays confined to contour topology). Full-image mask PNGs (``*_mask.png`` / ``*_filtered_mask.png``,
reference ``:357-374``) are written alongside.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

_RED = np.array([255, 0, 0], dtype=np.float32)
_BLUE = np.array([0, 0, 255], dtype=np.float32)
_GREEN = (0, 255, 0)


def _to_rgb(image: np.ndarray) -> np.ndarray:
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img


def _overlay(rgb: np.ndarray, mask: np.ndarray, color: np.ndarray) -> np.ndarray:
    """0.7*image + 0.3*color under the mask (the reference's addWeighted
    blend, ``:556-557``) — one vectorized pass, no per-contour work."""
    out = rgb.astype(np.float32)
    m = np.asarray(mask, dtype=bool)
    out[m] = 0.7 * out[m] + 0.3 * color
    return out.astype(np.uint8)


def save_visualization(
    image: np.ndarray,
    mask: np.ndarray,
    filtered_mask: np.ndarray,
    roi: Optional[Dict[str, int]],
    vis_path: Path,
    contour_metrics: Optional[Sequence[Dict[str, Any]]] = None,
) -> None:
    """Write the two-panel overlay PNG (reference ``:527-583``).

    ``image``: (H, W) grayscale or (H, W, 3) RGB frame. ``mask``: raw
    post-morphology foreground. ``filtered_mask``: kept components only.
    ``roi``: optional dict with x_min/x_max/y_min/y_max pixel bounds.
    """
    from PIL import Image, ImageDraw

    rgb = _to_rgb(image)
    h, w = rgb.shape[:2]
    left = _overlay(rgb, mask, _RED)
    right = _overlay(rgb, filtered_mask, _BLUE)
    combined = np.concatenate([left, right], axis=1)

    im = Image.fromarray(combined)
    draw = ImageDraw.Draw(im)
    x0 = roi.get("x_min", 0) if roi else 0
    x1 = roi.get("x_max", w) if roi else w
    y0 = roi.get("y_min", 0) if roi else 0
    y1 = roi.get("y_max", h) if roi else h
    for off in (0, w):  # ROI rectangle on both panels (reference :549-550)
        draw.rectangle([off + x0, y0, off + min(x1, w - 1), min(y1, h - 1)],
                       outline=_GREEN, width=2)
    draw.text((10, 8), "All Contours", fill=(255, 255, 255))
    draw.text((w + 10, 8), "ROI Contours", fill=(255, 255, 255))
    if contour_metrics is not None:
        defs = [m["deformability"] for m in contour_metrics
                if "deformability" in m]
        avg_def = float(np.mean(defs)) if defs else 0.0
        draw.text((w + 10, 28), f"Contours: {len(contour_metrics)}",
                  fill=(255, 255, 255))
        draw.text((w + 10, 48), f"Avg Deformability: {avg_def:.4f}",
                  fill=(255, 255, 255))
    vis_path = Path(vis_path)
    vis_path.parent.mkdir(parents=True, exist_ok=True)
    im.save(vis_path)


def save_mask_pngs(
    mask: np.ndarray, filtered_mask: np.ndarray, out_dir: Path, output_name: str
) -> Tuple[Path, Path]:
    """``{name}_mask.png`` + ``{name}_filtered_mask.png`` (reference
    ``:372-374``, mask*255 uint8)."""
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    mask_path = out_dir / f"{output_name}_mask.png"
    filt_path = out_dir / f"{output_name}_filtered_mask.png"
    Image.fromarray((np.asarray(mask, bool) * np.uint8(255))).save(mask_path)
    Image.fromarray((np.asarray(filtered_mask, bool) * np.uint8(255))).save(filt_path)
    return mask_path, filt_path


def disambiguated_name(image_path: Path) -> str:
    """Collision-safe output stem: prefix the batch folder's name when it
    carries a number, else a 6-hex md5 of the parent path (reference
    ``:291-308`` — same-named frames from different batches must not
    overwrite each other's visualizations).

    The batch folder is resolved explicitly: the file's own directory,
    unless that is one of the runner's known frame subdirs
    (``cropped_roi_with_target`` / ``full_frames_with_target``), in which
    case it is the grandparent. Digit-bearing batch names prefix directly;
    everything else hashes the batch DIRECTORY path — unlike the
    reference's go-up-two-levels rule, two digit-less batches of a
    digit-bearing condition can never collide."""
    import hashlib

    image_path = Path(image_path)
    sub = image_path.parent
    batch_dir = (
        sub.parent
        if sub.name in ("cropped_roi_with_target", "full_frames_with_target")
        else sub
    )
    name = batch_dir.name
    if name and any(ch.isdigit() for ch in name):
        return f"{name}_{image_path.stem}"
    path_hash = hashlib.md5(str(batch_dir).encode()).hexdigest()[:6]
    return f"{path_hash}_{image_path.stem}"
