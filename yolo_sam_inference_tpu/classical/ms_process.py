"""High-throughput classical pipeline over ``images.bin`` acquisition streams.

Capability parity with reference ``tools/ms_opencv_process.py``: streams the
binary container without loading all frames (``:605-836``), reads ``roi.csv``
(x,y,width,height — ``:179-216``), preprocesses the background (blur +
contrast — ``:552-584``), per frame blur -> contrast -> saturating subtract ->
threshold -> morph close/open (``process_frame :219-284``), contours with
hierarchy + min noise area 10 (``find_contours :287-332``), validity gating
(``filter_processed_image :365-487``: border-touch 2px rejection,
require-single-inner-contour, area range [250, 1200], inner/outer area
ratio), and the **C++-exact metric** ``circularity = sqrt(4*pi*A)/P`` from
raw-contour moments (``calculate_metrics :335-362`` — deliberately NOT the
hull-based formula of the deep pipeline). Output: ``deformability_results.csv``.

The dense per-frame preprocessing runs batched on the TPU
(``ops/morphology``); contour topology runs on host cv2.
"""

from __future__ import annotations

import dataclasses
import math
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp

from ..io.images_bin import iter_frame_batches, scan_frames
from ..ops.morphology import (
    contrast,
    gaussian_blur,
    morph_close,
    morph_open,
    subtract_clip,
    threshold_binary,
)
from ..utils.logger import setup_logger

logger = setup_logger(__name__)


@dataclasses.dataclass
class MsProcessingConfig:
    """Mirrors the reference's C++-derived default config
    (reference ``tools/ms_opencv_process.py:872-886``)."""

    threshold: float = 10.0
    blur_kernel: int = 3
    blur_sigma: float = 0.0
    contrast_alpha: float = 1.2
    contrast_beta: float = 0.0
    close_iterations: int = 1
    open_iterations: int = 1
    min_noise_area: float = 10.0
    border_margin: int = 2
    min_area: float = 250.0
    max_area: float = 1200.0
    min_area_ratio: float = 0.0
    require_single_inner: bool = True
    batch_size: int = 64
    # sampled per-frame stage dumps (original / roi / background / processed
    # PNGs under <batch_dir>/debug) — the operator's gate-tuning window into
    # a 17k-frame stream (reference ``:599-613, :776-800``); the reference
    # samples indices {0..4, 10, 20, 50, 100, 500} plus every 1000th frame
    debug_dumps: bool = False

    def to_json(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def read_roi_csv(path) -> Optional[Dict[str, int]]:
    """roi.csv with columns x,y,width,height (reference ``:179-216``)."""
    path = Path(path)
    if not path.exists():
        return None
    df = pd.read_csv(path)
    row = df.iloc[0]
    return {
        "x": int(row["x"]),
        "y": int(row["y"]),
        "width": int(row["width"]),
        "height": int(row["height"]),
    }


def crop_roi(frames: np.ndarray, roi: Optional[Dict[str, int]]) -> np.ndarray:
    if roi is None:
        return frames
    return frames[
        ..., roi["y"] : roi["y"] + roi["height"], roi["x"] : roi["x"] + roi["width"]
    ]


def preprocess_background(bg: np.ndarray, cfg: MsProcessingConfig) -> np.ndarray:
    """Blur + contrast background prep (reference ``:552-584``; the optional
    fastNlMeansDenoising is applied when cv2 provides it)."""
    bg = np.asarray(bg, dtype=np.float32)
    if bg.ndim == 3:
        bg = bg.mean(axis=2)
    if cv2 is not None:
        bg = cv2.fastNlMeansDenoising(bg.astype(np.uint8)).astype(np.float32)
    out = gaussian_blur(jnp.asarray(bg), cfg.blur_kernel, cfg.blur_sigma)
    out = contrast(out, cfg.contrast_alpha, cfg.contrast_beta)
    return np.asarray(out)


def process_frame_batch(
    frames: np.ndarray, background: np.ndarray, cfg: MsProcessingConfig
) -> np.ndarray:
    """Device-batched per-frame preprocessing -> (B, H, W) bool masks
    (reference ``process_frame :219-284``)."""
    f = jnp.asarray(frames, dtype=jnp.float32)
    blurred = gaussian_blur(f, cfg.blur_kernel, cfg.blur_sigma)
    enhanced = contrast(blurred, cfg.contrast_alpha, cfg.contrast_beta)
    diff = subtract_clip(enhanced, jnp.asarray(background)[None])
    binary = threshold_binary(diff, cfg.threshold)
    m = morph_close(binary, 3, cfg.close_iterations)
    m = morph_open(m, 3, cfg.open_iterations)
    return np.asarray(m)


def contour_metrics(contour: np.ndarray) -> Dict[str, float]:
    """C++-exact: circularity = sqrt(4*pi*A)/P from moments area + arcLength
    (reference ``calculate_metrics :335-362``)."""
    m = cv2.moments(contour)
    area = float(m["m00"])
    perimeter = float(cv2.arcLength(contour, True))
    circ = math.sqrt(4.0 * math.pi * area) / perimeter if perimeter > 0 else 0.0
    return {
        "area": area,
        "perimeter": perimeter,
        "circularity": circ,
        "deformability": 1.0 - circ,
    }


def analyze_mask(
    mask: np.ndarray, cfg: MsProcessingConfig
) -> Optional[Dict[str, float]]:
    """Contour-topology gating of one mask (reference ``:287-332, :365-487``).

    Returns the metric row of the single valid cell, or None if the frame is
    rejected (no/multiple candidates, border touch, bad area, bad ratio).
    """
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("cv2 required for contour topology analysis")
    m8 = mask.astype(np.uint8)
    contours, hierarchy = cv2.findContours(m8, cv2.RETR_TREE, cv2.CHAIN_APPROX_NONE)
    if not contours:
        return None
    hierarchy = hierarchy[0]  # (N, 4): next, prev, child, parent
    h, w = mask.shape

    # outer contours above noise area
    outers = [
        i
        for i, c in enumerate(contours)
        if hierarchy[i][3] == -1 and cv2.contourArea(c) > cfg.min_noise_area
    ]
    if len(outers) != 1:
        return None
    oi = outers[0]
    outer = contours[oi]

    # border-touch rejection (margin 2px, reference ``:398-413``)
    x, y, bw, bh = cv2.boundingRect(outer)
    if (
        x <= cfg.border_margin
        or y <= cfg.border_margin
        or x + bw >= w - cfg.border_margin
        or y + bh >= h - cfg.border_margin
    ):
        return None

    # inner contours (holes) above noise area (reference ``:434-454``)
    inners = [
        i
        for i, c in enumerate(contours)
        if hierarchy[i][3] == oi and cv2.contourArea(c) > cfg.min_noise_area
    ]
    if cfg.require_single_inner and len(inners) != 1:
        return None

    target = contours[inners[0]] if inners else outer
    mets = contour_metrics(target)
    if not (cfg.min_area <= mets["area"] <= cfg.max_area):
        return None
    if inners:
        outer_area = cv2.contourArea(outer)
        ratio = mets["area"] / outer_area if outer_area > 0 else 0.0
        if ratio < cfg.min_area_ratio:
            return None
        mets["area_ratio"] = ratio
    return mets


def discover_batch_dirs(root: Path) -> List[Path]:
    """Batch dirs are wherever an images.bin lives (reference ``:842-859``)."""
    return sorted({p.parent for p in Path(root).rglob("images.bin")})


# reference debug_sample_indices (``:601``); every 1000th frame also dumps
_DEBUG_SAMPLE_INDICES = frozenset({0, 1, 2, 3, 4, 10, 20, 50, 100, 500})


def _is_debug_frame(idx: int) -> bool:
    return idx in _DEBUG_SAMPLE_INDICES or idx % 1000 == 0


def _dump_debug_frames(
    debug_dir: Path,
    idx: int,
    original: np.ndarray,
    roi_image: np.ndarray,
    background: np.ndarray,
    mask: np.ndarray,
) -> None:
    """PNG stage dumps for one sampled frame (reference ``:776-800``:
    image_{i}_original / _roi / _background / _processed). Never fatal."""
    try:
        from PIL import Image

        debug_dir.mkdir(parents=True, exist_ok=True)
        u8 = lambda a: np.clip(np.asarray(a), 0, 255).astype(np.uint8)
        Image.fromarray(u8(original)).save(debug_dir / f"image_{idx}_original.png")
        Image.fromarray(u8(roi_image)).save(debug_dir / f"image_{idx}_roi.png")
        Image.fromarray(u8(background)).save(
            debug_dir / f"image_{idx}_background.png")
        Image.fromarray(u8(np.asarray(mask, bool) * 255)).save(
            debug_dir / f"image_{idx}_processed.png")
    except Exception as exc:  # pragma: no cover - diagnostics only
        logger.warning("debug dump failed for frame %d: %s", idx, exc)


def process_stream(
    bin_path: Path,
    cfg: MsProcessingConfig,
    background: Optional[np.ndarray] = None,
    roi: Optional[Dict[str, int]] = None,
) -> pd.DataFrame:
    """Process one images.bin -> rows (frame_index, area, perimeter,
    circularity, deformability). With ``cfg.debug_dumps``, sampled frames'
    stage images land under ``<batch_dir>/debug`` (reference ``:776-800``)."""
    bin_path = Path(bin_path)
    debug_dir = bin_path.parent / "debug"
    rows = []
    frame_idx = 0
    bg_prepped = None
    for raw_batch in iter_frame_batches(bin_path, cfg.batch_size):
        batch = crop_roi(raw_batch, roi)
        if bg_prepped is None:
            if background is None:
                background = batch[0]  # first frame as background fallback
            bg = crop_roi(background[None], roi)[0] if background.ndim == 2 else background
            bg_prepped = preprocess_background(bg, cfg)
        masks = process_frame_batch(batch, bg_prepped, cfg)
        for i in range(masks.shape[0]):
            if cfg.debug_dumps and _is_debug_frame(frame_idx):
                _dump_debug_frames(debug_dir, frame_idx, raw_batch[i],
                                   batch[i], bg_prepped, masks[i])
            mets = analyze_mask(masks[i], cfg)
            if mets is not None:
                rows.append({"frame_index": frame_idx, **mets})
            frame_idx += 1
    return pd.DataFrame(rows)


def process_project(
    project_dir: Path,
    output_dir: Path,
    cfg: Optional[MsProcessingConfig] = None,
) -> pd.DataFrame:
    """Process every batch dir under a project; writes deformability_results.csv."""
    from ..io.images import load_image

    cfg = cfg or MsProcessingConfig()
    project_dir, output_dir = Path(project_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    all_rows = []
    for bdir in discover_batch_dirs(project_dir):
        roi = read_roi_csv(bdir / "roi.csv")
        background = None
        for bg_name in ("background_clean.tiff", "background.tiff", "background.png"):
            if (bdir / bg_name).exists():
                background = load_image(bdir / bg_name, grayscale=True)
                break
        df = process_stream(bdir / "images.bin", cfg, background, roi)
        df["batch"] = bdir.name
        all_rows.append(df)
        logger.info("%s: %d valid cells", bdir, len(df))
    out = (
        pd.concat(all_rows, ignore_index=True)
        if all_rows
        else pd.DataFrame(columns=["frame_index", "area", "perimeter",
                                   "circularity", "deformability", "batch"])
    )
    out.to_csv(output_dir / "deformability_results.csv", index=False)

    import json

    with open(output_dir / "pipeline_parameters.json", "w") as f:
        json.dump(cfg.to_json(), f, indent=2)
    return out
