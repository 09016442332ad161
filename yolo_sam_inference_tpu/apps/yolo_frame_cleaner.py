"""Acquisition-frame curator: keep frames with exactly one valid detection.

Capability parity with reference ``tools/yolo_frame_cleaner.py``: run YOLO
per frame, keep detections with conf >= 0.5 (``:262, :285``) whose center is
inside the ROI and whose box is fully contained with a 2px margin
(``is_box_fully_contained :213-231``); a frame passes only with exactly ONE
valid non-boundary detection (``:342``); outputs ``full_frames_with_target/``
and ``cropped_roi_with_target/`` (``:171-183``) plus one ``*_background*``
frame chosen from the no-target pool (``:369-383``); optional recursive walk
(``:385-408``). Batched device inference replaces the per-frame loop.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.logger import setup_logger

logger = setup_logger(__name__)


def is_box_fully_contained(
    box, roi: Dict[str, int], margin: int = 2
) -> bool:
    """Box fully inside the ROI with a margin (reference ``:213-231``)."""
    x1, y1, x2, y2 = box
    return (
        x1 >= roi["x_min"] + margin
        and y1 >= roi["y_min"] + margin
        and x2 <= roi["x_max"] - margin
        and y2 <= roi["y_max"] - margin
    )


def center_in_roi(box, roi: Dict[str, int]) -> bool:
    cx = (box[0] + box[2]) / 2
    cy = (box[1] + box[3]) / 2
    return roi["x_min"] <= cx <= roi["x_max"] and roi["y_min"] <= cy <= roi["y_max"]


def classify_frame(
    boxes: np.ndarray, scores: np.ndarray, valid: np.ndarray,
    roi: Dict[str, int], conf: float = 0.5,
) -> Tuple[str, Optional[np.ndarray]]:
    """-> ('target', box) | ('background', None) | ('rejected', None).

    target = exactly one confident in-ROI fully-contained detection;
    background = zero confident detections (usable as background frame).
    """
    keep = [
        boxes[i]
        for i in range(len(boxes))
        if valid[i] and scores[i] >= conf and center_in_roi(boxes[i], roi)
    ]
    contained = [b for b in keep if is_box_fully_contained(b, roi)]
    n_any = int(sum(1 for i in range(len(boxes)) if valid[i] and scores[i] >= conf))
    if len(keep) == 1 and len(contained) == 1:
        return "target", contained[0]
    if n_any == 0:
        return "background", None
    return "rejected", None


def clean_frames(
    input_dir: Path,
    output_dir: Path,
    pipeline,
    roi: Optional[Dict[str, int]] = None,
    conf: float = 0.5,
    recursive: bool = False,
    batch_size: int = 16,
) -> Dict[str, int]:
    """Curate a directory of acquisition frames. Returns category counts."""
    from ..io.images import list_image_files, load_image, save_image
    from ..pipeline.loader import batched_image_loader

    input_dir, output_dir = Path(input_dir), Path(output_dir)
    full_dir = output_dir / "full_frames_with_target"
    crop_dir = output_dir / "cropped_roi_with_target"
    full_dir.mkdir(parents=True, exist_ok=True)
    crop_dir.mkdir(parents=True, exist_ok=True)

    files = list_image_files(input_dir, recursive=recursive)
    counts = {"target": 0, "background": 0, "rejected": 0}
    background_pool: List[Path] = []

    for batch, paths, n_valid, _ in batched_image_loader(files, batch_size):
        out = pipeline.detect_batch_arrays(batch)  # YOLO only — no SAM here
        h, w = batch.shape[1:3]
        frame_roi = roi or {"x_min": 0, "y_min": 0, "x_max": w, "y_max": h}
        for i in range(n_valid):
            kind, box = classify_frame(
                out["boxes"][i], out["scores"][i], out["valid"][i], frame_roi, conf
            )
            counts[kind] += 1
            if kind == "target":
                img = batch[i]
                save_image(full_dir / f"{paths[i].stem}.png", img)
                crop = img[
                    frame_roi["y_min"] : frame_roi["y_max"],
                    frame_roi["x_min"] : frame_roi["x_max"],
                ]
                save_image(crop_dir / f"{paths[i].stem}.png", crop)
            elif kind == "background":
                background_pool.append(paths[i])

    if background_pool:
        bg = background_pool[len(background_pool) // 2]
        save_image(full_dir / f"{bg.stem}_background.png", load_image(bg))
        logger.info("Selected background frame: %s", bg.name)
    logger.info("Frame cleaning done: %s", counts)
    return counts


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Curate acquisition frames with YOLO")
    p.add_argument("--input-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--yolo-model", type=str, default=None)
    p.add_argument("--conf", type=float, default=0.5)
    p.add_argument("--roi", type=str, default=None,
                   help="x_min,y_min,x_max,y_max (pixel box; full frame if omitted)")
    p.add_argument("--recursive", action="store_true")
    p.add_argument("--batch-size", type=int, default=16)
    args = p.parse_args(argv)
    if not args.input_dir.is_dir():
        print(f"error: --input-dir does not exist: {args.input_dir}")
        return 2

    roi = None
    if args.roi:
        v = [int(x) for x in args.roi.split(",")]
        roi = {"x_min": v[0], "y_min": v[1], "x_max": v[2], "y_max": v[3]}

    from ..pipeline.engine import CellSegmentationPipeline, PipelineOptions

    pipeline = CellSegmentationPipeline(
        yolo_model_path=args.yolo_model,
        options=PipelineOptions(batch_size=args.batch_size),
    )
    clean_frames(
        args.input_dir, args.output_dir, pipeline, roi,
        conf=args.conf, recursive=args.recursive, batch_size=args.batch_size,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
