"""Build a deformability-classification training set from gated metrics.

Capability parity with reference ``examples/deformability_training_data.py``:
quintile-bin ``deformability`` with ``pd.qcut(..., 5)`` (``:194``) into
``very_low/low/medium/high/very_high_deformability`` directories
(``:197-219``), crop each cell with 2x bbox expansion and the row/col
coordinate swap (``:97-153``), save optimized PNGs (``:155-172``), and write
``metadata.csv`` (``:272-275``).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional

import pandas as pd

from ..utils.logger import setup_logger
from .plot_scatter import find_original_image, load_project_data

logger = setup_logger(__name__)

GROUP_NAMES = [
    "very_low_deformability",
    "low_deformability",
    "medium_deformability",
    "high_deformability",
    "very_high_deformability",
]


def crop_cell(image, row, expansion: float = 0.5):
    """2x bbox expansion crop; min_x/max_x are ROWS (regionprops order)."""
    h, w = image.shape[:2]
    r0, r1 = int(row["min_x"]), int(row["max_x"])
    c0, c1 = int(row["min_y"]), int(row["max_y"])
    rh, rw = r1 - r0, c1 - c0
    r0 = max(0, int(r0 - rh * expansion))
    r1 = min(h, int(r1 + rh * expansion))
    c0 = max(0, int(c0 - rw * expansion))
    c1 = min(w, int(c1 + rw * expansion))
    if r1 <= r0 or c1 <= c0:
        return None
    return image[r0:r1, c0:c1]


def create_training_data(
    project_path: Path,
    output_dir: Path,
    num_bins: int = 5,
    max_cells_per_bin: Optional[int] = None,
) -> pd.DataFrame:
    """Crop cells into percentile-group directories; returns the metadata table."""
    from PIL import Image

    from ..io.images import load_image

    df = load_project_data(project_path)
    df = df.dropna(subset=["deformability"]).reset_index(drop=True)
    labels = GROUP_NAMES[:num_bins]
    df["group"] = pd.qcut(df["deformability"], num_bins, labels=labels, duplicates="drop")

    output_dir = Path(output_dir)
    for g in labels:
        (output_dir / g).mkdir(parents=True, exist_ok=True)

    records = []
    counts = {g: 0 for g in labels}
    image_cache = {}
    for idx, row in df.iterrows():
        group = str(row["group"])
        if group not in counts:
            continue
        if max_cells_per_bin and counts[group] >= max_cells_per_bin:
            continue
        src = find_original_image(Path(row["__csv_dir"]), str(row["image_name"]))
        if src is None:
            continue
        if src not in image_cache:
            try:
                image_cache[src] = load_image(src)
            except (OSError, ValueError):
                image_cache[src] = None
        img = image_cache[src]
        if img is None:
            continue
        crop = crop_cell(img, row)
        if crop is None or crop.size == 0:
            continue
        name = f"{Path(str(row['image_name'])).stem}_cell{int(row['cell_id'])}.png"
        out_path = output_dir / group / name
        Image.fromarray(crop).save(out_path, optimize=True)
        counts[group] += 1
        records.append(
            {
                "file": str(out_path.relative_to(output_dir)),
                "group": group,
                "deformability": float(row["deformability"]),
                "area": row.get("area"),
                "condition": row.get("condition"),
                "image_name": row.get("image_name"),
                "cell_id": row.get("cell_id"),
            }
        )
    meta = pd.DataFrame(records)
    meta.to_csv(output_dir / "metadata.csv", index=False)
    logger.info("Training data: %s", counts)
    return meta


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Deformability training-set builder")
    p.add_argument("--project-path", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--bins", type=int, default=5)
    p.add_argument("--max-cells-per-bin", type=int, default=None)
    args = p.parse_args(argv)
    create_training_data(args.project_path, args.output_dir, args.bins, args.max_cells_per_bin)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
