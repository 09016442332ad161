"""Host-side async image loading and batch assembly.

Replaces the reference's per-image synchronous ``cv2.imread`` in the hot
loop (reference ``pipeline.py:206-210, 244``) and its thread-replica
parallelism (``pipeline.py:562-566``) with a prefetching loader: a thread
pool decodes images ahead of the device, batches are grouped by image shape
(static shapes per compiled program), and partial batches are padded with a
validity count.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..io.images import load_image
from ..utils.logger import setup_logger

logger = setup_logger(__name__)


def batched_image_loader(
    files: Sequence[Path],
    batch_size: int,
    num_workers: int = 8,
    skipped_report: "Optional[Path]" = None,
) -> Iterator[Tuple[np.ndarray, List[Path], int, float]]:
    """Yield (batch (B, H, W, 3) uint8, paths, n_valid, load_seconds).

    Images are decoded concurrently and grouped by (H, W) so every yielded
    batch has a uniform static shape; the final partial batch of each group
    is padded by repeating its first image (n_valid marks the real count).
    Corrupt/zero-byte images are skipped and, when ``skipped_report`` is
    given, audited to a ``skipped_images.txt`` file (the reference's
    validation behavior, ``examples/mlflow_example_project_inference.py:178-234``).
    """
    files = list(files)
    if not files:
        return

    skipped: List[str] = []
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        t0 = time.time()
        loaded = []
        for path, img in zip(files, pool.map(_safe_load, files)):
            if img is None or img.size == 0:
                logger.warning("Skipping unreadable image: %s", path)
                skipped.append(str(path))
                continue
            loaded.append((path, img))
        load_total = time.time() - t0
    if skipped and skipped_report is not None:
        skipped_report.parent.mkdir(parents=True, exist_ok=True)
        with open(skipped_report, "a") as f:
            f.write("\n".join(skipped) + "\n")

    # group by shape, preserving order within groups
    groups: dict = {}
    for path, img in loaded:
        groups.setdefault(img.shape, []).append((path, img))

    n_total = max(len(loaded), 1)
    for shape, items in groups.items():
        for i in range(0, len(items), batch_size):
            chunk = items[i : i + batch_size]
            n_valid = len(chunk)
            imgs = [img for _, img in chunk]
            paths = [p for p, _ in chunk]
            while len(imgs) < batch_size:
                imgs.append(imgs[0])
            batch = np.stack(imgs).astype(np.uint8)
            # attribute load time proportionally to this batch
            yield batch, paths, n_valid, load_total * (n_valid / n_total)


def _safe_load(path: Path):
    try:
        return load_image(path)
    except Exception as e:  # corrupt/zero-byte images are skipped, not fatal
        logger.warning("Failed to load %s: %s", path, e)
        return None
