"""Synthetic microscopy-style fixtures (blob "cells" on noisy background).

The reference bundles real example images; we generate equivalents so tests
carry no binary assets and no copied data.
"""

from pathlib import Path

import numpy as np


def make_cell_image(rng, h=96, w=128, n_cells=3):
    """Grayscale-ish RGB uint8 image with bright elliptical cells."""
    img = rng.normal(40, 5, size=(h, w)).clip(0, 255)
    yy, xx = np.mgrid[:h, :w]
    for _ in range(n_cells):
        cy = rng.uniform(15, h - 15)
        cx = rng.uniform(15, w - 15)
        ry = rng.uniform(4, 9)
        rx = rng.uniform(4, 9)
        blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        img[blob] = rng.uniform(150, 220)
    return np.repeat(img[..., None], 3, axis=2).astype(np.uint8)


def make_project_tree(root: Path, conditions=("condition_a", "condition_b"),
                      batches=2, images_per_batch=3, seed=0):
    """Create the reference's project layout:
    project/ -> condition/ -> batch_N/ -> imgs (reference examples/example_project)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for cond in conditions:
        for b in range(1, batches + 1):
            d = root / cond / f"batch_{b}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(images_per_batch):
                img = make_cell_image(rng)
                Image.fromarray(img).save(d / f"img_{i:03d}.png")
    return root
