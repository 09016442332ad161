"""Numpy oracle for the REFERENCE's exact hull-measurement procedure.

The reference (reference ``utils/metrics.py:30-48``) measures the convex hull
by: find_contours(mask, 0.5) -> scipy ConvexHull of the contour points ->
polygon2mask rasterization of the hull polygon -> regionprops area (pixel
count) and perimeter (weighted 4-neighborhood estimator) of the rasterized
hull mask. skimage is not installed here, so this module re-implements that
procedure from the published definitions in pure numpy (+ scipy ConvexHull):

* find_contours vertices of a binary mask at level 0.5 are exactly the
  +-0.5 edge midpoints between inside and outside pixels (linear
  interpolation of a 0/1 field crosses 0.5 at the midpoint).
* polygon2mask includes every pixel whose integer-coordinate center lies
  inside the polygon (even-odd crossing rule).
* regionprops.perimeter is the weighted 4-neighborhood estimator
  (oracle_perimeter_4n in test_metrics.py).
"""

import numpy as np
from scipy.spatial import ConvexHull


def boundary_midpoints(mask: np.ndarray) -> np.ndarray:
    """All +-0.5 edge midpoints between inside and outside pixels
    (= the vertex set of find_contours(mask, 0.5) for a binary mask)."""
    m = np.pad(mask.astype(np.int8), 1)
    pts = []
    dv = m[1:, :] != m[:-1, :]  # vertical neighbors in padded coords
    rr, cc = np.nonzero(dv)
    pts.append(np.stack([rr - 0.5, cc - 1.0], axis=1))
    dh = m[:, 1:] != m[:, :-1]
    rr, cc = np.nonzero(dh)
    pts.append(np.stack([rr - 1.0, cc - 0.5], axis=1))
    return np.concatenate(pts, axis=0)


def rasterize_polygon(shape, poly: np.ndarray) -> np.ndarray:
    """polygon2mask equivalent: pixels whose integer centers are inside the
    (row, col) polygon, even-odd crossing rule (ray in +col direction)."""
    h, w = shape
    rr, cc = np.mgrid[:h, :w]
    pr = rr.ravel().astype(np.float64)
    pc = cc.ravel().astype(np.float64)
    inside = np.zeros(pr.shape, dtype=bool)
    n = len(poly)
    j = n - 1
    for i in range(n):
        ri, ci = poly[i]
        rj, cj = poly[j]
        crosses = (ri > pr) != (rj > pr)
        with np.errstate(divide="ignore", invalid="ignore"):
            c_at = (cj - ci) * (pr - ri) / (rj - ri) + ci
        inside ^= crosses & (pc < c_at)
        j = i
    return inside.reshape(h, w)


def reference_hull_measures(mask: np.ndarray):
    """(hull_area, hull_perimeter) via the reference's rasterize+regionprops
    procedure. Returns (0.0, 0.0) when the hull cannot be built (matching the
    reference's exception path, ``utils/metrics.py:52-59``)."""
    from test_metrics import oracle_perimeter_4n

    pts = boundary_midpoints(mask)
    if len(pts) < 3:
        return 0.0, 0.0
    try:
        hull = ConvexHull(pts)
    except Exception:
        return 0.0, 0.0
    poly = pts[hull.vertices]
    hull_mask = rasterize_polygon(mask.shape, poly)
    return float(hull_mask.sum()), oracle_perimeter_4n(hull_mask)


def reference_deformability(mask: np.ndarray) -> float:
    a, p = reference_hull_measures(mask)
    if p <= 0:
        return 1.0
    return 1.0 - 2.0 * np.sqrt(np.pi * a) / p


def make_cell_mask(rng, size=128, r_range=(8, 30), elongation=(1.0, 2.5),
                   noise=0.15) -> np.ndarray:
    """Realistic synthetic cell mask: noisy ellipse with random orientation."""
    r = rng.uniform(*r_range)
    e = rng.uniform(*elongation)
    theta = rng.uniform(0, np.pi)
    cy, cx = size / 2 + rng.uniform(-5, 5, 2)
    yy, xx = np.mgrid[:size, :size]
    y = (yy - cy) * np.cos(theta) + (xx - cx) * np.sin(theta)
    x = -(yy - cy) * np.sin(theta) + (xx - cx) * np.cos(theta)
    # low-frequency radial boundary noise (lobed cell outline)
    ang = np.arctan2(y, x)
    wobble = sum(
        rng.uniform(-noise, noise) * np.cos(k * ang + rng.uniform(0, 2 * np.pi))
        for k in (2, 3, 5)
    )
    rad = np.sqrt((y / (r * e)) ** 2 + (x / r) ** 2)
    return rad <= 1.0 + wobble
