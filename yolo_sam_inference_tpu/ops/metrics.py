"""Batched on-device cell morphometrics (the scientific core).

TPU-native re-design of the reference metrics engine
(reference ``utils/metrics.py:9-119``), which ran skimage ``regionprops`` +
``find_contours`` + ``scipy.spatial.ConvexHull`` + ``polygon2mask`` per cell on
the host. Here every metric is a fixed-shape ``jnp`` computation batched over
all cells of an image (and vmappable over images), so the whole morphometrics
stage fuses into the jitted pipeline program:

* **area / centroid / bbox** — masked reductions over the mask grid; the bbox
  keeps the reference's (row, col) regionprops convention (``min_x`` is the min
  ROW; consumers compensate — see reference ``examples/plot_scatter_example.py:115-119``).
* **perimeter** — the exact skimage ``regionprops.perimeter`` estimator
  (4-connected border via erosion, 3x3 code convolution, weighted histogram
  with weights 1, sqrt(2), (1+sqrt(2))/2), implemented as shifts + a small
  lookup table: bit-identical weighting, fully vectorized.
* **convex hull** — instead of host ConvexHull on contour points, we collect
  the per-row/per-column extreme *boundary midpoints* (the same +-0.5 pixel
  edge-midpoint convention as skimage ``find_contours`` vertices, a superset
  of all hull vertices, only ``2*(h+w)`` candidates), take per-direction
  argmax supports over ``D`` static directions via one small matmul (MXU
  friendly), and evaluate the exact shoelace area / polygon perimeter of the
  resulting angularly-ordered vertex cycle. With D=256 the area error versus
  the exact hull is well below one pixel for cell-sized masks.
  Divergence note: the reference rasterizes the hull polygon and re-measures
  it with regionprops (``utils/metrics.py:42-48``); we use the exact polygon
  area/perimeter, which is the same quantity without rasterization noise.
* **circularity / deformability** — the reference formulas preserved exactly:
  ``circularity = 2*sqrt(pi*hull_area)/hull_perimeter`` (hull-based — see the
  DO-NOT-CHANGE comment at reference ``utils/metrics.py:75``) and
  ``deformability = 1 - circularity``.
* **brightness** — mean/std of the grayscale image inside a disk of radius
  ``int(0.1 * min(image_shape))`` centered at the mask centroid (reference
  ``utils/metrics.py:84-94``), computed from a static-size window around the
  centroid via ``dynamic_slice`` so no host round-trip is needed.

Masks may be given as full-image arrays or as fixed-size crops with a
per-cell ``(row0, col0)`` offset; crops are how the pipeline bounds the work
per cell (cells are tiny relative to the frame).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

METRIC_KEYS = (
    "deformability",
    "area",
    "area_ratio",
    "circularity",
    "convex_hull_area",
    "mask_x_length",
    "mask_y_length",
    "min_x",
    "min_y",
    "max_x",
    "max_y",
    "mean_brightness",
    "brightness_std",
    "perimeter",
    "aspect_ratio",
    "convex_hull_perimeter",
)

_BIG = 1.0e9

# skimage.measure.perimeter weight table (4-neighborhood):
#   codes 5,7,15,17,25,27 -> 1 ; codes 21,33 -> sqrt(2) ; codes 13,23 -> (1+sqrt(2))/2
_PERIM_WEIGHTS = np.zeros(50, dtype=np.float32)
_PERIM_WEIGHTS[[5, 7, 15, 17, 25, 27]] = 1.0
_PERIM_WEIGHTS[[21, 33]] = math.sqrt(2.0)
_PERIM_WEIGHTS[[13, 23]] = (1.0 + math.sqrt(2.0)) / 2.0


def _shift2d(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Shift a (..., h, w) array by (dr, dc) with zero fill."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(dr, 0), max(-dr, 0)),
        (max(dc, 0), max(-dc, 0)),
    ]
    x = jnp.pad(x, pad)
    rs = max(-dr, 0)
    cs = max(-dc, 0)
    return x[..., rs : rs + h, cs : cs + w]


def perimeter_4n(mask: jnp.ndarray) -> jnp.ndarray:
    """skimage-exact weighted perimeter of (..., h, w) binary masks.

    Matches ``skimage.measure.perimeter(mask, neighborhood=4)`` (which is what
    ``regionprops.perimeter`` computes, used at reference ``utils/metrics.py:65``).

    Implementation notes (TPU): one zero-pad + nine static slices instead of
    per-shift pads, and the 50-entry weight lookup expressed as comparisons
    (element gathers are very slow on TPU vector units — the take() version
    dominated the whole metrics stage).
    """
    m = mask.astype(jnp.float32)
    h, w = m.shape[-2], m.shape[-1]
    pad = [(0, 0)] * (m.ndim - 2) + [(1, 1), (1, 1)]
    mp = jnp.pad(m, pad)

    def sl(dr, dc):
        return mp[..., 1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]

    # binary erosion with the 4-connected cross, border_value=0
    eroded = m * sl(-1, 0) * sl(1, 0) * sl(0, -1) * sl(0, 1)
    border = m - eroded  # 0/1

    bp = jnp.pad(border, pad)

    def bl(dr, dc):
        return bp[..., 1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]

    # convolution with [[10,2,10],[2,1,2],[10,2,10]] (symmetric kernel)
    diag = bl(-1, -1) + bl(-1, 1) + bl(1, -1) + bl(1, 1)
    orth = bl(-1, 0) + bl(1, 0) + bl(0, -1) + bl(0, 1)
    code = 10.0 * diag + 2.0 * orth + border

    sqrt2 = math.sqrt(2.0)
    w1 = (
        (code == 5.0) | (code == 7.0) | (code == 15.0)
        | (code == 17.0) | (code == 25.0) | (code == 27.0)
    )
    w2 = (code == 21.0) | (code == 33.0)
    w3 = (code == 13.0) | (code == 23.0)
    per_pixel = (
        w1.astype(jnp.float32)
        + w2.astype(jnp.float32) * sqrt2
        + w3.astype(jnp.float32) * ((1.0 + sqrt2) / 2.0)
    ) * border
    return per_pixel.sum(axis=(-2, -1))


@functools.lru_cache(maxsize=8)
def _hull_directions(num_directions: int) -> np.ndarray:
    ang = np.arange(num_directions, dtype=np.float64) * (2.0 * np.pi / num_directions)
    return np.stack([np.cos(ang), np.sin(ang)], axis=1).astype(np.float32)  # (D, 2)


def _hull_candidate_scores(
    masks: jnp.ndarray, num_directions: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared hull front-end: boundary edge-midpoint candidates + their
    support scores along D static directions.

    Returns (pts (K, N, 2), scores (K, N, D), any_mask (K,)).
    """
    m = masks.astype(jnp.float32)
    k, h, w = m.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    any_mask = m.max(axis=(1, 2)) > 0  # (K,)
    area = m.sum(axis=(1, 2))
    cr = (m * rows).sum(axis=(1, 2)) / jnp.maximum(area, 1.0)
    cc = (m * cols).sum(axis=(1, 2)) / jnp.maximum(area, 1.0)

    # Per-row extreme columns / per-col extreme rows.
    minc = jnp.where(m > 0, cols, _BIG).min(axis=2)  # (K, h)
    maxc = jnp.where(m > 0, cols, -_BIG).max(axis=2)
    row_ok = m.max(axis=2) > 0
    minr = jnp.where(m > 0, rows, _BIG).min(axis=1)  # (K, w)
    maxr = jnp.where(m > 0, rows, -_BIG).max(axis=1)
    col_ok = m.max(axis=1) > 0

    r_idx = jax.lax.broadcasted_iota(jnp.float32, (k, h), 1)
    c_idx = jax.lax.broadcasted_iota(jnp.float32, (k, w), 1)

    # Candidate points in the +-0.5 edge-midpoint convention; invalid rows/cols
    # collapse to the centroid (strictly inside the hull, never extreme).
    def fill(pts_r, pts_c, ok):
        pr = jnp.where(ok, pts_r, cr[:, None])
        pc = jnp.where(ok, pts_c, cc[:, None])
        return jnp.stack([pr, pc], axis=-1)  # (K, n, 2)

    pts = jnp.concatenate(
        [
            fill(r_idx, minc - 0.5, row_ok),
            fill(r_idx, maxc + 0.5, row_ok),
            fill(minr - 0.5, c_idx, col_ok),
            fill(maxr + 0.5, c_idx, col_ok),
        ],
        axis=1,
    )  # (K, N, 2) with N = 2h + 2w

    dirs = jnp.asarray(_hull_directions(num_directions))  # (D, 2)
    scores = jnp.einsum(
        "knc,dc->knd", pts, dirs, preferred_element_type=jnp.float32
    )  # (K, N, D)
    return pts, scores, any_mask


def _hull_vertices(
    masks: jnp.ndarray, num_directions: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K, h, w) -> (support vertices (K, D, 2) CCW, any_mask (K,)).

    On TPU the score/max/tie-break pipeline runs as ONE Pallas pass
    (ops/hull_support.py), so the (K, N, D) scores tensor never reaches
    HBM (three round-trips of ~0.8 GB at bench shape as XLA ops); elsewhere
    the einsum + select path below produces identical results.
    """
    pts, scores, any_mask = _hull_candidate_scores(masks, num_directions)
    if jax.default_backend() != "cpu":
        from .hull_support import support_vertices_tpu

        dirs = jnp.asarray(_hull_directions(num_directions))
        sup = support_vertices_tpu(pts.transpose(0, 2, 1), dirs)  # (K, 2, D)
        return sup.transpose(0, 2, 1), any_mask
    return _select_support_points(pts, scores), any_mask


def _select_support_points(pts: jnp.ndarray, scores: jnp.ndarray) -> jnp.ndarray:
    """Per-direction support points WITHOUT a gather.

    ``take_along_axis(pts, argmax(scores))`` measured 1.5 ms/iter at bench
    shape (element gathers are pathological on TPU). Instead the tied-max
    candidates are reduced lexicographically: among score-tied candidates
    take max r, then among r-tied take max c — select-where-max +
    max-reduce twice, all fusable elementwise/reduce ops. Coordinates are
    half-integer and exact in fp32 at any practical image size (a packed
    ``(2r+2)*4096+(2c+2)`` key used previously overflowed the row field
    once a column coordinate reached 2047.5). Tie-break picks the tied
    point with max (r, c) — a true extreme of the supporting segment, so
    hull geometry is unchanged.
    """
    mx = scores.max(axis=1, keepdims=True)  # (K, 1, D)
    elig = scores >= mx  # (K, N, D)
    r = pts[..., 0][:, :, None]  # (K, N, 1)
    c = pts[..., 1][:, :, None]
    vr = jnp.where(elig, r, -1e9).max(axis=1)  # (K, D)
    elig2 = jnp.logical_and(elig, r >= vr[:, None, :])
    vc = jnp.where(elig2, c, -1e9).max(axis=1)
    return jnp.stack([vr, vc], axis=-1)  # (K, D, 2)


def convex_hull_measures(
    masks: jnp.ndarray, num_directions: int = 256
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact convex hull (area, perimeter) of batched binary masks.

    ``masks``: (K, h, w) bool/float. Returns (area (K,), perimeter (K,)) of the
    convex hull of the boundary edge-midpoints (find_contours vertex
    convention, reference ``utils/metrics.py:31-40``). Zero for empty masks.
    """
    verts, any_mask = _hull_vertices(masks, num_directions)

    nxt = jnp.roll(verts, shift=-1, axis=1)
    cross = verts[..., 0] * nxt[..., 1] - nxt[..., 0] * verts[..., 1]
    hull_area = 0.5 * jnp.abs(cross.sum(axis=1))
    seg = jnp.sqrt(jnp.sum((nxt - verts) ** 2, axis=-1) + 1e-12)
    # zero-length repeats contribute ~sqrt(1e-12); mask them out exactly
    seg = jnp.where(jnp.all(nxt == verts, axis=-1), 0.0, seg)
    hull_perim = seg.sum(axis=1)

    hull_area = jnp.where(any_mask, hull_area, 0.0)
    hull_perim = jnp.where(any_mask, hull_perim, 0.0)
    return hull_area, hull_perim


def rasterized_hull_measures(
    masks: jnp.ndarray, num_directions: int = 256
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """REFERENCE-procedure hull measures: rasterize the hull polygon and
    re-measure it (pixel-count area + weighted 4n perimeter).

    Matches reference ``utils/metrics.py:42-48`` (ConvexHull -> polygon2mask
    -> regionprops), which reports systematically different numbers from the
    exact polygon: the rasterized weighted perimeter runs ~3% longer, shifting
    deformability by ~+0.03 on realistic cell masks (measured in
    tests/test_metrics.py::test_reference_hull_mode_divergence_bound).

    TPU-native rasterization: the hull is the intersection of D support
    half-planes ``r*cos(a_d) + c*sin(a_d) <= h_d``. For every row r each
    half-plane bounds the column interval, so the raster mask is built from
    per-(cell, row) [cmin, cmax] intervals — (K, h, D) work, no big
    intermediates, no gathers.
    """
    m = masks.astype(jnp.float32)
    k, h, w = m.shape
    verts, any_mask = _hull_vertices(masks, num_directions)  # (K, D, 2) CCW

    # The vertex polygon is the intersection of its D edge half-planes
    # n.(p - v_i) <= 0 with n the outward edge normal. In angular vertex
    # order the interior lies left of each edge e = v_{i+1} - v_i, i.e.
    # e_r*(c - v_c) - e_c*(r - v_r) >= 0  =>  (-e_r)*c + e_c*r <= e_c*v_r - e_r*v_c.
    nxt = jnp.roll(verts, shift=-1, axis=1)
    e = nxt - verts  # (K, D, 2); zero rows for repeated vertices
    n_r = e[..., 1]  # coefficient of r in the <= constraint
    n_c = -e[..., 0]  # coefficient of c
    b = e[..., 1] * verts[..., 0] - e[..., 0] * verts[..., 1]  # (K, D)

    r_grid = jnp.arange(h, dtype=jnp.float32)  # pixel-center rows
    resid = b[:, None, :] - r_grid[None, :, None] * n_r[:, None, :]  # (K, h, D)

    eps = 1e-4
    pos = n_c > eps  # bounds c from above: c <= resid/n_c
    neg = n_c < -eps  # bounds c from below
    axial = ~(pos | neg)  # n_c ~ 0: row feasibility (or degenerate edge)
    safe_nc = jnp.where(axial, 1.0, n_c)
    bound = resid / safe_nc[:, None, :]
    cmax = jnp.where(pos[:, None, :], bound, _BIG).min(axis=-1)  # (K, h)
    cmin = jnp.where(neg[:, None, :], bound, -_BIG).max(axis=-1)
    row_ok = jnp.where(axial[:, None, :], resid, _BIG).min(axis=-1) >= -eps

    c_grid = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)  # (h, w)
    # polygon2mask's even-odd rule counts crossings strictly right of the
    # pixel center, so centers exactly ON the left crossing are inside and
    # centers exactly ON the right crossing are outside — hence the
    # asymmetric epsilons (slope-p/q hull edges do hit centers exactly).
    raster = (
        (c_grid[None] >= cmin[:, :, None] - eps)
        & (c_grid[None] <= cmax[:, :, None] - eps)
        & row_ok[:, :, None]
        & any_mask[:, None, None]
    )
    rf = raster.astype(jnp.float32)
    return rf.sum(axis=(1, 2)), perimeter_4n(rf)


def _brightness_disk(
    gray: jnp.ndarray,
    centroid_r: jnp.ndarray,
    centroid_c: jnp.ndarray,
    radius: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean/std of ``gray`` inside the centroid disk (scalar centroid inputs).

    Replicates reference ``utils/metrics.py:84-94``: disk of integer radius
    ``int(0.1 * min(H, W))`` around the float centroid, clipped at image
    bounds, NOT intersected with the cell mask.
    """
    h, w = gray.shape
    win = 2 * radius + 3
    pad = radius + 1
    gpad = jnp.pad(gray, pad)
    # slice start in padded coords must lie in [0, dim + 2*pad - win]
    r0 = jnp.clip(jnp.floor(centroid_r).astype(jnp.int32) - radius - 1, -pad, h + pad - win)
    c0 = jnp.clip(jnp.floor(centroid_c).astype(jnp.int32) - radius - 1, -pad, w + pad - win)
    window = jax.lax.dynamic_slice(gpad, (r0 + pad, c0 + pad), (win, win))
    wr = jax.lax.broadcasted_iota(jnp.float32, (win, win), 0) + r0.astype(jnp.float32)
    wc = jax.lax.broadcasted_iota(jnp.float32, (win, win), 1) + c0.astype(jnp.float32)
    in_disk = (wr - centroid_r) ** 2 + (wc - centroid_c) ** 2 <= float(radius) ** 2
    in_img = (wr >= 0) & (wr < h) & (wc >= 0) & (wc < w)
    sel = (in_disk & in_img).astype(jnp.float32)
    n = jnp.maximum(sel.sum(), 1.0)
    mean = (window * sel).sum() / n
    var = (((window - mean) * sel) ** 2).sum() / n
    return mean, jnp.sqrt(var)


def _brightness_disk_batched(
    gray: jnp.ndarray, cr: jnp.ndarray, cc: jnp.ndarray, radius: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-cells brightness disk stats, gather-free.

    Semantics identical to vmapping :func:`_brightness_disk`, but batched
    ``dynamic_slice`` windows lower to a ONE-CELL-PER-ITERATION while loop
    on TPU (measured 7.5 ms/iter at bench shape). Instead each cell's
    window is extracted at coarse 64-block granularity with one-hot block
    matmuls (dense MXU work), and the exact in-disk / in-image conditions
    are evaluated against the true float centroid inside the (larger)
    coarse window — bit-identical statistics.
    """
    h, w = gray.shape
    k = cr.shape[0]
    win = 2 * radius + 3
    pad = radius + 1
    cb = 64
    nb = (win + cb - 1 + cb - 1) // cb  # blocks covering any win window
    hp = -(-(h + 2 * pad) // cb) * cb
    wp = -(-(w + 2 * pad) // cb) * cb
    gpad = jnp.pad(gray, ((pad, hp - h - pad), (pad, wp - w - pad)))
    g5 = gpad.reshape(hp // cb, cb, wp // cb, cb)

    r0 = jnp.clip(
        jnp.floor(cr).astype(jnp.int32) - radius - 1, -pad, h + pad - win
    )
    c0 = jnp.clip(
        jnp.floor(cc).astype(jnp.int32) - radius - 1, -pad, w + pad - win
    )
    rb = (r0 + pad) // cb  # coarse origin block per cell
    cb0 = (c0 + pad) // cb
    a_idx = jnp.arange(nb)[None, :, None]
    sel_r = (
        jnp.arange(hp // cb)[None, None, :] == rb[:, None, None] + a_idx
    ).astype(jnp.float32)  # (K, nb, hblocks)
    sel_c = (
        jnp.arange(wp // cb)[None, None, :] == cb0[:, None, None] + a_idx
    ).astype(jnp.float32)
    wins = jnp.einsum(
        "kau,uxvy,kbv->kaxby", sel_r, g5, sel_c,
        preferred_element_type=jnp.float32,
    ).reshape(k, nb * cb, nb * cb)

    orow = (rb * cb - pad).astype(jnp.float32)[:, None, None]
    ocol = (cb0 * cb - pad).astype(jnp.float32)[:, None, None]
    wr = jax.lax.broadcasted_iota(jnp.float32, (nb * cb, nb * cb), 0)[None] + orow
    wc = jax.lax.broadcasted_iota(jnp.float32, (nb * cb, nb * cb), 1)[None] + ocol
    in_disk = (wr - cr[:, None, None]) ** 2 + (wc - cc[:, None, None]) ** 2 <= float(
        radius
    ) ** 2
    in_img = (wr >= 0) & (wr < h) & (wc >= 0) & (wc < w)
    sel = (in_disk & in_img).astype(jnp.float32)
    n = jnp.maximum(sel.sum(axis=(1, 2)), 1.0)
    mean = (wins * sel).sum(axis=(1, 2)) / n
    var = (((wins - mean[:, None, None]) * sel) ** 2).sum(axis=(1, 2)) / n
    return mean, jnp.sqrt(var)


def batched_cell_metrics(
    masks: jnp.ndarray,
    gray_image: jnp.ndarray,
    offsets: Optional[jnp.ndarray] = None,
    image_shape: Optional[Tuple[int, int]] = None,
    num_directions: int = 256,
    hull_mode: str = "polygon",
) -> Dict[str, jnp.ndarray]:
    """All 16 reference metrics for K cells of one image, on device.

    Args:
        masks: (K, h, w) binary cell masks — full-image arrays or fixed-size
            crops (then ``offsets`` gives each crop's (row0, col0)).
        gray_image: (H, W) float grayscale image (mean over RGB, reference
            ``utils/metrics.py:81``).
        offsets: optional (K, 2) int crop offsets; default zeros.
        image_shape: logical image shape (H, W) for the brightness disk radius
            (= crop-independent ``int(0.1 * min(H, W))``); defaults to
            ``gray_image.shape``.
        num_directions: hull support directions (static).
        hull_mode: "polygon" (default) = exact polygon area/perimeter of the
            convex hull; "reference" = the reference's rasterize-and-remeasure
            procedure (``utils/metrics.py:42-48``), which reports ~3% longer
            hull perimeters and hence ~+0.03 deformability on realistic cell
            masks — use it when numbers must line up with reference output.

    Returns:
        dict of (K,) arrays keyed by :data:`METRIC_KEYS`. Empty masks yield
        zeros (matching the reference's hull-failure path,
        ``utils/metrics.py:52-59``).
    """
    m = masks.astype(jnp.float32)
    k, h, w = m.shape
    if offsets is None:
        offsets = jnp.zeros((k, 2), dtype=jnp.int32)
    if image_shape is None:
        image_shape = gray_image.shape

    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    area = m.sum(axis=(1, 2))
    nonempty = area > 0
    safe_area = jnp.maximum(area, 1.0)
    cr = (m * rows).sum(axis=(1, 2)) / safe_area + offsets[:, 0]
    cc = (m * cols).sum(axis=(1, 2)) / safe_area + offsets[:, 1]

    # bbox in regionprops convention: (min_row, min_col, max_row+1, max_col+1)
    min_r = jnp.where(m > 0, rows, _BIG).min(axis=(1, 2)) + offsets[:, 0]
    max_r = jnp.where(m > 0, rows, -_BIG).max(axis=(1, 2)) + 1.0 + offsets[:, 0]
    min_c = jnp.where(m > 0, cols, _BIG).min(axis=(1, 2)) + offsets[:, 1]
    max_c = jnp.where(m > 0, cols, -_BIG).max(axis=(1, 2)) + 1.0 + offsets[:, 1]
    min_r = jnp.where(nonempty, min_r, 0.0)
    max_r = jnp.where(nonempty, max_r, 0.0)
    min_c = jnp.where(nonempty, min_c, 0.0)
    max_c = jnp.where(nonempty, max_c, 0.0)

    x_len = max_r - min_r  # rows ("x" in the reference's row/col naming)
    y_len = max_c - min_c
    aspect = jnp.where((x_len > 0) & (y_len > 0), x_len / jnp.maximum(y_len, 1.0), 0.0)

    perim = perimeter_4n(m)
    if hull_mode == "reference":
        hull_area, hull_perim = rasterized_hull_measures(m, num_directions)
    elif hull_mode == "polygon":
        hull_area, hull_perim = convex_hull_measures(m, num_directions)
    else:
        raise ValueError(f"unknown hull_mode: {hull_mode!r}")
    area_ratio = jnp.where(nonempty, hull_area / safe_area, 0.0)
    circularity = jnp.where(
        hull_perim > 0,
        2.0 * jnp.sqrt(jnp.pi * hull_area) / jnp.maximum(hull_perim, 1e-6),
        0.0,
    )
    deformability = 1.0 - circularity

    radius = int(0.1 * min(image_shape))
    if jax.default_backend() != "cpu":
        mean_b, std_b = _brightness_disk_batched(gray_image, cr, cc, radius)
    else:
        mean_b, std_b = jax.vmap(
            lambda r, c: _brightness_disk(gray_image, r, c, radius)
        )(cr, cc)
    mean_b = jnp.where(nonempty, mean_b, 0.0)
    std_b = jnp.where(nonempty, std_b, 0.0)

    zero = jnp.zeros_like(area)
    return {
        # empty mask: circularity 0 => deformability 1 (hull-failure path,
        # reference utils/metrics.py:52-59,75-78)
        "deformability": jnp.where(nonempty, deformability, 1.0),
        "area": area,
        "area_ratio": area_ratio,
        "circularity": circularity,
        "convex_hull_area": hull_area,
        "mask_x_length": jnp.where(nonempty, x_len, zero),
        "mask_y_length": jnp.where(nonempty, y_len, zero),
        "min_x": min_r,
        "min_y": min_c,
        "max_x": max_r,
        "max_y": max_c,
        "mean_brightness": mean_b,
        "brightness_std": std_b,
        "perimeter": perim,
        "aspect_ratio": aspect,
        "convex_hull_perimeter": hull_perim,
    }


@functools.partial(jax.jit, static_argnames=("num_directions", "hull_mode"))
def _single_metrics_jit(mask, gray, num_directions=256, hull_mode="polygon"):
    return batched_cell_metrics(
        mask[None], gray, num_directions=num_directions, hull_mode=hull_mode
    )


def calculate_metrics(
    image: np.ndarray, mask: np.ndarray, hull_mode: str = "polygon"
) -> Dict[str, float]:
    """Single-cell host API, signature-compatible with the reference
    ``calculate_metrics(image, mask)`` (``utils/metrics.py:9-119``).

    Args:
        image: RGB image (H, W, 3).
        mask: binary mask (H, W) (extra singleton dims squeezed).

    Returns:
        dict with the reference's 16 keys and python scalar types
        (ints for area/hull_area/bbox, floats elsewhere). Note
        ``convex_hull_area`` is rounded to int for schema parity
        (``utils/metrics.py:107``).
    """
    mask = np.asarray(mask)
    if mask.ndim > 2:
        mask = mask.squeeze()
    mask = mask.astype(bool)
    image = np.asarray(image)
    assert mask.shape == image.shape[:2], (
        f"Mask shape {mask.shape} does not match image shape {image.shape[:2]}"
    )
    gray = image.mean(axis=2).astype(np.float32)
    out = _single_metrics_jit(jnp.asarray(mask), jnp.asarray(gray), hull_mode=hull_mode)
    out = {key: np.asarray(v)[0] for key, v in out.items()}
    result: Dict[str, float] = {}
    for key in METRIC_KEYS:
        v = float(out[key])
        if key in ("area", "convex_hull_area", "mask_x_length", "mask_y_length",
                   "min_x", "min_y", "max_x", "max_y"):
            result[key] = int(round(v))
        else:
            result[key] = v
    return result


def calculate_metrics_no_convex_hull(image: np.ndarray, mask: np.ndarray) -> Dict[str, float]:
    """Classical-pipeline variant with placeholder hull values.

    Parity with reference ``examples/opencv_project_inference.py:30-107``:
    circularity = deformability = 0.5, area_ratio = 1.0, hull stats mirror the
    plain mask stats.
    """
    full = calculate_metrics(image, mask)
    full.update(
        {
            "circularity": 0.5,
            "deformability": 0.5,
            "area_ratio": 1.0,
            "convex_hull_area": full["area"],
            "convex_hull_perimeter": full["perimeter"],
        }
    )
    return full
