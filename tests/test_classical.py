"""Classical pipeline tests: morphology oracles vs scipy/cv2, component
extraction, ROI intersection, end-to-end detection of synthetic blobs."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_sam_inference_tpu.classical.pipeline import (
    ClassicalParams,
    ClassicalPipeline,
    _bbox_intersects_roi,
)
from yolo_sam_inference_tpu.ops.morphology import (
    absdiff,
    dilate,
    erode,
    gaussian_blur,
    morph_close,
    morph_open,
    subtract_clip,
    threshold_binary,
)


def test_dilate_erode_vs_scipy(rng):
    from scipy import ndimage

    mask = rng.random((40, 50)) > 0.7
    st = np.ones((3, 3), dtype=bool)
    got_d = np.asarray(dilate(jnp.asarray(mask), 3, 1))
    want_d = ndimage.binary_dilation(mask, st)
    np.testing.assert_array_equal(got_d, want_d)

    got_e = np.asarray(erode(jnp.asarray(mask), 3, 1))
    want_e = ndimage.binary_erosion(mask, st, border_value=0)
    np.testing.assert_array_equal(got_e, want_e)


def test_open_close_idempotent_on_big_blob():
    mask = np.zeros((32, 32), dtype=bool)
    mask[8:24, 8:24] = True
    opened = np.asarray(morph_open(jnp.asarray(mask), 3, 1))
    np.testing.assert_array_equal(opened, mask)
    closed = np.asarray(morph_close(jnp.asarray(mask), 3, 1))
    np.testing.assert_array_equal(closed, mask)


def test_open_removes_speckle():
    mask = np.zeros((32, 32), dtype=bool)
    mask[5, 5] = True  # single-pixel noise
    mask[10:20, 10:20] = True
    opened = np.asarray(morph_open(jnp.asarray(mask), 3, 1))
    assert not opened[5, 5]
    assert opened[12:18, 12:18].all()


def test_gaussian_blur_vs_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = (rng.random((48, 64)) * 255).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(img), 5, 1.2))
    want = cv2.GaussianBlur(img, (5, 5), 1.2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_subtract_and_threshold_semantics():
    a = jnp.asarray([[10.0, 5.0]])
    b = jnp.asarray([[3.0, 9.0]])
    np.testing.assert_array_equal(np.asarray(subtract_clip(a, b)), [[7.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(absdiff(a, b)), [[7.0, 4.0]])
    np.testing.assert_array_equal(
        np.asarray(threshold_binary(jnp.asarray([[5.0, 6.0]]), 5.0)), [[False, True]]
    )


@pytest.fixture
def synthetic_frames(rng):
    h, w, n = 96, 128, 3
    bg = rng.normal(40, 2, size=(h, w)).astype(np.float32).clip(0, 255)
    frames = np.stack([bg.copy() for _ in range(n)])
    yy, xx = np.mgrid[:h, :w]
    centers = [(30, 40), (60, 90), (50, 30)]
    for i in range(n):
        cy, cx = centers[i]
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= 8**2
        frames[i][blob] = 200.0
    return frames, bg, centers


def test_classical_end_to_end(synthetic_frames):
    frames, bg, centers = synthetic_frames
    pipe = ClassicalPipeline(ClassicalParams(threshold=20, min_area=30))
    results = pipe.process_images(frames, background=bg)
    assert len(results) == 3
    for i, rows in enumerate(results):
        assert len(rows) == 1, f"frame {i}: expected 1 cell, got {len(rows)}"
        row = rows[0]
        cy, cx = centers[i]
        assert abs((row["min_x"] + row["max_x"]) / 2 - cy) < 4
        assert abs((row["min_y"] + row["max_y"]) / 2 - cx) < 4
        assert row["circularity"] == 0.5 and row["deformability"] == 0.5
        assert row["area_ratio"] == 1.0
        assert row["area"] > 100


def test_classical_roi_filter(synthetic_frames):
    frames, bg, centers = synthetic_frames
    pipe = ClassicalPipeline(ClassicalParams(threshold=20, min_area=30))
    # ROI covering only x (col) in [80, 120]: keeps the (60, 90) cell only
    roi = {"x_min": 80, "x_max": 120, "y_min": 0, "y_max": 1000}
    results = pipe.process_images(frames, background=bg, roi=roi)
    assert [len(r) for r in results] == [0, 1, 0]


def test_bbox_roi_intersection_convention():
    row = {"min_x": 10, "max_x": 20, "min_y": 30, "max_y": 40}  # rows 10-20, cols 30-40
    assert _bbox_intersects_roi(row, {"x_min": 35, "x_max": 50})
    assert not _bbox_intersects_roi(row, {"x_min": 45, "x_max": 50})
    assert _bbox_intersects_roi(row, {"x_min": 0, "x_max": 100, "y_min": 15, "y_max": 18})
    assert not _bbox_intersects_roi(row, {"x_min": 0, "x_max": 100, "y_min": 25, "y_max": 28})


def test_parameters_snapshot(tmp_path):
    import json

    pipe = ClassicalPipeline(ClassicalParams(threshold=15))
    p = tmp_path / "pipeline_parameters.json"
    pipe.save_parameters(p)
    data = json.loads(p.read_text())
    assert data["threshold"] == 15
    assert data["pipeline"] == "classical_background_subtraction"
