"""Classical-pipeline visualization outputs (VERDICT r3 missing #1).

Covers the side-by-side overlay + mask PNG writers (reference
``examples/opencv_project_inference.py:527-583, :357-374``), batch-name
disambiguation (``:291-308``), the ``return_masks`` pipeline path, and the
runner-level output layout."""

from pathlib import Path

import numpy as np
import pytest

from yolo_sam_inference_tpu.classical.pipeline import (
    ClassicalParams,
    ClassicalPipeline,
)
from yolo_sam_inference_tpu.classical.viz import (
    disambiguated_name,
    save_mask_pngs,
    save_visualization,
)


def _frame_with_blob(h=80, w=100, cy=40, cx=30, r=10):
    bg = np.full((h, w), 30.0, dtype=np.float32)
    yy, xx = np.mgrid[:h, :w]
    f = bg.copy()
    f[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 200.0
    return f, bg


def test_return_masks_shapes_and_subset():
    f, bg = _frame_with_blob()
    pipe = ClassicalPipeline(ClassicalParams(threshold=20, min_area=30))
    results, masks, filtered = pipe.process_images(
        f[None], background=bg, return_masks=True
    )
    assert masks.shape == (1, 80, 100) and masks.dtype == bool
    assert filtered.shape == masks.shape and filtered.dtype == bool
    # filtered = kept components only -> subset of the raw mask
    assert not (filtered & ~masks).any()
    assert filtered.any() and len(results[0]) == 1


def test_roi_filter_empties_filtered_mask():
    f, bg = _frame_with_blob(cx=30)
    pipe = ClassicalPipeline(ClassicalParams(threshold=20, min_area=30))
    roi = {"x_min": 80, "x_max": 99}  # cols far from the blob
    results, masks, filtered = pipe.process_images(
        f[None], background=bg, roi=roi, return_masks=True
    )
    assert masks.any()
    assert not filtered.any() and results[0] == []


def test_save_visualization_layout(tmp_path):
    from PIL import Image

    f, _ = _frame_with_blob()
    mask = np.zeros((80, 100), bool)
    mask[30:50, 20:40] = True
    filtered = np.zeros_like(mask)
    filtered[35:45, 25:35] = True
    vis = tmp_path / "v.png"
    save_visualization(
        f, mask, filtered, {"x_min": 5, "x_max": 90, "y_min": 5, "y_max": 70},
        vis, [{"deformability": 0.25}, {"deformability": 0.35}],
    )
    im = np.asarray(Image.open(vis))
    # two side-by-side panels
    assert im.shape == (80, 200, 3)
    # left panel: red blend where mask (red channel raised above the others)
    lp = im[40, 30]
    assert lp[0] > lp[2] and lp[0] > lp[1]
    # right panel: blue blend where filtered mask only
    rp = im[40, 100 + 30]
    assert rp[2] > rp[0]
    # green ROI rectangle drawn on both panels
    assert (im[5, 5] == [0, 255, 0]).all() and (im[5, 105] == [0, 255, 0]).all()


def test_save_mask_pngs(tmp_path):
    from PIL import Image

    mask = np.zeros((16, 16), bool)
    mask[4:8, 4:8] = True
    filt = np.zeros_like(mask)
    mp, fp = save_mask_pngs(mask, filt, tmp_path, "b1_img")
    assert mp.name == "b1_img_mask.png" and fp.name == "b1_img_filtered_mask.png"
    m = np.asarray(Image.open(mp))
    assert m.max() == 255 and (m > 0).sum() == 16
    assert np.asarray(Image.open(fp)).max() == 0


def test_disambiguated_name():
    # batch folder with a digit -> prefixed name
    p = Path("/proj/cond/batch_3_output/cropped_roi_with_target/frame.png")
    assert disambiguated_name(p) == "batch_3_output_frame"
    # no digit anywhere -> 6-hex path hash prefix
    q = Path("/proj/cond/outputs/frames/frame.png")
    name = disambiguated_name(q)
    assert name.endswith("_frame") and len(name.split("_")[0]) == 6
    # same-named frames from different batches never collide
    r = Path("/proj/cond/other/frames/frame.png")
    assert disambiguated_name(r) != name


@pytest.fixture
def classical_project(tmp_path, rng):
    """condition/cond_a/batch_1_output/cropped_roi_with_target/*.png layout
    (reference :595-649)."""
    from PIL import Image

    d = tmp_path / "proj" / "cond_a" / "batch_1_output" / "cropped_roi_with_target"
    d.mkdir(parents=True)
    bg = rng.normal(30, 1, size=(80, 100)).clip(0, 255).astype(np.uint8)
    Image.fromarray(bg).save(d / "background.png")
    yy, xx = np.mgrid[:80, :100]
    for i in range(3):
        f = bg.astype(np.float32).copy()
        f[(yy - 40) ** 2 + (xx - (30 + 10 * i)) ** 2 <= 100] = 200
        Image.fromarray(f.astype(np.uint8)).save(d / f"frame_{i}.png")
    return tmp_path / "proj"


def test_runner_writes_visualizations(classical_project, tmp_path):
    from yolo_sam_inference_tpu.apps.opencv_project_inference import main

    out = tmp_path / "out"
    rc = main([
        "--project-dir", str(classical_project),
        "--output-dir", str(out),
        "--thresholds", "20",
        "--min-area", "30",
    ])
    assert rc == 0
    runs = list(out.iterdir())
    assert len(runs) == 1
    run = runs[0]
    assert (run / "cell_metrics.csv").exists()
    vis = sorted((run / "cond_a").glob("*_visualization.png"))
    masks = sorted((run / "cond_a").glob("*_mask.png"))
    assert len(vis) == 3
    # per image: _mask.png + _filtered_mask.png
    assert len(masks) == 6
    # filenames carry the digit-bearing batch folder prefix (:291-308)
    assert all(v.name.startswith("batch_1_output_") for v in vis)


def test_runner_no_visualizations_flag(classical_project, tmp_path):
    from yolo_sam_inference_tpu.apps.opencv_project_inference import main

    out = tmp_path / "out"
    rc = main([
        "--project-dir", str(classical_project),
        "--output-dir", str(out),
        "--thresholds", "20",
        "--min-area", "30",
        "--no-save-visualizations",
    ])
    assert rc == 0
    run = next(out.iterdir())
    assert not list(run.glob("cond_a/*_visualization.png"))


def test_disambiguated_name_direct_batch_layout():
    """Frames directly in a *_output batch dir (the '.' fallback): the
    nearest digit-bearing ancestor wins, so two batches of a digit-bearing
    condition never collide (a collision the reference's go-up-two-levels
    rule had)."""
    a = Path("/proj/cond_1/a_output/frame.png")
    b = Path("/proj/cond_1/b_output/frame.png")
    na, nb = disambiguated_name(a), disambiguated_name(b)
    assert na != nb
    # no digit anywhere near -> distinct hashes per directory
    c = Path("/proj/cond/a_output/frame.png")
    d = Path("/proj/cond/b_output/frame.png")
    assert disambiguated_name(c) != disambiguated_name(d)
