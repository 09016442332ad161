"""End-to-end pipeline tests on synthetic fixtures (CPU, tiny configs).

Covers the minimum end-to-end slice of SURVEY.md §7.2 step 5: directory run,
padded-batch semantics, metrics rows, CSV schema parity, visualization
layout, and the direct ndarray API.
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_sam_inference_tpu.models.sam import sam_tiny_test
from yolo_sam_inference_tpu.models.yolo import YoloConfig
from yolo_sam_inference_tpu.ops.metrics import METRIC_KEYS
from yolo_sam_inference_tpu.pipeline.engine import (
    CellSegmentationPipeline,
    ParallelCellSegmentationPipeline,
    PipelineOptions,
)
from yolo_sam_inference_tpu.reporting import (
    print_summary,
    save_results_to_csv,
    save_run_summary,
)

from synth import make_cell_image, make_project_tree


TINY_OPTS = PipelineOptions(
    batch_size=2,
    max_det=8,
    metric_crop=48,
    conf_threshold=0.25,
    yolo_size=64,
    nms_candidates=64,
    compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny_pipeline():
    return CellSegmentationPipeline(
        sam_config=sam_tiny_test(),
        yolo_config=YoloConfig(num_classes=1),
        options=TINY_OPTS,
    )


@pytest.mark.slow
def test_process_batch_arrays_shapes(tiny_pipeline):
    rng = np.random.default_rng(0)
    imgs = np.stack([make_cell_image(rng) for _ in range(2)])
    out = tiny_pipeline.process_batch_arrays(imgs)
    b, k = 2, TINY_OPTS.max_det
    assert out["boxes"].shape == (b, k, 4)
    assert out["scores"].shape == (b, k)
    assert out["valid"].shape == (b, k)
    cm = min(TINY_OPTS.metric_crop, 96, 128)
    assert out["mask_crops"].shape == (b, k, cm, cm)
    assert out["offsets"].shape == (b, k, 2)
    for key in METRIC_KEYS:
        assert out["metrics"][key].shape == (b, k)
    # boxes inside image bounds
    assert (out["boxes"][..., [0, 2]] <= 128).all()
    assert (out["boxes"][..., [1, 3]] <= 96).all()
    assert (out["boxes"] >= 0).all()


def test_invalid_cells_zeroed(tiny_pipeline):
    rng = np.random.default_rng(1)
    imgs = np.stack([make_cell_image(rng) for _ in range(2)])
    out = tiny_pipeline.process_batch_arrays(imgs)
    invalid = ~out["valid"]
    assert (out["metrics"]["area"][invalid] == 0).all()
    assert (~out["mask_crops"][invalid].any(axis=(-2, -1))).all()


@pytest.mark.slow
def test_fetch_masks_false_skips_crop_transfer(tiny_pipeline):
    """fetch_masks=False (the CSV-only directory path) must skip the mask
    bitpack + device->host crop transfer (~4 MB/batch at serving shape — the
    dominant fetch leg on the tunneled link) while leaving every other
    output identical."""
    rng = np.random.default_rng(21)
    imgs = np.stack([make_cell_image(rng) for _ in range(2)])
    full = tiny_pipeline.process_batch_arrays(imgs)
    lean = tiny_pipeline.process_batch_arrays(imgs, fetch_masks=False)
    assert lean["mask_crops"] is None
    h = tiny_pipeline._dispatch_batch(imgs, fetch_masks=False)
    assert h["packed"] is None  # the pack program was never dispatched
    for name in ("boxes", "scores", "valid", "offsets"):
        np.testing.assert_array_equal(full[name], lean[name], err_msg=name)
    for key in METRIC_KEYS:
        np.testing.assert_array_equal(
            full["metrics"][key], lean["metrics"][key], err_msg=key
        )


@pytest.mark.slow
def test_grayscale_transfer_path_matches_rgb(tiny_pipeline):
    """Replicated-RGB batches take the 1-channel host->device transfer path
    (engine._images_to_device) and must produce identical outputs."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    gray = np.stack([make_cell_image(rng)[..., 0] for _ in range(2)])
    rgb = np.repeat(gray[..., None], 3, axis=-1)

    dev, b = tiny_pipeline._images_to_device(rgb)
    assert dev.ndim == 3 and b == 2  # the gray fast path actually engaged

    # RGB route (4D device input) vs gray route (3D) through the same program
    h, w = rgb.shape[1:3]
    st = tiny_pipeline._stages(h, w)
    out4 = st["fused"](st["yolo_params"], st["sam_params"], jnp.asarray(rgb))
    out3 = st["fused"](st["yolo_params"], st["sam_params"], jnp.asarray(gray))
    names = ("boxes", "scores", "valid", "mask_crops", "offsets", "metrics")
    for name, a, b4 in zip(names, out3, out4):
        if name == "metrics":
            for key in METRIC_KEYS:
                np.testing.assert_allclose(
                    np.asarray(a[key]), np.asarray(b4[key]), rtol=1e-6, atol=1e-6,
                    err_msg=key,
                )
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b4), rtol=1e-6, atol=1e-6, err_msg=name
            )


@pytest.mark.slow
def test_process_single_image_timing_schema(tiny_pipeline, tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    p = tmp_path / "img.png"
    Image.fromarray(make_cell_image(rng)).save(p)
    res = tiny_pipeline.process_single_image(p, tmp_path, save_visualizations=False)
    for key in ("image_load", "yolo_detection", "sam_preprocess",
                "sam_inference_total", "metrics_total", "visualization",
                "total_time", "cells_processed"):
        assert key in res.timing, key
    assert res.num_cells == len(res.cell_metrics)
    for row in res.cell_metrics:
        assert tuple(row.keys()) == METRIC_KEYS


def test_process_directory_and_reports(tiny_pipeline, tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    for i in range(3):
        Image.fromarray(make_cell_image(rng)).save(in_dir / f"im_{i}.png")

    out_dir = tmp_path / "out"
    batch = tiny_pipeline.process_directory(in_dir, out_dir, progress=False)
    assert len(batch.results) == 3
    assert batch.total_timing["total_cells"] == sum(r.num_cells for r in batch.results)

    run_dir = out_dir / tiny_pipeline.run_id
    save_results_to_csv(batch, run_dir)
    save_run_summary(batch, in_dir, run_dir, tiny_pipeline.run_id, total_runtime=1.0)
    print_summary(batch, total_runtime=1.0)

    import pandas as pd

    if batch.metrics_data:
        df = pd.read_csv(run_dir / "cell_metrics.csv")
        # golden column schema (reference reporting.py:19-27 + metrics keys)
        assert list(df.columns)[:2] == ["image_name", "cell_id"]
        for key in METRIC_KEYS:
            assert key in df.columns
    tdf = pd.read_csv(run_dir / "processing_times.csv")
    assert list(tdf.columns)[:2] == ["image_name", "cells_processed"]
    for col in ("image_load_ms", "yolo_detection_ms", "sam_preprocess_ms"):
        assert col in tdf.columns
    assert (run_dir / "run_summary.txt").read_text().startswith("Pipeline Run Summary")


def test_async_directory_path_matches_stage_api(tiny_pipeline, tmp_path):
    """process_directory's async fused-dispatch path (batches after the
    timed sample batch) must produce the same cells/metrics as the synced
    stage-jitted API on the same images, and every image must still get a
    full per-stage timing row (sampled amortization contract)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    imgs = [make_cell_image(rng) for _ in range(5)]
    in_dir = tmp_path / "async_in"
    in_dir.mkdir()
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(in_dir / f"im_{i}.png")

    batch = tiny_pipeline.process_directory(
        in_dir, tmp_path / "async_out", progress=False
    )
    assert len(batch.results) == 5
    by_name = {Path(r.image_path).name: r for r in batch.results}

    # oracle: the synced stage API over the same 2-image groups
    for start in range(0, 5, 2):
        group = imgs[start : start + 2]
        out = tiny_pipeline.process_batch_arrays(np.stack(group))
        for j in range(len(group)):
            res = by_name[f"im_{start + j}.png"]
            assert res.num_cells == int(out["valid"][j].sum())
            kept = [k for k in range(out["valid"].shape[1]) if out["valid"][j][k]]
            for row, k in zip(res.cell_metrics, kept):
                for key in ("area", "deformability", "mean_brightness"):
                    assert row[key] == pytest.approx(
                        float(out["metrics"][key][j, k]), rel=1e-5, abs=1e-5
                    )

    for res in batch.results:  # sampled timings propagate to every image
        for key in ("image_load", "yolo_detection", "sam_preprocess",
                    "sam_inference_total", "metrics_total", "total_time"):
            assert key in res.timing

    # host-side wall attribution (bench.py BENCH_E2E reports this): all legs
    # accounted, counts match, and the async path actually ran
    stats = tiny_pipeline.last_directory_stats
    for key in ("decode_s", "dispatch_s", "fetch_s", "assemble_s",
                "sample_sync_s", "vis_s", "wall_s"):
        assert isinstance(stats[key], float) and stats[key] >= 0.0
    assert stats["n_images"] == 5
    assert stats["n_batches"] == 3  # batch_size=2 -> 2+2+1
    assert stats["n_sample_batches"] >= 1
    assert stats["dispatch_s"] > 0.0 and stats["fetch_s"] > 0.0
    assert stats["wall_s"] >= stats["sample_sync_s"]


def test_sub_batch_timing_sample(tiny_pipeline, tmp_path, monkeypatch):
    """E2E_SAMPLE_BATCH smaller than the batch size: the timing sample runs
    on a stage-jitted SUB-batch while every full batch (including the
    sampled one) goes through the async fused path; per-image timing rows
    carry the sampled per-stage device seconds."""
    from PIL import Image

    monkeypatch.setenv("E2E_SAMPLE_BATCH", "1")
    rng = np.random.default_rng(11)
    imgs = [make_cell_image(rng) for _ in range(4)]
    in_dir = tmp_path / "sub_in"
    in_dir.mkdir()
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(in_dir / f"im_{i}.png")

    batch = tiny_pipeline.process_directory(
        in_dir, tmp_path / "sub_out", progress=False
    )
    assert len(batch.results) == 4
    stage_keys = ("yolo_detection", "sam_preprocess",
                  "sam_inference_total", "metrics_total")
    per_image = {k: batch.results[0].timing[k] for k in stage_keys}
    for res in batch.results:
        for k in stage_keys:
            assert res.timing[k] > 0.0
            # every row carries the same sampled per-image stage seconds
            assert res.timing[k] == pytest.approx(per_image[k], rel=1e-9)
    # oracle parity: the async fused outputs match the synced stage API
    out = tiny_pipeline.process_batch_arrays(np.stack(imgs[:2]))
    by_name = {Path(r.image_path).name: r for r in batch.results}
    for j in range(2):
        assert by_name[f"im_{j}.png"].num_cells == int(out["valid"][j].sum())


@pytest.mark.slow
def test_mixed_shapes_grouped(tiny_pipeline, tmp_path):
    from PIL import Image

    rng = np.random.default_rng(4)
    in_dir = tmp_path / "mixed"
    in_dir.mkdir()
    Image.fromarray(make_cell_image(rng, 96, 128)).save(in_dir / "a.png")
    Image.fromarray(make_cell_image(rng, 64, 96)).save(in_dir / "b.png")
    batch = tiny_pipeline.process_directory(in_dir, tmp_path / "out2", progress=False)
    assert len(batch.results) == 2


@pytest.mark.slow
def test_parallel_pipeline_ndarray_api():
    pipe = ParallelCellSegmentationPipeline(
        sam_config=sam_tiny_test(),
        yolo_config=YoloConfig(num_classes=1),
        options=TINY_OPTS,
        num_pipelines=2,
    )
    rng = np.random.default_rng(5)
    img = make_cell_image(rng)
    boxes, masks, scores = pipe.process_image(img)
    n = boxes.shape[0]
    assert masks.shape == (n, 96, 128)
    assert scores.shape == (n,)
    if n:
        assert (scores >= TINY_OPTS.conf_threshold).all()


def test_visualization_layout(tiny_pipeline, tmp_path):
    from PIL import Image

    rng = np.random.default_rng(6)
    p = tmp_path / "v.png"
    Image.fromarray(make_cell_image(rng)).save(p)
    res = tiny_pipeline.process_single_image(p, tmp_path / "vis", save_visualizations=True)
    for d in (
        "1_original_images",
        "2_yolo_detections",
        "3_processed_masks/masks",
        "3_processed_masks/overlay_images",
        "3_processed_masks/convex_hull_overlay",
        "4_combined_visualization",
    ):
        assert (tmp_path / "vis" / d).is_dir(), d
    assert (tmp_path / "vis" / "1_original_images" / "v_original.tiff").exists()


def test_project_tree_fixture(tmp_path):
    root = make_project_tree(tmp_path / "project")
    pngs = list(root.rglob("*.png"))
    assert len(pngs) == 2 * 2 * 3


# heavy suite (torch parity / e2e pipeline / 8-device mesh): run the
# quick loop with `pytest -m "not slow" tests/`
pytestmark = pytest.mark.slow


def test_device_put_packed_roundtrip():
    """_device_put_packed: one transfer per dtype, leaves come back exact —
    mixed dtypes, None leaves, and already-on-device leaves pass through."""
    import jax
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.pipeline.engine import _device_put_packed

    rng = np.random.default_rng(0)
    dev = jnp.arange(6.0).reshape(2, 3)
    tree = {
        "a": rng.normal(size=(3, 4)).astype(np.float32),
        "b": {"w": rng.normal(size=(2, 2, 2)).astype(np.float32),
              "bf": rng.normal(size=(5,)).astype(jnp.bfloat16),
              "i": np.arange(7, dtype=np.int32),
              "none": None},
        "dev": dev,
    }
    out = _device_put_packed(tree)
    assert isinstance(out["a"], jax.Array)
    np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])
    np.testing.assert_array_equal(
        np.asarray(out["b"]["w"]), tree["b"]["w"])
    np.testing.assert_array_equal(
        np.asarray(out["b"]["bf"], np.float32),
        np.asarray(tree["b"]["bf"], np.float32))
    np.testing.assert_array_equal(np.asarray(out["b"]["i"]), tree["b"]["i"])
    assert out["b"]["none"] is None
    assert out["dev"] is dev  # device leaves untouched
    # shapes/dtypes preserved
    assert out["b"]["bf"].dtype == jnp.bfloat16
    assert out["b"]["i"].dtype == jnp.int32


def test_fused_program_value_independent():
    """The fused program's lowered HLO must not bake weight VALUES in as
    constants: two pipelines with different seeds must lower to the same
    module text (modulo nothing — byte equality), or the persistent
    compile cache misses on every fresh random init (queue r4a leg 2:
    a 189 s recompile from a closure-captured s2d tree)."""
    import jax

    from yolo_sam_inference_tpu.models.sam import sam_tiny_test
    from yolo_sam_inference_tpu.models.yolo import YoloConfig
    from yolo_sam_inference_tpu.pipeline.engine import (
        CellSegmentationPipeline,
        PipelineOptions,
    )

    opts = PipelineOptions(batch_size=2, max_det=4, metric_crop=48,
                           yolo_size=64, nms_candidates=64,
                           sam_encoder_size=64)
    texts = []
    for seed in (0, 1):
        pipe = CellSegmentationPipeline(
            sam_config=sam_tiny_test(), yolo_config=YoloConfig(num_classes=1),
            options=opts, seed=seed,
        )
        st = pipe._stages(64, 64)
        args = (st["yolo_params"], st["sam_params"], st["yolo_s2d"],
                jnp.zeros((2, 64, 64, 3), jnp.uint8))
        texts.append(st["fused_core"].lower(*args).as_text())
    assert texts[0] == texts[1], (
        "fused HLO differs between seeds — some weight array is being "
        "closure-captured into the program as a constant"
    )
