"""Registry tests: manifest resume semantics, nodes processing, readout,
result viewer, tracking no-op path."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from yolo_sam_inference_tpu.registry.manifest import (
    TABLE_TEMPLATES,
    WorkManifest,
    metrics_to_result_row,
)

from synth import make_cell_image


def test_manifest_ingest_upsert_and_pending(tmp_path):
    m = WorkManifest(tmp_path / "m.db")
    assert m.ingest(["a.png", "b.png", "c.png"]) == 3
    assert m.ingest(["b.png"]) == 1  # upsert keeps the row
    assert m.pending() == ["a.png", "b.png", "c.png"]

    m.record_result("b.png", [{"deformability": 0.1, "area": 100}])
    assert m.pending() == ["a.png", "c.png"]
    # idempotent re-run ingestion does not reset results
    m.ingest(["a.png", "b.png", "c.png"])
    assert m.pending() == ["a.png", "c.png"]
    assert m.get_results("b.png")[0]["area"] == 100


def test_manifest_error_and_summary(tmp_path):
    m = WorkManifest(tmp_path / "m.db", template="experiment")
    m.ingest(["x.png", "y.png"], condition_name="cond_a", batch_name="batch_1")
    m.record_error("x.png", "boom")
    m.record_result("y.png", [], empty=True)
    s = m.summary()
    assert s["total"] == 2 and s["completed"] == 1 and s["errors"] == 1 and s["empty"] == 1
    assert m.pending() == []  # errored rows are not retried silently
    rows = m.list_rows()
    assert rows[0]["error"] == "boom"


def test_all_templates_create(tmp_path):
    for t in TABLE_TEMPLATES:
        WorkManifest(tmp_path / f"{t}.db", table="imgs", template=t).close()


def test_metrics_to_result_row_schema():
    metrics = {
        "deformability": 0.2, "area": 300, "area_ratio": 1.1, "circularity": 0.8,
        "convex_hull_area": 330, "mean_brightness": 80.0, "brightness_std": 4.0,
        "perimeter": 60.0, "convex_hull_perimeter": 62.0,
    }
    row = metrics_to_result_row(metrics, box=[1, 2, 3, 4], confidence=0.9)
    # DB-facing schema keys (reference tools/postgres_data_create.py:17-33)
    for key in ("deformability", "area", "area_r", "circularity", "ch_area",
                "mean_brightness", "brightness_std", "perimeter", "ch_perimeter"):
        assert key in row
    assert row["box"] == {"x_min": 1.0, "y_min": 2.0, "x_max": 3.0, "y_max": 4.0}
    assert row["confidence"] == 0.9


@pytest.fixture(scope="module")
def tiny_pipeline():
    from yolo_sam_inference_tpu.models.sam import sam_tiny_test
    from yolo_sam_inference_tpu.models.yolo import YoloConfig
    from yolo_sam_inference_tpu.pipeline.engine import (
        CellSegmentationPipeline,
        PipelineOptions,
    )

    return CellSegmentationPipeline(
        sam_config=sam_tiny_test(),
        yolo_config=YoloConfig(num_classes=1),
        options=PipelineOptions(
            batch_size=1, max_det=4, metric_crop=48, yolo_size=64,
            nms_candidates=32, compute_dtype=jnp.float32,
        ),
    )


@pytest.mark.slow
def test_process_pending_resume(tmp_path, tiny_pipeline, rng):
    from PIL import Image

    from yolo_sam_inference_tpu.registry.nodes import process_pending

    imgs = []
    for i in range(3):
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(make_cell_image(rng)).save(p)
        imgs.append(str(p))
    bad = tmp_path / "missing.png"  # never written -> error path
    m = WorkManifest(tmp_path / "m.db")
    m.ingest(imgs + [str(bad)])

    stats = process_pending(m, tiny_pipeline)
    assert stats["processed"] == 3
    assert stats["errors"] == 1
    assert m.pending() == []
    # rows carry the DB schema incl. encoded masks round-trippable
    res = m.get_results(imgs[0])
    if res:
        from yolo_sam_inference_tpu.utils.mask_encoding import decode_binary_mask

        mask = decode_binary_mask(res[0]["mask"])
        assert mask.shape == (96, 128)
        assert "confidence" in res[0] and "box" in res[0]

    # resume: nothing left to do
    stats2 = process_pending(m, tiny_pipeline)
    assert stats2["processed"] == 0


def test_result_viewer_report(tmp_path, tiny_pipeline, rng):
    from PIL import Image

    from yolo_sam_inference_tpu.apps.result_viewer import build_report
    from yolo_sam_inference_tpu.registry.nodes import process_pending

    p = tmp_path / "img.png"
    Image.fromarray(make_cell_image(rng)).save(p)
    m = WorkManifest(tmp_path / "m.db")
    m.ingest([str(p)])
    process_pending(m, tiny_pipeline)
    out = build_report(m, tmp_path / "report.html")
    html = out.read_text()
    assert "Result viewer" in html
    assert "data:image/png;base64," in html


def test_result_viewer_serve_live(tmp_path, rng):
    """The live --serve browser (reference viewer's flow: table picker ->
    row list -> on-demand render) over the sqlite backend."""
    import threading
    import urllib.request

    from PIL import Image

    from yolo_sam_inference_tpu.apps.result_viewer import serve_viewer
    from yolo_sam_inference_tpu.registry.manifest import metrics_to_result_row
    from yolo_sam_inference_tpu.utils.mask_encoding import encode_binary_mask

    p = tmp_path / "img.png"
    img = make_cell_image(rng)
    Image.fromarray(img).save(p)
    m = WorkManifest(tmp_path / "m.db")
    m.ingest([str(p)])
    mask = np.zeros(img.shape[:2], bool)
    mask[10:30, 10:30] = True
    row = metrics_to_result_row(
        {"deformability": 0.1, "area": 400, "area_ratio": 1.0,
         "circularity": 0.9, "convex_hull_area": 420, "mean_brightness": 90.0,
         "brightness_std": 5.0, "perimeter": 80.0,
         "convex_hull_perimeter": 82.0},
        box=[10, 10, 30, 30], confidence=0.8)
    row["mask"] = encode_binary_mask(mask)
    m.record_result(str(p), [row])
    m.close()

    server = serve_viewer(
        lambda table: WorkManifest(tmp_path / "m.db", table=table),
        ["images"], "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        idx = urllib.request.urlopen(base + "/", timeout=10).read().decode()
        assert '<a href="/t/images">' in idx
        tbl = urllib.request.urlopen(base + "/t/images", timeout=10).read().decode()
        assert "1/1 complete" in tbl and "img.png" in tbl
        from urllib.parse import quote

        rowp = urllib.request.urlopen(
            base + f"/t/images/row?path={quote(str(p), safe='')}", timeout=10
        ).read().decode()
        assert "data:image/png;base64," in rowp  # on-demand render happened
        assert "0.1" in rowp  # deformability cell
        bad = urllib.request.urlopen(base + "/t/nope", timeout=10)
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        server.shutdown()


def test_combine_local_batches(tmp_path):
    from yolo_sam_inference_tpu.registry.readout import combine_local_batches

    for i in (1, 2, 3):
        d = tmp_path / f"batch_{i}"
        d.mkdir()
        pd.DataFrame({"v": [i, i * 10]}).to_csv(d / "batch_data.csv", index=False)
    df = combine_local_batches(tmp_path)
    assert len(df) == 6
    assert set(df["batch"]) == {"batch_1", "batch_2", "batch_3"}
    assert (tmp_path / "combined_output.csv").exists()


def test_tracking_noop_without_mlflow():
    from yolo_sam_inference_tpu.registry.tracking import tracked_run

    with tracked_run(enabled=True) as t:
        assert t.enabled is False  # mlflow absent in this environment
        t.log_params({"a": 1})
        t.log_metrics({"m": 2.0})
