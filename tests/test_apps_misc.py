"""Tests for remaining app-layer pieces: manifest CLI, summary figures,
loader audit file, config snapshot."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from synth import make_cell_image


def test_manifest_cli_roundtrip(tmp_path, rng, capsys):
    from PIL import Image

    from yolo_sam_inference_tpu.apps.manifest_cli import main

    src = tmp_path / "imgs"
    src.mkdir()
    for i in range(3):
        Image.fromarray(make_cell_image(rng)).save(src / f"i{i}.png")
    db = str(tmp_path / "m.db")

    assert main(["--db", db, "create"]) == 0
    assert main(["--db", db, "add", "--source-dir", str(src)]) == 0
    out = capsys.readouterr().out
    assert "ingested 3 paths" in out

    assert main(["--db", db, "summary"]) == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["total"] == 3 and summary["completed"] == 0

    assert main(["--db", db, "pending"]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 3

    assert main(["--db", db, "list", "--limit", "2"]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 2

    assert main(["--db", db, "add"]) == 2  # nothing to add -> error exit


def test_summary_figures(tmp_path, rng):
    from yolo_sam_inference_tpu.registry.tracking import create_summary_figures

    df = pd.DataFrame(
        {
            "area": rng.integers(100, 1000, 50),
            "circularity": rng.random(50),
            "condition": ["a"] * 25 + ["b"] * 25,
        }
    )
    paths = create_summary_figures(df, tmp_path / "figs")
    assert len(paths) == 3
    for p in paths:
        assert p.exists() and p.stat().st_size > 500


def test_loader_skipped_audit(tmp_path, rng):
    from PIL import Image

    from yolo_sam_inference_tpu.pipeline.loader import batched_image_loader

    good = tmp_path / "good.png"
    Image.fromarray(make_cell_image(rng)).save(good)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    zero = tmp_path / "zero.png"
    zero.write_bytes(b"")

    report = tmp_path / "skipped_images.txt"
    batches = list(
        batched_image_loader([good, bad, zero], batch_size=4, skipped_report=report)
    )
    assert sum(b[2] for b in batches) == 1  # only the good image
    audit = report.read_text()
    assert "bad.png" in audit and "zero.png" in audit


@pytest.mark.slow
def test_run_config_snapshot(tmp_path, rng):
    import jax.numpy as jnp
    from PIL import Image

    from yolo_sam_inference_tpu.models.sam import sam_tiny_test
    from yolo_sam_inference_tpu.models.yolo import YoloConfig
    from yolo_sam_inference_tpu.pipeline.engine import (
        CellSegmentationPipeline,
        PipelineOptions,
    )

    src = tmp_path / "in"
    src.mkdir()
    Image.fromarray(make_cell_image(rng)).save(src / "a.png")
    pipe = CellSegmentationPipeline(
        sam_config=sam_tiny_test(),
        yolo_config=YoloConfig(num_classes=1),
        options=PipelineOptions(batch_size=1, max_det=4, metric_crop=48,
                                yolo_size=64, nms_candidates=32,
                                compute_dtype=jnp.float32),
    )
    pipe.process_directory(src, tmp_path / "out", progress=False)
    snap = json.loads(
        (tmp_path / "out" / pipe.run_id / "pipeline_parameters.json").read_text()
    )
    assert snap["batch_size"] == 1
    assert snap["run_id"] == pipe.run_id


def test_runner_quant_flag_plumbs():
    """--quant parses on both runners and lands in PipelineOptions."""
    from yolo_sam_inference_tpu.apps import project_inference, single_batch_inference
    from yolo_sam_inference_tpu.pipeline.engine import PipelineOptions

    a = single_batch_inference.parse_args(
        ["--input-dir", "/x", "--output-dir", "/y", "--quant", "int8"]
    )
    assert a.quant == "int8"
    b = project_inference.parse_args(
        ["--project-dir", "/x", "--output-dir", "/y", "--quant", "int8"]
    )
    assert b.quant == "int8"
    assert PipelineOptions(quant="int8").quant == "int8"


def test_cv2_roi_picker_interaction(tmp_path, monkeypatch):
    """Legacy picker parity (reference example_project_inference.py:226-262):
    two clicks -> (min, max), 'r' resets, 'c' confirms — driven through a
    scripted cv2 stub (no display in this environment)."""
    import sys
    import types

    import numpy as np
    from PIL import Image

    img_path = tmp_path / "frame.png"
    Image.fromarray(np.zeros((20, 40), np.uint8)).save(img_path)

    stub = types.SimpleNamespace()
    stub.EVENT_LBUTTONDOWN = 1
    state = {"cb": None, "keys": None}

    stub.imread = lambda p: np.zeros((20, 40, 3), np.uint8)
    stub.namedWindow = lambda name: None
    stub.line = lambda *a, **k: None
    stub.imshow = lambda *a, **k: None
    stub.destroyAllWindows = lambda: None

    def set_cb(name, cb):
        state["cb"] = cb

    stub.setMouseCallback = set_cb

    def wait_key(ms):
        return next(state["keys"])

    stub.waitKey = wait_key

    def keyscript():
        cb = state["cb"]
        cb(stub.EVENT_LBUTTONDOWN, 30, 5, 0, None)   # click x=30
        yield 0xFF & 0  # no-op key
        cb(stub.EVENT_LBUTTONDOWN, 8, 5, 0, None)    # click x=8
        yield ord("r")  # reset — points cleared
        cb(stub.EVENT_LBUTTONDOWN, 12, 5, 0, None)
        cb(stub.EVENT_LBUTTONDOWN, 33, 5, 0, None)
        yield ord("c")  # confirm

    monkeypatch.setitem(sys.modules, "cv2", stub)
    import importlib

    import yolo_sam_inference_tpu.gate.picker as picker

    importlib.reload(picker)
    state["keys"] = keyscript()
    # drive: first wait_key call happens after callback registration
    x_min, x_max = picker.get_roi_coordinates(img_path)
    assert (x_min, x_max) == (12, 33)


def test_cv2_roi_picker_unreadable_image(tmp_path, monkeypatch):
    import sys
    import types

    stub = types.SimpleNamespace(imread=lambda p: None, EVENT_LBUTTONDOWN=1)
    monkeypatch.setitem(sys.modules, "cv2", stub)
    import importlib

    import yolo_sam_inference_tpu.gate.picker as picker

    importlib.reload(picker)
    with pytest.raises(ValueError, match="Could not read image"):
        picker.get_roi_coordinates(tmp_path / "missing.png")
