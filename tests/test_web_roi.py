"""ROI web picker tests: drive the stdlib HTTP server programmatically."""

import json
import threading
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from yolo_sam_inference_tpu.web.app import (
    RoiSession,
    get_roi_coordinates_web,
    pick_condition_image,
    run_server,
)

from synth import make_cell_image


@pytest.fixture
def condition_tree(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for cond in ("cond_x", "cond_y"):
        d = tmp_path / cond / "batch_1"
        d.mkdir(parents=True)
        Image.fromarray(make_cell_image(rng)).save(d / "img_0.png")
        Image.fromarray(make_cell_image(rng)).save(d / "something_background.png")
    # full_frames preference check
    ff = tmp_path / "cond_x" / "full_frames"
    ff.mkdir()
    from PIL import Image as I

    I.fromarray(make_cell_image(rng)).save(ff / "frame.png")
    return tmp_path


def test_pick_condition_image_prefers_full_frames(condition_tree):
    p = pick_condition_image(condition_tree / "cond_x")
    assert "full_frames" in str(p)
    p2 = pick_condition_image(condition_tree / "cond_y")
    assert "background" not in p2.name


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, json.loads(r.read())


def test_full_roi_flow(condition_tree, tmp_path):
    out = tmp_path / "out"
    port = 19487
    result = {}

    def client():
        import time

        base = f"http://localhost:{port}"
        for _ in range(100):
            try:
                _get(base + "/health")
                break
            except OSError:
                time.sleep(0.1)
        status, body = _get(base + "/")
        assert status == 200 and b"Select ROI" in body
        status, img = _get(base + "/image?condition=cond_x")
        assert status == 200 and img[:8] == b"\x89PNG\r\n\x1a\n"
        _, resp = _post(base + "/confirm_roi",
                        {"condition": "cond_x", "x_min": 10, "x_max": 90, "y_min": 5, "y_max": 60})
        assert resp["next"] == "cond_y"
        _, resp = _post(base + "/confirm_roi",
                        {"condition": "cond_y", "x_min": 1, "x_max": 2, "y_min": 3, "y_max": 4})
        assert resp["next"] is None

    t = threading.Thread(target=client)
    t.start()
    rois = get_roi_coordinates_web(
        [condition_tree / "cond_x", condition_tree / "cond_y"], out, port=port, timeout=30
    )
    t.join()
    assert rois["cond_x"] == {"x_min": 10, "x_max": 90, "y_min": 5, "y_max": 60}
    assert rois["cond_y"]["x_max"] == 2
    saved = json.loads((out / "roi_coordinates.json").read_text())
    assert saved == rois


def test_condition_param_escaped_and_validated(condition_tree, tmp_path):
    """Reflected-XSS hardening: unknown conditions are rejected outright,
    and known condition names are escaped per-context in the page."""
    session = RoiSession(
        {"<img src=x onerror=alert(1)>": pick_condition_image(condition_tree / "cond_y")},
        tmp_path / "roi.json",
    )
    server = run_server(session, port=19489)
    try:
        base = "http://localhost:19489"
        # unknown condition -> 404, nothing reflected
        from urllib.parse import quote

        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(base + "/?condition=" + quote("<script>alert(1)</script>"))
        assert exc.value.code == 404
        # known-but-hostile condition name is escaped in the served page
        status, body = _get(base + "/?condition=" + quote("<img src=x onerror=alert(1)>"))
        assert status == 200
        assert b"<img src=x onerror" not in body
        assert b"&lt;img src=x onerror" in body
        # the JS context gets a JSON string literal with '<' escaped
        assert b'condition: "\\u003cimg' in body
        # confirm with an unknown condition -> 404
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(base + "/confirm_roi",
                  {"condition": "evil", "x_min": 0, "x_max": 1, "y_min": 0, "y_max": 1})
        assert exc.value.code == 404
    finally:
        server.shutdown()


def test_bad_confirm_rejected(condition_tree, tmp_path):
    session = RoiSession({"c": pick_condition_image(condition_tree / "cond_y")},
                         tmp_path / "roi.json")
    server = run_server(session, port=19488)
    try:
        req = urllib.request.Request(
            "http://localhost:19488/confirm_roi",
            data=b"not json",
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=10)
        assert exc.value.code == 400
    finally:
        server.shutdown()
