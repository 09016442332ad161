"""Micro-batching inference service (web/serve.py): HTTP contract,
batching behavior, shape guard, mask wire codec."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from synth import make_cell_image


@pytest.fixture(scope="module")
def running_service():
    import jax.numpy as jnp  # noqa: F401  (pipeline import below needs jax)

    from yolo_sam_inference_tpu.models.sam import sam_tiny_test
    from yolo_sam_inference_tpu.models.yolo import YoloConfig
    from yolo_sam_inference_tpu.pipeline.engine import (
        CellSegmentationPipeline,
        PipelineOptions,
    )
    from yolo_sam_inference_tpu.web.serve import serve

    opts = PipelineOptions(batch_size=4, max_det=8, metric_crop=48,
                           yolo_size=64, nms_candidates=64,
                           sam_encoder_size=64)
    pipe = CellSegmentationPipeline(
        sam_config=sam_tiny_test(), yolo_config=YoloConfig(num_classes=1),
        options=opts, seed=0,
    )
    server, service = serve(pipe, host="127.0.0.1", port=0,
                            max_wait_ms=30.0, image_shape=(64, 64))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, service
    server.shutdown()
    service.stop()


def _post(url, path, body, headers=None):
    req = urllib.request.Request(url + path, data=body, method="POST",
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _png_bytes(img):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz_ready_after_warmup(running_service):
    url, _ = running_service
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert r.status == 200
        assert json.loads(r.read())["status"] == "ok"


def test_segment_png_roundtrip(running_service):
    url, _ = running_service
    rng = np.random.default_rng(0)
    img = make_cell_image(rng, 64, 64)
    status, resp = _post(url, "/segment", _png_bytes(img),
                         {"Content-Type": "image/png"})
    assert status == 200
    assert set(resp) >= {"num_cells", "boxes", "scores", "cells"}
    assert len(resp["boxes"]) == resp["num_cells"] == len(resp["cells"])
    if resp["cells"]:
        assert set(resp["cells"][0]) == set(
            __import__("yolo_sam_inference_tpu.ops.metrics",
                       fromlist=["METRIC_KEYS"]).METRIC_KEYS)


def test_segment_raw_body_and_masks(running_service):
    url, _ = running_service
    rng = np.random.default_rng(1)
    img = make_cell_image(rng, 64, 64)
    raw = (img[..., 0] if img.ndim == 3 else img).tobytes()
    status, resp = _post(url, "/segment?masks=1", raw,
                         {"Content-Type": "application/octet-stream",
                          "X-Shape": "64x64"})
    assert status == 200
    if resp["num_cells"]:
        from yolo_sam_inference_tpu.utils.mask_encoding import (
            decode_binary_mask,
        )

        m = resp["masks"][0]
        assert len(m["offset"]) == 2
        decoded = decode_binary_mask(m)
        assert decoded.dtype == bool and decoded.any()


def test_segment_binary_response(running_service):
    """?fmt=bin returns the packed record; values match the JSON path."""
    import struct

    url, _ = running_service
    rng = np.random.default_rng(7)
    img = make_cell_image(rng, 64, 64)
    _, jresp = _post(url, "/segment?masks=1", _png_bytes(img),
                     {"Content-Type": "image/png"})
    req = urllib.request.Request(
        url + "/segment?fmt=bin&masks=1", data=_png_bytes(img),
        method="POST", headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/octet-stream"
        buf = r.read()
    assert buf[:4] == b"YSB1"
    n, nm, flags = struct.unpack_from("<III", buf, 4)
    (klen,) = struct.unpack_from("<I", buf, 16)
    keys = buf[20:20 + klen].decode().split(",")
    from yolo_sam_inference_tpu.ops.metrics import METRIC_KEYS

    assert keys == list(METRIC_KEYS) and nm == len(METRIC_KEYS)
    assert n == jresp["num_cells"] and flags == 1
    off = 20 + klen
    boxes = np.frombuffer(buf, "<f4", n * 4, off).reshape(n, 4)
    off += n * 16
    scores = np.frombuffer(buf, "<f4", n, off)
    off += n * 4
    metrics = np.frombuffer(buf, "<f4", n * nm, off).reshape(n, nm)
    off += n * nm * 4
    np.testing.assert_allclose(boxes, np.asarray(jresp["boxes"]), rtol=1e-6)
    np.testing.assert_allclose(scores, np.asarray(jresp["scores"]), rtol=1e-6)
    for j, cell in enumerate(jresp["cells"]):
        np.testing.assert_allclose(
            metrics[j], np.asarray([cell[k] for k in keys], np.float32),
            rtol=1e-5, atol=1e-5)
    # masks section decodes to the same pixels as the JSON wire codec
    import zlib

    from yolo_sam_inference_tpu.utils.mask_encoding import decode_binary_mask

    for j in range(n):
        oy, ox, h, w, nb = struct.unpack_from("<IIIII", buf, off)
        off += 20
        bits = np.unpackbits(
            np.frombuffer(zlib.decompress(buf[off:off + nb]), np.uint8)
        )[: h * w].reshape(h, w).astype(bool)
        off += nb
        jm = jresp["masks"][j]
        assert [oy, ox] == jm["offset"]
        np.testing.assert_array_equal(bits, decode_binary_mask(jm))
    assert off == len(buf)


def test_true_color_rejected_on_grayscale_service(running_service):
    """ADVICE r4 (medium): true-RGB must never silently collapse — on a
    grayscale-geometry service it is a 400; replicated-RGB still works."""
    url, _ = running_service
    rng = np.random.default_rng(8)
    color = rng.integers(0, 255, (64, 64, 3), np.uint8)
    color[..., 1] ^= 0xFF  # genuinely non-replicated
    status, resp = _post(url, "/segment", _png_bytes(color),
                         {"Content-Type": "image/png"})
    assert status == 400 and "shape" in resp["error"]
    gray = np.repeat(rng.integers(0, 255, (64, 64, 1), np.uint8), 3, -1)
    status, _ = _post(url, "/segment", _png_bytes(gray),
                      {"Content-Type": "image/png"})
    assert status == 200


def test_rgba_policy():
    from yolo_sam_inference_tpu.web.serve import InferenceService

    norm = InferenceService._normalize_channels
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 255, (8, 8, 3), np.uint8)
    rgb[..., 1] ^= 0xFF
    opaque = np.dstack([rgb, np.full((8, 8), 255, np.uint8)])
    np.testing.assert_array_equal(norm(opaque), rgb)  # alpha dropped
    rep = np.repeat(rng.integers(0, 255, (8, 8, 1), np.uint8), 3, -1)
    assert norm(rep).shape == (8, 8)  # replicated-RGB collapses
    assert norm(rgb).shape == (8, 8, 3)  # true color passes through
    translucent = opaque.copy()
    translucent[0, 0, 3] = 17
    with pytest.raises(ValueError):
        norm(translucent)


def test_body_size_cap(running_service):
    import yolo_sam_inference_tpu.web.serve as serve_mod

    url, _ = running_service
    old = serve_mod.MAX_BODY_BYTES
    serve_mod.MAX_BODY_BYTES = 64
    try:
        status, resp = _post(url, "/segment", b"x" * 200,
                             {"Content-Type": "image/png"})
        assert status == 413 and "cap" in resp["error"]
    finally:
        serve_mod.MAX_BODY_BYTES = old


def test_concurrent_requests_share_batches(running_service):
    url, service = running_service
    rng = np.random.default_rng(2)
    imgs = [make_cell_image(rng, 64, 64) for _ in range(4)]
    before = dict(service.stats)
    results = [None] * 4

    def hit(i):
        results[i] = _post(url, "/segment", _png_bytes(imgs[i]),
                           {"Content-Type": "image/png"})

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    d_req = service.stats["requests"] - before["requests"]
    d_batches = service.stats["batches"] - before["batches"]
    assert d_req == 4
    # micro-batching: 4 concurrent requests need at most 3 dispatches
    # (deterministically fewer than one-dispatch-per-request)
    assert d_batches < 4


def test_shape_mismatch_is_400(running_service):
    url, _ = running_service
    img = np.zeros((32, 32), np.uint8)
    status, resp = _post(url, "/segment", _png_bytes(img),
                         {"Content-Type": "image/png"})
    assert status == 400
    assert "shape" in resp["error"]


def test_stats_endpoint(running_service):
    url, _ = running_service
    with urllib.request.urlopen(url + "/stats", timeout=30) as r:
        s = json.loads(r.read())
    assert s["batches"] >= 1 and s["mean_batch_fill"] >= 1.0


def test_abandoned_requests_are_dropped():
    """A request that times out is marked abandoned and the collector
    skips it — no device batch runs for clients that already hung up."""
    import time

    from yolo_sam_inference_tpu.web.serve import InferenceService

    class SlowPipeline:
        class options:
            batch_size = 2

        def __init__(self):
            self.calls = 0

        def _dispatch_batch(self, imgs, fetch_masks=True):
            self.calls += 1
            return {"n": imgs.shape[0]}

        def _fetch_outputs(self, h):
            k = 4
            return {
                "valid": np.zeros((2, k), bool),
                "boxes": np.zeros((2, k, 4)),
                "scores": np.zeros((2, k)),
                "offsets": np.zeros((2, k, 2), int),
                "metrics": {m: np.zeros((2, k)) for m in
                            __import__("yolo_sam_inference_tpu.ops.metrics",
                                       fromlist=["METRIC_KEYS"]).METRIC_KEYS},
                "mask_crops": None,
            }

    pipe = SlowPipeline()
    svc = InferenceService(pipe, batch_size=2, max_wait_ms=1.0,
                           image_shape=(8, 8))
    # do NOT start the collector yet: the submit below must time out first
    img = np.zeros((8, 8), np.uint8)
    with pytest.raises(TimeoutError):
        svc.submit(img, want_masks=False, timeout=0.05)
    svc.start()
    try:
        # give the collector a moment to drain the abandoned entry
        deadline = time.time() + 2
        while svc.stats["abandoned"] < 1 and time.time() < deadline:
            time.sleep(0.01)
        assert svc.stats["abandoned"] == 1
        assert pipe.calls == 0  # no device work for the abandoned request
        # a live request still works
        resp = svc.submit(img, want_masks=False, timeout=5)
        assert resp["num_cells"] == 0
        assert pipe.calls == 1
    finally:
        svc.stop()
