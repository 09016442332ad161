"""Micro-batching inference service: HTTP in, per-cell metrics JSON out.

The serving-side complement of the batch engine (the reference has no
serving story at all — its closest shape is the thread-replica pipeline,
reference ``pipeline.py:440-643``, which serializes on one GPU). The
TPU-native pattern is the opposite of per-request execution: requests
queue on the host, a SINGLE device-owner thread drains the queue into
fixed-size padded batches (static shapes — one compiled program), and
every request in a batch shares one fused YOLO→SAM→metrics dispatch.
Latency under load amortizes to the per-image cost of the fused program
(~2 ms/img for config 1) instead of paying a whole-batch dispatch per
request.

Endpoints:

* ``POST /segment`` — request body is a PNG/TIFF/JPEG image (or raw
  ``(H, W)`` uint8 with ``X-Shape: HxW`` and content-type
  ``application/octet-stream``). Optional query ``?masks=1`` adds
  wire-codec masks (``utils/mask_encoding``, reference-compatible).
  Response: ``{"num_cells", "boxes", "scores", "cells": [{metric: value,
  ...}], ["masks"]}``.
* ``GET /healthz`` — liveness (200 once the device program is warm).
* ``GET /stats`` — requests served, batches dispatched, mean batch fill.

Batching knobs: ``batch_size`` (the compiled batch — requests pad up to
it), ``max_wait_ms`` (how long the collector waits to fill a batch before
dispatching a partial one). All images in one service share a single
compiled shape: the first request's (H, W) fixes it (configurable via
``image_size=``); mismatched inputs get 400 — production deployments run
one service per camera geometry, which is how acquisition rigs work.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..ops.metrics import METRIC_KEYS
from ..pipeline.engine import INT_METRIC_KEYS
from ..utils.logger import setup_logger

logger = setup_logger(__name__)


class _Pending:
    __slots__ = ("image", "want_masks", "event", "response", "error",
                 "abandoned")

    def __init__(self, image: np.ndarray, want_masks: bool):
        self.image = image
        self.want_masks = want_masks
        self.event = threading.Event()
        self.response: Optional[Dict[str, Any]] = None
        self.error: Optional[str] = None
        # set by the client side on timeout: the collector drops abandoned
        # entries instead of burning device batches nobody will read
        self.abandoned = False


class InferenceService:
    """Owns the pipeline + the collector thread; serves via stdlib HTTP."""

    def __init__(
        self,
        pipeline,
        batch_size: Optional[int] = None,
        max_wait_ms: float = 5.0,
        image_shape: Optional[Tuple[int, int]] = None,
        request_timeout_s: float = 60.0,
    ):
        self.pipeline = pipeline
        self.batch_size = int(batch_size or pipeline.options.batch_size)
        self.max_wait_s = max_wait_ms / 1e3
        self.image_shape = tuple(image_shape) if image_shape else None
        self.request_timeout_s = request_timeout_s
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._warm = threading.Event()
        self._lock = threading.Lock()  # stats + lazy image_shape init
        self.stats = {"requests": 0, "batches": 0, "images_batched": 0,
                      "errors": 0, "abandoned": 0}
        self._collector = threading.Thread(target=self._collect_loop,
                                           daemon=True)

    # -- device-owner side -----------------------------------------------------

    def start(self) -> None:
        self._collector.start()

    def stop(self) -> None:
        self._stop.set()
        self._collector.join(timeout=5)

    def warmup(self) -> None:
        """Compile + run the fused program once on zeros (so /healthz means
        'ready', not 'will compile on your first request')."""
        if self.image_shape is None:
            return
        h, w = self.image_shape
        zeros = np.zeros((self.batch_size, h, w), np.uint8)
        self.pipeline._fetch_outputs(
            self.pipeline._dispatch_batch(zeros, fetch_masks=True)
        )
        self._warm.set()

    def _collect_loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            live = [p for p in batch if not p.abandoned]
            with self._lock:
                self.stats["abandoned"] += len(batch) - len(live)
            if live:
                self._run_batch(live)

    def _run_batch(self, batch: List[_Pending]) -> None:
        try:
            n = len(batch)
            h, w = batch[0].image.shape[:2]
            imgs = np.zeros((self.batch_size, h, w), np.uint8)
            for i, p in enumerate(batch):
                imgs[i] = p.image
            want_masks = any(p.want_masks for p in batch)
            # the async fused path — the same compiled program bench.py
            # warms, so a service on a warm cache pays ZERO compiles
            # (process_batch_arrays would compile the four stage programs)
            out = self.pipeline._fetch_outputs(
                self.pipeline._dispatch_batch(imgs, fetch_masks=want_masks)
            )
            self._warm.set()
            with self._lock:
                self.stats["batches"] += 1
                self.stats["images_batched"] += n
            for i, p in enumerate(batch):
                p.response = self._format_response(out, i, p.want_masks)
                p.event.set()
        except Exception as e:  # pragma: no cover - defensive
            logger.exception("batch failed")
            with self._lock:
                self.stats["errors"] += 1
            for p in batch:
                p.error = str(e)
                p.event.set()

    @staticmethod
    def _format_response(out: Dict[str, np.ndarray], i: int,
                         want_masks: bool) -> Dict[str, Any]:
        valid = np.asarray(out["valid"][i], bool)
        kidx = np.flatnonzero(valid)
        # same int-metric rounding as every CSV surface
        # (engine._results_from_outputs) so serving and batch outputs agree
        cells = [
            {k: (int(round(float(out["metrics"][k][i, j])))
                 if k in INT_METRIC_KEYS else float(out["metrics"][k][i, j]))
             for k in METRIC_KEYS}
            for j in kidx
        ]
        resp: Dict[str, Any] = {
            "num_cells": int(kidx.size),
            "boxes": np.asarray(out["boxes"][i][kidx], float).tolist(),
            "scores": np.asarray(out["scores"][i][kidx], float).tolist(),
            "cells": cells,
        }
        if want_masks and out.get("mask_crops") is not None:
            from ..utils.mask_encoding import encode_binary_mask

            offs = np.asarray(out["offsets"][i][kidx], int).tolist()
            resp["masks"] = [
                {"offset": offs[jj],
                 **encode_binary_mask(np.asarray(out["mask_crops"][i][j]))}
                for jj, j in enumerate(kidx)
            ]
        return resp

    # -- request side ----------------------------------------------------------

    def submit(self, image: np.ndarray, want_masks: bool,
               timeout: Optional[float] = None) -> Dict[str, Any]:
        if image.ndim == 3:  # collapse replicated-RGB like the loader
            image = image[..., 0] if np.array_equal(
                image[..., 0], image[..., 1]) else image.mean(-1).astype(np.uint8)
        with self._lock:  # lazy shape init must be single-winner
            if self.image_shape is None:
                self.image_shape = image.shape[:2]
            shape = self.image_shape
            self.stats["requests"] += 1
        if image.shape[:2] != shape:
            raise ValueError(
                f"image shape {image.shape[:2]} != service shape "
                f"{shape} (one compiled geometry per service)"
            )
        p = _Pending(image, want_masks)
        self._q.put(p)
        if not p.event.wait(timeout or self.request_timeout_s):
            p.abandoned = True  # collector drops it instead of serving it
            raise TimeoutError("inference timed out")
        if p.error:
            raise RuntimeError(p.error)
        return p.response  # type: ignore[return-value]


def _decode_image(body: bytes, headers) -> np.ndarray:
    ctype = headers.get("Content-Type", "")
    if ctype == "application/octet-stream":
        shape = headers.get("X-Shape", "")
        h, w = (int(v) for v in shape.lower().split("x"))
        arr = np.frombuffer(body, np.uint8)
        if arr.size != h * w:
            raise ValueError(f"raw body size {arr.size} != {h}x{w}")
        return arr.reshape(h, w).copy()
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(body)))


def _make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, obj: Dict[str, Any]) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                ready = service._warm.is_set()
                self._send(200 if ready else 503,
                           {"status": "ok" if ready else "warming"})
            elif self.path == "/stats":
                s = dict(service.stats)
                s["mean_batch_fill"] = round(
                    s["images_batched"] / s["batches"], 3
                ) if s["batches"] else 0.0
                self._send(200, s)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if not self.path.startswith("/segment"):
                return self._send(404, {"error": "not found"})
            want_masks = "masks=1" in self.path
            try:
                length = int(self.headers.get("Content-Length", "0"))
                img = _decode_image(self.rfile.read(length), self.headers)
                resp = service.submit(np.asarray(img, np.uint8), want_masks)
                self._send(200, resp)
            except (ValueError, OSError) as e:
                self._send(400, {"error": str(e)})
            except TimeoutError as e:
                self._send(504, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                self._send(500, {"error": str(e)})

    return Handler


class _Server(ThreadingHTTPServer):
    # enough TCP backlog for a full batch of concurrent clients (the
    # stdlib default of 5 refuses connections under load) and daemonic
    # handler threads so shutdown never hangs on a stuck client
    request_queue_size = 256
    daemon_threads = True


def serve(pipeline, host: str = "0.0.0.0", port: int = 9488,
          batch_size: Optional[int] = None, max_wait_ms: float = 5.0,
          image_shape: Optional[Tuple[int, int]] = None,
          warmup: bool = True):
    """Build + start the service; returns (server, service). Callers own
    ``server.serve_forever()`` (the CLI does; tests drive it in a thread)."""
    service = InferenceService(pipeline, batch_size=batch_size,
                               max_wait_ms=max_wait_ms,
                               image_shape=image_shape)
    service.start()
    if warmup and image_shape is not None:
        service.warmup()
    server = _Server((host, port), _make_handler(service))
    return server, service
