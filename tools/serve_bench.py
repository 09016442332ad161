"""Device benchmark for the micro-batching inference service.

Starts apps/serve's service in-process (default: config-1 geometry,
B=128, 512x512), fires concurrent HTTP requests with raw uint8 bodies
over loopback, and reports steady-state throughput + per-request latency
percentiles. The service rides the fused program bench.py warms, so on a
warm cache this measures serving overhead (HTTP + queue + JSON) on top of
the known device rate, not compilation.

Usage (device): python tools/serve_bench.py [--batch 128] [--inflight 256]
                [--requests 2048] [--masks]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--inflight", type=int, default=256)
    p.add_argument("--requests", type=int, default=2048)
    p.add_argument("--warm-requests", type=int, default=256)
    p.add_argument("--max-wait-ms", type=float, default=3.0)
    p.add_argument("--masks", action="store_true")
    p.add_argument("--fmt", choices=("json", "bin"), default="json",
                   help="response format: bin = packed fp32 records "
                        "(content-negotiated; cuts per-request host CPU)")
    args = p.parse_args()

    _enable_compile_cache()
    from yolo_sam_inference_tpu.pipeline.engine import (
        CellSegmentationPipeline,
        PipelineOptions,
    )
    from yolo_sam_inference_tpu.web.serve import serve

    pipe = CellSegmentationPipeline(
        sam_model_type=os.environ.get("BENCH_SAM", "facebook/sam-vit-base"),
        options=PipelineOptions(batch_size=args.batch, max_det=16,
                                metric_crop=128),
    )
    t0 = time.time()
    server, service = serve(pipe, host="127.0.0.1", port=0,
                            batch_size=args.batch,
                            max_wait_ms=args.max_wait_ms,
                            image_shape=(args.size, args.size))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    q = [k for k, on in (("masks=1", args.masks),
                         ("fmt=bin", args.fmt == "bin")) if on]
    url = f"http://127.0.0.1:{server.server_address[1]}/segment" + (
        "?" + "&".join(q) if q else "")
    warm_s = time.time() - t0

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(args.size, args.size), dtype=np.uint8)
    # a few bright blobs so detection does real work
    yy, xx = np.mgrid[: args.size, : args.size]
    for _ in range(8):
        cy, cx = rng.uniform(30, args.size - 30, 2)
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= 14 ** 2] = 200
    body = img.tobytes()
    headers = {"Content-Type": "application/octet-stream",
               "X-Shape": f"{args.size}x{args.size}"}

    def cpu_jiffies():
        """(busy, total) jiffies across the host, from /proc/stat."""
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(v) for v in parts]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
        return sum(vals) - idle, sum(vals)

    lat_lock = threading.Lock()
    latencies = []
    counter = {"left": args.warm_requests + args.requests,
               "measured": 0, "errors": 0}
    measure_from = args.requests  # count down: last `requests` are measured
    t_start = [None]
    cpu_start = [None]

    def worker():
        while True:
            with lat_lock:
                if counter["left"] <= 0:
                    return
                counter["left"] -= 1
                measuring = counter["left"] < measure_from
                if measuring and t_start[0] is None:
                    t_start[0] = time.perf_counter()
                    cpu_start[0] = cpu_jiffies()
            rt0 = time.perf_counter()
            try:
                req = urllib.request.Request(url, data=body, headers=headers,
                                             method="POST")
                with urllib.request.urlopen(req, timeout=120) as r:
                    payload = r.read()
                if args.fmt == "bin" and payload[:4] != b"YSB1":
                    raise ValueError("bad binary magic")
            except Exception:
                with lat_lock:
                    counter["errors"] += 1
                continue
            if measuring:
                with lat_lock:
                    latencies.append(time.perf_counter() - rt0)
                    counter["measured"] += 1

    threads = [threading.Thread(target=worker) for _ in range(args.inflight)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t_start[0]
    busy0, total0 = cpu_start[0]
    busy1, total1 = cpu_jiffies()
    # host-CPU ms per measured request (client+server share this host): the
    # number the binary response mode exists to cut (VERDICT r4 next #6)
    hz = os.sysconf("SC_CLK_TCK")
    cpu_ms_per_req = (busy1 - busy0) / hz * 1e3 / max(counter["measured"], 1)
    lat_ms = np.sort(np.asarray(latencies)) * 1e3
    s = dict(service.stats)
    rec = {
        "metric": "serving images/sec (HTTP micro-batching, "
                  f"B={args.batch}, {args.size}x{args.size}, {args.fmt})",
        "value": round(counter["measured"] / dt, 2),
        "unit": "images/sec",
        "host_cpu_ms_per_request": round(cpu_ms_per_req, 2),
        "p50_request_latency_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p99_request_latency_ms": round(float(np.percentile(lat_ms, 99)), 1),
        "mean_batch_fill": round(s["images_batched"] / max(s["batches"], 1), 1),
        "errors": counter["errors"],
        "warmup_s": round(warm_s, 1),
        "inflight": args.inflight,
    }
    print(json.dumps(rec), flush=True)
    server.shutdown()
    service.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
