"""End-to-end throughput benchmark: YOLO + SAM + metrics on 512x512 images.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north star = 500 images/sec/chip on TPU v5e
(YOLOv8n detect + SAM ViT-B box-prompted masks + all 16 morphometrics).
The whole pipeline runs as one fused XLA program per batch; weights are
random (no pretrained checkpoints ship in this environment) — identical
FLOPs/memory traffic to converted weights.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.pipeline.engine import (
        CellSegmentationPipeline,
        PipelineOptions,
    )

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    max_det = int(os.environ.get("BENCH_MAX_DET", "16"))
    # BASELINE.json configs: facebook/sam-vit-base (default), mobile-sam
    # (latency swap), facebook/sam-vit-large (multi-box), facebook/sam-vit-huge
    sam_model = os.environ.get("BENCH_SAM", "facebook/sam-vit-base")

    opts = PipelineOptions(batch_size=batch, max_det=max_det, metric_crop=128)
    pipe = CellSegmentationPipeline(sam_model_type=sam_model, options=opts)

    rng = np.random.default_rng(0)
    # synthetic microscopy-like frames: bright blobs on dark background
    imgs = (rng.normal(40, 5, size=(batch, size, size, 3))).clip(0, 255)
    yy, xx = np.mgrid[:size, :size]
    for b in range(batch):
        for _ in range(8):
            cy, cx = rng.uniform(30, size - 30, 2)
            r = rng.uniform(8, 20)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            imgs[b][blob] = rng.uniform(150, 220)
    imgs = imgs.astype(np.uint8)
    dev_imgs = jnp.asarray(imgs)

    def sync(out):
        # a tiny device->host transfer is the only reliable sync primitive on
        # the tunneled backend (block_until_ready can be a no-op there)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[0])

    # compile + warmup
    out = pipe.fused_call(dev_imgs)
    sync(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe.fused_call(dev_imgs)
    sync(out)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    label = {"facebook/sam-vit-base": "SAM-ViT-B", "facebook/sam-vit-large": "SAM-ViT-L",
             "facebook/sam-vit-huge": "SAM-ViT-H", "mobile-sam": "MobileSAM"}.get(sam_model, sam_model)
    print(
        json.dumps(
            {
                "metric": f"end-to-end images/sec/chip (YOLOv8n+{label}+metrics, {size}x{size})",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / 500.0, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
