"""Measure the int8 (w8a8 encoder) accuracy cost against the bf16 default.

The ladder publishes int8 throughput (ViT-B 583.6, ViT-L 212.7, ViT-H 21.4
img/s) as an opt-in `--quant int8`; this tool backs those entries with the
output deltas a user buys into: detection-box drift, mask-crop IoU, and
per-metric relative error on the same weights + images.

Usage (device): BENCH_SAM=facebook/sam-vit-base python tools/quant_accuracy.py
Prints one human table + one JSON line.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache(jax):
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


def main() -> None:
    import jax

    _enable_compile_cache(jax)

    from yolo_sam_inference_tpu.pipeline.engine import (
        CellSegmentationPipeline,
        PipelineOptions,
    )

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    sam_model = os.environ.get("BENCH_SAM", "facebook/sam-vit-base")

    rng = np.random.default_rng(0)
    gray = rng.uniform(8, 28, size=(batch, size, size)).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    for b in range(batch):
        for _ in range(8):
            cy, cx = rng.uniform(40, size - 40, size=2)
            r = rng.uniform(9, 16)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            gray[b][blob] = rng.uniform(150, 220)
    imgs = np.repeat(gray.astype(np.uint8)[..., None], 3, axis=-1)

    outs = {}
    for quant in (None, "int8"):
        opts = PipelineOptions(batch_size=batch, max_det=16, metric_crop=128,
                               quant=quant)
        # same seed => identical weights; only the encoder matmul path differs
        pipe = CellSegmentationPipeline(sam_model_type=sam_model, options=opts,
                                        seed=0)
        out = pipe.process_batch_arrays(imgs)
        outs[quant or "bf16"] = {
            "boxes": np.asarray(out["boxes"], dtype=np.float32),
            "scores": np.asarray(out["scores"], dtype=np.float32),
            "valid": np.asarray(out["valid"]).astype(bool),
            "crops": np.asarray(out["mask_crops"]).astype(bool),
            "metrics": {k: np.asarray(v, dtype=np.float32)
                        for k, v in out["metrics"].items()},
        }
        del pipe

    a, b = outs["bf16"], outs["int8"]
    both = a["valid"] & b["valid"]
    n_ref, n_both = int(a["valid"].sum()), int(both.sum())
    det_match = n_both / max(n_ref, 1)

    box_drift = (np.abs(a["boxes"] - b["boxes"])[both].max()
                 if n_both else float("nan"))
    inter = (a["crops"] & b["crops"])[both].sum(axis=(-2, -1))
    union = (a["crops"] | b["crops"])[both].sum(axis=(-2, -1))
    iou = inter / np.maximum(union, 1)
    met_rel = {}
    for k, va in a["metrics"].items():
        vb = b["metrics"][k]
        denom = np.maximum(np.abs(va[both]), 1e-6)
        met_rel[k] = float(np.median(np.abs(va[both] - vb[both]) / denom))

    print(f"{'config':34s} {sam_model} {size}x{size} B={batch}")
    print(f"{'detections kept (int8 vs bf16)':34s} {n_both}/{n_ref} "
          f"({100 * det_match:.1f}%)")
    print(f"{'max |box drift| (px)':34s} {box_drift:.2f}")
    if n_both:
        print(f"{'mask IoU p50 / p5 / min':34s} "
              f"{np.percentile(iou, 50):.4f} / {np.percentile(iou, 5):.4f}"
              f" / {iou.min():.4f}")
    worst = sorted(met_rel.items(), key=lambda kv: -kv[1])[:5]
    for k, v in worst:
        print(f"{'median rel err ' + k:34s} {v:.4f}")
    print(json.dumps({
        "model": sam_model, "size": size, "batch": batch,
        "det_match": round(det_match, 4),
        "box_drift_px": round(float(box_drift), 3),
        "mask_iou_p50": round(float(np.percentile(iou, 50)), 4) if n_both else None,
        "mask_iou_min": round(float(iou.min()), 4) if n_both else None,
        "metric_median_rel_err_max": (round(max(met_rel.values()), 5)
                                      if met_rel else None),
    }))


if __name__ == "__main__":
    main()
