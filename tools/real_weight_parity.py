"""Real-checkpoint mask parity: JAX SAM vs the torch/HF reference weights.

The BASELINE contract is mask IoU >= 0.99 against the reference pipeline's
SAM outputs (reference ``pipeline.py:76-124``). This environment ships no
pretrained checkpoints (zero egress), so the repo proves ARCHITECTURE
parity against randomly-initialized torch models
(tests/test_sam_parity.py, tests/test_tinyvit_parity.py) — this tool is
the missing last mile for a weights-available environment: point it at a
real checkpoint (+ optionally a directory of real images) and it runs the
full converted-weights comparison and prints the IoU table the contract
asks for.

Usage:
  python tools/real_weight_parity.py --checkpoint /path/to/sam_vit_b.safetensors \
      [--model facebook/sam-vit-base] [--images DIR] [--num-boxes 4] [--size 1024]

Exit code 0 iff mean IoU >= 0.99 (and every image >= 0.95). Prints one
JSON line with the distribution either way.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _synthetic_images(n, size, rng):
    yy, xx = np.mgrid[:size, :size]
    imgs = []
    for _ in range(n):
        img = rng.normal(40, 5, size=(size, size)).clip(0, 255)
        for _ in range(6):
            cy, cx = rng.uniform(40, size - 40, 2)
            r = rng.uniform(12, 40)
            img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = rng.uniform(150, 220)
        imgs.append(np.repeat(img.astype(np.uint8)[..., None], 3, axis=-1))
    return imgs


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="SAM checkpoint (.safetensors / torch .bin/.pt)")
    p.add_argument("--model", default="facebook/sam-vit-base")
    p.add_argument("--images", type=Path, default=None,
                   help="directory of real images (default: synthetic frames)")
    p.add_argument("--num-images", type=int, default=8)
    p.add_argument("--num-boxes", type=int, default=4)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--threshold", type=float, default=0.99)
    args = p.parse_args()

    import torch
    from transformers import SamModel, SamProcessor

    import jax.numpy as jnp

    from yolo_sam_inference_tpu.models.sam import sam_forward_boxes
    from yolo_sam_inference_tpu.pipeline.engine import SAM_CONFIGS
    from yolo_sam_inference_tpu.models.sam.convert import load_sam_params

    cfg = SAM_CONFIGS[args.model]()
    params = load_sam_params(args.checkpoint, cfg)

    # torch side: same checkpoint through the HF reference implementation.
    # The state dict must actually cover the HF model — a silently ignored
    # mismatch (original-Meta key layout, wrong variant) would make the
    # pass/fail verdict compare against stock-hub or random weights.
    if str(args.checkpoint).endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(args.checkpoint)
    else:
        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd)
    tm = SamModel.from_pretrained(args.model)
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    n_model = sum(1 for _ in tm.state_dict())
    if len(missing) > 0.01 * n_model:
        raise SystemExit(
            f"checkpoint covers only {n_model - len(missing)}/{n_model} of "
            f"{args.model}'s parameters ({len(unexpected)} unexpected keys) "
            "— wrong variant or non-HF key layout; convert it first"
        )
    tm.eval()
    proc = SamProcessor.from_pretrained(args.model)

    rng = np.random.default_rng(0)
    if args.images is not None:
        from yolo_sam_inference_tpu.io.images import list_image_files, load_image

        files = list_image_files(args.images)[: args.num_images]
        imgs = [load_image(f) for f in files]
    else:
        imgs = _synthetic_images(args.num_images, args.size, rng)

    ious = []
    for img in imgs:
        h, w = img.shape[:2]
        # two uniform corner points, sorted per axis -> [x1, y1, x2, y2]
        boxes = np.stack([
            np.sort(rng.uniform([0, 0], [w - 1, h - 1], size=(2, 2)), axis=0).reshape(-1)
            for _ in range(args.num_boxes)
        ])  # (K, 4) xyxy
        # torch reference masks
        inputs = proc(images=img, input_boxes=[[list(map(float, b)) for b in boxes]],
                      return_tensors="pt")
        with torch.no_grad():
            out = tm(**inputs, multimask_output=False)
        tmask = proc.image_processor.post_process_masks(
            out.pred_masks.cpu(), inputs["original_sizes"].cpu(),
            inputs["reshaped_input_sizes"].cpu(),
        )[0][:, 0].numpy() > 0  # (K, H, W)

        # JAX masks (same boxes, 1024 canvas like the reference)
        from yolo_sam_inference_tpu.ops.preprocess import sam_preprocess_batch

        pix, scale, _ = sam_preprocess_batch(
            jnp.asarray(img[None]), cfg.image_size
        )
        jb = jnp.asarray(boxes[None] * scale, dtype=jnp.float32)
        masks, _ = sam_forward_boxes(params, pix, jb, cfg,
                                     multimask_output=False)
        jm = np.asarray(masks[0, :, 0])  # (K, gs*4, gs*4) logits
        # upscale logits to original resolution, threshold at 0
        import jax

        jm_full = np.asarray(jax.image.resize(
            jnp.asarray(jm), (jm.shape[0], cfg.image_size, cfg.image_size),
            method="bilinear",
        ))[:, : int(round(h * scale)), : int(round(w * scale))]
        jm_up = np.asarray(jax.image.resize(
            jnp.asarray(jm_full), (jm.shape[0], h, w), method="bilinear",
        )) > 0

        for k in range(boxes.shape[0]):
            inter = np.logical_and(tmask[k], jm_up[k]).sum()
            union = np.logical_or(tmask[k], jm_up[k]).sum()
            ious.append(inter / union if union else 1.0)

    ious = np.asarray(ious)
    rec = {
        "model": args.model,
        "n_masks": int(ious.size),
        "iou_mean": round(float(ious.mean()), 4),
        "iou_p50": round(float(np.percentile(ious, 50)), 4),
        "iou_p5": round(float(np.percentile(ious, 5)), 4),
        "iou_min": round(float(ious.min()), 4),
        "pass": bool(ious.mean() >= args.threshold and ious.min() >= 0.95),
    }
    print(json.dumps(rec))
    return 0 if rec["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
