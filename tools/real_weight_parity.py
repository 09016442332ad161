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

Online usage (weights + HF hub/cache available):
  python tools/real_weight_parity.py --checkpoint sam_vit_b.safetensors \
      [--model facebook/sam-vit-base] [--images DIR] [--num-boxes 4]

Offline / dry-run usage (VERDICT r4 next #5 — prove the harness executes
without any hub access):
  python tools/real_weight_parity.py --offline --tiny-test \
      --save-synthetic /tmp/synth_ckpt.safetensors
builds a randomly-initialized HF SamModel from a LOCAL config (no
network), saves its state dict as a synthetic checkpoint FILE, then runs
the normal flow against that file: checkpoint load -> weight conversion
-> full forward on both stacks -> IoU table. Identical weights on both
sides, so the run must PASS — it exercises every line a real-checkpoint
run would except the download. ``--offline`` alone (with a real
--checkpoint) also works where the checkpoint file exists locally but the
hub is unreachable: the torch model is built from the local config and
masks are compared at the decoder's low-res logit resolution (the
SamProcessor resize/normalize is replaced by this repo's device
preprocess feeding BOTH stacks the same pixels).

Exit code 0 iff mean IoU >= threshold (and every mask >= 0.95). Prints
one JSON line with the distribution either way.

Gated self-test: tests/test_tools.py::test_real_weight_parity_dryrun.
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
        margin = max(4, size // 25)  # blob geometry scales with the canvas
        for _ in range(6):
            cy, cx = rng.uniform(margin, size - margin, 2)
            r = rng.uniform(max(2, size // 85), margin)
            img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = rng.uniform(150, 220)
        imgs.append(np.repeat(img.astype(np.uint8)[..., None], 3, axis=-1))
    return imgs


def build_hf_sam(cfg):
    """transformers SamModel from a LOCAL config mirroring SamTPUConfig —
    no hub access (the same mapping tests/test_sam_parity.py::torch_sam
    uses at tiny scale)."""
    from transformers import SamConfig, SamModel
    from transformers.models.sam.configuration_sam import (
        SamMaskDecoderConfig,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    vc = SamVisionConfig(
        hidden_size=cfg.vision_hidden,
        num_hidden_layers=cfg.vision_layers,
        num_attention_heads=cfg.vision_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        global_attn_indexes=list(cfg.global_attn_indexes),
        window_size=cfg.window_size,
        output_channels=cfg.output_channels,
        mlp_dim=cfg.vision_mlp_dim,
        num_pos_feats=cfg.num_pos_feats,
        attn_implementation="eager",
    )
    pc = SamPromptEncoderConfig(
        hidden_size=cfg.prompt_hidden, image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        mask_input_channels=cfg.mask_input_channels,
    )
    mc = SamMaskDecoderConfig(
        hidden_size=cfg.prompt_hidden, num_hidden_layers=cfg.decoder_layers,
        num_attention_heads=cfg.decoder_heads, mlp_dim=cfg.decoder_mlp_dim,
        iou_head_hidden_dim=cfg.iou_head_hidden,
    )
    hf = SamConfig(
        vision_config=vc.to_dict(), prompt_encoder_config=pc.to_dict(),
        mask_decoder_config=mc.to_dict(),
    )
    hf._attn_implementation = "eager"
    return SamModel(hf).eval()


def _save_state_dict(model, path: Path) -> None:
    import torch

    sd = model.state_dict()
    if str(path).endswith(".safetensors"):
        from safetensors.torch import save_file

        # .clone() breaks HF's aliased tensors (shared_image_embedding is
        # the prompt encoder's positional embedding) — safetensors refuses
        # shared storage
        save_file(
            {k: v.detach().clone().contiguous() for k, v in sd.items()},
            str(path),
        )
    else:
        torch.save(sd, str(path))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None,
                   help="SAM checkpoint (.safetensors / torch .bin/.pt)")
    p.add_argument("--model", default="facebook/sam-vit-base")
    p.add_argument("--images", type=Path, default=None,
                   help="directory of real images (default: synthetic frames)")
    p.add_argument("--num-images", type=int, default=8)
    p.add_argument("--num-boxes", type=int, default=4)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--threshold", type=float, default=0.99)
    p.add_argument("--offline", action="store_true",
                   help="no hub access: build the torch model from a local "
                        "config and compare at low-res logit resolution")
    p.add_argument("--tiny-test", action="store_true",
                   help="use the tiny parity config (harness self-test; "
                        "implies --offline)")
    p.add_argument("--save-synthetic", type=Path, default=None,
                   help="offline dry run: save a random-init state dict "
                        "here, then use it as --checkpoint")
    args = p.parse_args(argv)
    if args.tiny_test:
        args.offline = True

    import torch

    import jax.numpy as jnp

    from yolo_sam_inference_tpu.models.sam import sam_forward_boxes
    from yolo_sam_inference_tpu.models.sam.config import sam_tiny_test
    from yolo_sam_inference_tpu.models.sam.convert import load_sam_params
    from yolo_sam_inference_tpu.pipeline.engine import SAM_CONFIGS

    cfg = sam_tiny_test() if args.tiny_test else SAM_CONFIGS[args.model]()
    if args.tiny_test:
        args.size = cfg.image_size

    if args.save_synthetic is not None:
        if not args.offline:
            raise SystemExit("--save-synthetic requires --offline")
        torch.manual_seed(0)
        synth = build_hf_sam(cfg)
        with torch.no_grad():  # rel_pos tables init to zero — exercise them
            for layer in synth.vision_encoder.layers:
                layer.attn.rel_pos_h.normal_(0, 0.1)
                layer.attn.rel_pos_w.normal_(0, 0.1)
        _save_state_dict(synth, args.save_synthetic)
        args.checkpoint = str(args.save_synthetic)
    if args.checkpoint is None:
        raise SystemExit("--checkpoint required (or --save-synthetic)")

    # JAX side: the checkpoint through this repo's converter
    params = load_sam_params(args.checkpoint, cfg)

    # torch side: the SAME checkpoint through the HF reference
    # implementation. The state dict must actually cover the HF model — a
    # silently ignored mismatch (original-Meta key layout, wrong variant)
    # would make the verdict compare against stock-hub or random weights.
    if str(args.checkpoint).endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(args.checkpoint)
    else:
        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd)
    if args.offline:
        tm = build_hf_sam(cfg)
    else:
        from transformers import SamModel

        tm = SamModel.from_pretrained(args.model)
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    n_model = sum(1 for _ in tm.state_dict())
    if len(missing) > 0.01 * n_model:
        raise SystemExit(
            f"checkpoint covers only {n_model - len(missing)}/{n_model} of "
            f"the model's parameters ({len(unexpected)} unexpected keys) "
            "— wrong variant or non-HF key layout; convert it first"
        )
    tm.eval()

    rng = np.random.default_rng(0)
    if args.images is not None:
        from yolo_sam_inference_tpu.io.images import list_image_files, load_image

        files = list_image_files(args.images)[: args.num_images]
        imgs = [load_image(f) for f in files]
    else:
        imgs = _synthetic_images(args.num_images, args.size, rng)

    from yolo_sam_inference_tpu.ops.preprocess import sam_preprocess_batch

    proc = None
    if not args.offline:
        from transformers import SamProcessor

        proc = SamProcessor.from_pretrained(args.model)

    ious = []
    for img in imgs:
        h, w = img.shape[:2]
        # two uniform corner points, sorted per axis -> [x1, y1, x2, y2]
        boxes = np.stack([
            np.sort(rng.uniform([0, 0], [w - 1, h - 1], size=(2, 2)), axis=0).reshape(-1)
            for _ in range(args.num_boxes)
        ])  # (K, 4) xyxy

        pix, scale, _ = sam_preprocess_batch(
            jnp.asarray(img[None]), cfg.image_size
        )
        jb = jnp.asarray(boxes[None] * scale, dtype=jnp.float32)
        masks, _ = sam_forward_boxes(params, pix, jb, cfg,
                                     multimask_output=False)
        jm = np.asarray(masks[0, :, 0])  # (K, low, low) logits

        if args.offline:
            # identical pixels into the HF stack; compare low-res logits
            tpix = torch.from_numpy(
                np.asarray(pix, np.float32).transpose(0, 3, 1, 2)
            )
            with torch.no_grad():
                out = tm(pixel_values=tpix,
                         input_boxes=torch.from_numpy(
                             np.asarray(jb, np.float32)),
                         multimask_output=False)
            tmask = out.pred_masks[0, :, 0].numpy() > 0
            jmask = jm > 0
        else:
            inputs = proc(images=img,
                          input_boxes=[[list(map(float, b)) for b in boxes]],
                          return_tensors="pt")
            with torch.no_grad():
                out = tm(**inputs, multimask_output=False)
            tmask = proc.image_processor.post_process_masks(
                out.pred_masks.cpu(), inputs["original_sizes"].cpu(),
                inputs["reshaped_input_sizes"].cpu(),
            )[0][:, 0].numpy() > 0  # (K, H, W)
            import jax

            jm_full = np.asarray(jax.image.resize(
                jnp.asarray(jm), (jm.shape[0], cfg.image_size, cfg.image_size),
                method="bilinear",
            ))[:, : int(round(h * scale)), : int(round(w * scale))]
            jmask = np.asarray(jax.image.resize(
                jnp.asarray(jm_full), (jm.shape[0], h, w), method="bilinear",
            )) > 0

        for k in range(boxes.shape[0]):
            inter = np.logical_and(tmask[k], jmask[k]).sum()
            union = np.logical_or(tmask[k], jmask[k]).sum()
            ious.append(inter / union if union else 1.0)

    ious = np.asarray(ious)
    rec = {
        "model": "tiny-test" if args.tiny_test else args.model,
        "offline": bool(args.offline),
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
