"""Count per-image FLOPs for every bench config — the MFU table's numerator.

COUNTED from the model configs (conv = 2*K^2*Ci*Co*Ho*Wo, dense =
2*M*N*K, attention = 2*N^2*hd per head for QK^T and again for AV), not
estimated: the walk mirrors the actual forward structure
(models/yolo/model.py, models/sam/model.py, models/sam/tinyvit.py) at the
canvas sizes the engine picks (PipelineOptions.encoder_size_for /
yolo_size_for). Decoder/metrics FLOPs are counted per max_det=16 prompts.

Usage: python tools/flops_count.py  -> one JSON line per config + a table.
The MFU column divides by the v5e bf16 peak (197 TFLOP/s) at the measured
img/s (pass updated throughputs via env, e.g. C1_IPS=525.49).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK = 197e12  # bf16 TFLOP/s, one v5e chip


def conv(k, ci, co, ho, wo, groups=1):
    return 2 * k * k * (ci // groups) * co * ho * wo


def dense(m, n, kk):
    return 2 * m * n * kk


def yolo_flops(size):
    """YOLOv8n backbone+head+detect at a square canvas (models/yolo/model.py)."""
    from yolo_sam_inference_tpu.models.yolo import yolov8n

    cfg = yolov8n()
    c1, c2, c3, c4, c5 = cfg.stage_channels
    n1, n2 = cfg.depth(3), cfg.depth(6)
    f = 0
    s = size

    def c2f(ci, co, n, hw):
        c = co // 2
        t = conv(1, ci, 2 * c, hw, hw) + conv(1, (2 + n) * c, co, hw, hw)
        t += n * (conv(3, c, c, hw, hw) * 2)  # bottlenecks
        return t

    f += conv(3, 3, c1, s // 2, s // 2)           # stem /2
    f += conv(3, c1, c2, s // 4, s // 4)          # down2
    f += c2f(c2, c2, n1, s // 4)
    f += conv(3, c2, c3, s // 8, s // 8)
    f += c2f(c3, c3, n2, s // 8)
    f += conv(3, c3, c4, s // 16, s // 16)
    f += c2f(c4, c4, n2, s // 16)
    f += conv(3, c4, c5, s // 32, s // 32)
    f += c2f(c5, c5, n1, s // 32)
    f += conv(1, c5, c5 // 2, s // 32, s // 32) + conv(1, c5 * 2, c5, s // 32, s // 32)  # sppf
    # head (P3 s/8, P4 s/16, P5 s/32)
    f += c2f(c5 + c4, c4, n1, s // 16)
    f += c2f(c4 + c3, c3, n1, s // 8)
    f += conv(3, c3, c3, s // 16, s // 16)
    f += c2f(c3 + c4, c4, n1, s // 16)
    f += conv(3, c4, c4, s // 32, s // 32)
    f += c2f(c4 + c5, c5, n1, s // 32)
    bc, cc = cfg.box_branch_ch, cfg.cls_branch_ch
    for ci, st in zip(cfg.detect_channels, (8, 16, 32)):
        hw = s // st
        f += conv(3, ci, bc, hw, hw) + conv(3, bc, bc, hw, hw) + conv(1, bc, 4 * cfg.reg_max, hw, hw)
        f += conv(3, ci, cc, hw, hw) + conv(3, cc, cc, hw, hw) + conv(1, cc, cfg.num_classes, hw, hw)
    return f


def vit_encoder_flops(cfg):
    """SAM ViT encoder at cfg.image_size with the engine's window-16 swap
    (pipeline/engine.py _stages: ws=16 when the grid divides)."""
    gs = cfg.image_size // cfg.patch_size
    ws = 16 if gs % 16 == 0 else cfg.window_size
    c, mlp = cfg.vision_hidden, cfg.vision_mlp_dim
    n_tokens = gs * gs
    f = conv(cfg.patch_size, 3, c, gs, gs)  # patch embed
    for i in range(cfg.vision_layers):
        wsz = gs if i in cfg.global_attn_indexes else ws
        nw = (gs // wsz) ** 2
        n = wsz * wsz
        f += dense(n_tokens, 3 * c, c)      # qkv
        f += nw * 2 * 2 * n * n * c         # QK^T + AV over all heads (hd*heads=c)
        f += dense(n_tokens, c, c)          # proj
        f += dense(n_tokens, mlp, c) + dense(n_tokens, c, mlp)  # MLP
    oc = cfg.output_channels
    f += conv(1, c, oc, gs, gs) + conv(3, oc, oc, gs, gs)  # neck
    return f


def tinyvit_flops(size):
    from yolo_sam_inference_tpu.models.sam.tinyvit import TinyViTConfig

    cfg = TinyViTConfig(image_size=size)
    d0, d1, d2, d3 = cfg.embed_dims
    f = conv(3, 3, d0 // 2, size // 2, size // 2)
    f += conv(3, d0 // 2, d0, size // 4, size // 4)

    def mbconv(c, hw):
        h = int(c * cfg.mbconv_expand)
        return (conv(1, c, h, hw, hw) + conv(3, h, h, hw, hw, groups=h)
                + conv(1, h, c, hw, hw))

    def merge(ci, co, hw_in, stride):
        hw = hw_in // stride
        return (conv(1, ci, co, hw_in, hw_in)
                + conv(3, co, co, hw, hw, groups=co) + conv(1, co, co, hw, hw))

    def block(c, heads, ws, hw):
        # qkv projects to 3c (models/sam/tinyvit.py init: dense(c, 3c)),
        # so q/k/v are all c-dim; heads split c. Unpadded window count —
        # padded windows add a few % the count omits (conservative).
        del heads
        n_tokens = hw * hw
        n = min(ws, hw) ** 2
        nw = max(1, (hw // min(ws, hw)) ** 2)
        t = dense(n_tokens, 3 * c, c)
        t += nw * 2 * 2 * n * n * c  # QK^T + AV over all heads
        t += dense(n_tokens, c, c)
        t += conv(3, c, c, hw, hw, groups=c)  # local conv
        t += dense(n_tokens, int(c * cfg.mlp_ratio), c) * 2
        return t

    hw = size // 4
    f += cfg.depths[0] * mbconv(d0, hw)
    f += merge(d0, d1, hw, 2); hw //= 2
    f += cfg.depths[1] * block(d1, cfg.num_heads[1], cfg.window_sizes[1], hw)
    f += merge(d1, d2, hw, 2); hw //= 2
    f += cfg.depths[2] * block(d2, cfg.num_heads[2], cfg.window_sizes[2], hw)
    f += merge(d2, d3, hw, 1)
    f += cfg.depths[3] * block(d3, cfg.num_heads[3], cfg.window_sizes[3], hw)
    oc = cfg.output_channels
    f += conv(1, d3, oc, hw, hw) + conv(3, oc, oc, hw, hw)
    return f


def decoder_flops(cfg, k_prompts=16):
    """Two-way decoder + upscale + hyper MLPs for K box prompts."""
    di = cfg.prompt_hidden
    dh = di // 2
    gs = cfg.image_size // cfg.patch_size
    n_img = gs * gs
    n_tok = cfg.num_mask_tokens + 1 + 2  # iou + mask tokens + 2 corner pts
    f = 0
    for _ in range(cfg.decoder_layers):
        f += dense(n_tok, 3 * di, di) + 2 * 2 * n_tok * n_tok * di + dense(n_tok, di, di)
        f += 2 * (dense(n_tok, dh, di) * 2 + dense(n_img, dh, di)
                  + 2 * n_tok * n_img * dh * 2 + dense(n_tok, di, dh))
        f += dense(n_tok, cfg.decoder_mlp_dim, di) * 2
    f += dense(n_img, dh, di) * 2 + 2 * n_tok * n_img * dh * 2
    f += conv(2, di, di // 4, gs * 2, gs * 2) + conv(2, di // 4, di // 8, gs * 4, gs * 4)
    f += cfg.num_mask_tokens * 3 * dense(1, di, di)
    f += dense(n_img * 16, 1, di // 8)  # mask logits dot per upscaled px
    return f * k_prompts


def main():
    from yolo_sam_inference_tpu.models.sam.config import (
        sam_vit_b, sam_vit_h, sam_vit_l,
    )

    configs = {
        "config1_vitb_512": yolo_flops(512) + vit_encoder_flops(sam_vit_b(512))
        + decoder_flops(sam_vit_b(512)),
        "config2_mobilesam_512": yolo_flops(512) + tinyvit_flops(512)
        + decoder_flops(sam_vit_b(512)),
        "config3_vitl_512": yolo_flops(512) + vit_encoder_flops(sam_vit_l(512))
        + decoder_flops(sam_vit_l(512)),
        "config4_vith_1024ladder": yolo_flops(640) + vit_encoder_flops(sam_vit_h(1024))
        + decoder_flops(sam_vit_h(1024)),
    }
    ips = {
        "config1_vitb_512": float(os.environ.get("C1_IPS", "525.49")),
        "config2_mobilesam_512": float(os.environ.get("C2_IPS", "787.95")),
        "config3_vitl_512": float(os.environ.get("C3_IPS", "164.9")),
        "config4_vith_1024ladder": float(os.environ.get("C4_IPS", "18.1")),
    }
    print(f"{'config':28s} {'GFLOP/img':>10s} {'img/s':>8s} {'TFLOP/s':>8s} {'MFU %':>6s}")
    for k, f in configs.items():
        tf = f * ips[k] / 1e12
        print(f"{k:28s} {f / 1e9:10.1f} {ips[k]:8.1f} {tf:8.1f} "
              f"{100 * tf * 1e12 / V5E_PEAK:6.1f}")
        print(json.dumps({"config": k, "gflop_per_img": round(f / 1e9, 2),
                          "img_s": ips[k], "tflop_s": round(tf, 2),
                          "mfu_pct_v5e_bf16": round(100 * tf * 1e12 / V5E_PEAK, 2)}))


if __name__ == "__main__":
    main()
