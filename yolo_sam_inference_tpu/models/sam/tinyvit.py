"""TinyViT-5M image encoder (the MobileSAM swap), pure JAX.

BASELINE.json config 2 asks for a "MobileSAM/TinyViT swap (latency-optimized
single-image path)". MobileSAM keeps SAM's prompt encoder + mask decoder and
replaces the ViT-B image encoder with a distilled TinyViT-5M producing the
same (64, 64, 256) embedding, ~40x fewer encoder FLOPs.

Architecture (TinyViT-5M @ 1024, MobileSAM variant):
* patch embed: two stride-2 conv+BN+GELU stems -> /4 resolution;
* stage 0: MBConv blocks (conv stage) @ 256px, 64ch;
* stages 1-3: window transformer blocks (learned per-offset attention
  biases, depthwise local conv between attention and MLP) @ 128/64/64 px
  with 128/160/320 channels — the final patch-merging keeps stride 1 so the
  output grid stays 64x64;
* neck: 1x1 conv -> LN -> 3x3 conv -> LN to 256 channels (as SAM's neck).

BatchNorm folds into convs at conversion; the engine swaps this in via
``sam_model_type="mobile-sam"``. Weight conversion from official MobileSAM
checkpoints (``convert.convert_mobilesam_state_dict``) maps the
``image_encoder.*`` torch names onto this tree; encoder parity vs a
torch TinyViT with the official state-dict layout is enforced by
tests/test_tinyvit_parity.py.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# device A/B knob for the fused stride-2 merge size gate (read at import;
# the traced program is shape-static so a per-process setting is exact)
_FUSED_MERGE_MIN_H = int(os.environ.get("TINYVIT_FUSED_MERGE_MIN_H", "128"))
# stride-1 merge (merge2 at S/16) through the residual-free MBConv kernel:
# its 4x-expanded 640-channel depthwise otherwise hits the XLA grouped-conv
# emitter. Kill switch for device A/B.
_FUSED_MERGE_S1 = os.environ.get("TINYVIT_FUSED_MERGE_S1", "1") == "1"


@dataclasses.dataclass(frozen=True)
class TinyViTConfig:
    image_size: int = 1024
    embed_dims: Tuple[int, ...] = (64, 128, 160, 320)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (2, 4, 5, 10)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand: float = 4.0
    output_channels: int = 256

    @property
    def grid_size(self) -> int:
        return self.image_size // 16


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU default = exact erf formulation (tiny_vit_sam.py uses
    # nn.GELU; jax.nn.gelu defaults to the tanh approximation)
    return jax.nn.gelu(x, approximate=False)


def _conv_bn(
    p: Params, x: jnp.ndarray, stride: int = 1, groups: int = 1,
    act: str = "none",
) -> jnp.ndarray:
    """Conv with pre-folded BN (HWIO weights, 'same' padding).

    1x1 convs run as dots by default (ops/conv2d_fused.py mode "dot", r3q
    A/B); CONV2D_FUSED=1 routes dense convs through the Pallas im2row pass
    too — measured slower than the XLA convs it replaces (r3p A/B), so
    dense stays on XLA. act="gelu" fuses the stems' erf-GELU into the
    opt-in pass; depthwise convs (groups > 1) stay on XLA (their
    kernelized forms live in ops/mbconv_fused.py / ops/merge_fused.py)."""
    kh = p["w"].shape[0]
    pad = kh // 2
    if groups == 1:
        from ...ops.conv2d_fused import conv2d_fused_enabled, conv2d_supported

        if conv2d_fused_enabled(kh) and conv2d_supported(x.shape, kh, stride):
            from ...ops.conv2d_fused import conv2d_act

            return conv2d_act(x, p["w"], p["b"], k=kh, stride=stride, act=act)
    elif groups == x.shape[-1] and kh == 3:
        # CONV2D_FUSED=dotdense: depthwise as k^2 shift-multiply-accumulate
        # (kills the grouped-conv layout anchor — see ops/conv2d_fused.py)
        from ...ops.conv2d_fused import dwconv_unrolled, dwconv_unrolled_enabled

        if dwconv_unrolled_enabled():
            return dwconv_unrolled(x, p["w"], p["b"], k=kh, stride=stride,
                                   act="gelu" if act == "gelu" else "none")
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    y = y + p["b"]
    return _gelu(y) if act == "gelu" else y


def _mbconv(
    p: Params, x: jnp.ndarray, fused: bool = False, interpret: bool = False,
    compute: str = "fp32",
) -> jnp.ndarray:
    if fused and x.shape[2] % 8 == 0:
        from ...ops.mbconv_fused import mbconv_block

        return mbconv_block(
            x,
            p["conv1"]["w"][0, 0], p["conv1"]["b"],
            p["conv2"]["w"], p["conv2"]["b"],
            p["conv3"]["w"][0, 0], p["conv3"]["b"],
            interpret=interpret,
            compute=compute,
        )
    h = _conv_bn(p["conv1"], x, act="gelu")
    h = _gelu(_conv_bn(p["conv2"], h, groups=h.shape[-1]))
    h = _conv_bn(p["conv3"], h)
    return _gelu(x + h)


def _patch_merge(
    p: Params, x: jnp.ndarray, stride: int,
    fused: bool = False, interpret: bool = False, compute: str = "fp32",
) -> jnp.ndarray:
    # Fused Pallas downsampler for the large stride-2 merges (the XLA
    # depthwise emitter pathology — see ops/merge_fused.py). Gated to
    # H >= 128 by default: at 64^2 and below the XLA-side pad/staging
    # copies exceeded the emitter inefficiency for standalone kernels
    # (BENCH_NOTES r3 negative results); TINYVIT_FUSED_MERGE_MIN_H
    # overrides for device A/B (the merge kernel runs at quarter res, so
    # the prior may not transfer).
    if (
        fused and stride == 2 and x.shape[1] >= _FUSED_MERGE_MIN_H
        and x.shape[1] % 2 == 0 and x.shape[2] % 16 == 0
    ):
        from ...ops.merge_fused import patch_merge_block

        return patch_merge_block(
            x,
            p["conv1"]["w"][0, 0], p["conv1"]["b"],
            p["conv2"]["w"], p["conv2"]["b"],
            p["conv3"]["w"][0, 0], p["conv3"]["b"],
            interpret=interpret,
            compute=compute,
        )
    if fused and stride == 1 and _FUSED_MERGE_S1 and x.shape[2] % 8 == 0:
        # stride-1 PatchMerging == MBConv minus the residual + outer GELU
        from ...ops.mbconv_fused import mbconv_block

        return mbconv_block(
            x,
            p["conv1"]["w"][0, 0], p["conv1"]["b"],
            p["conv2"]["w"], p["conv2"]["b"],
            p["conv3"]["w"][0, 0], p["conv3"]["b"],
            interpret=interpret,
            compute=compute,
            residual=False,
        )
    h = _conv_bn(p["conv1"], x, act="gelu")
    h = _gelu(_conv_bn(p["conv2"], h, stride=stride, groups=h.shape[-1]))
    return _conv_bn(p["conv3"], h)


def _layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, -1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _window_attention(
    p: Params, ln: Params, x: jnp.ndarray, heads: int, ws: int
) -> jnp.ndarray:
    """Windowed attention with learned per-offset bias. x: (B, H, W, C),
    PRE-norm: the official TinyViT pads the pre-norm input with zeros and
    applies the attention's LayerNorm after windowing (tiny_vit_sam.py
    TinyViTBlock.forward pads, Attention.forward norms), so pad tokens
    enter qkv as LN(0) = ln_bias — replicated here by norming after the
    window partition."""
    b, hgt, wid, c = x.shape
    pad_h = (ws - hgt % ws) % ws
    pad_w = (ws - wid % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = hgt + pad_h, wid + pad_w
    nh, nw = ph // ws, pw // ws
    win = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(b * nh * nw, ws * ws, c)
    win = _layer_norm(ln, win)

    hd = c // heads
    qkv = win @ p["qkv_w"] + p["qkv_b"]  # (N, T, 3C)
    qkv = qkv.reshape(-1, ws * ws, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]

    # learned attention bias indexed by pairwise offset
    idx = _offset_index(ws)
    bias = p["attn_bias"][:, idx]  # (heads, T, T)
    logits = jnp.einsum(
        "nhqc,nhkc->nhqk", q * (hd**-0.5), k, preferred_element_type=jnp.float32
    ) + bias[None]
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("nhqk,nhkc->nhqc", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(-1, ws * ws, c)
    out = out @ p["proj_w"] + p["proj_b"]

    out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, ph, pw, c)
    return out[:, :hgt, :wid, :]


_OFFSET_CACHE: Dict[int, np.ndarray] = {}


def _offset_index(ws: int) -> np.ndarray:
    if ws not in _OFFSET_CACHE:
        coords = np.stack(np.mgrid[:ws, :ws], -1).reshape(-1, 2)
        rel = coords[:, None, :] - coords[None, :, :] + (ws - 1)
        _OFFSET_CACHE[ws] = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
    return _OFFSET_CACHE[ws]


def _tinyvit_block(
    p: Params, x: jnp.ndarray, heads: int, ws: int, cfg,
    fused: bool = False, interpret: bool = False,
) -> jnp.ndarray:
    if fused:
        import os as _os

        from ...ops.fused_ln import fused_ln_mlp
        from ...ops.tinyvit_attention import (
            tinyvit_window_block,
            tinyvit_window_block_cells,
        )

        # Cell-layout attention I/O (windows in ws x ws8 spatial cells)
        # replaces the XLA 6D window partition/inverse transposes around
        # the kernel with one pad copy + one slice — measured 648.5 ->
        # 664.0 img/s on the MobileSAM bench config. SAM_TV_ATTN_V2=0 is
        # the kill switch back to the partitioned-layout kernel.
        attn_block = (
            tinyvit_window_block_cells
            if _os.environ.get("SAM_TV_ATTN_V2", "1") == "1"
            else tinyvit_window_block
        )
        a = p["attn"]
        x = attn_block(
            x, a["attn_bias"][:, _offset_index(ws)],
            p["ln1"]["scale"], p["ln1"]["bias"],
            a["qkv_w"], a["qkv_b"], a["proj_w"], a["proj_b"],
            heads, ws, interpret=interpret,
        )
        if x.shape[2] % 8 == 0:
            # local_conv fused into the MLP-tail kernel (the standalone
            # XLA depthwise + two HBM round-trips disappear; a standalone
            # Pallas depthwise loses at these sizes — ops/dw_ln_mlp.py)
            from ...ops.dw_ln_mlp import dw_ln_mlp

            return dw_ln_mlp(
                x, p["local_conv"]["w"], p["local_conv"]["b"],
                p["ln2"]["scale"], p["ln2"]["bias"],
                p["mlp1_w"], p["mlp1_b"], p["mlp2_w"], p["mlp2_b"],
                eps=1e-5, interpret=interpret,
            )
        x = _conv_bn(p["local_conv"], x, groups=x.shape[-1])
        return fused_ln_mlp(
            x, None, p["ln2"]["scale"], p["ln2"]["bias"],
            p["mlp1_w"], p["mlp1_b"], p["mlp2_w"], p["mlp2_b"],
            eps=1e-5, interpret=interpret,
        )
    x = x + _window_attention(p["attn"], p["ln1"], x, heads, ws)
    # NOTE: the reference TinyViT applies local_conv WITHOUT a residual
    # (tiny_vit_sam.py TinyViTBlock.forward: x = self.local_conv(x))
    x = _conv_bn(p["local_conv"], x, groups=x.shape[-1])
    h = _layer_norm(p["ln2"], x)
    h = _gelu(h @ p["mlp1_w"] + p["mlp1_b"])
    h = h @ p["mlp2_w"] + p["mlp2_b"]
    return x + h


def transform_stem_s2d(params: Params) -> Params:
    """s2d block weights for the two narrow patch-embed stems.

    The stems are 3->32 and 32->64 stride-2 convs over the full-res frame;
    the MXU contracts 128-deep lanes, so they run at <25% lane utilization
    (the same pathology the YOLO backbone prefix had — see models/yolo/s2d).
    The transformed convs compute EXACTLY the same function on (S/2, 4C)
    tensors. Call once at stage-build time; store as params["stem_s2d"].
    """
    from ..yolo.s2d import _s2d_conv_params

    return {
        "stem1": _s2d_conv_params(params["stem1"], 2),
        "stem2": _s2d_conv_params(params["stem2"], 2),
    }


def _stems_s2d(p: Params, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """Patch embed in s2d space: (B, S, S, 3) -> (B, S/4, S/4, d0)."""
    from ..yolo.s2d import _conv_s2d, depth_to_space, space_to_depth

    x = space_to_depth(pixel_values)  # (S/2, 12)
    x = _conv_s2d(p["stem1"], x, k=3, stride=2, act="gelu")  # (S/4, 4*(d0/2))
    x = _conv_s2d(p["stem2"], x, k=3, stride=2, act=False)  # (S/8, 4*d0)
    return depth_to_space(x)  # (S/4, d0)


def tinyvit_encoder(
    params: Params, pixel_values: jnp.ndarray, cfg: TinyViTConfig,
    mbconv_compute: str = "fp32",
    fused: bool = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, S, 3) normalized -> (B, S/16, S/16, output_channels).

    On TPU the transformer stages run as fused Pallas passes
    (ops/tinyvit_attention.py window kernel + ops/fused_ln.py MLP tail);
    the plain jnp formulation below stays the CPU/test reference —
    interpret-mode equality is enforced by tests/test_tinyvit.py, both
    per kernel and for the full fused composition (``fused=True,
    interpret=True`` forces the TPU wiring through the Pallas
    interpreter off-device).
    """
    from ...ops import mosaic_backend

    p = params
    if fused is None:
        fused = mosaic_backend()
    if "stem_s2d" in p and pixel_values.shape[1] % 8 == 0:
        x = _stems_s2d(p["stem_s2d"], pixel_values)  # /4, exact-equivalent
    else:
        # patch embed: Conv2d_BN + GELU + Conv2d_BN (no activation after the
        # second conv — tiny_vit_sam.py PatchEmbed.seq)
        x = _conv_bn(p["stem1"], pixel_values, stride=2, act="gelu")
        x = _conv_bn(p["stem2"], x, stride=2)  # /4

    # stage 0: MBConv
    for bp in p["stage0"]:
        x = _mbconv(bp, x, fused=fused, interpret=interpret, compute=mbconv_compute)
    x = _patch_merge(
        p["merge0"], x, stride=2, fused=fused, interpret=interpret,
        compute=mbconv_compute,
    )  # /8

    for si in (1, 2, 3):
        for bp in p[f"stage{si}"]:
            x = _tinyvit_block(
                bp, x, cfg.num_heads[si], cfg.window_sizes[si], cfg,
                fused=fused, interpret=interpret,
            )
        if si < 3:
            # last merge keeps stride 1 so the final grid is S/16 (MobileSAM)
            stride = 2 if si == 1 else 1
            x = _patch_merge(
                p[f"merge{si}"], x, stride=stride, fused=fused,
                interpret=interpret, compute=mbconv_compute,
            )

    n = p["neck"]
    y = jnp.einsum("bhwc,co->bhwo", x, n["conv1_w"])
    if fused:
        from ...ops.fused_ln import fused_ln

        y = fused_ln(
            y, n["ln1"]["scale"], n["ln1"]["bias"], eps=1e-6,
            interpret=interpret,
        )
    else:
        y = _layer_norm(n["ln1"], y, 1e-6)
    from ...ops.conv2d_fused import conv2d_fused_enabled, conv2d_supported

    if conv2d_fused_enabled(3) and conv2d_supported(y.shape, 3, 1):
        from ...ops.conv2d_fused import conv2d_act

        y = conv2d_act(
            y, n["conv2_w"], jnp.zeros((n["conv2_w"].shape[-1],), jnp.float32),
            k=3, stride=1,
        )
    else:
        y = jax.lax.conv_general_dilated(
            y, n["conv2_w"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    if fused:
        from ...ops.fused_ln import fused_ln

        return fused_ln(
            y, n["ln2"]["scale"], n["ln2"]["bias"], eps=1e-6,
            interpret=interpret,
        )
    return _layer_norm(n["ln2"], y, 1e-6)


def init_tinyvit_params(rng, cfg: TinyViTConfig, dtype=jnp.float32) -> Params:
    """Host-numpy random init."""
    seed = rng if isinstance(rng, int) else int(np.asarray(rng).sum()) & 0x7FFFFFFF
    nrng = np.random.default_rng(seed)

    def conv(i, o, k=1):
        fan = i * k * k
        return {
            "w": nrng.normal(0, 1 / math.sqrt(fan), (k, k, i, o)).astype(dtype),
            "b": np.zeros((o,), dtype),
        }

    def dwconv(c, k=3):
        return {
            "w": nrng.normal(0, 1 / math.sqrt(k * k), (k, k, 1, c)).astype(dtype),
            "b": np.zeros((c,), dtype),
        }

    def dense(i, o):
        return (
            nrng.normal(0, 1 / math.sqrt(i), (i, o)).astype(dtype),
            np.zeros((o,), dtype),
        )

    def ln(d):
        return {"scale": np.ones((d,), dtype), "bias": np.zeros((d,), dtype)}

    d0, d1, d2, d3 = cfg.embed_dims

    def mbconv(c):
        h = int(c * cfg.mbconv_expand)
        return {"conv1": conv(c, h), "conv2": dwconv(h), "conv3": conv(h, c)}

    def merge(ci, co):
        return {"conv1": conv(ci, co), "conv2": dwconv(co), "conv3": conv(co, co)}

    def block(c, heads, ws):
        qkv_w, qkv_b = dense(c, 3 * c)
        proj_w, proj_b = dense(c, c)
        m1w, m1b = dense(c, int(c * cfg.mlp_ratio))
        m2w, m2b = dense(int(c * cfg.mlp_ratio), c)
        return {
            "ln1": ln(c),
            "attn": {
                "qkv_w": qkv_w, "qkv_b": qkv_b,
                "proj_w": proj_w, "proj_b": proj_b,
                "attn_bias": np.zeros((heads, (2 * ws - 1) ** 2), dtype),
            },
            "local_conv": dwconv(c),
            "ln2": ln(c),
            "mlp1_w": m1w, "mlp1_b": m1b,
            "mlp2_w": m2w, "mlp2_b": m2b,
        }

    oc = cfg.output_channels
    return {
        "stem1": conv(3, d0 // 2, 3),
        "stem2": conv(d0 // 2, d0, 3),
        "stage0": [mbconv(d0) for _ in range(cfg.depths[0])],
        "merge0": merge(d0, d1),
        "stage1": [block(d1, cfg.num_heads[1], cfg.window_sizes[1]) for _ in range(cfg.depths[1])],
        "merge1": merge(d1, d2),
        "stage2": [block(d2, cfg.num_heads[2], cfg.window_sizes[2]) for _ in range(cfg.depths[2])],
        "merge2": merge(d2, d3),
        "stage3": [block(d3, cfg.num_heads[3], cfg.window_sizes[3]) for _ in range(cfg.depths[3])],
        "neck": {
            "conv1_w": nrng.normal(0, 0.02, (d3, oc)).astype(dtype),
            "ln1": ln(oc),
            "conv2_w": nrng.normal(0, 0.02, (3, 3, oc, oc)).astype(dtype),
            "ln2": ln(oc),
        },
    }
