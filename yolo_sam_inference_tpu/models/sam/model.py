"""SAM forward passes as pure JAX functions (NHWC, fp32-softmax, jit-ready).

Numerics match the public SAM architecture (as shipped in HuggingFace
``facebook/sam-vit-*`` checkpoints) so converted weights reproduce reference
masks (target IoU >= 0.99, see BASELINE.md). Everything is fixed-shape:

* :func:`sam_image_encoder` — ViT encoder, runs once per image batch;
* :func:`sam_prompt_boxes` — box prompts (B, K, 4) -> sparse corner tokens;
* :func:`sam_mask_decoder` — two-way transformer batched over the K box
  prompts of every image in one program (the reference looped SAM over boxes
  on the host, re-running the encoder each time: reference
  ``pipeline.py:89-124`` in the loop at ``:170``).

Parameters live in a plain nested-dict pytree (see :func:`init_sam_params`
for the authoritative tree layout); linear weights are stored ``(in, out)``
so application is ``x @ w + b``.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SamTPUConfig

Params = Dict[str, Any]


# --------------------------------------------------------------------------- common


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def _ln_use_pallas(x: jnp.ndarray) -> bool:
    """Dispatch LayerNorm to the Pallas one-pass kernel when it pays off:
    TPU backend, lane-aligned channel count, enough rows to amortize the
    launch. XLA's lowering measured ~7x off HBM speed-of-light at encoder
    shapes (see ops/fused_ln.py)."""
    c = x.shape[-1]
    m = x.size // c
    return (
        jax.default_backend() != "cpu"
        and c % 128 == 0
        and m >= 4096
        and m % 8 == 0
    )


def _layer_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    if _ln_use_pallas(x):
        from ...ops.fused_ln import fused_ln

        return fused_ln(x, p["scale"], p["bias"], eps=eps)
    if x.dtype == jnp.float32:
        mean = x.mean(axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        return y * p["scale"] + p["bias"]
    # reduced-precision activations: statistics accumulate in fp32, the
    # elementwise normalize stays in the activation dtype (halves the LN's
    # HBM traffic — the fp32 round-trips showed up in the profile)
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    d = x - mean.astype(x.dtype)
    var = jnp.mean(
        d.astype(jnp.float32) * d.astype(jnp.float32), axis=-1, keepdims=True
    )
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
    return d * inv * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _add_layer_norm(
    p: Params, x: jnp.ndarray, delta: jnp.ndarray, eps: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(x + delta, LayerNorm(x + delta)) — fused into one HBM pass on TPU."""
    if _ln_use_pallas(x):
        from ...ops.fused_ln import fused_add_ln

        return fused_add_ln(x, delta, p["scale"], p["bias"], eps=eps)
    y = x + delta
    return y, _layer_norm(p, y, eps)


def _softmax_fp32(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch.nn.GELU default = exact erf formulation
    return jax.nn.gelu(x, approximate=False)


# ------------------------------------------------------------------- vision encoder


def _vision_rel_bias(
    q: jnp.ndarray, rel_h: jnp.ndarray, rel_w: jnp.ndarray, size: int
) -> jnp.ndarray:
    """Decomposed relative position bias for equal q/k grids of ``size``.

    q: (B, heads, size*size, hd). rel tables: (2*size-1, hd). Returns bias
    (B, heads, size*size, size*size). At the training resolution the table
    gather is exact (no interpolation needed).
    """
    assert rel_h.shape[0] == 2 * size - 1, (rel_h.shape, size)
    idx = np.arange(size)[:, None] - np.arange(size)[None, :] + size - 1  # (s, s)
    rh = rel_h[idx]  # (s, s, hd) indexed [q_h, k_h]
    rw = rel_w[idx]
    b, h, _, hd = q.shape
    qg = q.reshape(b, h, size, size, hd)
    bias_h = jnp.einsum("bhqwc,qkc->bhqwk", qg, rh)  # (B, H, qh, qw, kh)
    bias_w = jnp.einsum("bhqwc,wkc->bhqwk", qg, rw)  # (B, H, qh, qw, kw)
    bias = bias_h[..., :, None] + bias_w[..., None, :]  # (B,H,qh,qw,kh,kw)
    return bias.reshape(b, h, size * size, size * size)


# Token-grid side length at/above which the Pallas flash kernel takes over
# from naive attention. Windowed layers (s = 14) and test-size grids stay
# naive; 1024-input global layers (s = 64 -> N = 4096) go through flash.
_FLASH_MIN_GRID = 32

# kill switch / device A/B for the weight-tiled ViT-L/H MLP kernel
_TILED_MLP = os.environ.get("SAM_TILED_MLP", "1") != "0"
# SAM_INT8_FUSED=0: kill switch for the VMEM-resident w8a8 block-tail
# kernel (ops/fused_ln.py:fused_ln_mlp_int8) — reverts quantized MLPs to
# the unfused XLA int8 path (ops/quant.py) for device A/B.
_INT8_FUSED = os.environ.get("SAM_INT8_FUSED", "1") != "0"


def _vision_attention_grid(
    p: Params,
    x: jnp.ndarray,
    heads: int,
    window: int,
    ln: Optional[Params] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Window-confined ViT attention via the layout-native grid kernel.

    x: (B, S, S, C), never window-partitioned — the kernel tiles windows via
    its grid (pass window = S for global layers), reading q/k/v straight out
    of the fused qkv tensor and writing (B, S, S, C). This removed the
    window-relayout copies, (B,H,N,hd) head transposes and bias-augmentation
    concats that dominated the r1 profile's copy bucket.
    """
    from ...ops.flash_attention import flash_attention_grid
    from ...ops.quant import apply_linear, is_quantized

    b, s, _, c = x.shape
    hd = c // heads
    if ln is not None and not is_quantized(p["qkv"]):
        # LN1 fused into the qkv projection (one HBM pass for both)
        from ...ops.fused_ln import fused_ln_matmul

        qkv = fused_ln_matmul(
            x, ln["scale"], ln["bias"], p["qkv"]["w"], p["qkv"]["b"], eps=eps
        )
    elif ln is not None and _INT8_FUSED:
        # int8 qkv (PipelineOptions.quant): LN + dynamic quant + int8
        # projection in one kernel (the LN output never round-trips HBM)
        from ...ops.fused_ln import fused_ln_matmul_int8

        qkv = fused_ln_matmul_int8(
            x, ln["scale"], ln["bias"],
            p["qkv"]["wq"], p["qkv"]["wscale"], p["qkv"]["b"], eps=eps
        )
    elif ln is not None:
        # SAM_INT8_FUSED=0 A/B fallback: separate LN pass + the XLA int8
        # path (ops/quant.py)
        qkv = apply_linear(p["qkv"], _layer_norm(ln, x, eps))
    else:
        qkv = apply_linear(p["qkv"], x)  # (B, S, S, 3C)

    # score-table VMEM budget: the Pallas table builder holds a (w, s, C) q
    # block + (w, s*heads, 2w-1) fp32 contraction in VMEM — fine for w <= 32
    # (and the w=16 windowed layers of every config); 1024-input global
    # layers (w=64) fall back to the einsum path
    table_vmem = window * s * c * 2 + window * s * heads * (2 * window - 1) * 4
    if jax.default_backend() != "cpu" and table_vmem <= 6_000_000:
        from ...ops.flash_attention import relpos_tables

        rhw = relpos_tables(
            qkv, p["rel_pos_h"], p["rel_pos_w"], heads=heads, window=window
        )
    else:
        idx = np.arange(window)[:, None] - np.arange(window)[None, :] + window - 1
        rh_tab = p["rel_pos_h"][idx]  # (w, w, hd) [q_local, k_local]
        rw_tab = p["rel_pos_w"][idx]
        reps = s // window
        th = jnp.tile(rh_tab, (reps, 1, 1)).astype(x.dtype)  # (S, w, hd) by y
        tw = jnp.tile(rw_tab, (reps, 1, 1)).astype(x.dtype)
        qp = qkv[..., :c].reshape(b, s, s, heads, hd)
        rh = jnp.einsum("byxhc,ykc->byxhk", qp, th)
        rw = jnp.einsum("byxhc,xkc->byxhk", qp, tw)
        rhw = jnp.concatenate(
            [
                rh.reshape(b, s, s, heads * window),
                rw.reshape(b, s, s, heads * window),
            ],
            axis=-1,
        ).astype(x.dtype)
    # output projection fused into the kernel (its weight sits in VMEM)
    return flash_attention_grid(
        qkv, rhw, heads=heads, window=window,
        wproj=p["proj"]["w"], bproj=p["proj"]["b"],
    )


def _vision_attention(
    p: Params, x: jnp.ndarray, heads: int, use_rel_pos: bool
) -> jnp.ndarray:
    """Windowed/global ViT attention. x: (B, S, S, C) square token grid."""
    from ...ops.quant import apply_linear

    b, s, _, c = x.shape
    hd = c // heads
    qkv = apply_linear(p["qkv"], x.reshape(b, s * s, c))  # (B, N, 3C)
    qkv = qkv.reshape(b, s * s, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, hd)

    if use_rel_pos and s >= _FLASH_MIN_GRID and jax.default_backend() != "cpu":
        from ...ops.flash_attention import flash_attention_relpos

        idx = np.arange(s)[:, None] - np.arange(s)[None, :] + s - 1
        rh_tab = p["rel_pos_h"][idx].astype(jnp.float32)  # (s, s, hd) [qy, ky]
        rw_tab = p["rel_pos_w"][idx].astype(jnp.float32)
        qg = q.reshape(b, heads, s, s, hd).astype(jnp.float32)
        # score tables: (B, H, N, s) — ~1000x smaller than full logits
        rh = jnp.einsum("bhqwc,qkc->bhqwk", qg, rh_tab).reshape(b * heads, s * s, s)
        rw = jnp.einsum("bhqwc,wkc->bhqwk", qg, rw_tab).reshape(b * heads, s * s, s)

        # tile sizes: largest divisors of N within VMEM-friendly budgets,
        # block_k a multiple of the grid side (bias chunking invariant);
        # with the bias folded into the contraction, bigger q tiles win
        n = s * s
        bq = max(d for d in range(8, min(1024, n) + 1, 8) if n % d == 0)
        bk = max(m for m in range(s, min(1024, n) + 1, s) if n % m == 0)
        out = flash_attention_relpos(
            q.reshape(b * heads, s * s, hd),
            k.reshape(b * heads, s * s, hd),
            v.reshape(b * heads, s * s, hd),
            rh,
            rw,
            grid_s=s,
            block_q=bq,
            block_k=bk,
        )
        out = out.reshape(b, heads, s * s, hd)
    else:
        # materialized logits follow the activation dtype: bf16 halves the
        # HBM traffic of the windowed layers in production while fp32 inputs
        # (parity tests) keep exact numerics. Accumulation stays fp32.
        logits = jnp.einsum(
            "bhqc,bhkc->bhqk", q * (hd**-0.5), k, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        if use_rel_pos:
            bias = _vision_rel_bias(q, p["rel_pos_h"], p["rel_pos_w"], s)
            logits = logits + bias.astype(x.dtype)
        attn = _softmax_fp32(logits).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)

    out = out.transpose(0, 2, 1, 3).reshape(b, s * s, c)
    return _linear(p["proj"], out).reshape(b, s, s, c)


def _window_partition(x: jnp.ndarray, ws: int) -> Tuple[jnp.ndarray, int]:
    """(B, S, S, C) -> (B*nw*nw, ws, ws, C) with zero pad to a multiple of ws."""
    b, s, _, c = x.shape
    pad = (ws - s % ws) % ws
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
    ps = s + pad
    nw = ps // ws
    x = x.reshape(b, nw, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * nw * nw, ws, ws, c), ps


def _window_unpartition(win: jnp.ndarray, ws: int, padded: int, orig: int) -> jnp.ndarray:
    nw = padded // ws
    b = win.shape[0] // (nw * nw)
    c = win.shape[-1]
    x = win.reshape(b, nw, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, padded, padded, c)
    return x[:, :orig, :orig, :]


def sam_image_encoder(
    params: Params, pixel_values: jnp.ndarray, cfg: SamTPUConfig
) -> jnp.ndarray:
    """ViT image encoder. pixel_values: (B, H, W, 3) normalized. -> (B, gs, gs, out_c)."""
    p = params["vision"]
    ps = cfg.patch_size
    # stride == kernel patchify is a reshape + one matmul — emitting it as
    # an XLA convolution would anchor batch-minor operand layouts (the
    # relayout-copy pathology traced in BENCH_NOTES r3l)
    pw = p["patch_embed"]["w"]  # (ps, ps, 3, C) HWIO
    b_, s_, _, ci_ = pixel_values.shape
    gs_ = s_ // ps
    patches = pixel_values.reshape(b_, gs_, ps, gs_, ps, ci_)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b_, gs_, gs_, ps * ps * ci_)
    x = jax.lax.dot_general(
        patches, pw.astype(patches.dtype).reshape(ps * ps * ci_, -1),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(pixel_values.dtype) + p["patch_embed"]["b"]
    x = x + p["pos_embed"]

    s = cfg.grid_size
    ws = cfg.window_size
    # When the window divides the grid (always true for the window-16
    # adaptation), LN/MLP/residentials are layout-agnostic, so activations
    # can STAY window-partitioned across consecutive windowed layers —
    # eliminating two big relayout transposes per layer (a major HBM-copy
    # cost in the profile). With nonzero padding this would leak padded
    # state across layers, so it only engages when s % ws == 0.
    # Grid-kernel path: windows tiled inside the attention kernel itself, so
    # activations stay (B, S, S, C) for the whole stack — no partition
    # relayouts, no head transposes. Engages on TPU for lane-aligned dims.
    use_grid_attn = (
        jax.default_backend() != "cpu"
        and cfg.use_rel_pos
        and cfg.vision_hidden % 128 == 0
        and s % ws == 0
    )
    from ...ops.quant import apply_linear, is_quantized

    quantized = cfg.vision_layers > 0 and is_quantized(p["layers"][0]["mlp1"])
    if use_grid_attn:
        # fused block tail (add+LN+MLP in one kernel) needs both MLP weight
        # matrices resident in VMEM: ViT-B (768x3072 bf16 x2 = 9 MB) yes,
        # ViT-L/H no — they fall back to the unfused tail. int8-quantized
        # MLPs (the ViT-L/H lever) always take the unfused int8 path.
        fuse_tail = (
            not quantized and cfg.vision_hidden * cfg.vision_mlp_dim <= 2_400_000
        )
        # int8 weights halve the residency budget: ViT-B AND ViT-L MLPs fit
        # (4.7 / 8.4 MB); ViT-H (13.1 MB) leaves no room for the activation
        # blocks and takes the weight-tiled int8 kernel instead.
        fuse_tail_int8 = (
            quantized and _INT8_FUSED
            and cfg.vision_hidden * cfg.vision_mlp_dim <= 4_500_000
        )
        pending = None
        for i in range(cfg.vision_layers):
            lp = p["layers"][i]
            wsl = s if i in cfg.global_attn_indexes else ws
            if pending is not None:
                x = x + pending
                pending = None
            h = _vision_attention_grid(
                lp["attn"], x, cfg.vision_heads, wsl,
                ln=lp["ln1"], eps=cfg.layer_norm_eps,
            )
            if fuse_tail:
                from ...ops.fused_ln import fused_ln_mlp

                x = fused_ln_mlp(
                    x, h,
                    lp["ln2"]["scale"], lp["ln2"]["bias"],
                    lp["mlp1"]["w"], lp["mlp1"]["b"],
                    lp["mlp2"]["w"], lp["mlp2"]["b"],
                    eps=cfg.layer_norm_eps,
                )
            elif fuse_tail_int8:
                from ...ops.fused_ln import fused_ln_mlp_int8

                x = fused_ln_mlp_int8(
                    x, h,
                    lp["ln2"]["scale"], lp["ln2"]["bias"],
                    lp["mlp1"]["wq"], lp["mlp1"]["wscale"], lp["mlp1"]["b"],
                    lp["mlp2"]["wq"], lp["mlp2"]["wscale"], lp["mlp2"]["b"],
                    eps=cfg.layer_norm_eps,
                )
            elif quantized and _INT8_FUSED and _TILED_MLP:
                # ViT-H int8: MLP exceeds even the int8 VMEM-residency
                # budget — stream int8 weight tiles (2x MXU rate + no
                # (rows, hidden) HBM round-trips). Either kill switch
                # (SAM_INT8_FUSED=0 / SAM_TILED_MLP=0) reverts to the
                # unfused XLA int8 path for device A/B.
                from ...ops.fused_ln import fused_ln_mlp_tiled_int8

                x = fused_ln_mlp_tiled_int8(
                    x, h,
                    lp["ln2"]["scale"], lp["ln2"]["bias"],
                    lp["mlp1"]["wq"], lp["mlp1"]["wscale"], lp["mlp1"]["b"],
                    lp["mlp2"]["wq"], lp["mlp2"]["wscale"], lp["mlp2"]["b"],
                    eps=cfg.layer_norm_eps,
                )
            elif not quantized and _TILED_MLP:
                # ViT-L/H: MLP weights exceed the VMEM-resident budget —
                # stream weight tiles instead (the XLA fallback round-trips
                # the full (rows, hidden) GELU activation through HBM).
                # SAM_TILED_MLP=0 reverts to the unfused XLA tail (device
                # A/B + kill switch while the kernel is young).
                from ...ops.fused_ln import fused_ln_mlp_tiled

                x = fused_ln_mlp_tiled(
                    x, h,
                    lp["ln2"]["scale"], lp["ln2"]["bias"],
                    lp["mlp1"]["w"], lp["mlp1"]["b"],
                    lp["mlp2"]["w"], lp["mlp2"]["b"],
                    eps=cfg.layer_norm_eps,
                )
            else:
                x, h = _add_layer_norm(lp["ln2"], x, h, cfg.layer_norm_eps)
                h = apply_linear(lp["mlp1"], h)
                h = _gelu(h)
                h = apply_linear(lp["mlp2"], h)
                pending = h
        if pending is not None:
            x = x + pending
        return _encoder_neck(p, x)

    persistent = s % ws == 0
    parted = False
    pending = None  # mlp residual carried into the next layer's LN1 (fused)
    for i in range(cfg.vision_layers):
        lp = p["layers"][i]
        is_global = i in cfg.global_attn_indexes
        boundary = persistent and (
            (is_global and parted) or (not is_global and not parted)
        )
        if boundary and pending is not None:
            x = x + pending  # repartition relayouts must see the summed x
            pending = None
        if persistent:
            if is_global and parted:
                x = _window_unpartition(x, ws, s, s)
                parted = False
            elif not is_global and not parted:
                x, _ = _window_partition(x, ws)
                parted = True
        if pending is not None:
            x, h = _add_layer_norm(lp["ln1"], x, pending, cfg.layer_norm_eps)
            pending = None
        else:
            h = _layer_norm(lp["ln1"], x, cfg.layer_norm_eps)
        if is_global:
            h = _vision_attention(lp["attn"], h, cfg.vision_heads, cfg.use_rel_pos)
        elif persistent:
            h = _vision_attention(lp["attn"], h, cfg.vision_heads, cfg.use_rel_pos)
        else:
            win, padded = _window_partition(h, ws)
            win = _vision_attention(lp["attn"], win, cfg.vision_heads, cfg.use_rel_pos)
            h = _window_unpartition(win, ws, padded, s)
        x, h = _add_layer_norm(lp["ln2"], x, h, cfg.layer_norm_eps)
        h = apply_linear(lp["mlp1"], h)
        h = _gelu(h)
        h = apply_linear(lp["mlp2"], h)
        pending = h
    if pending is not None:
        x = x + pending
    if persistent and parted:
        x = _window_unpartition(x, ws, s, s)
    return _encoder_neck(p, x)


def _encoder_neck(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """neck: 1x1 conv -> LN -> 3x3 conv -> LN (channels-last)."""
    n = p["neck"]
    y = jnp.einsum("bhwc,co->bhwo", x, n["conv1_w"])
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
            y,
            n["conv2_w"],  # (3, 3, out_c, out_c)
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    y = _layer_norm(n["ln2"], y, 1e-6)
    return y


# ------------------------------------------------------------------- prompt encoder


def _fourier_embed(pe_matrix: jnp.ndarray, coords01: jnp.ndarray) -> jnp.ndarray:
    """Random-Fourier positional encoding of coords in [0, 1]^2 -> (..., 2*npf).

    The (..., 2) @ (2, npf) projection is written elementwise in fp32: a
    matmul would be routed to the MXU at reduced default precision, and sine
    arguments reach ~100 rad where bf16 rounding destroys the phase.
    """
    c = (2.0 * coords01 - 1.0).astype(jnp.float32)
    pe = pe_matrix.astype(jnp.float32)
    proj = c[..., 0:1] * pe[0] + c[..., 1:2] * pe[1]  # (..., npf)
    proj = (2.0 * jnp.pi) * proj
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def image_wide_positional_embedding(params: Params, cfg: SamTPUConfig) -> jnp.ndarray:
    """Dense (gs, gs, C) positional encoding for the decoder's image tokens."""
    gs = cfg.grid_size
    y = (jnp.arange(gs, dtype=jnp.float32) + 0.5) / gs
    x = (jnp.arange(gs, dtype=jnp.float32) + 0.5) / gs
    grid = jnp.stack(
        [jnp.tile(x[None, :], (gs, 1)), jnp.tile(y[:, None], (1, gs))], axis=-1
    )  # (gs, gs, 2) as (x, y)
    pe = params.get("shared_image_pe", params["shared_pe"])
    return _fourier_embed(pe, grid)


def sam_prompt_boxes(params: Params, boxes: jnp.ndarray, cfg: SamTPUConfig) -> jnp.ndarray:
    """Encode box prompts. boxes: (B, K, 4) xyxy in 1024-input coords -> (B, K, 2, C)."""
    pe = params["prompt"]
    coords = (boxes + 0.5).reshape(*boxes.shape[:-1], 2, 2) / cfg.image_size
    emb = _fourier_embed(params["shared_pe"], coords)  # (B, K, 2, C)
    corner = jnp.stack(
        [emb[..., 0, :] + pe["point_embed"][2], emb[..., 1, :] + pe["point_embed"][3]],
        axis=-2,
    )
    return corner


def sam_prompt_points(
    params: Params,
    points: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: SamTPUConfig,
    pad: bool = True,
) -> jnp.ndarray:
    """Encode point prompts. points: (B, K, P, 2) xy; labels: (B, K, P) in {-1,0,1}.

    Semantics: label 1 = foreground, 0 = background, -1 = padding (replaced by
    the not-a-point embedding).
    """
    pe = params["prompt"]
    if pad:
        zeros = jnp.zeros(points.shape[:-2] + (1, 2), dtype=points.dtype)
        neg = -jnp.ones(labels.shape[:-1] + (1,), dtype=labels.dtype)
        points = jnp.concatenate([points, zeros], axis=-2)
        labels = jnp.concatenate([labels, neg], axis=-1)
    coords = (points + 0.5) / cfg.image_size
    emb = _fourier_embed(params["shared_pe"], coords)
    lab = labels[..., None]
    emb = jnp.where(lab == -1, pe["not_a_point"], emb)
    emb = jnp.where(lab == 0, emb + pe["point_embed"][0], emb)
    emb = jnp.where(lab == 1, emb + pe["point_embed"][1], emb)
    return emb


def sam_dense_no_mask(params: Params, cfg: SamTPUConfig) -> jnp.ndarray:
    """(gs, gs, C) dense embedding when no mask prompt is given."""
    gs = cfg.grid_size
    return jnp.broadcast_to(
        params["prompt"]["no_mask"][None, None, :], (gs, gs, cfg.prompt_hidden)
    )


# --------------------------------------------------------------------- mask decoder


def _fused_i2t_enabled(c: int) -> bool:
    """Use the fused Pallas keys-stream decoder (TPU, lane-aligned C).
    Tests monkeypatch this to exercise the fused path in interpret mode."""
    return jax.default_backend() != "cpu" and c % 128 == 0


def _decoder_attention(
    p: Params, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int
) -> jnp.ndarray:
    """SAM decoder attention with optional internal downsampling. Inputs (N, T, C)."""
    qp, kp, vp = _linear(p["q"], q), _linear(p["k"], k), _linear(p["v"], v)
    n, tq, ci = qp.shape
    tk = kp.shape[1]
    hd = ci // heads

    def split(x, t):
        return x.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(qp, tq), split(kp, tk), split(vp, tk)
    logits = jnp.einsum(
        "nhqc,nhkc->nhqk", qh * (hd**-0.5), kh, preferred_element_type=jnp.float32
    )
    # store logits in the activation dtype (fp32 in parity tests, bf16 in
    # production — halves the i2t logits' HBM round trip); softmax math
    # still upcasts to fp32 in-register
    attn = _softmax_fp32(logits.astype(qh.dtype)).astype(vh.dtype)
    out = jnp.einsum("nhqk,nhkc->nhqc", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(n, tq, ci)
    return _linear(p["out"], out)


def _t2i_attention_shared(
    p: Params, q: jnp.ndarray, k_img: jnp.ndarray, v_img: jnp.ndarray, heads: int
) -> jnp.ndarray:
    """Token-to-image attention against PER-IMAGE keys/values.

    q: (B, K, tq, C) per-prompt queries; k_img/v_img: (B, T, C) — the k/v
    projections run once per image (the K prompts of an image share the
    untouched image tokens at decoder layer 0), saving the Kx-duplicated
    268 MB keys-stream passes the generic path pays. Exact same math.
    """
    b, kk, tq, _ = q.shape
    qp = _linear(p["q"], q)  # (B, K, tq, dh)
    kp = _linear(p["k"], k_img)  # (B, T, dh)
    vp = _linear(p["v"], v_img)
    ci = qp.shape[-1]
    hd = ci // heads
    t = kp.shape[1]
    qh = qp.reshape(b, kk, tq, heads, hd)
    kh = kp.reshape(b, t, heads, hd)
    vh = vp.reshape(b, t, heads, hd)
    logits = jnp.einsum(
        "bkqhc,bthc->bkhqt", qh * (hd**-0.5), kh, preferred_element_type=jnp.float32
    )
    attn = _softmax_fp32(logits.astype(qh.dtype)).astype(vh.dtype)
    out = jnp.einsum("bkhqt,bthc->bkqhc", attn, vh)
    return _linear(p["out"], out.reshape(b, kk, tq, ci))


def _i2t_attention_shared(
    p: Params, q_img: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int
) -> jnp.ndarray:
    """Image-to-token attention with a PER-IMAGE query side.

    q_img: (B, T, C) untouched image tokens (+pe); k/v: (B, K, tq, C)
    per-prompt. The q projection runs once per image; only the (tiny-
    contraction) attention product and the output projection are per-prompt.
    Returns (B, K, T, C).
    """
    b, kk, tq, _ = k.shape
    qp = _linear(p["q"], q_img)  # (B, T, dh)
    kp = _linear(p["k"], k)  # (B, K, tq, dh)
    vp = _linear(p["v"], v)
    ci = qp.shape[-1]
    hd = ci // heads
    t = qp.shape[1]
    qh = qp.reshape(b, t, heads, hd)
    kh = kp.reshape(b, kk, tq, heads, hd)
    vh = vp.reshape(b, kk, tq, heads, hd)
    logits = jnp.einsum(
        "bthc,bkqhc->bkhtq", qh * (hd**-0.5), kh, preferred_element_type=jnp.float32
    )
    attn = _softmax_fp32(logits.astype(qh.dtype)).astype(vh.dtype)
    out = jnp.einsum("bkhtq,bkqhc->bkthc", attn, vh)
    return _linear(p["out"], out.reshape(b, kk, t, ci))


def _feed_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """SAM FeedForward: relu MLP with proj_in / hidden layers / proj_out."""
    x = jax.nn.relu(_linear(p["in"], x))
    for lp in p["hidden"]:
        x = jax.nn.relu(_linear(lp, x))
    return _linear(p["out"], x)


def _conv_transpose_2x(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """2x2-stride-2 transposed conv, NHWC. w: (in_c, out_c, 2, 2) (torch layout).

    Each input pixel emits a 2x2 output block — expressed as one einsum
    (a matmul on the MXU) plus an interleaving reshape; exact transposed-conv
    semantics with no framework-convention risk.
    """
    bsz, h, wd, _ = x.shape
    o = w.shape[1]
    y = jnp.einsum("bhwc,coij->bhiwjo", x, w, preferred_element_type=jnp.float32)
    y = y.reshape(bsz, h * 2, wd * 2, o).astype(x.dtype)
    return y + b


def sam_mask_decoder_tokens(
    params: Params,
    image_embeddings: jnp.ndarray,
    sparse_prompts: jnp.ndarray,
    cfg: SamTPUConfig,
    dense_prompts: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-way transformer up to (but excluding) the mask upscaling.

    Returns (iou (B, K, M), hyper (B*K, M, C/8), keys_grid (B*K, gs, gs, C)).
    The caller applies :func:`sam_mask_head` on the full grid (reference
    semantics) or on per-prompt windows (the pipeline's fast path — each cell
    only needs its own neighborhood, not the full frame per prompt).
    """
    dp = params["decoder"]
    b, gs, _, c = image_embeddings.shape
    k = sparse_prompts.shape[1]
    eps = cfg.decoder_layer_norm_eps

    if dense_prompts is None:
        dense_prompts = sam_dense_no_mask(params, cfg)[None]
    img = image_embeddings + dense_prompts  # (B, gs, gs, C)
    img_flat = img.reshape(b, gs * gs, c)  # PER-IMAGE image tokens

    img_pe = (
        image_wide_positional_embedding(params, cfg)
        .reshape(1, gs * gs, c)
        .astype(image_embeddings.dtype)  # avoid fp32 promotion of the token stream
    )

    output_tokens = jnp.concatenate([dp["iou_token"], dp["mask_tokens"]], axis=0)
    num_out = output_tokens.shape[0]
    nt = num_out + sparse_prompts.shape[2]
    tokens4 = jnp.concatenate(
        [
            jnp.broadcast_to(output_tokens[None, None], (b, k, num_out, c)),
            sparse_prompts,
        ],
        axis=2,
    )  # (B, K, nt, C)
    tokens = tokens4.reshape(b * k, nt, c)

    queries = tokens
    point_pe = tokens  # query positional embedding = initial prompt tokens
    heads = cfg.decoder_heads

    # ---- layer 0, keys still per-image -------------------------------------
    # Until the first i2t update the K prompts of an image share identical
    # image tokens, so the t2i k/v projections and the i2t q projection run
    # per-image ((B, T, C)) instead of per-prompt ((B*K, T, C)) — identical
    # math, 1/K of the keys-stream HBM traffic that dominated the decoder in
    # the bench profile. Layers >= 1 use the generic per-prompt path.
    lp0 = dp["layers"][0]
    queries = _decoder_attention(
        lp0["self_attn"], queries, queries, queries, heads
    )  # skip_first_layer_pe: output replaces queries
    queries = _layer_norm(lp0["ln1"], queries, eps)

    if _fused_i2t_enabled(c):
        # layer-0 t2i rides the fused per-image kernel: k/v projections once
        # per image, the (H*tq, T) softmax never leaves VMEM
        from ...ops.decoder_fused import t2i_shared_attend

        t2i0 = lp0["t2i"]
        scale0 = (t2i0["q"]["w"].shape[1] // heads) ** -0.5
        qp0 = _linear(t2i0["q"], queries + point_pe) * jnp.asarray(
            scale0, queries.dtype
        )
        attn = _linear(
            t2i0["out"],
            t2i_shared_attend(
                img_flat, img_pe, qp0,
                t2i0["k"]["w"], t2i0["k"]["b"],
                t2i0["v"]["w"], t2i0["v"]["b"],
                heads=heads, k_share=k,
            ),
        )
        queries = _layer_norm(lp0["ln2"], queries + attn, eps)
    else:
        kk_img = img_flat + img_pe  # (B, T, C)
        q4 = (queries + point_pe).reshape(b, k, nt, c)
        attn = _t2i_attention_shared(lp0["t2i"], q4, kk_img, img_flat, heads)
        queries = _layer_norm(
            lp0["ln2"], queries + attn.reshape(b * k, nt, c), eps
        )

    mlp = _linear(lp0["mlp2"], jax.nn.relu(_linear(lp0["mlp1"], queries)))
    queries = _layer_norm(lp0["ln3"], queries + mlp, eps)

    if _fused_i2t_enabled(c):
        # Pipelined Pallas decoder: each keys-stream pass fuses [i2t(i) +
        # residual + ln4] WITH the next stage's t2i attention (layer i+1's
        # self-attn + ln1 are computed first — legal, i2t never touches the
        # queries; the final iteration fuses final_t2i). The (B*K, T, C)
        # keys stream is then written once and read once per layer instead
        # of XLA's ~8 round-trips — the decoder's dominant cost at bench
        # shape.
        from ...ops.decoder_fused import i2t_keys_update

        layers = dp["layers"]
        keys_src, share = img_flat, k
        for i, lpi in enumerate(layers):
            last = i + 1 >= len(layers)
            if not last:
                lpn = layers[i + 1]
                q = queries + point_pe
                attn_s = _decoder_attention(lpn["self_attn"], q, q, queries, heads)
                q_pre = _layer_norm(lpn["ln1"], queries + attn_s, eps)
                t2i_p = lpn["t2i"]
            else:
                q_pre = queries
                t2i_p = dp["final_t2i"]
            tq_side = q_pre + point_pe
            scale2 = (t2i_p["q"]["w"].shape[1] // heads) ** -0.5
            qp2 = _linear(t2i_p["q"], tq_side) * jnp.asarray(
                scale2, tq_side.dtype
            )
            kq = _linear(lpi["i2t"]["k"], queries + point_pe)
            vq = _linear(lpi["i2t"]["v"], queries)
            keys, t2i_attn = i2t_keys_update(
                keys_src, img_pe, kq, vq,
                lpi["i2t"]["q"]["w"], lpi["i2t"]["q"]["b"],
                lpi["i2t"]["out"]["w"], lpi["i2t"]["out"]["b"],
                lpi["ln4"]["scale"], lpi["ln4"]["bias"],
                heads=heads, k_share=share, eps=eps,
                t2i={"qp": qp2, "wk": t2i_p["k"]["w"], "bk": t2i_p["k"]["b"],
                     "wv": t2i_p["v"]["w"], "bv": t2i_p["v"]["b"]},
                # final layer writes straight into the (gs, gs, C) grid the
                # mask head slices (saves a full-stream relayout copy)
                out_grid=gs if last else 0,
            )
            attn = _linear(t2i_p["out"], t2i_attn)
            if not last:
                queries = _layer_norm(lpn["ln2"], q_pre + attn, eps)
                mlp = _linear(lpn["mlp2"], jax.nn.relu(_linear(lpn["mlp1"], queries)))
                queries = _layer_norm(lpn["ln3"], queries + mlp, eps)
            else:
                # final LN is a default nn.LayerNorm in the source -> eps 1e-5
                queries = _layer_norm(dp["ln_final"], q_pre + attn, 1e-5)
            keys_src, share = keys, 1
    else:
        q4 = (queries + point_pe).reshape(b, k, nt, c)
        attn = _i2t_attention_shared(
            lp0["i2t"], kk_img, q4, queries.reshape(b, k, nt, c), heads
        )  # (B, K, T, C)
        keys = _layer_norm(
            lp0["ln4"], (img_flat[:, None] + attn).reshape(b * k, gs * gs, c), eps
        )

        # ---- layers 1.. on the per-prompt streams --------------------------
        for lp in dp["layers"][1:]:
            q = queries + point_pe
            attn = _decoder_attention(lp["self_attn"], q, q, queries, heads)
            queries = _layer_norm(lp["ln1"], queries + attn, eps)

            q = queries + point_pe
            kk = keys + img_pe
            attn = _decoder_attention(lp["t2i"], q, kk, keys, heads)
            queries = _layer_norm(lp["ln2"], queries + attn, eps)

            mlp = _linear(lp["mlp2"], jax.nn.relu(_linear(lp["mlp1"], queries)))
            queries = _layer_norm(lp["ln3"], queries + mlp, eps)

            q = queries + point_pe
            kk = keys + img_pe
            attn = _decoder_attention(lp["i2t"], kk, q, queries, heads)
            keys = _layer_norm(lp["ln4"], keys + attn, eps)

        q = queries + point_pe
        kk = keys + img_pe
        attn = _decoder_attention(dp["final_t2i"], q, kk, keys, cfg.decoder_heads)
        # the final LN is a default nn.LayerNorm in the source -> eps 1e-5
        queries = _layer_norm(dp["ln_final"], queries + attn, 1e-5)

    iou_token_out = queries[:, 0, :]
    mask_tokens_out = queries[:, 1 : 1 + cfg.num_mask_tokens, :]

    hyper = jnp.stack(
        [
            _feed_forward(dp["hyper_mlps"][i], mask_tokens_out[:, i, :])
            for i in range(cfg.num_mask_tokens)
        ],
        axis=1,
    )  # (B*K, M, C/8)
    iou = _feed_forward(dp["iou_head"], iou_token_out).reshape(b, k, cfg.num_mask_tokens)
    # the fused decoder's last pass already emits the (gs, gs, C) grid
    keys_grid = keys if keys.ndim == 4 else keys.reshape(b * k, gs, gs, c)
    return iou, hyper, keys_grid


def sam_mask_head(
    params: Params, keys_grid: jnp.ndarray, hyper: jnp.ndarray
) -> jnp.ndarray:
    """Upscale image tokens 4x and project with the hypernetwork outputs.

    keys_grid: (N, g, g, C) — the full grid or per-prompt windows of it.
    hyper: (N, M, C/8). Returns logits (N, M, 4g, 4g) fp32.
    """
    dp = params["decoder"]
    n, g, _, c = keys_grid.shape
    up = _conv_transpose_2x(keys_grid, dp["up1_w"], dp["up1_b"])
    up = _gelu(_layer_norm(dp["up_ln"], up, 1e-6))
    up = _gelu(_conv_transpose_2x(up, dp["up2_w"], dp["up2_b"]))
    hw4 = g * 4
    return jnp.einsum(
        "nmc,npc->nmp", hyper, up.reshape(n, hw4 * hw4, -1),
        preferred_element_type=jnp.float32,
    ).reshape(n, hyper.shape[1], hw4, hw4)


def sam_mask_decoder(
    params: Params,
    image_embeddings: jnp.ndarray,
    sparse_prompts: jnp.ndarray,
    cfg: SamTPUConfig,
    dense_prompts: Optional[jnp.ndarray] = None,
    multimask_output: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-way transformer mask decoder, batched over prompts.

    Args:
        image_embeddings: (B, gs, gs, C) from :func:`sam_image_encoder`.
        sparse_prompts: (B, K, P, C) prompt tokens (P=2 for boxes).
        dense_prompts: optional (B or 1, gs, gs, C); defaults to no-mask embed.
        multimask_output: if True return 3 masks/prompt else 1 (reference uses
            False: ``pipeline.py:109``).

    Returns:
        (low_res_masks (B, K, M, 4*gs, 4*gs), iou_scores (B, K, M)).
    """
    b, gs = image_embeddings.shape[0], image_embeddings.shape[1]
    k = sparse_prompts.shape[1]
    iou, hyper, keys_grid = sam_mask_decoder_tokens(
        params, image_embeddings, sparse_prompts, cfg, dense_prompts
    )
    masks = sam_mask_head(params, keys_grid, hyper).reshape(
        b, k, cfg.num_mask_tokens, gs * 4, gs * 4
    )
    if multimask_output:
        return masks[:, :, 1:], iou[:, :, 1:]
    return masks[:, :, :1], iou[:, :, :1]


def sam_forward_boxes(
    params: Params,
    pixel_values: jnp.ndarray,
    boxes: jnp.ndarray,
    cfg: SamTPUConfig,
    multimask_output: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full SAM: images (B, H, W, 3 normalized) + boxes (B, K, 4) -> masks, iou.

    The encoder runs once per image; the decoder handles all K boxes at once.
    """
    emb = sam_image_encoder(params, pixel_values, cfg)
    sparse = sam_prompt_boxes(params, boxes, cfg)
    return sam_mask_decoder(params, emb, sparse, cfg, multimask_output=multimask_output)


# -------------------------------------------------------------------------- init


def init_sam_params(rng, cfg: SamTPUConfig, dtype=jnp.float32) -> Params:
    """Random-init parameter pytree (authoritative tree layout).

    Initialization happens on the HOST and the leaves STAY numpy: building
    ~300 leaves with jax.random would trigger one remote XLA compile per op
    under the TPU tunnel (minutes of cold startup), and even per-leaf
    ``jnp.asarray`` costs ~100 ms of round-trip each there (~50 s for the
    full tree — the dominant bench startup phase, r3u log). Callers upload
    in one packed transfer (``pipeline.engine._device_put_packed``) or let
    jit argument transfer handle it.
    ``rng`` may be a jax PRNGKey (hashed to a seed) or a plain int.
    """
    seed = rng if isinstance(rng, int) else int(np.asarray(rng).sum()) & 0x7FFFFFFF
    nrng = np.random.default_rng(seed)

    def randn(*shape, scale=1.0):
        return nrng.normal(0.0, scale, size=shape).astype(dtype)

    def dense(i, o, scale=None):
        s = scale if scale is not None else (1.0 / math.sqrt(i))
        return {"w": randn(i, o, scale=s), "b": np.zeros((o,), dtype)}

    def ln(d):
        return {"scale": np.ones((d,), dtype), "bias": np.zeros((d,), dtype)}

    c = cfg.vision_hidden
    hd = c // cfg.vision_heads
    gs = cfg.grid_size

    def vis_layer(i):
        ws = cfg.window_size if i not in cfg.global_attn_indexes else gs
        return {
            "ln1": ln(c),
            "attn": {
                "qkv": dense(c, 3 * c),
                "proj": dense(c, c),
                "rel_pos_h": np.zeros((2 * ws - 1, hd), dtype),
                "rel_pos_w": np.zeros((2 * ws - 1, hd), dtype),
            },
            "ln2": ln(c),
            "mlp1": dense(c, cfg.vision_mlp_dim),
            "mlp2": dense(cfg.vision_mlp_dim, c),
        }

    oc = cfg.output_channels
    vision = {
        "patch_embed": {
            "w": (
                randn(cfg.patch_size, cfg.patch_size, 3, c)
                * 0.02
            ).astype(dtype),
            "b": np.zeros((c,), dtype),
        },
        "pos_embed": np.zeros((1, gs, gs, c), dtype),
        "layers": [vis_layer(i) for i in range(cfg.vision_layers)],
        "neck": {
            "conv1_w": (randn(c, oc) * 0.02).astype(dtype),
            "ln1": ln(oc),
            "conv2_w": (randn(3, 3, oc, oc) * 0.02).astype(dtype),
            "ln2": ln(oc),
        },
    }

    ph = cfg.prompt_hidden
    prompt = {
        "point_embed": randn(4, ph).astype(dtype) * 0.02,
        "not_a_point": randn(ph,).astype(dtype) * 0.02,
        "no_mask": randn(ph,).astype(dtype) * 0.02,
        "mask_embed": None,  # mask-prompt path unused by the pipeline
    }

    di = ph  # decoder hidden == prompt hidden
    dh = di // 2  # downsampled internal dim

    def dec_attn(internal):
        return {
            "q": dense(di, internal),
            "k": dense(di, internal),
            "v": dense(di, internal),
            "out": dense(internal, di),
        }

    def dec_layer():
        return {
            "self_attn": dec_attn(di),
            "ln1": ln(di),
            "t2i": dec_attn(dh),
            "ln2": ln(di),
            "mlp1": dense(di, cfg.decoder_mlp_dim),
            "mlp2": dense(cfg.decoder_mlp_dim, di),
            "ln3": ln(di),
            "i2t": dec_attn(dh),
            "ln4": ln(di),
        }

    def ff(i, h, o, depth):
        return {
            "in": dense(i, h),
            "hidden": [dense(h, h) for _ in range(depth - 2)],
            "out": dense(h, o),
        }

    decoder = {
        "iou_token": randn(1, di).astype(dtype) * 0.02,
        "mask_tokens": randn(cfg.num_mask_tokens, di).astype(dtype) * 0.02,
        "layers": [dec_layer() for _ in range(cfg.decoder_layers)],
        "final_t2i": dec_attn(dh),
        "ln_final": ln(di),
        "up1_w": (randn(di, di // 4, 2, 2) * 0.02).astype(dtype),
        "up1_b": np.zeros((di // 4,), dtype),
        "up_ln": ln(di // 4),
        "up2_w": (randn(di // 4, di // 8, 2, 2) * 0.02).astype(dtype),
        "up2_b": np.zeros((di // 8,), dtype),
        "hyper_mlps": [ff(di, di, di // 8, 3) for _ in range(cfg.num_mask_tokens)],
        "iou_head": ff(di, cfg.iou_head_hidden, cfg.num_mask_tokens, cfg.iou_head_depth),
    }

    shared_pe = (
        randn(2, cfg.num_pos_feats) * (cfg.vision_hidden // 2)
    ).astype(dtype)

    return {
        "vision": vision,
        "prompt": prompt,
        "decoder": decoder,
        "shared_pe": shared_pe,
        "shared_image_pe": shared_pe,
    }
