"""Fused TinyViT block tail: local_conv (3x3 depthwise) + LayerNorm + MLP.

The TinyViT block is  x = x + attn(LN1(x)); x = local_conv(x);
x = x + mlp(LN2(x))  (tiny_vit_sam.py TinyViTBlock.forward — note
local_conv REPLACES x, no residual). In the fused path the window
attention and the LN+MLP tail are already Pallas kernels, but the ten
local_convs between them ran as standalone XLA depthwise convolutions —
the same pathological `EmitDepthwiseInputBatchInSublanes` emitter that
motivated ops/mbconv_fused.py, plus a full HBM round-trip of the
activation on each side. A standalone Pallas depthwise LOSES at these
sizes (64^2/32^2 — the XLA-side pad/staging copies exceed the emitter
inefficiency, BENCH_NOTES r3 negative results); fusing it into the MLP
kernel is the version with nothing to stage: the depthwise is 9 shifted
VPU FMAs riding the same row strips the MLP reads anyway, overlapping
the MXU matmul issue.

out = y + mlp2(gelu(mlp1(LN(y)))),  y = dw3x3(x) + b_dw

Row-strip grid over the UNPADDED input: the one-row top/bottom halos are
height-1 BlockSpec blocks with CLAMPED index maps (a height-1 block can
address any row, so `max(i*h-1, 0)` / `min(i*h+h, H-1)` fetch the
neighbor row, or a duplicate row at the image boundary that the kernel
re-zeroes — duplicates stand in for the conv's 'same' padding). The
width padding (one zero column left, sublane-alignment zeros right)
happens IN-KERNEL on the VMEM-resident strip. The previous version
staged a spatially zero-padded copy of the whole activation through HBM
(full-tensor jnp.pad + lax.slice, ~4 ms/iter at the MobileSAM B=128
bench for the ten block tails) — this version reads x directly and pays
only a strip-sized VMEM move that overlaps the matmul issue. Both MLP
weight matrices stay VMEM-resident (TinyViT dims: 128/160/320 x 4).

Reference anchor: MobileSAM tiny_vit_sam.py TinyViTBlock.local_conv;
variant swap by checkpoint name (reference pipeline.py:76).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_ln import _ln_rows, _mlp_rows


def _dw_ln_mlp_kernel(
    xc_ref, xt_ref, xb_ref, wd_ref, bd_ref, s_ref, b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *, h: int, nh: int, w: int, wp: int, eps: float,
):
    c = xc_ref.shape[3]

    xc = xc_ref[0]  # (h, W, C) center strip
    xt = xt_ref[0]  # (1, W, C) row above (clamped duplicate on strip 0)
    xb = xb_ref[0]  # (1, W, C) row below (clamped duplicate on the last)
    ext = jnp.concatenate([xt, xc, xb], axis=0)  # (h+2, W, C)

    # 'same'-padding semantics: the clamped halo rows at the image
    # boundary and the left/right columns must read as zeros
    i = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h + 2, 1, 1), 0)
    row_ok = ((row > 0) | (i > 0)) & ((row < h + 1) | (i < nh - 1))
    ext = jnp.where(row_ok, ext, jnp.zeros((), ext.dtype))
    zl = jnp.zeros((h + 2, 1, c), ext.dtype)
    zr = jnp.zeros((h + 2, wp - w - 1, c), ext.dtype)
    ext = jnp.concatenate([zl, ext, zr], axis=1)  # (h+2, Wp, C)

    # depthwise 3x3: 9 shifted VPU FMAs on the VMEM-resident strip
    acc = jnp.broadcast_to(bd_ref[...].reshape(1, 1, c), (h, w, c)).astype(
        jnp.float32
    )
    for dy in range(3):
        for dx in range(3):
            acc = acc + (
                ext[dy : dy + h, dx : dx + w, :].astype(jnp.float32)
                * wd_ref[dy, dx]
            )
    y = acc.astype(xc.dtype).reshape(h * w, c)

    ln = _ln_rows(y, s_ref[...], b_ref[...], eps)
    out = _mlp_rows(ln, w1_ref, b1_ref, w2_ref, b2_ref, y.dtype)
    o_ref[0] = (y + out.astype(y.dtype)).reshape(h, w, c)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def dw_ln_mlp(
    x: jnp.ndarray,
    wd: jnp.ndarray, bd: jnp.ndarray,
    scale: jnp.ndarray, bias: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, H, W, C) -> y + mlp2(gelu(mlp1(LN(y)))), y = dw3x3(x) + bd.

    wd (3, 3, 1, C) depthwise HWIO with pre-folded BN, (scale, bias) the
    LayerNorm affine, w1 (C, hidden) / w2 (hidden, C) the MLP. W must be
    a multiple of 8 (sublane-aligned flatten) — TinyViT stages run at
    64/32.
    """
    b, hgt, wid, c = x.shape
    hidden = w1.shape[-1]
    from . import mosaic_backend

    interpret = interpret or not mosaic_backend()

    wp = (wid + 2 + 7) // 8 * 8

    # strip height: divisor of H; bound the (h*w, hidden) fp32 accumulator
    # + bf16 hidden + the input strips to the VMEM budget
    h = 1
    for cand in range(2, min(hgt, 33)):
        if hgt % cand == 0 and cand * wid * hidden * 6 + (cand + 2) * wp * c * 8 <= 6_000_000:
            h = cand
    nh = hgt // h

    kernel = functools.partial(
        _dw_ln_mlp_kernel, h=h, nh=nh, w=wid, wp=wp, eps=eps
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec((1, h, wid, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec(
                (1, 1, wid, c),
                lambda bi, i, _h=h: (bi, jnp.maximum(i * _h - 1, 0), 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, wid, c),
                lambda bi, i, _h=h, _hi=hgt - 1: (
                    bi, jnp.minimum(i * _h + _h, _hi), 0, 0,
                ),
            ),
            pl.BlockSpec((3, 3, c), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((c, hidden), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda bi, i: (0, 0)),
            pl.BlockSpec((hidden, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, wid, c), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hgt, wid, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x,
        x,
        x,
        wd.reshape(3, 3, c).astype(jnp.float32),
        bd.reshape(1, c).astype(jnp.float32),
        scale.reshape(1, c).astype(x.dtype),
        bias.reshape(1, c).astype(x.dtype),
        w1.astype(x.dtype),
        b1.reshape(1, hidden).astype(jnp.float32),
        w2.astype(x.dtype),
        b2.reshape(1, c).astype(jnp.float32),
    )
    return out
