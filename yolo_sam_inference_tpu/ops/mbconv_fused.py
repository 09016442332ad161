"""Fused MBConv block (TinyViT stage 0) as one Pallas pass.

The MBConv block  out = gelu(x + conv3(gelu(dw3x3(gelu(conv1(x))))))
expands 64 -> 256 channels, runs a depthwise 3x3, and projects back.
XLA executes it as separate convolutions with the 4x-expanded activation
round-tripping HBM between each, and its depthwise emitter
(`EmitDepthwiseInputBatchInSublanes`) runs ~30x off memory-bound — at the
MobileSAM bench (B=32, 512px) the two stage-0 dwconvs profiled 4.9 ms EACH
and the full MBConv chain ~16 ms of a 57 ms iteration.

This kernel streams row strips of the input directly from HBM and keeps
the expanded activation entirely in VMEM:

* conv1 (1x1) runs as one (rows, C) @ (C, E) matmul over the strip PLUS
  its one-row halos above/below (1x1 conv => halo expansion is exact
  recomputation, 2/h extra work);
* halo/edge positions are re-masked to zero before the depthwise pass
  (the reference pads the EXPANDED tensor with zeros; padded x rows would
  otherwise contribute gelu(b1) != 0 through the conv1 bias);
* the depthwise 3x3 is 9 shifted VPU multiply-adds on the VMEM-resident
  expanded strip (static sublane/lane slices — no grouped-conv emitter);
* conv3 (1x1) projects back as one matmul, and the residual + outer GELU
  close the strip.

HBM traffic drops to ~1.1x read + 1x write of the UNEXPANDED tensor.

The halo rows ride Pallas BlockSpecs with block height 1: a height-1 block
can address ANY row (index maps return block-sized offsets), so the same
UNPADDED input is passed three times — an (h)-row center block plus
CLAMPED index maps fetching the rows just above and below it (duplicate
rows at the image boundary — harmless, those positions are re-masked
after conv1 anyway). The width padding to the sublane multiple happens
IN-KERNEL on the VMEM-resident strip; the previous version staged a
spatially zero-padded copy of the whole activation through HBM
(full-tensor jnp.pad + lax.slice, ~6.7 ms/iter at the MobileSAM B=128
bench across the eight stage-0 blocks).

Reference anchor: MobileSAM tiny_vit_sam.py MBConv.forward; stage-0 swap
selected by checkpoint name (reference pipeline.py:76).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .fused_ln import _erf_as


def _gelu_f32(x):
    """erf-GELU via the shared kernel erf (fused_ln; rational + fast recip)."""
    return x * 0.5 * (1.0 + _erf_as(x * (2.0 ** -0.5), fast_recip=True))


def _mbconv_kernel(
    xc_ref, xt_ref, xb_ref, w1_ref, b1_ref, wd_ref, bd_ref, w3_ref, b3_ref,
    o_ref,
    *, h: int, nh: int, w: int, wp: int, compute_bf16: bool, residual: bool,
):
    c = xc_ref.shape[3]
    e = w1_ref.shape[1]
    co = w3_ref.shape[1]
    # compute_bf16: run the VPU-bound stretch (GELUs + the 9-tap depthwise
    # FMA chain) in the activation dtype instead of fp32 — packed-bf16 VPU
    # issue is 2x the fp32 rate. Opt-in; error bound tested in
    # tests/test_tinyvit.py::test_mbconv_bf16_compute_bound.
    cdt = xc_ref.dtype if compute_bf16 else jnp.float32

    xc = xc_ref[0]  # (h, W, C) center strip
    xt = xt_ref[0]  # (1, W, C) row above (clamped duplicate on strip 0)
    xb = xb_ref[0]  # (1, W, C) row below (clamped duplicate on the last)
    ext = jnp.concatenate([xt, xc, xb], axis=0)  # (h+2, W, C)
    # width pad in-kernel: +1 column left ('same' dw), zeros right to the
    # sublane multiple; padded positions (and the boundary halo rows, which
    # hold clamped duplicate data) are re-masked after conv1 below
    zl = jnp.zeros((h + 2, 1, c), ext.dtype)
    zr = jnp.zeros((h + 2, wp - w - 1, c), ext.dtype)
    ext = jnp.concatenate([zl, ext, zr], axis=1)  # (h+2, Wp, C)

    flat = ext.reshape((h + 2) * wp, c)
    h1 = (
        jax.lax.dot_general(
            flat, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[...]
    )
    h1 = _gelu_f32(h1.astype(cdt)).astype(xc.dtype).reshape(h + 2, wp, e)

    # zero the expanded halo where the INPUT was spatial zero-padding: the
    # reference pads the expanded tensor with zeros, but conv1's bias makes
    # gelu(b1) != 0 there. Columns 0 and Wp-1 always; the top halo row on
    # the first strip; the bottom halo row on the last strip.
    i = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    col_ok = (col > 0) & (col < w + 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h + 2, 1, 1), 0)
    row_ok = ((row > 0) | (i > 0)) & ((row < h + 1) | (i < nh - 1))
    h1 = jnp.where(col_ok & row_ok, h1, jnp.zeros((), h1.dtype))

    # depthwise 3x3: 9 shifted VPU FMAs on the VMEM-resident strip
    acc = jnp.broadcast_to(bd_ref[...].reshape(1, 1, e), (h, w, e)).astype(cdt)
    for dy in range(3):
        for dx in range(3):
            acc = acc + (
                h1[dy : dy + h, dx : dx + w, :].astype(cdt)
                * wd_ref[dy, dx].astype(cdt)
            )
    h2 = _gelu_f32(acc).astype(xc.dtype)

    out = (
        jax.lax.dot_general(
            h2.reshape(h * w, e), w3_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b3_ref[...]
    )
    if residual:
        # MBConv tail: gelu(x + conv3(...)) — requires co == c
        res = xc.reshape(h * w, c).astype(jnp.float32)
        out = _gelu_f32((res + out).astype(cdt))
    o_ref[0] = out.astype(xc.dtype).reshape(h, w, co)


@functools.partial(
    jax.jit, static_argnames=("interpret", "compute", "residual")
)
def mbconv_block(
    x: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    wd: jnp.ndarray, bd: jnp.ndarray,
    w3: jnp.ndarray, b3: jnp.ndarray,
    interpret: bool = False,
    compute: str = "fp32",
    residual: bool = True,
) -> jnp.ndarray:
    """x (B, H, W, C) -> gelu(x + conv3(gelu(dw3x3(gelu(conv1(x)))))).

    w1 (C, E) 1x1 expand, wd (3, 3, 1, E) depthwise HWIO, w3 (E, Co) 1x1
    project; all biases pre-folded BN. W must be a multiple of 8
    (sublane-aligned flatten) — TinyViT stage 0 runs at S/4 = 128/256.
    compute="bf16" runs the VPU-bound GELU/depthwise stretch in the
    activation dtype (opt-in 2x VPU-rate path; matmuls stay fp32-accum).
    residual=False drops the residual add and the outer GELU (and allows
    Co != C):  x -> conv3(gelu(dw3x3(gelu(conv1(x))))) — exactly TinyViT's
    stride-1 PatchMerging (merge2 at S/16, tiny_vit_sam.py PatchMerging
    with stride 1), whose 640-channel depthwise otherwise hits the XLA
    grouped-conv emitter.
    """
    b, hgt, wid, c = x.shape
    e = w1.shape[1]
    co = w3.shape[1]
    if residual and co != c:
        raise ValueError("residual MBConv requires w3 Co == C")
    from . import mosaic_backend

    interpret = interpret or not mosaic_backend()

    # width padding: +1 zero column left (dw 'same'), right padded so the
    # total is a sublane multiple (Mosaic rejects shape casts whose merged
    # second-minor dim is not 8-aligned); the right pad also covers dw's
    # +1 column and is re-masked after conv1
    wp = (wid + 2 + 7) // 8 * 8
    # strip height: divisor of H, VMEM-bounded expanded strip
    h = 1
    for cand in range(2, min(hgt, 33)):
        if hgt % cand == 0 and (cand + 2) * wp * e * 6 <= 4_000_000:
            h = cand
    nh = hgt // h

    kernel = functools.partial(
        _mbconv_kernel, h=h, nh=nh, w=wid, wp=wp,
        compute_bf16=(compute == "bf16" and x.dtype == jnp.bfloat16),
        residual=residual,
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
            pl.BlockSpec((c, e), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, e), lambda bi, i: (0, 0)),
            pl.BlockSpec((3, 3, e), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((1, e), lambda bi, i: (0, 0)),
            pl.BlockSpec((e, co), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, co), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, wid, co), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hgt, wid, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x,
        x,
        x,
        w1.astype(x.dtype),
        b1.reshape(1, e).astype(jnp.float32),
        wd.reshape(3, 3, e).astype(jnp.float32),
        bd.reshape(1, e).astype(jnp.float32),
        w3.astype(x.dtype),
        b3.reshape(1, co).astype(jnp.float32),
    )
    return out
