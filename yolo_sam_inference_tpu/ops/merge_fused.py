"""Fused TinyViT patch-merge block (stride-2 MBConv-style downsampler).

PatchMerging  out = conv3(gelu(dw3x3_s2(gelu(conv1(x)))))  expands
ci -> co with a 1x1, downsamples with a stride-2 depthwise 3x3, and
projects co -> co (tiny_vit_sam.py PatchMerging.forward; no residual, no
outer activation). XLA gives the depthwise the same pathological
`EmitDepthwiseInputBatchInSublanes` emitter that made stage-0 MBConvs
4.9 ms each at the MobileSAM bench (see ops/mbconv_fused.py), and the
expanded activation round-trips HBM between the three convs.

Design: the stride-2 depthwise is a strided-access pattern Mosaic can't
load efficiently, so the kernel consumes the input in a **q-major
space-to-depth layout** (B, H/2, W/2, 4ci), channel index = (2p+q)*ci + c
for sub-pixel offset (p, q) — each quadrant plane is a CONTIGUOUS lane
group. Then:

* conv1 runs as ONE matmul against a block-diagonal (4ci, 4E) weight, so
  lane group pq of the result IS the expanded quadrant plane H_pq
  (gelu'd in-register);
* the stride-2 depthwise decomposes EXACTLY into 9 unit-shifted VPU FMAs
  on the quarter-resolution planes: tap (dy, dx) reads plane
  (p, q) = (dy != 1, dx != 1) at row offset a-1 (dy = 0) or a (else) and
  col offset j-1 (dx = 0) or j (else) — static lane slices + unit
  sublane shifts, never a strided load. Only a TOP row / LEFT column
  halo exists (stride-2 'same' never reads the bottom/right padding);
* conv3 projects back as one (rows, E) @ (E, co) matmul.

The 4x-expanded activation never leaves VMEM; HBM traffic is ~1x read of
the s2d input + 1x write of the quarter-res output.

Reference anchor: MobileSAM tiny_vit_sam.py PatchMerging; variant swap by
checkpoint name (reference pipeline.py:76).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mbconv_fused import _gelu_f32


def space_to_depth_q(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), q-major: channel = (2p+q)*C + c.

    Distinct from models/yolo/s2d.space_to_depth (c-major): quadrant
    planes here are contiguous lane groups, which is what the kernel's
    static lane slicing needs.
    """
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (B, h2, w2, p, q, C)
    return y.reshape(b, h // 2, w // 2, 4 * c)


def _merge_kernel(
    xc_ref, xt_ref, w1_ref, b1_ref, wd_ref, bd_ref, w3_ref, b3_ref,
    o_ref,
    *, h2: int, w2: int, wp2: int, e: int, compute_bf16: bool,
):
    cdt = xc_ref.dtype if compute_bf16 else jnp.float32
    ci4 = xc_ref.shape[3]

    xc = xc_ref[0]  # (h2, W2, 4ci) center strip (quarter-res rows)
    xt = xt_ref[0]  # (1, W2, 4ci) quarter-row above (clamped dup on strip 0)
    ext = jnp.concatenate([xt, xc], axis=0)  # (h2+1, W2, 4ci)
    # width pad in-kernel: +1 column left (stride-2 'same' reads only a
    # top/left halo), zeros right to the sublane multiple; padded positions
    # (and strip 0's clamped duplicate halo row) are re-masked after conv1
    zl = jnp.zeros((h2 + 1, 1, ci4), ext.dtype)
    zr = jnp.zeros((h2 + 1, wp2 - w2 - 1, ci4), ext.dtype)
    ext = jnp.concatenate([zl, ext, zr], axis=1)  # (h2+1, Wp2, 4ci)

    flat = ext.reshape((h2 + 1) * wp2, ext.shape[-1])
    h1 = (
        jax.lax.dot_general(
            flat, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[...]
    )
    h1 = _gelu_f32(h1.astype(cdt)).astype(xc.dtype).reshape(h2 + 1, wp2, 4 * e)

    # re-zero the expanded positions whose INPUT was spatial zero padding
    # (conv1's bias makes gelu(b1) != 0 there): the left halo column
    # always, the 8-alignment columns right of the data, and the top halo
    # row on the first strip only. No bottom/right halo exists.
    i = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wp2, 1), 1)
    col_ok = (col > 0) & (col < w2 + 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h2 + 1, 1, 1), 0)
    row_ok = (row > 0) | (i > 0)
    h1 = jnp.where(col_ok & row_ok, h1, jnp.zeros((), h1.dtype))

    # stride-2 depthwise 3x3 == 9 unit-shifted FMAs on the quadrant planes
    acc = jnp.broadcast_to(bd_ref[...].reshape(1, 1, e), (h2, w2, e)).astype(cdt)
    for dy in range(3):
        p, ro = (0, 1) if dy == 1 else (1, 1 if dy == 2 else 0)
        for dx in range(3):
            q, co_ = (0, 1) if dx == 1 else (1, 1 if dx == 2 else 0)
            pq = 2 * p + q
            acc = acc + (
                h1[ro : ro + h2, co_ : co_ + w2, pq * e : (pq + 1) * e]
                .astype(cdt)
                * wd_ref[dy, dx].astype(cdt)
            )
    h2act = _gelu_f32(acc).astype(xc.dtype)

    out = (
        jax.lax.dot_general(
            h2act.reshape(h2 * w2, e), w3_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b3_ref[...]
    )
    o_ref[0] = out.astype(xc.dtype).reshape(h2, w2, -1)


@functools.partial(jax.jit, static_argnames=("interpret", "compute"))
def patch_merge_block(
    x: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    wd: jnp.ndarray, bd: jnp.ndarray,
    w3: jnp.ndarray, b3: jnp.ndarray,
    interpret: bool = False,
    compute: str = "fp32",
) -> jnp.ndarray:
    """x (B, H, W, ci) -> conv3(gelu(dw3x3_s2(gelu(conv1(x))))) (B, H/2, W/2, co).

    w1 (ci, E) 1x1 expand, wd (3, 3, 1, E) depthwise HWIO, w3 (E, co) 1x1
    project; biases pre-folded BN. H, W must be even and W/2 a multiple
    of 8 (sublane-aligned flatten) — TinyViT merges run at S/4 and S/8.
    compute="bf16" as in ops/mbconv_fused.mbconv_block.
    """
    b, hgt, wid, ci = x.shape
    e = w1.shape[1]
    co = w3.shape[1]
    h2all, w2 = hgt // 2, wid // 2
    from . import mosaic_backend

    interpret = interpret or not mosaic_backend()

    xq = space_to_depth_q(x)  # (B, H/2, W/2, 4ci)
    wp2 = (w2 + 1 + 7) // 8 * 8

    # strip height (quarter-res rows): divisor of H/2, VMEM-bounded
    h2 = 1
    for cand in range(2, min(h2all, 33)):
        if h2all % cand == 0 and (cand + 1) * wp2 * (4 * e) * 6 <= 4_000_000:
            h2 = cand
    nh = h2all // h2

    # block-diagonal expand weight: lane group pq of conv1's output is the
    # expanded quadrant plane H_pq
    w1_bd = jnp.zeros((4 * ci, 4 * e), w1.dtype)
    for pq in range(4):
        w1_bd = w1_bd.at[pq * ci : (pq + 1) * ci, pq * e : (pq + 1) * e].set(w1)
    b1_bd = jnp.tile(b1.reshape(1, e), (1, 4))

    kernel = functools.partial(
        _merge_kernel, h2=h2, w2=w2, wp2=wp2, e=e,
        compute_bf16=(compute == "bf16" and x.dtype == jnp.bfloat16),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec((1, h2, w2, 4 * ci), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec(
                (1, 1, w2, 4 * ci),
                lambda bi, i, _h=h2: (bi, jnp.maximum(i * _h - 1, 0), 0, 0),
            ),
            pl.BlockSpec((4 * ci, 4 * e), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, 4 * e), lambda bi, i: (0, 0)),
            pl.BlockSpec((3, 3, e), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((1, e), lambda bi, i: (0, 0)),
            pl.BlockSpec((e, co), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, co), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h2, w2, co), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h2all, w2, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        xq,
        xq,
        w1_bd.astype(x.dtype),
        b1_bd.astype(jnp.float32),
        wd.reshape(3, 3, e).astype(jnp.float32),
        bd.reshape(1, e).astype(jnp.float32),
        w3.astype(x.dtype),
        b3.reshape(1, co).astype(jnp.float32),
    )
    return out
