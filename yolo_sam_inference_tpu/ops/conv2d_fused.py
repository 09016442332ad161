"""Dense KxK conv + bias + activation as one Pallas strip pass.

The fused pipeline's remaining XLA convolutions — the YOLO s2d path
(models/yolo/s2d.py), the native mid-stage YOLO convs (models/yolo/model.py),
and the TinyViT patch-embed/downsample/neck convs (models/sam/tinyvit.py) —
cost ~22 ms of the 164 ms MobileSAM B=128 iteration directly, and anchor
another ~9 ms of XLA-inserted relayout copies: convolution layout assignment
prefers batch-minor operands ({0,4,3,2,1}-style layouts) while every Mosaic
kernel requires the standard layout, so XLA pairs each conv with
batch-minor<->standard copies of the stage tensors (r3l trace,
BENCH_NOTES.md session 9).

This kernel replaces them with an im2row matmul formulation executed on
row strips held in VMEM. Everything is built around one Mosaic lowering
rule learned the hard way on device: tpu.concatenate rejects operands
whose NON-concat dims carry a layout offset, and every width shift —
whether a plain slice or a statically-folded tpu.rotate — produces a
sublane offset. So both kernels run on width-PAIR-MERGED views
((B, H, W, Ci) -> (B, H, W/2, 2Ci), a free row-major reshape done outside
the kernel), where all remaining shifts are either offset-free width
concats (zeros + from-zero slices), LANE rolls (offsets on the concat dim
are accepted), or rolls feeding matmuls directly (dot operands are
relayout-legal):

* each grid step loads an output strip's worth of input rows plus the
  one-row halos it needs (clamped BlockSpec index maps — boundary
  duplicates are re-masked to zero in-kernel, standing in for the 'same'
  padding);
* stride 1 computes even and odd output columns as two tap grids over the
  pair view (see _conv_s1_kernel) sharing the (k, k*Ci, Co) weights, and
  lane-concats the two results into a pair-merged output the wrapper
  un-merges for free;
* stride 2's taps are the pair blocks themselves: the 2c-1 tap is a width
  concat plus one lane roll, row pairs split via a major-dim reshape, and
  the contraction depth is 3Ci per row tap (optionally all 9 taps in one
  (rows*Wo, 9Ci) dot while Ci is small — the stems' case);
* tap assembly runs in fp32 (tpu.rotate supports 32-bit data only); one
  downcast feeds the MXU, accumulation stays fp32;
* bias and the activation (SiLU for YOLO, erf-GELU for TinyViT) fuse into
  the same pass — the separate elementwise fusions XLA ran on the conv
  outputs (1.6 ms of bias adds alone in the r3l trace) disappear.

1x1 convs take a plain jnp dot path (`conv1x1_act`): XLA lowers a dot with
standard layouts and fuses the bias+activation, so no Pallas is needed —
the point is only to stop emitting `convolution` ops.

Reference anchor: these convs implement the YOLOv8n backbone/head
(reference pipeline.py:72 loads the ultralytics checkpoint) and MobileSAM's
TinyViT stems/merges/neck (reference pipeline.py:76 swaps SAM variants by
checkpoint name); the reference runs both through cuDNN.

STATUS — the dense kernels measured NEGATIVE and are kept as an opt-in
(CONV2D_FUSED=1): the r3p device A/B put the dense pass at 499.6 vs 524.3
img/s (config 1) and 720.3 vs 781.6 (config 2). The strip kernels pass
parity but run ~30 ms/iter where XLA's convs take ~22 ms, and the
batch-minor relayout copies the pass was built to kill largely survive
(the unsupported-geometry fallback convs keep the layout anchors alive —
r3p trace, BENCH_NOTES.md session 10). The 1x1-dot-only middle ground IS
the default (CONV2D_FUSED=dot): r3q measured it at 525.4 (config 1) and
787.9 (config 2) against the all-XLA control's 524.3 / 781.6.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_ln import _erf_as

# Device A/B modes: "dot" (the DEFAULT — only the k==1 convs run as dots;
# no Pallas kernel, the point is just to stop emitting `convolution` ops:
# r3q measured 525.4 vs 524.3 img/s on config 1 and 787.9 vs 781.6 on
# config 2 against the all-XLA control), "1" (dense Pallas strip kernels
# everywhere — measured NEGATIVE, r3p: 499.6 / 720.3 on the same configs;
# XLA's conv emitter beats the strip kernels even after paying its
# batch-minor relayout copies, and the copies largely survive anyway
# because the unsupported-geometry fallback convs keep the layout anchors
# alive), "dotdense" (NO `convolution` op anywhere: k>1 dense convs unroll
# into k^2 strided slices + concat + ONE dot_general, depthwise convs into
# k^2 shift-multiply-accumulates — the r4 test of the VERDICT-r3 hypothesis
# that the ~9 ms batch-minor relayout bucket dies only when every conv
# layout anchor is gone; the im2row *kernel* family lost in r3p, this is
# the *dot-rewrite* family that won in r3q, extended to k>1), and "0" (XLA
# convs everywhere — the measured r3p/r3q control; see BENCH_NOTES.md
# session 10).
_MODE = os.environ.get("CONV2D_FUSED", "dot")

_VMEM_BUDGET = 5_000_000


def conv2d_fused_enabled(k: int = 1) -> bool:
    """True when :func:`conv2d_act` should replace the XLA conv for this k.

    Mode "1" enables every geometry (Pallas strip kernels); "dotdense"
    every k through the conv-free dot rewrites; "dot" only the k==1 dot
    path (no Pallas kernel — the point is just to stop emitting
    `convolution` ops); "0" none."""
    from . import mosaic_backend

    if _MODE == "0" or not mosaic_backend():
        return False
    return _MODE in ("1", "dotdense") or k == 1


def _apply_act(y: jnp.ndarray, act: str, fast_recip: bool = True) -> jnp.ndarray:
    """Activation on the fp32 accumulator. ``fast_recip=False`` for paths
    that may run outside Pallas on CPU (the approx-reciprocal primitive
    only lowers on TPU)."""
    if act == "silu":
        return y * jax.nn.sigmoid(y)
    if act == "gelu":
        return y * 0.5 * (1.0 + _erf_as(y * (2.0 ** -0.5), fast_recip=fast_recip))
    return y


def conv1x1_act(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, act: str) -> jnp.ndarray:
    """1x1 conv as a dot (w: (Ci, Co)); bias+act fuse into the dot consumer."""
    y = jax.lax.dot_general(
        x, w.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    return _apply_act(y, act).astype(x.dtype)


def _dense_pad(k: int, stride: int):
    """(pad_lo, pad_hi) per spatial dim for the pipeline's conv geometries:
    k=3 is 'same' (1, 1); k=2 is the s2d native-out downsample's (1, 0)
    (models/yolo/s2d.py _block_geometry)."""
    if k == 3:
        return 1, 1
    if k == 2:
        return 1, 0
    return 0, 0


def conv_unrolled_dot(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
    k: int, stride: int, act: str,
) -> jnp.ndarray:
    """Dense KxK conv as k^2 strided slices + channel concat + ONE dot.

    Emits zero `convolution` ops: tap (dh, dw) of the im2row is a strided
    slice of the padded input, the k^2 taps concatenate on channels in
    (dh, dw)-major order — exactly the flattening of the HWIO weight's
    leading dims — and one ``dot_general`` against ``w.reshape(k*k*Ci,
    Co)`` contracts them all. XLA lowers slices/concat/dot with standard
    layouts (no batch-minor conv layout anchor) and fuses bias+act into
    the dot consumer. The concat materializes k^2 x the input bytes; at
    the stem/downsample shapes this is a few MB per image — HBM traffic
    the conv pays anyway via its window reads.
    """
    bsz, h, wid, ci = x.shape
    co = w.shape[-1]
    pl_, ph_ = _dense_pad(k, stride)
    xp = jnp.pad(x, ((0, 0), (pl_, ph_), (pl_, ph_), (0, 0)))
    hp, wp = h + pl_ + ph_, wid + pl_ + ph_
    ho = (hp - k) // stride + 1
    wo = (wp - k) // stride + 1
    taps = [
        jax.lax.slice(
            xp,
            (0, dh, dw, 0),
            (bsz, dh + (ho - 1) * stride + 1, dw + (wo - 1) * stride + 1, ci),
            (1, stride, stride, 1),
        )
        for dh in range(k)
        for dw in range(k)
    ]
    cat = jnp.concatenate(taps, axis=-1)  # (B, Ho, Wo, k*k*Ci)
    y = jax.lax.dot_general(
        cat, w.astype(x.dtype).reshape(k * k * ci, co),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    from . import mosaic_backend

    return _apply_act(y, act, fast_recip=mosaic_backend()).astype(x.dtype)


def dwconv_unrolled(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
    k: int, stride: int, act: str = "none",
) -> jnp.ndarray:
    """Depthwise KxK conv as k^2 shift-multiply-accumulates (no conv op).

    ``w``: (k, k, 1, C) HWIO depthwise weights. Each tap is a strided slice
    scaled by its per-channel weight row — pure elementwise VPU work that
    XLA fuses into one pass; like :func:`conv_unrolled_dot` this removes
    the grouped-conv layout anchor from the program.
    """
    bsz, h, wid, c = x.shape
    pl_, ph_ = _dense_pad(k, stride)
    xp = jnp.pad(x, ((0, 0), (pl_, ph_), (pl_, ph_), (0, 0)))
    hp, wp = h + pl_ + ph_, wid + pl_ + ph_
    ho = (hp - k) // stride + 1
    wo = (wp - k) // stride + 1
    acc = None
    for dh in range(k):
        for dw in range(k):
            tap = jax.lax.slice(
                xp,
                (0, dh, dw, 0),
                (bsz, dh + (ho - 1) * stride + 1, dw + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1),
            ).astype(jnp.float32)
            term = tap * w[dh, dw, 0].astype(jnp.float32)
            acc = term if acc is None else acc + term
    y = acc + b.astype(jnp.float32)
    from . import mosaic_backend

    return _apply_act(y, act, fast_recip=mosaic_backend()).astype(x.dtype)


def dwconv_unrolled_enabled() -> bool:
    """True when depthwise convs should route through
    :func:`dwconv_unrolled` (mode "dotdense" only)."""
    from . import mosaic_backend

    return _MODE == "dotdense" and mosaic_backend()


def _dot2d(lhs, w2):
    return jax.lax.dot_general(
        lhs, w2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _conv_s1_kernel(
    *refs, k: int, ho: int, nh: int, w: int, act: str,
):
    """Stride-1 conv on width-pair-merged refs (rows, W/2, 2Ci).

    Mosaic's concatenate rejects operands whose NON-concat dims carry a
    layout offset, and every width shift (plain slice or folded static
    rotate) produces a sublane offset — so no width-shifted tensor may feed
    a concat. Instead, even and odd output columns are computed as two tap
    grids in the pair-merged view (the stride-2 kernel's proven pattern):

      even col 2p   reads [pair p-1 odd | pair p]: an offset-free width
                    concat (zeros + from-zero slice) plus a LANE roll
                    (offsets on the concat dim are accepted);
      odd  col 2p+1 reads [pair p | pair p+1 even]: the 'pair p' block is
                    rows itself; the 'next pair, even half' block never
                    touches a concat — it is a roll of the FLATTENED
                    (ho*Wo, 2Ci) row tap fed straight into its own matmul
                    (dot operands with offset layouts are relayout-legal),
                    with the wrapped row-boundary positions re-masked to
                    the 'same'-padding zeros.

    Both grids share the (k, k*Ci, Co) weights; their results lane-concat
    into one pair-merged output (B, H, W/2, 2Co) that the wrapper reshapes
    back for free. Tap assembly runs in fp32 (tpu.rotate is 32-bit-only);
    one downcast feeds the MXU."""
    if k == 3:
        xc_ref, xt_ref, xb_ref, w_ref, b_ref, o_ref = refs
    else:  # k == 2 has no bottom halo (pad (1, 0))
        xc_ref, xt_ref, w_ref, b_ref, o_ref = refs
    ci = xc_ref.shape[3] // 2
    co = w_ref.shape[-1]
    wo = w // 2
    mdt = w_ref.dtype
    parts = [xt_ref[0], xc_ref[0]]
    if k == 3:
        parts.append(xb_ref[0])
    rows = jnp.concatenate(parts, axis=0).astype(jnp.float32)  # (R, Wo, 2Ci)
    r = ho + k - 1

    # zero the clamped halo rows at the image boundary (they hold duplicate
    # data; 'same' padding needs zeros there)
    i = pl.program_id(1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
    ok = (ridx > 0) | (i > 0)
    if k == 3:
        ok = ok & ((ridx < ho + 1) | (i < nh - 1))
    rows = jnp.where(ok, rows, jnp.zeros((), rows.dtype))

    zpair = jnp.zeros((r, 1, 2 * ci), rows.dtype)
    prev = jnp.concatenate([zpair, rows[:, : wo - 1, :]], axis=1)  # pair p-1
    prev_odd = pltpu.roll(prev, ci, 2)[..., :ci]
    if k == 3:
        cat_e = jnp.concatenate([prev_odd, rows], axis=-1)  # (R, Wo, 3Ci)
    else:
        cat_e = jnp.concatenate([prev_odd, rows[..., :ci]], axis=-1)
    cat_e = cat_e.astype(mdt)

    # odd-column 'next pair, even half' mask: after the flat left-roll,
    # the last column of each row wrapped in the next row's first pair —
    # those positions are the W+1 'same' zero pad
    cmask = (
        jax.lax.broadcasted_iota(jnp.int32, (ho * wo, 1), 0) % wo != wo - 1
    ).astype(jnp.float32)

    acc_e = None
    acc_o = None
    for dh in range(k):
        we = w_ref[dh]  # (k*Ci, Co): width-tap-major blocks
        flat32 = rows[dh : dh + ho].reshape(ho * wo, 2 * ci)  # fp32 for roll
        e = _dot2d(cat_e[dh : dh + ho].reshape(ho * wo, cat_e.shape[-1]), we)
        if k == 3:
            # odd col 2p+1: [pair p] carries taps dw=0,1; [next pair, even
            # half] carries dw=2
            o = _dot2d(flat32.astype(mdt), we[: 2 * ci])
            nxt = pltpu.roll(flat32, ho * wo - 1, 0) * cmask
            o = o + _dot2d(nxt[:, :ci].astype(mdt), we[2 * ci :])
        else:
            o = _dot2d(flat32.astype(mdt), we)
        acc_e = e if acc_e is None else acc_e + e
        acc_o = o if acc_o is None else acc_o + o

    acc_e = _apply_act(acc_e + b_ref[...], act)
    acc_o = _apply_act(acc_o + b_ref[...], act)
    out = jnp.concatenate(
        [
            acc_e.astype(o_ref.dtype).reshape(ho, wo, co),
            acc_o.astype(o_ref.dtype).reshape(ho, wo, co),
        ],
        axis=-1,
    )
    o_ref[0] = out


def _conv_s2_kernel(
    xc_ref, xt_ref, w_ref, b_ref, o_ref,
    *, ho: int, w: int, full: bool, act: str,
):
    # the wrapper pre-merges width pairs into lanes (a free row-major
    # reshape outside the kernel): input col 2c+s -> (pair c, channel
    # block s), so refs arrive as (rows, W/2, 2Ci)
    ci = xc_ref.shape[3] // 2
    co = w_ref.shape[-1]
    wo = w // 2
    mdt = w_ref.dtype
    # fp32 assembly (32-bit rotate requirement); downcast once per tap
    x2 = jnp.concatenate([xt_ref[0], xc_ref[0]], axis=0).astype(jnp.float32)

    i = pl.program_id(1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (2 * ho + 1, 1, 1), 0)
    x2 = jnp.where((ridx > 0) | (i > 0), x2, jnp.zeros((), x2.dtype))

    # input col 2c-1 = (pair c-1, odd slot): shift pairs right by one with
    # offset-free operands, then lane-roll the odd block to the front
    x2shift = jnp.concatenate(
        [jnp.zeros((2 * ho + 1, 1, 2 * ci), x2.dtype), x2[:, : wo - 1, :]], axis=1
    )
    prev_odd = pltpu.roll(x2shift, ci, 2)[..., :ci]
    cat = jnp.concatenate([prev_odd, x2], axis=-1).astype(mdt)  # (2ho+1, Wo, 3Ci)

    # row pairs merge into a major dim: local input row j = 2*dr + dh
    ext2 = jnp.concatenate(
        [cat, jnp.zeros((1, wo, 3 * ci), cat.dtype)], axis=0
    ).reshape(ho + 1, 2, wo, 3 * ci)
    taps = (ext2[0:ho, 0], ext2[0:ho, 1], ext2[1 : ho + 1, 0])
    if full:
        full_cat = jnp.concatenate(taps, axis=-1).reshape(ho * wo, 9 * ci)
        acc = jax.lax.dot_general(
            full_cat, w_ref[...].reshape(9 * ci, co),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc = jax.lax.dot_general(
            taps[0].reshape(ho * wo, 3 * ci), w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for dh in (1, 2):
            acc = acc + jax.lax.dot_general(
                taps[dh].reshape(ho * wo, 3 * ci), w_ref[dh],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = _apply_act(acc + b_ref[...], act)
    o_ref[0] = acc.astype(o_ref.dtype).reshape(ho, wo, co)


def conv2d_supported(
    x_shape, k: int, stride: int, k2_s2d: bool = False
) -> bool:
    """Geometry gate for :func:`conv2d_act` (callers fall back to XLA).

    Both kernels run on width-pair-merged views, so W % 16 (Wo % 8 for the
    sublane-aligned flatten) and an even Ci (the lane roll that extracts a
    pair's odd half) are required for k > 1.

    ``k2_s2d``: k=2 convs here always use the s2d transform's (1, 0)
    padding (:func:`_dense_pad`), NOT XLA's 'same' (1, 1) — a non-s2d
    caller would silently get a different window geometry (ADVICE r4), so
    k=2 is only supported when the caller declares the s2d contract."""
    _, h, w, ci = x_shape
    if k == 1 and stride == 1:
        return True
    if k == 2 and not k2_s2d:
        return False
    if k not in (2, 3) or stride not in (1, 2):
        return False
    if _MODE == "dotdense":
        # the dot rewrite has no width/channel alignment requirements, but
        # its k=3 stride-2 'same' padding (1, 1) only agrees with the s2d
        # path's (pad_lo=1, pad_hi=0) geometry when the spatial dims are
        # even (identical window set; odd sizes diverge on the last row)
        return stride == 1 or (k == 3 and h % 2 == 0 and w % 2 == 0)
    if ci % 2 or w % 16 or w < 16:
        return False
    if stride == 2:
        return k == 3 and h % 2 == 0
    return True


def _pick_ho(hout: int, per_row_bytes: int) -> int:
    ho = 1
    for cand in range(2, min(hout, 65)):
        if hout % cand == 0 and cand * per_row_bytes <= _VMEM_BUDGET:
            ho = cand
    return ho


@functools.partial(
    jax.jit, static_argnames=("k", "stride", "act", "interpret")
)
def conv2d_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    k: int = 3,
    stride: int = 1,
    act: str = "none",
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, H, W, Ci), w (k, k, Ci, Co) HWIO, b (Co,) -> act(conv(x) + b).

    Padding follows the pipeline's two geometries: k=3 is 'same' (pad 1);
    k=2 pads (1, 0) — the s2d transform's native-out downsample
    (models/yolo/s2d.py _block_geometry). k > 1 requires W % 16 == 0 and an
    even Ci (both kernels run on width-pair-merged views — see
    conv2d_supported); stride=2 supports k=3 only. act in {"none", "silu",
    "gelu"}; the GELU is the kernel-shared rational erf (ops/fused_ln.py,
    |err| <= 3.4e-5).
    """
    bsz, h, wid, ci = x.shape
    co = w.shape[-1]
    assert w.shape[:3] == (k, k, ci), (w.shape, k, ci)
    # k2_s2d=True here: this function's k=2 IS the s2d (1, 0)-padding
    # contract (docstring) — the caller-side conv2d_supported gate is where
    # a non-s2d k=2 must be declared (and thereby fall back to XLA)
    if not conv2d_supported(x.shape, k, stride, k2_s2d=True):
        raise ValueError(f"unsupported conv2d_act geometry {x.shape} k={k} s={stride}")
    if k == 1 and stride == 1:
        return conv1x1_act(x, w[0, 0], b, act)
    if _MODE == "dotdense":
        return conv_unrolled_dot(x, w, b, k, stride, act)
    from . import mosaic_backend

    interpret = interpret or not mosaic_backend()
    isz = jnp.dtype(x.dtype).itemsize
    full = k * ci <= 128  # one big dot only while the im2row stays thin

    xp = x.reshape(bsz, h, wid // 2, 2 * ci)  # pair-merged view: same bytes
    if stride == 1:
        hout = h
        # fp32 rows + fp32 prev/cat_e + downcast cat/flat/nxt + fp32 accs
        # + out, per output row
        prb = wid * (ci * (8 + isz * (k + 2)) + co * (8 + isz))
        ho = _pick_ho(hout, prb)
        nh = hout // ho
        kernel = functools.partial(
            _conv_s1_kernel, k=k, ho=ho, nh=nh, w=wid, act=act,
        )
        in_specs = [
            pl.BlockSpec((1, ho, wid // 2, 2 * ci), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec(
                (1, 1, wid // 2, 2 * ci),
                lambda bi, i, _ho=ho: (bi, jnp.maximum(i * _ho - 1, 0), 0, 0),
            ),
        ]
        operands = [xp, xp]
        if k == 3:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, wid // 2, 2 * ci),
                    lambda bi, i, _ho=ho, _hi=h - 1: (
                        bi, jnp.minimum(i * _ho + _ho, _hi), 0, 0,
                    ),
                )
            )
            operands.append(xp)
        out_w, out_c = wid // 2, 2 * co  # pair-merged output
    else:
        hout = h // 2
        prb = wid * (
            ci * (4 * 6 + isz * 3 + (isz * 9 if full else 0)) + co * (4 + isz)
        ) // 2 + 2 * wid * ci * isz
        ho = _pick_ho(hout, prb)
        nh = hout // ho
        kernel = functools.partial(
            _conv_s2_kernel, ho=ho, w=wid, full=full, act=act,
        )
        in_specs = [
            pl.BlockSpec((1, 2 * ho, wid // 2, 2 * ci), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec(
                (1, 1, wid // 2, 2 * ci),
                lambda bi, i, _ho=ho: (bi, jnp.maximum(2 * i * _ho - 1, 0), 0, 0),
            ),
        ]
        operands = [xp, xp]
        out_w, out_c = wid // 2, co

    mdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    in_specs += [
        pl.BlockSpec((k, k * ci, co), lambda bi, i: (0, 0, 0)),
        pl.BlockSpec((1, co), lambda bi, i: (0, 0)),
    ]
    operands += [
        w.astype(mdt).reshape(k, k * ci, co),
        b.reshape(1, co).astype(jnp.float32),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ho, out_w, out_c), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, hout, out_w, out_c), mdt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    if stride == 1:
        out = out.reshape(bsz, hout, wid, co)  # un-merge the pair layout
    return out
