"""Pallas TPU fused residual-add + LayerNorm.

XLA lowers the ViT encoder's LayerNorms as separate convert+reduce fusions
and the residual adds as their own elementwise fusions; at SAM-ViT-B bench
shape that measured ~37 ms/iter of the ~153 ms device time — ~7x off HBM
speed-of-light for the bytes involved. This kernel streams row blocks once:
reads x (+ optional residual), writes the residual sum and its LayerNorm in
one pass, with the statistics accumulated in fp32 and the elementwise math
kept in the activation dtype.

Replaces the ``_layer_norm`` + ``+`` pairs in the SAM ViT encoder
(models/sam/model.py) on TPU; CPU/tests keep the jnp path (interpret mode
covers kernel parity).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_rows(y, scale, bias, eps):
    """LayerNorm over the minor axis of a (bm, C) tile; fp32 statistics."""
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    d = yf - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (d * inv).astype(y.dtype) * scale + bias


def _add_ln_kernel(x_ref, r_ref, s_ref, b_ref, y_ref, ln_ref, *, eps: float):
    y = x_ref[...] + r_ref[...]
    y_ref[...] = y
    ln_ref[...] = _ln_rows(y, s_ref[...], b_ref[...], eps)


def _ln_kernel(x_ref, s_ref, b_ref, ln_ref, *, eps: float):
    ln_ref[...] = _ln_rows(x_ref[...], s_ref[...], b_ref[...], eps)


def _pick_bm(m: int, c: int, budget_rows: int = 512) -> int:
    """Largest divisor of m within the row budget (keeps blocks VMEM-sized)."""
    bm = min(m, budget_rows)
    while m % bm:
        bm -= 1
    return bm


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_add_ln(x, res, scale, bias, eps: float = 1e-6, interpret: bool = False):
    """(y, ln) with y = x + res and ln = LayerNorm(y) * scale + bias.

    x, res: (..., C); scale, bias: (C,). One HBM pass instead of three.
    """
    orig_shape = x.shape
    c = x.shape[-1]
    m = x.size // c
    x2 = x.reshape(m, c)
    r2 = res.reshape(m, c)
    bm = _pick_bm(m, c)
    grid = (m // bm,)
    y, ln = pl.pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, c), x.dtype),
            jax.ShapeDtypeStruct((m, c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, r2, scale.reshape(1, c).astype(x.dtype), bias.reshape(1, c).astype(x.dtype))
    return y.reshape(orig_shape), ln.reshape(orig_shape)


# SAM_ERF_AS=1 restores the Abramowitz-Stegun erf (exp-based, |err|<=1.5e-7)
# in every GELU-carrying kernel; default is the exp-free rational below.
_USE_AS_ERF = os.environ.get("SAM_ERF_AS", "0") == "1"
# SAM_ERF_RECIP=0 disables the approx-reciprocal P/Q divide inside kernels
# (falls back to the exact fp32 divide); device A/B kill switch.
_USE_FAST_RECIP = os.environ.get("SAM_ERF_RECIP", "1") == "1"


def _erf_as(x, fast_recip: bool = False):
    """erf approximation for the kernel GELUs, fp32-evaluated.

    Default: odd rational  erf(x) ~ clip(y * P3(y^2) / Q3(y^2), -1, 1)
    with y = x (callers pass x/sqrt2), minimax-fitted on |y| <= 6 with
    all-positive coefficients (stable fp32 Horner, saturating tail).
    Max |erf err| 3.4e-5 => max abs GELU err ~9.3e-5 — two orders below
    bf16 activation rounding, so invisible in the production bf16 path;
    fused-vs-plain CPU tests bound it at fp32. Unlike Abramowitz-Stegun
    7.1.26 (SAM_ERF_AS=1 fallback, |err| <= 1.5e-7) it needs no exp and
    no reciprocal-of-affine — 7 FMAs + 1 divide + clamp — which matters
    because the GELU stretch is the VPU bottleneck of the conv/MLP
    kernels (ops/mbconv_fused.py, _mlp_rows below).

    Always evaluated in fp32 (result cast back to the input dtype): the
    polynomials are useless at bf16 precision, and Mosaic cannot lower
    packed-bf16 vector compares on v5e ("Target does not support this
    comparison"), so a bf16-compute caller (BENCH_TV_BF16) would fail to
    compile.
    """
    xf = x.astype(jnp.float32)
    if _USE_AS_ERF:
        sign = jnp.sign(xf)
        ax = jnp.abs(xf)
        t = 1.0 / (1.0 + 0.3275911 * ax)
        poly = t * (
            0.254829592
            + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
        )
        return (sign * (1.0 - poly * jnp.exp(-ax * ax))).astype(x.dtype)
    u = xf * xf
    # note: fitted for erf(x/sqrt2) in x; callers pass x/sqrt2, so fold the
    # 1/sqrt2 scaling into the u/x coefficients: erf(y) with y = x/sqrt2
    # => u' = 2*u, y*c = xf*c/sqrt2 — coefficients below are pre-folded
    p = 7.9773798e-01 + u * (1.3141873e-01 + u * (2.8835702e-02 + u * 3.9488860e-04))
    q = 1.0 + u * (4.9692304e-01 + u * (1.0365437e-01 + u * 7.7713679e-03))
    if fast_recip and _USE_FAST_RECIP:
        # Pallas-kernel-only path (pl.reciprocal has no out-of-kernel eval
        # rule): VPU approx reciprocal + one Newton step instead of the
        # exact divide. err(recip) ~2^-12 squared by Newton => ~1e-6 rel on
        # P/Q, invisible under the 3.4e-5 fit error. Kernel-isolated
        # microbench: 15.05 -> 12.57 ms per stage-0 MBConv block
        # (tools/micro_ln_mlp.py mbconv).
        r = pl.reciprocal(q, approx=True)
        ratio = p * (r * (2.0 - q * r))
    else:
        ratio = p / q
    return jnp.clip(xf * 1.4142135623730951 * ratio, -1.0, 1.0).astype(x.dtype)


def _mlp_rows(ln, w1_ref, b1_ref, w2_ref, b2_ref, act_dtype):
    """fp32 mlp2(gelu(mlp1(ln))) + b2 over a (rows, C) tile, both weights
    VMEM-resident. Split along the hidden dim so the gelu (VPU) of one
    chunk can overlap the next chunk's matmuls (MXU) in Mosaic's schedule
    — the three ops are otherwise a serial dependency chain. erf-GELU via
    the shared kernel erf above (_erf_as: rational + fast recip by default;
    Pallas TPU has no erf primitive). fp32 throughout: a bf16 polynomial
    measured ~5% relative error. Shared by the resident block-tail kernel
    below and the TinyViT dw+LN+MLP kernel (ops/dw_ln_mlp.py)."""
    hidden = w1_ref.shape[-1]
    chunks = 4 if hidden % 4 == 0 else 1
    ch = hidden // chunks
    out = b2_ref[...]
    for i in range(chunks):
        h = (
            jax.lax.dot_general(
                ln, w1_ref[:, i * ch : (i + 1) * ch],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b1_ref[:, i * ch : (i + 1) * ch]
        )
        h = h * 0.5 * (1.0 + _erf_as(h * (2.0 ** -0.5), fast_recip=True))
        h = h.astype(act_dtype)
        out = out + jax.lax.dot_general(
            h, w2_ref[i * ch : (i + 1) * ch, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return out


def _ln_mlp_kernel(
    x_ref, *refs, eps: float, with_attn: bool = True,
):
    """out = (x + a) + mlp(LayerNorm(x + a)) — the transformer-block tail in
    one pass; the (bm, hidden) activation lives only in VMEM. With
    ``with_attn=False`` (no attention-residual operand, e.g. the TinyViT
    tail) computes x + mlp(LayerNorm(x))."""
    if with_attn:
        a_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref = refs
        y = x_ref[...] + a_ref[...]
    else:
        s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref = refs
        y = x_ref[...]
    ln = _ln_rows(y, s_ref[...], b_ref[...], eps)
    out = _mlp_rows(ln, w1_ref, b1_ref, w2_ref, b2_ref, y.dtype)
    o_ref[...] = y + out.astype(y.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def fused_ln_mlp(
    x, attn, scale, bias, w1, b1, w2, b2,
    eps: float = 1e-6,
    block_rows: int = 256,
    interpret: bool = False,
):
    """Fused transformer-block tail:
    ``(x + attn) + mlp2(gelu(mlp1(LayerNorm(x + attn))))``.

    Both MLP weight matrices stay resident in VMEM (use only when
    2*(C*hidden) fits, e.g. ViT-B: 9 MB bf16) and the (rows, hidden)
    activation never touches HBM — replacing ~670 MB/layer of XLA traffic
    (add + LN + two batched dots + gelu round-trips) with 96 MB read +
    48 MB write at bench shape. ``attn=None`` computes x + mlp(LN(x))
    (no attention-residual operand — the TinyViT block tail).
    """
    orig_shape = x.shape
    c = x.shape[-1]
    hidden = w1.shape[-1]
    m = x.size // c
    bm = _pick_bm(m, c, block_rows)
    x2 = x.reshape(m, c)
    grid = (m // bm,)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    attn_spec = [pl.BlockSpec((bm, c), row)] if attn is not None else []
    attn_arg = [attn.reshape(m, c)] if attn is not None else []
    out = pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps, with_attn=attn is not None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), row),
            *attn_spec,
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((c, hidden), full),
            pl.BlockSpec((1, hidden), full),
            pl.BlockSpec((hidden, c), full),
            pl.BlockSpec((1, c), full),
        ],
        out_specs=pl.BlockSpec((bm, c), row),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x2,
        *attn_arg,
        scale.reshape(1, c).astype(x.dtype),
        bias.reshape(1, c).astype(x.dtype),
        w1.astype(x.dtype),
        b1.reshape(1, hidden).astype(jnp.float32),
        w2.astype(x.dtype),
        b2.reshape(1, c).astype(jnp.float32),
    )
    return out.reshape(orig_shape)


def _ln_mlp_tiled_kernel(
    x_ref, a_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref, ln_ref, y_ref, acc_ref,
    *, eps: float, nk: int,
):
    """Weight-tiled block tail: grid (row blocks, hidden tiles); the output
    block is revisited across the (innermost, sequential) tile dimension.
    LN and the residual sum are computed once per row block (tile 0) and
    stay in VMEM scratch; the fp32 partial-sum accumulator too, so the
    numerics match the resident-weight kernel (one fp32 sum, one downcast)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        y = x_ref[...] + a_ref[...]
        y_ref[...] = y
        ln_ref[...] = _ln_rows(y, s_ref[...], b_ref[...], eps)
        acc_ref[...] = jnp.broadcast_to(b2_ref[...], acc_ref.shape)

    h = (
        jax.lax.dot_general(
            ln_ref[...], w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[...]
    )
    h = h * 0.5 * (1.0 + _erf_as(h * (2.0 ** -0.5), fast_recip=True))
    h = h.astype(y_ref.dtype)
    acc_ref[...] += jax.lax.dot_general(
        h, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = y_ref[...] + acc_ref[...].astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def fused_ln_mlp_tiled(
    x, attn, scale, bias, w1, b1, w2, b2,
    eps: float = 1e-6,
    block_rows: int = 256,
    interpret: bool = False,
):
    """``(x + attn) + mlp2(gelu(mlp1(LayerNorm(x + attn))))`` for models
    whose MLP weights exceed the VMEM-resident budget of
    :func:`fused_ln_mlp` (ViT-L: 1024x4096 bf16 x2 = 16.7 MB; ViT-H
    1280x5120 = 26 MB).

    The hidden dimension is tiled over the innermost grid dimension:
    weight tiles stream through VMEM (double-buffered by the Pallas
    pipeline) while the (rows, hidden-tile) activation never touches HBM —
    XLA's unfused lowering round-trips the full (rows, hidden) GELU
    activation (ViT-L bench shape: 268 MB per direction per layer).
    """
    orig_shape = x.shape
    c = x.shape[-1]
    hidden = w1.shape[-1]
    m = x.size // c
    bm = _pick_bm(m, c, block_rows)
    # hidden tile: largest divisor of hidden keeping a double-buffered
    # (C, ht) + (ht, C) tile pair + the row-block scratch under ~10 MB
    ht = hidden
    while ht > 128 and (4 * c * ht * x.dtype.itemsize + bm * c * 8) > 10_000_000:
        nxt = ht // 2
        while hidden % nxt and nxt > 128:
            nxt -= 1
        if nxt == ht or hidden % nxt:
            break
        ht = nxt
    nk = hidden // ht
    x2 = x.reshape(m, c)
    a2 = attn.reshape(m, c)
    grid = (m // bm, nk)
    row = lambda i, k: (i, 0)
    full = lambda i, k: (0, 0)
    out = pl.pallas_call(
        functools.partial(_ln_mlp_tiled_kernel, eps=eps, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), row),
            pl.BlockSpec((bm, c), row),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((c, ht), lambda i, k: (0, k)),
            pl.BlockSpec((1, ht), lambda i, k: (0, k)),
            pl.BlockSpec((ht, c), lambda i, k: (k, 0)),
            pl.BlockSpec((1, c), full),
        ],
        out_specs=pl.BlockSpec((bm, c), row),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, c), x.dtype),      # ln rows
            pltpu.VMEM((bm, c), x.dtype),      # residual sum y
            pltpu.VMEM((bm, c), jnp.float32),  # fp32 partial-sum accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x2,
        a2,
        scale.reshape(1, c).astype(x.dtype),
        bias.reshape(1, c).astype(x.dtype),
        w1.astype(x.dtype),
        b1.reshape(1, hidden).astype(jnp.float32),
        w2.astype(x.dtype),
        b2.reshape(1, c).astype(jnp.float32),
    )
    return out.reshape(orig_shape)


def _quant_rows(xf):
    """Symmetric per-row dynamic int8 quantization of an fp32 (rows, k) tile.

    Returns ``(xq int8, scale fp32 (rows, 1))`` with ``xf ~= xq * scale``;
    the same scheme as ops/quant.py:int8_linear's activation side (jnp.round
    = round-half-to-even on both paths, so kernel and XLA oracle agree
    bit-for-bit on the quantized integers)."""
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def _int8_mlp_rows(ln, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref, b2_ref):
    """w8a8 mlp2(gelu(mlp1(ln))) over a (rows, C) fp32 tile; both int8
    weights VMEM-resident. Matches ops/quant.py's dynamic-quant scheme per
    matmul: int8 x int8 -> int32 contraction (the MXU's 2x-rate path) with
    per-row activation x per-column weight fp32 dequant epilogues. The
    hidden dim runs in chunks so each chunk's VPU work (gelu + requantize)
    overlaps the next chunk's MXU dots; per-chunk activation scales are a
    refinement of the unfused path's per-row scale (each hidden chunk gets
    its own amax), accuracy-neutral-or-better."""
    hidden = w1q_ref.shape[-1]
    chunks = 4 if hidden % 4 == 0 else 1
    ch = hidden // chunks
    xq, xs = _quant_rows(ln)
    out = jnp.broadcast_to(b2_ref[...], (ln.shape[0], b2_ref.shape[-1])).astype(jnp.float32)
    for i in range(chunks):
        sl = slice(i * ch, (i + 1) * ch)
        acc = jax.lax.dot_general(
            xq, w1q_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = acc.astype(jnp.float32) * (xs * w1s_ref[:, sl]) + b1_ref[:, sl]
        h = h * 0.5 * (1.0 + _erf_as(h * (2.0 ** -0.5), fast_recip=True))
        hq, hs = _quant_rows(h)
        acc2 = jax.lax.dot_general(
            hq, w2q_ref[sl, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = out + acc2.astype(jnp.float32) * (hs * w2s_ref[...])
    return out


def _ln_mlp_int8_kernel(x_ref, *refs, eps: float, with_attn: bool = True):
    """out = (x + a) + int8_mlp(LayerNorm(x + a)) — the w8a8 block tail in
    one pass (see :func:`fused_ln_mlp_int8`)."""
    if with_attn:
        a_ref, s_ref, b_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref, b2_ref, o_ref = refs
        y = x_ref[...] + a_ref[...]
    else:
        s_ref, b_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref, b2_ref, o_ref = refs
        y = x_ref[...]
    ln = _ln_rows(y, s_ref[...], b_ref[...], eps).astype(jnp.float32)
    out = _int8_mlp_rows(ln, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref, b2_ref)
    o_ref[...] = y + out.astype(y.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def fused_ln_mlp_int8(
    x, attn, scale, bias, w1q, w1s, b1, w2q, w2s, b2,
    eps: float = 1e-6,
    block_rows: int = 256,
    interpret: bool = False,
):
    """Fused w8a8 transformer-block tail:
    ``(x + attn) + int8_mlp2(gelu(int8_mlp1(LayerNorm(x + attn))))``.

    The int8 weights halve the VMEM-residency budget of
    :func:`fused_ln_mlp` — ViT-B (768x3072 x2 = 4.7 MB) *and* ViT-L
    (1024x4096 x2 = 8.4 MB) fit — and the int8 x int8 contractions run at
    2x the bf16 MXU rate on v5e (ops/quant.py module docstring). vs the
    unfused XLA int8 path (quant.py:int8_linear) this keeps the (rows,
    hidden) activation, its quantized copy, and the LN out of HBM entirely.
    Weights come pre-quantized from quantize_linear_params (wq/wscale).
    ``attn=None`` computes x + int8_mlp(LN(x)).
    """
    orig_shape = x.shape
    c = x.shape[-1]
    hidden = w1q.shape[-1]
    m = x.size // c
    bm = _pick_bm(m, c, block_rows)
    x2 = x.reshape(m, c)
    grid = (m // bm,)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    attn_spec = [pl.BlockSpec((bm, c), row)] if attn is not None else []
    attn_arg = [attn.reshape(m, c)] if attn is not None else []
    out = pl.pallas_call(
        functools.partial(_ln_mlp_int8_kernel, eps=eps, with_attn=attn is not None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), row),
            *attn_spec,
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((c, hidden), full),
            pl.BlockSpec((1, hidden), full),
            pl.BlockSpec((1, hidden), full),
            pl.BlockSpec((hidden, c), full),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((1, c), full),
        ],
        out_specs=pl.BlockSpec((bm, c), row),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x2,
        *attn_arg,
        scale.reshape(1, c).astype(x.dtype),
        bias.reshape(1, c).astype(x.dtype),
        w1q,
        w1s.reshape(1, hidden).astype(jnp.float32),
        b1.reshape(1, hidden).astype(jnp.float32),
        w2q,
        w2s.reshape(1, c).astype(jnp.float32),
        b2.reshape(1, c).astype(jnp.float32),
    )
    return out.reshape(orig_shape)


def _ln_mlp_tiled_int8_kernel(
    x_ref, a_ref, s_ref, b_ref, w1q_ref, w1s_ref, b1_ref,
    w2q_ref, w2s_ref, b2_ref, o_ref, acc_ref,
    *, eps: float, nk: int,
):
    """Weight-tiled w8a8 block tail: grid (row blocks, hidden tiles), int8
    weight tiles streaming through VMEM, fp32 partial-sum accumulator in
    scratch. LN + activation quantization are *recomputed* per tile step
    (identical inputs => identical integers) instead of held in scratch:
    the recompute is cheap VPU work against the tile's two MXU
    contractions, and it keeps the scratch footprint to the one proven
    (bm, C) fp32 accumulator shape the bf16 tiled kernel already uses.
    Per-hidden-tile activation scales play the role of the resident
    kernel's per-chunk scales (oracle: chunks = nk)."""
    k = pl.program_id(1)
    y = x_ref[...] + a_ref[...]
    ln = _ln_rows(y, s_ref[...], b_ref[...], eps).astype(jnp.float32)
    xq, xs = _quant_rows(ln)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.broadcast_to(b2_ref[...], acc_ref.shape)

    acc1 = jax.lax.dot_general(
        xq, w1q_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = acc1.astype(jnp.float32) * (xs * w1s_ref[...]) + b1_ref[...]
    h = h * 0.5 * (1.0 + _erf_as(h * (2.0 ** -0.5), fast_recip=True))
    hq, hs = _quant_rows(h)
    acc2 = jax.lax.dot_general(
        hq, w2q_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[...] += acc2.astype(jnp.float32) * (hs * w2s_ref[...])

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = y + acc_ref[...].astype(y.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_rows", "block_hidden", "interpret")
)
def fused_ln_mlp_tiled_int8(
    x, attn, scale, bias, w1q, w1s, b1, w2q, w2s, b2,
    eps: float = 1e-6,
    block_rows: int = 256,
    block_hidden: int = 0,
    interpret: bool = False,
):
    """w8a8 block tail for MLPs too big even for int8 VMEM residency:
    ``(x + attn) + int8_mlp2(gelu(int8_mlp1(LayerNorm(x + attn))))`` with
    the hidden dim tiled over the innermost grid dimension.

    ViT-H's int8 MLP weights (1280x5120 x2 = 13.1 MB) exceed
    :func:`fused_ln_mlp_int8`'s residency budget and previously fell back
    to the unfused XLA int8 path (ops/quant.py), which round-trips the
    (rows, hidden) GELU activation plus its quantized copy through HBM
    every layer. Here int8 weight tiles stream double-buffered at half
    the bf16 tile bytes while the int8xint8->int32 contractions run at
    the MXU's 2x rate — the quantization lever and the fusion lever in
    one kernel. ``block_hidden`` (tests) forces the tile size.
    """
    orig_shape = x.shape
    c = x.shape[-1]
    hidden = w1q.shape[-1]
    m = x.size // c
    bm = _pick_bm(m, c, block_rows)
    if block_hidden:
        ht = block_hidden
        assert hidden % ht == 0, (hidden, ht)
    else:
        # largest divisor of hidden keeping the double-buffered int8 tile
        # pair + the fp32 accumulator under ~10 MB
        ht = hidden
        while ht > 128 and (4 * c * ht + bm * c * 4) > 10_000_000:
            nxt = ht // 2
            while hidden % nxt and nxt > 128:
                nxt -= 1
            if nxt == ht or hidden % nxt:
                break
            ht = nxt
    nk = hidden // ht
    x2 = x.reshape(m, c)
    a2 = attn.reshape(m, c)
    grid = (m // bm, nk)
    row = lambda i, k: (i, 0)
    full = lambda i, k: (0, 0)
    out = pl.pallas_call(
        functools.partial(_ln_mlp_tiled_int8_kernel, eps=eps, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), row),
            pl.BlockSpec((bm, c), row),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((c, ht), lambda i, k: (0, k)),
            pl.BlockSpec((1, ht), lambda i, k: (0, k)),
            pl.BlockSpec((1, ht), lambda i, k: (0, k)),
            pl.BlockSpec((ht, c), lambda i, k: (k, 0)),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((1, c), full),
        ],
        out_specs=pl.BlockSpec((bm, c), row),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, c), jnp.float32),  # fp32 partial-sum accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x2,
        a2,
        scale.reshape(1, c).astype(x.dtype),
        bias.reshape(1, c).astype(x.dtype),
        w1q,
        w1s.reshape(1, hidden).astype(jnp.float32),
        b1.reshape(1, hidden).astype(jnp.float32),
        w2q,
        w2s.reshape(1, c).astype(jnp.float32),
        b2.reshape(1, c).astype(jnp.float32),
    )
    return out.reshape(orig_shape)


def _ln_matmul_kernel(x_ref, s_ref, b_ref, w_ref, wb_ref, o_ref, *, eps: float):
    """out = LayerNorm(x) @ W + b in one pass (W resident in VMEM)."""
    ln = _ln_rows(x_ref[...], s_ref[...], b_ref[...], eps)
    out = jax.lax.dot_general(
        ln, w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + wb_ref[...]
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def fused_ln_matmul(
    x, scale, bias, w, b,
    eps: float = 1e-6,
    block_rows: Optional[int] = None,
    interpret: bool = False,
):
    if block_rows is None:
        # r5 chained sweep (tools/chain_bench.py): 512 rows = 2.622 ms/call
        # at ViT-B bench shape vs 2.702 at the old 256 (97% of the FLOP
        # floor); 128 worse (2.821), 1024 exceeds the 16M scoped vmem.
        # SAM_LNMM_BR overrides for A/B.
        block_rows = int(os.environ.get("SAM_LNMM_BR", "512"))
    """``LayerNorm(x) @ W + b`` fused — used for the encoder's LN1 + qkv
    projection (the LN output never round-trips HBM). W stays VMEM-resident;
    at ViT-H qkv size (1280x3840 bf16 = 9.8 MB) it still fits."""
    orig_shape = x.shape
    c = x.shape[-1]
    o = w.shape[-1]
    m = x.size // c
    bm = _pick_bm(m, c, block_rows)
    grid = (m // bm,)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), row),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((c, o), full),
            pl.BlockSpec((1, o), full),
        ],
        out_specs=pl.BlockSpec((bm, o), row),
        out_shape=jax.ShapeDtypeStruct((m, o), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x.reshape(m, c),
        scale.reshape(1, c).astype(x.dtype),
        bias.reshape(1, c).astype(x.dtype),
        w.astype(x.dtype),
        b.reshape(1, o).astype(jnp.float32),
    )
    return out.reshape(*orig_shape[:-1], o)


def _ln_matmul_int8_kernel(
    x_ref, s_ref, b_ref, wq_ref, ws_ref, wb_ref, o_ref, *, eps: float
):
    """out = int8(LayerNorm(x)) @ wq * scales + b in one pass — the w8a8
    qkv projection with its LN fused (see :func:`fused_ln_matmul_int8`)."""
    ln = _ln_rows(x_ref[...], s_ref[...], b_ref[...], eps).astype(jnp.float32)
    xq, xs = _quant_rows(ln)
    acc = jax.lax.dot_general(
        xq, wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (xs * ws_ref[...]) + wb_ref[...]
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def fused_ln_matmul_int8(
    x, scale, bias, wq, ws, b,
    eps: float = 1e-6,
    block_rows: int = 256,
    interpret: bool = False,
):
    """``int8_linear(LayerNorm(x))`` fused — the quantized counterpart of
    :func:`fused_ln_matmul` for the encoder's LN1 + qkv projection. vs the
    unfused path (separate LN pass + ops/quant.py:int8_linear) the LN
    output and its quantized copy never round-trip HBM, and the int8 qkv
    weight is half the bf16 footprint (ViT-H 1280x3840: 4.9 MB resident).
    Same dynamic per-row activation scheme as :func:`fused_ln_mlp_int8`.
    """
    orig_shape = x.shape
    c = x.shape[-1]
    o = wq.shape[-1]
    m = x.size // c
    bm = _pick_bm(m, c, block_rows)
    grid = (m // bm,)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_ln_matmul_int8_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), row),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((1, c), full),
            pl.BlockSpec((c, o), full),
            pl.BlockSpec((1, o), full),
            pl.BlockSpec((1, o), full),
        ],
        out_specs=pl.BlockSpec((bm, o), row),
        out_shape=jax.ShapeDtypeStruct((m, o), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x.reshape(m, c),
        scale.reshape(1, c).astype(x.dtype),
        bias.reshape(1, c).astype(x.dtype),
        wq,
        ws.reshape(1, o).astype(jnp.float32),
        b.reshape(1, o).astype(jnp.float32),
    )
    return out.reshape(*orig_shape[:-1], o)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ln(x, scale, bias, eps: float = 1e-6, interpret: bool = False):
    """LayerNorm(x) * scale + bias in one HBM pass (no residual input)."""
    orig_shape = x.shape
    c = x.shape[-1]
    m = x.size // c
    x2 = x.reshape(m, c)
    bm = _pick_bm(m, c)
    grid = (m // bm,)
    ln = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, scale.reshape(1, c).astype(x.dtype), bias.reshape(1, c).astype(x.dtype))
    return ln.reshape(orig_shape)
