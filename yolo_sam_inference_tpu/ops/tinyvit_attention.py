"""Fused TinyViT windowed-attention block as one Pallas pass.

The MobileSAM/TinyViT transformer stages run LeViT-style windowed attention
(learned per-offset bias tables, window sizes 7/14 that do NOT divide the
token grid) over small windows of T = ws^2 = 49/196 tokens with head dim 32.
XLA executes the plain formulation as:

    pad -> 6D window partition -> LayerNorm -> qkv + 5D head transpose ->
    thousands of (T, 32)x(32, T) batched matmuls -> softmax -> ... ->
    inverse partition

measured at ~230 ms of the 347 ms MobileSAM batch-128 bench iteration
(attention logits einsum alone: 58 ms at <1% MXU efficiency — the per-head
per-window matmuls are too small for XLA's batched-dot tiling, and every
step between them round-trips HBM).

Here the *wrapper* does the cheap part in XLA — pad + window partition to a
(N, Tp, C) token tensor, Tp = T rounded up to the sublane count (Mosaic
rejects shape casts whose merged second-minor dim is not 8-aligned, so the
47/196-token windows are padded to 56/200 with masked-out keys) — and the
kernel computes   out = x + proj(attn(LN(x)))   in ONE pass over blocks of
whole windows:

* the block's LayerNorm + qkv projection run as one full-lane
  (nwin*Tp, C) @ (C, 3C) matmul (C = 128/160/320);
* per-window, per-head (Tp, hd) x (hd, Tp) dots + fp32 bias add + fp32
  softmax all stay in VMEM (pad keys are masked with -1e9 folded into the
  bias operand; pad-query rows are discarded by the inverse partition);
* the output projection runs once per block on the re-assembled
  (nwin*Tp, C) tokens, and the residual add closes the block.

Padding parity: the official TinyViT pads the PRE-norm input with zeros and
norms after windowing (tiny_vit_sam.py TinyViTBlock.forward pads,
Attention.forward norms), so pad tokens enter qkv as LN(0) = ln_bias. The
wrapper pads with zeros and the kernel's LN reproduces exactly that.

Reference anchor: MobileSAM tiny_vit_sam.py (Attention + TinyViTBlock); the
reference pipeline swaps SAM variants by checkpoint name (reference
pipeline.py:76).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_rows(y, scale, bias, eps):
    """LayerNorm rows with the scale/bias applied IN fp32 before the final
    cast — deliberately different from ops/fused_ln.py::_ln_rows, which
    casts to the activation dtype first (that variant's scale/bias arrive
    pre-cast to x.dtype; here they stay fp32 to match the plain-path
    TinyViT numerics the parity test pins)."""
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    d = yf - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return (d * jax.lax.rsqrt(var + eps) * scale + bias).astype(y.dtype)


def _tinyvit_attn_kernel(
    x_ref, bias_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
    o_ref,
    *, nwin: int, pack: int, heads: int, scale: float, eps: float,
):
    tp = x_ref.shape[1]
    c = x_ref.shape[2]
    hd = c // heads

    xb = x_ref[...]  # (nwin, Tp, C)
    flat = xb.reshape(nwin * tp, c)  # Tp % 8 == 0 -> legal shape cast
    ln = _ln_rows(flat, lns_ref[...], lnb_ref[...], eps)
    qkv = (
        jax.lax.dot_general(
            ln, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[...]
    ).astype(xb.dtype)  # (rows, 3C) — ONE full-lane matmul for the block
    # `pack` windows share each attention dot: the (Tp, hd) per-window dots
    # are MXU-latency-bound, so P windows are concatenated along tokens and
    # cross-window logits are masked by the block-diagonal bias (-1e9 off
    # the diagonal) — P x fewer dot issues for P x (MXU-cheap) waste FLOPs.
    qkv3 = qkv.reshape(nwin // pack, pack * tp, 3 * c)

    win_outs = []
    for w in range(nwin // pack):
        wqkv = qkv3[w]  # (P*Tp, 3C) — major-dim index, no relayout
        head_outs = []
        for h in range(heads):
            q = wqkv[:, h * hd : (h + 1) * hd]
            k = wqkv[:, c + h * hd : c + (h + 1) * hd]
            v = wqkv[:, 2 * c + h * hd : 2 * c + (h + 1) * hd]
            s = jax.lax.dot_general(
                q * q.dtype.type(scale), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias_ref[h]  # (P*Tp, P*Tp) fp32; pad/cross-window keys -1e9
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp((s - m).astype(v.dtype))  # exp(<=0): safe in bf16
            l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
            o_h = jax.lax.dot_general(
                p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / jnp.maximum(l, 1e-30)
            head_outs.append(o_h)
        win_outs.append(
            jnp.concatenate(head_outs, axis=-1).astype(xb.dtype)[None]
        )  # (1, P*Tp, C)
    attn = jnp.concatenate(win_outs, axis=0).reshape(nwin * tp, c)
    out = (
        jax.lax.dot_general(
            attn, wp_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bp_ref[...]
    ).astype(xb.dtype)
    o_ref[...] = xb + out.reshape(nwin, tp, c)


def _pick_nwin(n: int, tp: int, heads: int) -> int:
    """Windows per grid step: amortize the per-step LN/qkv/proj matmuls
    while bounding VMEM rows and the unrolled window x head loop (window
    packing divides the real unroll by ~4, so the head cap is generous)."""
    best = 1
    for cand in range(2, n + 1):
        if n % cand:
            continue
        if cand * tp > 1024 or cand * heads > 160:
            break
        best = cand
    return best


@functools.partial(
    jax.jit, static_argnames=("heads", "ws", "interpret")
)
def tinyvit_window_block(
    x: jnp.ndarray,
    bias_tt: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    heads: int,
    ws: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, H, W, C) PRE-norm -> x + proj(window_attn(LN(pad(x)))).

    bias_tt: (heads, T, T) fp32 per-pair attention bias (the learned
    per-offset table already expanded to token pairs). Pads x with zeros to
    window multiples (official-TinyViT pad-before-norm semantics), window-
    partitions in XLA, runs the fused kernel over (nwin, Tp, C) blocks, and
    inverse-partitions back to (B, H, W, C).
    """
    b, hgt, wid, c = x.shape
    hd = c // heads
    pad_h = (ws - hgt % ws) % ws
    pad_w = (ws - wid % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp_cols = hgt + pad_h, wid + pad_w
    nh, nw = hp // ws, wp_cols // ws
    from . import mosaic_backend

    interpret = interpret or not mosaic_backend()

    t = ws * ws
    tp = (t + 7) // 8 * 8  # sublane-align the token axis
    n = b * nh * nw

    # window partition (XLA relayout, ~2 HBM passes) + token padding
    xw = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(n, t, c)
    if tp != t:
        xw = jnp.pad(xw, ((0, 0), (0, tp - t), (0, 0)))

    # pad the bias to (heads, Tp, Tp); -1e9 on pad KEY columns masks them
    # out of every softmax (pad-query rows are sliced away afterwards)
    bias_p = jnp.pad(
        bias_tt.astype(jnp.float32),
        ((0, 0), (0, tp - t), (0, tp - t)),
        constant_values=-1e9,
    )
    if tp != t:  # pad-query rows: keep real keys finite, mask pad keys
        bias_p = bias_p.at[:, t:, :t].set(0.0)

    nwin = _pick_nwin(n, tp, heads)
    # windows per attention dot: P*Tp ~ 224 tokens keeps the MXU fed while
    # the block-diagonal packed bias stays small VMEM (heads*(P*Tp)^2 fp32).
    # SAM_TV_PACKCAP sweeps the token cap (chain legs): the default 256
    # leaves the ws=14 stage-3 blocks at pack=1 — 200-token 32-deep
    # per-head dots, the same fill/drain starvation the r5 flash ablations
    # measured on config 1.
    packcap = int(os.environ.get("SAM_TV_PACKCAP", "256"))
    biascap = int(os.environ.get("SAM_TV_BIASCAP", "3500000"))
    pack = 1
    for cand in (10, 8, 6, 5, 4, 3, 2):  # nwin is 10 or 3 at 512^2 shapes
        if (
            nwin % cand == 0
            and cand * tp <= packcap
            and heads * (cand * tp) ** 2 * 4 <= biascap
        ):
            pack = cand
            break
    if pack > 1:
        blk = jnp.kron(
            jnp.eye(pack, dtype=jnp.float32), jnp.ones((tp, tp), jnp.float32)
        )
        bias_p = jnp.where(
            blk.astype(bool)[None],
            jnp.tile(bias_p, (1, pack, pack)),
            jnp.float32(-1e9),
        )

    kernel = functools.partial(
        _tinyvit_attn_kernel,
        nwin=nwin, pack=pack, heads=heads, scale=hd ** -0.5, eps=eps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n // nwin,),
        in_specs=[
            pl.BlockSpec((nwin, tp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((heads, pack * tp, pack * tp), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nwin, tp, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, tp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=(
                int(os.environ["SAM_TV_VMEM"])
                if os.environ.get("SAM_TV_VMEM")
                else None
            ),
        ),
        interpret=interpret,
    )(
        xw,
        bias_p,
        ln_scale.reshape(1, c).astype(jnp.float32),
        ln_bias.reshape(1, c).astype(jnp.float32),
        wqkv.astype(x.dtype),
        bqkv.reshape(1, 3 * c).astype(jnp.float32),
        wproj.astype(x.dtype),
        bproj.reshape(1, c).astype(jnp.float32),
    )

    # inverse partition; pad-token rows are dropped here
    out = out[:, :t, :].reshape(b, nh, nw, ws, ws, c)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp_cols, c)
    if pad_h or pad_w:
        out = out[:, :hgt, :wid, :]
    return out


# --------------------------------------------------------------- cell layout


def _tinyvit_attn_cells_kernel(
    x_ref, bias_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
    o_ref,
    *, nb: int, nwy: int, nwx: int, ws: int, ws8: int, pack: int,
    heads: int, scale: float, eps: float,
):
    """Same math as _tinyvit_attn_kernel, but windows arrive in SPATIAL cell
    layout — block (nb, nwy*ws, nwx*ws8, C) where each window occupies a
    ws x ws8 cell (columns ws..ws8-1 are zero pad, masked as keys by the
    bias). Every reshape keeps a factor-8 minor merge, so no XLA 6D window
    partition / inverse transpose is needed around the kernel (those two
    relayouts measured ~18 ms of the MobileSAM B=128 iteration)."""
    c = x_ref.shape[3]
    hd = c // heads
    tp = ws * ws8
    nwin = nb * nwy * nwx

    xb = x_ref[...]  # (nb, nwy*ws, nwx*ws8, C)
    rows = nb * nwy * ws * nwx * ws8
    flat = xb.reshape(rows, c)  # minor merge carries the ws8 factor: legal
    ln = _ln_rows(flat, lns_ref[...], lnb_ref[...], eps)
    qkv = (
        jax.lax.dot_general(
            ln, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[...]
    ).astype(xb.dtype)  # (rows, 3C)

    # gather per-window token blocks (bi, yi, wi) -> (tp, 3C): major-dim
    # slices of the 6D view, no relayout
    qkv6 = qkv.reshape(nb, nwy, ws, nwx, ws8, 3 * c)
    wins = [
        qkv6[bi, yi, :, wi].reshape(1, tp, 3 * c)
        for bi in range(nb)
        for yi in range(nwy)
        for wi in range(nwx)
    ]
    qkvw = jnp.concatenate(wins, axis=0)  # (nwin, tp, 3C)
    qkv3 = qkvw.reshape(nwin // pack, pack * tp, 3 * c)

    win_outs = []
    for w in range(nwin // pack):
        wqkv = qkv3[w]  # (P*Tp, 3C)
        head_outs = []
        for h in range(heads):
            q = wqkv[:, h * hd : (h + 1) * hd]
            k = wqkv[:, c + h * hd : c + (h + 1) * hd]
            v = wqkv[:, 2 * c + h * hd : 2 * c + (h + 1) * hd]
            s = jax.lax.dot_general(
                q * q.dtype.type(scale), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias_ref[h]  # (P*Tp, P*Tp); pad/cross-window keys -1e9
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp((s - m).astype(v.dtype))
            l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
            o_h = jax.lax.dot_general(
                p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / jnp.maximum(l, 1e-30)
            head_outs.append(o_h)
        win_outs.append(
            jnp.concatenate(head_outs, axis=-1).astype(xb.dtype)
        )  # (P*Tp, C)
    attn = jnp.concatenate(win_outs, axis=0).reshape(nwin, ws, ws8, c)

    # rebuild the spatial cell layout with pure concats (window (bi, yi, wi)
    # tokens go back to rows [yi*ws, yi*ws+ws) x cols [wi*ws8, wi*ws8+ws8))
    att6 = attn.reshape(nb, nwy, nwx, ws, ws8, c)
    bimgs = []
    for bi in range(nb):
        rows_y = []
        for yi in range(nwy):
            cols = [att6[bi, yi, wi] for wi in range(nwx)]  # (ws, ws8, C)
            rows_y.append(jnp.concatenate(cols, axis=1))  # (ws, nwx*ws8, C)
        bimgs.append(jnp.concatenate(rows_y, axis=0)[None])
    spatial = jnp.concatenate(bimgs, axis=0)  # (nb, nwy*ws, nwx*ws8, C)

    out = (
        jax.lax.dot_general(
            spatial.reshape(rows, c), wp_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bp_ref[...]
    ).astype(xb.dtype)
    o_ref[...] = xb + out.reshape(xb.shape)


def _pick_cells(b: int, nh: int, nw: int, ws: int, ws8: int, heads: int):
    """(nb, nwy, nwx) windows per grid step: fill ~1024 VMEM rows while
    keeping the unrolled window x head loop bounded (same caps as
    _pick_nwin; window packing divides the real unroll by ~pack)."""
    row_cap, unroll_cap = 1024, 160

    def ok(nb, nwy, nwx):
        rows = nb * nwy * ws * nwx * ws8
        return rows <= row_cap and nb * nwy * nwx * heads <= unroll_cap

    nwx = max(d for d in range(1, nw + 1) if nw % d == 0 and ok(1, 1, d))
    nwy = max(d for d in range(1, nh + 1) if nh % d == 0 and ok(1, d, nwx))
    nb = max(d for d in range(1, b + 1) if b % d == 0 and ok(d, nwy, nwx))
    return nb, nwy, nwx


@functools.partial(
    jax.jit, static_argnames=("heads", "ws", "interpret")
)
def tinyvit_window_block_cells(
    x: jnp.ndarray,
    bias_tt: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    heads: int,
    ws: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cell-layout variant of :func:`tinyvit_window_block` (opt-in via
    SAM_TV_ATTN_V2): instead of the 6D window-partition transpose + inverse
    around the kernel, each ws x ws window is stored in a ws x ws8 spatial
    cell (ws8 = ws rounded up to the sublane count; the pad columns are
    zeros masked out of every softmax). The only XLA work is one strided
    pad copy in and one strided slice out; the kernel reads/writes the
    spatial tensor directly and its per-window token count (ws*ws8) equals
    the old sublane-aligned Tp, so kernel matmul rows are unchanged for
    ws=7 (56) and +12% for ws=14 (224 vs 200)."""
    b, hgt, wid, c = x.shape
    hd = c // heads
    pad_h = (ws - hgt % ws) % ws
    pad_w = (ws - wid % ws) % ws
    hp, wpc = hgt + pad_h, wid + pad_w
    nh, nw = hp // ws, wpc // ws
    ws8 = (ws + 7) // 8 * 8
    tp = ws * ws8
    from . import mosaic_backend

    interpret = interpret or not mosaic_backend()

    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    xc = x.reshape(b, hp, nw, ws, c)
    if ws8 != ws:
        xc = jnp.pad(xc, ((0, 0), (0, 0), (0, 0), (0, ws8 - ws), (0, 0)))
    xc = xc.reshape(b, hp, nw * ws8, c)

    # bias re-indexed to cell token order t = r*ws8 + col (pad cols are
    # -1e9 keys everywhere; pad-query rows keep real keys finite)
    import numpy as _np

    tok = _np.arange(tp)
    col = tok % ws8
    real = col < ws
    t0 = (tok // ws8) * ws + _np.minimum(col, ws - 1)
    bias_g = bias_tt.astype(jnp.float32)[:, t0][:, :, t0]
    realq = jnp.asarray(real)[None, :, None]
    realk = jnp.asarray(real)[None, None, :]
    bias_p = jnp.where(realk, jnp.where(realq, bias_g, 0.0), jnp.float32(-1e9))

    nb, nwy, nwx = _pick_cells(b, nh, nw, ws, ws8, heads)
    nwin = nb * nwy * nwx
    # same sweepable cap as the non-cells builder (SAM_TV_PACKCAP): the
    # default 256 pins ws=14 stages at pack=1
    packcap = int(os.environ.get("SAM_TV_PACKCAP", "256"))
    biascap = int(os.environ.get("SAM_TV_BIASCAP", "3500000"))
    pack = 1
    for cand in (10, 8, 6, 5, 4, 3, 2):  # nwin is 10 or 3 at 512^2 shapes
        if (
            nwin % cand == 0
            and cand * tp <= packcap
            and heads * (cand * tp) ** 2 * 4 <= biascap
        ):
            pack = cand
            break
    if pack > 1:
        blk = jnp.kron(
            jnp.eye(pack, dtype=jnp.float32), jnp.ones((tp, tp), jnp.float32)
        )
        bias_p = jnp.where(
            blk.astype(bool)[None],
            jnp.tile(bias_p, (1, pack, pack)),
            jnp.float32(-1e9),
        )

    nby, nbx = nh // nwy, nw // nwx

    def imap(i):
        bi = i // (nby * nbx)
        r = i % (nby * nbx)
        return (bi, r // nbx, r % nbx, 0)

    kernel = functools.partial(
        _tinyvit_attn_cells_kernel,
        nb=nb, nwy=nwy, nwx=nwx, ws=ws, ws8=ws8, pack=pack,
        heads=heads, scale=hd ** -0.5, eps=eps,
    )
    out = pl.pallas_call(
        kernel,
        grid=((b // nb) * nby * nbx,),
        in_specs=[
            pl.BlockSpec((nb, nwy * ws, nwx * ws8, c), imap),
            pl.BlockSpec(
                (heads, pack * tp, pack * tp), lambda i: (0, 0, 0)
            ),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, nwy * ws, nwx * ws8, c), imap),
        out_shape=jax.ShapeDtypeStruct((b, hp, nw * ws8, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=(
                int(os.environ["SAM_TV_VMEM"])
                if os.environ.get("SAM_TV_VMEM")
                else None
            ),
        ),
        interpret=interpret,
    )(
        xc,
        bias_p,
        ln_scale.reshape(1, c).astype(jnp.float32),
        ln_bias.reshape(1, c).astype(jnp.float32),
        wqkv.astype(x.dtype),
        bqkv.reshape(1, 3 * c).astype(jnp.float32),
        wproj.astype(x.dtype),
        bproj.reshape(1, c).astype(jnp.float32),
    )

    # inverse: drop the per-window pad columns + the spatial pad
    out = out.reshape(b, hp, nw, ws8, c)[:, :, :, :ws, :]
    out = out.reshape(b, hp, wpc, c)
    if pad_h or pad_w:
        out = out[:, :hgt, :wid, :]
    return out
