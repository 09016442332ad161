"""Pallas TPU flash attention with SAM's decomposed relative-position bias.

The SAM ViT encoder's global-attention layers attend over N = 64*64 = 4096
tokens. Naive attention materializes (B, heads, N, N) fp32 logits — 12.9 GB
at batch 16 — making the encoder HBM-bandwidth-bound (measured: the dominant
cost in bench.py before this kernel). This kernel streams K/V tiles through
VMEM with the classic running-max/running-sum online softmax, so logits
never leave the chip.

SAM's decomposed rel-pos bias (mvitv2-style) factors as
``bias[q, k] = rh[q, ky(k)] + rw[q, kx(k)]`` with ky = k // S, kx = k % S for
an S x S token grid. We precompute the two small score tables

    rh = einsum(q_grid, rel_pos_h)   # (BH, N, S)
    rw = einsum(q_grid, rel_pos_w)   # (BH, N, S)

outside the kernel (S = 64, so both are ~1000x smaller than the logits) and
reconstruct each (block_q, block_k) bias tile inside the kernel with a
repeat (ky is constant over contiguous S-column chunks) plus a tile of rw.

Grid: (BH, num_q_blocks, num_k_blocks), k innermost; block_k must be a
multiple of S.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30

# SAM_RELPOS_V2=1 opt-in (A/B pending device measurement): dot-only score
# tables on the full-image (s <= 32) path instead of the slice-assembly
# builder (_relpos_tables_kernel_big).
_RELPOS_V2 = os.environ.get("SAM_RELPOS_V2", "0") == "1"

# SAM_FLASH_ABL: measurement-only ablations of the grid kernel (wrong
# numerics by construction — never in a product path). chain_bench legs use
# these to decompose the windowed step's 2.8x-over-FLOP-floor cost:
#   noexp   — softmax exp replaced by a cast (VPU transcendental cost)
#   nobias  — q/k used un-augmented (concat + onehot-build cost)
#   nopv    — PV contraction replaced by a slice of p
#   noqk    — QK contraction replaced by zeros
def _ablate() -> str:
    return os.environ.get("SAM_FLASH_ABL", "")


# SAM_FLASH_VSUM (default ON): compute the softmax denominator ON the MXU
# by appending a ones-column to v — the PV contraction then yields
# [p@v | l] in the same pass and the VPU cross-lane row-sum disappears.
# Exact same math (both paths accumulate fp32); measured −0.23 ms/call on
# the windowed ViT-B layer (BENCH_NOTES r5). SAM_FLASH_VSUM=0 reverts.
def _vsum() -> bool:
    return os.environ.get("SAM_FLASH_VSUM", "1") == "1"


# SAM_FLASH_NOMAX=1 (measurement/opt-in): skip the row-max subtraction in
# the single-window softmax — exact softmax in exact arithmetic, but exp
# overflows if logits exceed ~88, so it is NOT a default (SAM logits after
# LN sit around +-30).
def _nomax() -> bool:
    return os.environ.get("SAM_FLASH_NOMAX", "0") == "1"


# Single-window softmax stabilizer (default "clamp"): the row-max subtract
# is a cross-lane VPU reduction per head per window; an elementwise CLAMP
# — p = exp(min(s - shift, 80)) — needs no reduction and can never
# overflow (512 * e^80 < fp32 max; e^80 is bf16-representable), while
# being EXACTLY softmax whenever the shifted logits stay <= 80 (SAM
# logits sit around +-30; the wpair +M shift is subtracted first).
# Rows with logits beyond 80 get their top weights compressed instead of
# producing inf/nan — a bounded failure mode vs the max path's exact one.
# SAM_FLASH_SOFTMAX=max reverts to the reduction.
_SOFTMAX_CLAMP = 80.0


def _softmax_mode() -> str:
    return os.environ.get("SAM_FLASH_SOFTMAX", "clamp")


# SAM_FLASH_WPAIR: merge the wps=2 adjacent windows of a grid step into
# ONE per-head contraction instead of two — the r5 ablation chain showed
# the QK dot is the kernel's dominant cost (noqk: 4.02 -> 1.39 ms/call
# windowed) because 24 small 96-deep dots per step run at ~20% MXU
# efficiency (pipeline fill/drain dominates). Window isolation rides the
# contraction as two indicator lanes scaled by sqrt(M): same-window pairs
# gain +M, so after the row-max subtraction cross-window logits sit at
# ~-M and exp to exactly 0 (bf16 exp underflows below ~-90; M = 512
# leaves >5x margin even for adversarial +-80 logits). sqrt(M) rides the
# indicator lanes in the activation dtype; the fp32 logit rounding cost
# at +512 is ~6e-5 absolute — invisible at output tolerance. Halves
# QK/PV issue counts at 2x their FLOPs —
# a win while the dots are issue-bound: measured 4.02 -> 3.32 ms/call
# (with vsum) on the windowed ViT-B layer (BENCH_NOTES r5) — default ON
# (only wps==2 geometries are affected; ViT-L/H run wps=1 and never take
# this path). SAM_FLASH_WPAIR=0 reverts.
_WPAIR_M = 512.0


def _wpair() -> bool:
    return os.environ.get("SAM_FLASH_WPAIR", "1") == "1"


def _flash_kernel(
    q_ref, k_ref, v_ref, rh_ref, rw_ref,  # inputs
    o_ref,  # output
    m_scr, l_scr, acc_scr,  # scratch
    *, scale: float, grid_s: int, block_k: int, num_k: int, use_bias: bool = True,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, hd)
    k = k_ref[0]  # (bk, hd)
    v = v_ref[0]  # (bk, hd)

    # MXU matmuls take bf16 inputs with fp32 accumulation; scale applied to
    # q in its own dtype (exact for power-of-two head dims).
    s = jax.lax.dot_general(
        q * q.dtype.type(scale),
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk) fp32

    # Decomposed rel-pos bias tile: ky is constant over contiguous S-column
    # chunks. Per chunk: extract rh[:, ky0+c] as (bq, 1) with one masked
    # row-reduce over (bq, S), add it (+ rw) to that chunk's S-column slice
    # of s, and reassemble with a concat — O(block_k) VPU work per step
    # instead of per-chunk full-tile selects (which made the kernel
    # VPU-bound at ~2M ops/step).
    chunks = block_k // grid_s
    if use_bias:
        rh_blk = rh_ref[0]  # (bq, S)
        rw_blk = rw_ref[0]  # (bq, S)
        bq = q.shape[0]
        ky0 = ki * chunks
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (bq, grid_s), 1)
        pieces = []
        for c in range(chunks):
            colval = jnp.sum(
                jnp.where(lane_s == ky0 + c, rh_blk, 0.0), axis=1, keepdims=True
            )  # (bq, 1) = rh[:, ky0 + c]
            pieces.append(s[:, c * grid_s : (c + 1) * grid_s] + (rw_blk + colval))
        s = jnp.concatenate(pieces, axis=1) if chunks > 1 else pieces[0]

    m_prev = m_scr[:, 0:1]  # (bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # (bq, 1)
    # the exp over the full (bq, bk) tile is the VPU hot spot: for bf16
    # attention run it in bf16 (args are <= 0 so exp is in [0, 1] — bf16's
    # sweet spot); row sums still accumulate in fp32
    p = jnp.exp((s - m_new).astype(v.dtype))  # (bq, bk) in v.dtype

    l_new = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v,  # bf16 x bf16 -> fp32 accumulate on the MXU
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == num_k - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:, 0:1], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("grid_s", "block_q", "block_k", "interpret", "use_bias"),
)
def flash_attention_relpos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rh: jnp.ndarray,
    rw: jnp.ndarray,
    grid_s: int,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
    use_bias: bool = True,
) -> jnp.ndarray:
    """Flash attention with decomposed rel-pos bias.

    Args:
        q: (BH, NQ, hd). NQ may be a row-aligned *subset* of the k/v grid
            (NQ = N / sp for the sequence-parallel encoder's local q rows —
            the bias is q/k-separable: the q side carries its own rh/rw
            score tables, the k side only one-hot grid positions, so a
            partial q block needs nothing but its own tables).
        k, v: (BH, N, hd) with N = grid_s**2.
        rh, rw: (BH, NQ, grid_s) rel-pos score tables (see module docstring).
        grid_s: token-grid side length S of the k/v grid.
        block_q/block_k: tile sizes; block_k % grid_s == 0.
        interpret: run in Pallas interpreter mode (CPU tests).

    Returns:
        (BH, NQ, hd) attention output, dtype of v. Softmax is fp32 throughout.
    """
    bh, nq, hd = q.shape
    n = k.shape[1]
    assert n == grid_s * grid_s, (n, grid_s)
    assert nq % grid_s == 0, (nq, grid_s)
    block_q = min(block_q, nq)
    block_k = min(block_k, n)
    assert nq % block_q == 0 and n % block_k == 0
    assert block_k % grid_s == 0
    num_q = nq // block_q
    num_k = n // block_k
    chunks = block_k // grid_s
    scale = hd ** -0.5

    if use_bias:
        # Fold the decomposed bias INTO the contraction: augment
        #   q' = [q * hd^-1/2, rh, rw]      (hd + 2S dims)
        #   k' = [k, onehot(ky), onehot(kx)]
        # so q'.k'^T = scale*q.k^T + rh[q, ky] + rw[q, kx] exactly — the bias
        # becomes MXU work and the per-chunk VPU assembly in the kernel
        # (formerly the kernel's dominant cost) disappears.
        ky = np.arange(n) // grid_s
        kx = np.arange(n) % grid_s
        eye = np.eye(grid_s, dtype=np.float32)
        onehot = jnp.asarray(
            np.concatenate([eye[ky], eye[kx]], axis=1)
        )  # (N, 2S)
        q = jnp.concatenate(
            [
                (q * q.dtype.type(scale)).astype(q.dtype),
                rh.astype(q.dtype),
                rw.astype(q.dtype),
            ],
            axis=-1,
        )
        k = jnp.concatenate(
            [k, jnp.broadcast_to(onehot[None].astype(k.dtype), (bh, n, 2 * grid_s))],
            axis=-1,
        )
        scale = 1.0
        use_bias = False
        hd_out = v.shape[-1]
    else:
        hd_out = hd
    hd = q.shape[-1]

    kernel = functools.partial(
        _flash_kernel, scale=scale, grid_s=grid_s, block_k=block_k, num_k=num_k,
        use_bias=use_bias,
    )

    grid = (bh, num_q, num_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, hd_out), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_q, grid_s), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_q, grid_s), lambda b, qi, ki: (b, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd_out), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, hd_out), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, hd_out), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, rh, rw)
    return out


# --------------------------------------------------------------- grid kernel


def _flash_grid_kernel(
    *refs,
    heads: int,
    hd: int,
    wsx: int,
    wk: int,
    bky: int,
    num_k: int,
    scale: float,
    fuse_proj: bool,
    wps: int = 1,
    combined: bool = False,
):
    if combined:
        # single-block qkv read (SAM_FLASH_QKV1): q/k/v arrive as ONE
        # contiguous (bqy, wps*wsx, 3C) block — one DMA per step instead
        # of three 768-lane strided slices of the same tensor
        if fuse_proj:
            (qkv_ref, rhw_ref, wp_ref, bp_ref,
             o_ref, m_scr, l_scr, acc_scr) = refs
        else:
            qkv_ref, rhw_ref, o_ref, m_scr, l_scr, acc_scr = refs
            wp_ref = bp_ref = None
        c_ = heads * hd
        blk = qkv_ref[0]
        qt = blk[..., :c_]
        kt = blk[..., c_: 2 * c_]
        vt = blk[..., 2 * c_:]
    elif fuse_proj:
        (q_ref, k_ref, v_ref, rhw_ref, wp_ref, bp_ref,
         o_ref, m_scr, l_scr, acc_scr) = refs
        qt = q_ref[0]  # (bqy, wps*wsx, C)
        kt = k_ref[0]
        vt = v_ref[0]
    else:
        q_ref, k_ref, v_ref, rhw_ref, o_ref, m_scr, l_scr, acc_scr = refs
        wp_ref = bp_ref = None
        qt = q_ref[0]
        kt = k_ref[0]
        vt = v_ref[0]
    ki = pl.program_id(2)
    single = num_k == 1  # whole window per step: plain softmax, no scratch IO
    assert wps == 1 or single

    if not single:
        @pl.when(ki == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)
    rhw = rhw_ref[0]  # (bqy, wps*wsx, 2*heads*wk)
    nq = qt.shape[0] * wsx
    nk = kt.shape[0] * wsx
    c = heads * hd

    # local (row, col) one-hots of each k token in this k block, laid out
    # (nk, wk) so they append directly onto k's contraction axis: rows are
    # global window rows [ki*bky, ki*bky + bky), columns all wsx
    kk = jax.lax.broadcasted_iota(jnp.int32, (nk, wk), 0)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (nk, wk), 1)
    e_ky = (jcol == kk // wsx + ki * bky).astype(qt.dtype)  # (nk, wk)
    e_kx = (jcol == kk % wsx).astype(qt.dtype)
    e_kyx = jnp.concatenate([e_ky, e_kx], axis=1)  # (nk, 2*wk)

    abl = _ablate()

    def one_window(qf, kf, vf, rhwf):
        """Per-head attention within one window; returns (nq, C) unprojected
        output (single path) or None (online-softmax accumulation path)."""
        outs = []
        for h in range(heads):
            q = qf[:, h * hd : (h + 1) * hd]
            k = kf[:, h * hd : (h + 1) * hd]
            v = vf[:, h * hd : (h + 1) * hd]
            # Bias folded into the contraction: with hd = 64 the bare qk^T
            # wastes half the MXU's 128-deep contraction anyway, so
            #   q' = [q * scale, rh, rw]   k' = [k | onehot(ky) | onehot(kx)]
            # computes scale*qk^T + rh[q, ky] + rw[q, kx] in ONE matmul issue
            # instead of three.
            if abl == "nobias":
                q_aug = q * q.dtype.type(scale)
                k_aug = k
            else:
                rh_rw = (
                    rhwf[:, h * wk : (h + 1) * wk],
                    rhwf[:, (heads + h) * wk : (heads + h + 1) * wk],
                )
                q_aug = jnp.concatenate(
                    [q * q.dtype.type(scale), rh_rw[0], rh_rw[1]], axis=1
                )  # (nq, hd + 2*wk)
                k_aug = jnp.concatenate([k, e_kyx], axis=1)  # (nk, hd + 2*wk)
            if abl == "noqk":
                s = jnp.zeros((q.shape[0], k.shape[0]), jnp.float32)
            else:
                s = jax.lax.dot_general(
                    q_aug,
                    k_aug,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (nq, nk) fp32

            if single:
                if _nomax():
                    p = jnp.exp(s.astype(v.dtype))
                elif _softmax_mode() == "clamp" and abl != "noexp":
                    # no cross-lane reduction: exact softmax for logits
                    # <= 80, overflow-impossible beyond (see _softmax_mode)
                    p = jnp.exp(
                        jnp.minimum(s, _SOFTMAX_CLAMP).astype(v.dtype)
                    )
                else:
                    m_cur = jnp.max(s, axis=1, keepdims=True)
                    if abl == "noexp":
                        p = (s - m_cur).astype(v.dtype)
                    else:
                        p = jnp.exp((s - m_cur).astype(v.dtype))  # bf16 exp
                if abl == "nopv":
                    l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
                    o_h = p[:, :hd].astype(jnp.float32) + l * 0
                elif _vsum():
                    nk_ = v.shape[0]
                    v_aug = jnp.concatenate(
                        [v, jnp.ones((nk_, 1), v.dtype)], axis=1
                    )
                    pv = jax.lax.dot_general(
                        p, v_aug, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (nq, hd + 1): [p @ v | row-sum l]
                    o_h = pv[:, :hd] / jnp.maximum(pv[:, hd:], 1e-30)
                else:
                    l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
                    o_h = jax.lax.dot_general(
                        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) / jnp.maximum(l, 1e-30)
                outs.append(o_h)
                continue

            r0 = h * nq
            m_prev = m_scr[r0 : r0 + nq, 0:1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp((s - m_new).astype(v.dtype))  # bf16 exp (args <= 0)
            l_new = alpha * l_scr[r0 : r0 + nq, 0:1] + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32
            )
            acc_scr[r0 : r0 + nq, :] = acc_scr[r0 : r0 + nq, :] * alpha + jax.lax.dot_general(
                p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[r0 : r0 + nq, :] = jnp.broadcast_to(m_new, (nq, m_scr.shape[1]))
            l_scr[r0 : r0 + nq, :] = jnp.broadcast_to(l_new, (nq, l_scr.shape[1]))
        if single:
            return jnp.concatenate(outs, axis=-1)
        return None

    def project(o):
        # o: (rows, C) attention output, head-major
        o = o.astype(o_ref.dtype)
        if fuse_proj:
            o = (
                jax.lax.dot_general(
                    o, wp_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bp_ref[...]
            ).astype(o_ref.dtype)
        return o

    def window_merged(qf, kf, vf, rhwf):
        """All wps windows of the step in ONE contraction per head.

        Tokens are (bqy, wps*wsx) row-major, so windows INTERLEAVE along
        x — isolation cannot be a block mask. Instead two indicator lanes
        scaled by sqrt(_WPAIR_M) ride the contraction: same-window pairs
        gain +M, the row max absorbs it, and cross-window entries exp to
        exactly 0 (see _wpair). QK/PV run 2x FLOPs in half the issues —
        measured faster while the small dots are fill/drain-bound.
        """
        nt = qf.shape[0]
        row = wps * wsx
        tok = jax.lax.broadcasted_iota(jnp.int32, (nt, wps), 0)
        wj = jax.lax.broadcasted_iota(jnp.int32, (nt, wps), 1)
        wid = ((tok % row) // wsx == wj).astype(qf.dtype) * qf.dtype.type(
            _WPAIR_M ** 0.5
        )  # (nt, wps) window-membership lanes
        # k one-hots over all step tokens: local row = t // row, local
        # col = t % wsx (wsx divides row)
        kk = jax.lax.broadcasted_iota(jnp.int32, (nt, wk), 0)
        jc = jax.lax.broadcasted_iota(jnp.int32, (nt, wk), 1)
        e_ky_m = (jc == kk // row).astype(qf.dtype)
        e_kx_m = (jc == kk % wsx).astype(qf.dtype)
        outs = []
        for h in range(heads):
            q = qf[:, h * hd : (h + 1) * hd]
            k = kf[:, h * hd : (h + 1) * hd]
            v = vf[:, h * hd : (h + 1) * hd]
            q_aug = jnp.concatenate(
                [
                    q * q.dtype.type(scale),
                    rhwf[:, h * wk : (h + 1) * wk],
                    rhwf[:, (heads + h) * wk : (heads + h + 1) * wk],
                    wid,
                ],
                axis=1,
            )  # (nt, hd + 2*wk + wps)
            k_aug = jnp.concatenate([k, e_ky_m, e_kx_m, wid], axis=1)
            s = jax.lax.dot_general(
                q_aug, k_aug,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (nt, nt); same-window entries sit at raw + M
            if _nomax():
                # under wpair the stability shift can be the CONSTANT M:
                # same-window -> exp(raw), cross-window -> exp(raw - M) -> 0.
                # No row reduction at all; safe while raw logits < ~88
                # (opt-in, same caveat as plain nomax).
                p = jnp.exp((s - jnp.float32(_WPAIR_M)).astype(v.dtype))
            elif _softmax_mode() == "clamp":
                # constant-M shift + elementwise clamp: exact softmax for
                # raw logits <= 80, no reduction, no overflow possible;
                # cross-window entries exp(raw - M) -> 0 as before
                p = jnp.exp(
                    jnp.minimum(
                        s - jnp.float32(_WPAIR_M), _SOFTMAX_CLAMP
                    ).astype(v.dtype)
                )
            else:
                m_cur = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp((s - m_cur).astype(v.dtype))  # cross-window -> 0
            if _vsum():
                v_aug = jnp.concatenate(
                    [v, jnp.ones((nt, 1), v.dtype)], axis=1
                )
                pv = jax.lax.dot_general(
                    p, v_aug, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append(pv[:, :hd] / jnp.maximum(pv[:, hd:], 1e-30))
            else:
                l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
                outs.append(
                    jax.lax.dot_general(
                        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) / jnp.maximum(l, 1e-30)
                )
        return jnp.concatenate(outs, axis=-1)

    if single:
        bqy = qt.shape[0]
        if wps == 1:
            o = one_window(
                qt.reshape(nq, c),
                kt.reshape(nk, c),
                vt.reshape(nk, c),
                rhw.reshape(nq, 2 * heads * wk),
            )
            o_ref[0] = project(o).reshape(bqy, wsx, c)
            return
        if _wpair():
            nt = bqy * wps * wsx
            o = window_merged(
                qt.reshape(nt, c),
                kt.reshape(nt, c),
                vt.reshape(nt, c),
                rhw.reshape(nt, 2 * heads * wk),
            )
            o_ref[0] = project(o).reshape(bqy, wps * wsx, c)
            return
        # wps adjacent windows along x per grid step (amortizes the
        # per-step fixed costs that dominate small-window layers); the
        # output projection runs ONCE on the concatenated tokens
        wouts = []
        for wi in range(wps):
            sl = slice(wi * wsx, (wi + 1) * wsx)
            wouts.append(
                one_window(
                    qt[:, sl, :].reshape(nq, c),
                    kt[:, sl, :].reshape(nk, c),
                    vt[:, sl, :].reshape(nk, c),
                    rhw[:, sl, :].reshape(nq, 2 * heads * wk),
                ).reshape(bqy, wsx, c)
            )
        o = jnp.concatenate(wouts, axis=1).reshape(bqy * wps * wsx, c)
        o_ref[0] = project(o).reshape(bqy, wps * wsx, c)
        return

    one_window(
        qt.reshape(nq, c),
        kt.reshape(nk, c),
        vt.reshape(nk, c),
        rhw.reshape(nq, 2 * heads * wk),
    )

    @pl.when(ki == num_k - 1)
    def _():
        fin = []
        for h in range(heads):
            r0 = h * nq
            fin.append(
                acc_scr[r0 : r0 + nq, :]
                / jnp.maximum(l_scr[r0 : r0 + nq, 0:1], 1e-30)
            )
        o = project(jnp.concatenate(fin, axis=-1))
        o_ref[0] = o.reshape(o_ref.shape[1], wsx, c)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "window", "block_qy", "block_ky", "interpret"),
)
def flash_attention_grid(
    qkv: jnp.ndarray,
    rhw: jnp.ndarray,
    heads: int,
    window: int,
    block_qy: Optional[int] = None,
    block_ky: Optional[int] = None,
    wproj: Optional[jnp.ndarray] = None,
    bproj: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed/global ViT attention straight from the fused qkv tensor.

    Reads q/k/v tiles directly out of ``qkv`` (B, S, S, 3C) — channel layout
    [q | k | v], head-major within each — and writes (B, S, S, C), so the
    surrounding program needs NO window partition copies, NO (B,H,N,hd) head
    transposes and NO bias-augmentation concats (together ~25% of device time
    at bench shape before this kernel). Attention is confined to ``window`` x
    ``window`` token blocks (pass window = S for global layers). The
    decomposed rel-pos bias arrives as per-token score tables
    ``rhw`` (B, S, S, 2*heads*window): rh || rw, built against LOCAL window
    coordinates; inside the kernel each (q, k) bias tile is reconstructed
    with two small iota-mask matmuls on the MXU.

    Softmax is the standard online fp32 running-max/sum; the k loop streams
    ``block_ky`` window rows at a time so gs=64 global layers fit VMEM.
    """
    b, s, s2, c3 = qkv.shape
    assert s == s2 and c3 % 3 == 0
    c = c3 // 3
    hd = c // heads
    assert window <= s and s % window == 0
    nw = s // window
    wk = window

    # default tiles: <= 256 q tokens / <= 1024 k tokens per step — the
    # per-head scratch (heads * nq rows x 128 lanes fp32) plus double-buffered
    # blocks must fit the ~16 MB VMEM budget. Wide-channel configs (ViT-L/H,
    # C >= 1024) halve both budgets: the folded-bias k_aug temporaries scale
    # with heads * nk and overflow VMEM at the ViT-B tile sizes.
    # SAM_FLASH_QQ / SAM_FLASH_KQ / SAM_FLASH_WPSB override the token/byte
    # budgets for device A/B sweeps (tools/sweep_flash.py); defaults are the
    # measured-best serving configuration.
    # global-layer q blocks doubled r5 (256 -> 512 token budget => bqy 16
    # at ViT-B): 5.91 -> 5.48 ms/call once the scoped-vmem budget allows
    # (the 22.5M allocation needs the raised limit below). c >= 1024
    # (ViT-L/H) keeps the r3-measured budgets — unmeasured there.
    kq_budget, qq_budget = (1024, 512) if c < 1024 else (512, 128)
    kq_budget = int(os.environ.get("SAM_FLASH_KQ", kq_budget))
    qq_budget = int(os.environ.get("SAM_FLASH_QQ", qq_budget))
    if block_ky is None:
        block_ky = max(d for d in range(1, window + 1)
                       if window % d == 0 and d * window <= kq_budget)
    if block_qy is None:
        # small windows default to whole-window q blocks (wps batching
        # needs num_q == 1); an explicit SAM_FLASH_QQ sweeps them too
        block_qy = (
            max(d for d in range(1, window + 1)
                if window % d == 0 and d * window <= qq_budget)
            if window > 16 or "SAM_FLASH_QQ" in os.environ
            else window
        )
    num_q = window // block_qy
    num_k = window // block_ky
    nq = block_qy * window
    # small windows: process several adjacent windows along x per grid step
    # — per-step fixed costs (DMA scheduling, loop prologue) dominate
    # small-window layers; windows stay attention-isolated via an in-kernel
    # loop, and the output projection runs once on the combined tokens
    wps = 1
    if num_k == 1 and num_q == 1:
        # VMEM bound: the q/k/v/rhw/out blocks + per-head fp32 logits all
        # scale with wps * window^2 * C (ViT-L's C=1024 overflows at wps=2)
        wpsb = int(os.environ.get("SAM_FLASH_WPSB", 400_000))
        wps = max(
            d for d in range(1, nw + 1)
            if nw % d == 0
            and d * window * window <= 1024
            and d * window * window * c <= wpsb
        )
    nwx = nw // wps
    grid = (b * nw * nwx, num_q, num_k)

    def qmap(g, qi, ki):
        wy, wx = (g // nwx) % nw, g % nwx
        return (g // (nw * nwx), wy * num_q + qi, wx, 0)

    def kmap(g, qi, ki):
        wy, wx = (g // nwx) % nw, g % nwx
        return (g // (nw * nwx), wy * num_k + ki, wx, 1)

    def vmap_(g, qi, ki):
        wy, wx = (g // nwx) % nw, g % nwx
        return (g // (nw * nwx), wy * num_k + ki, wx, 2)

    def omap(g, qi, ki):
        wy, wx = (g // nwx) % nw, g % nwx
        return (g // (nw * nwx), wy * num_q + qi, wx, 0)

    fuse_proj = wproj is not None
    # combined qkv read (opt-in A/B): when q and k/v blocks coincide
    # (num_q == num_k == 1, the windowed path), read the whole (.., 3C)
    # lane range as ONE contiguous block instead of three 768-lane strided
    # slices of the same tensor — 1/3 the DMA descriptors, no lane stride
    combined = (
        num_q == 1 and num_k == 1
        and os.environ.get("SAM_FLASH_QKV1", "0") == "1"
    )
    kernel = functools.partial(
        _flash_grid_kernel,
        heads=heads,
        hd=hd,
        wsx=window,
        wk=wk,
        bky=block_ky,
        num_k=num_k,
        scale=hd ** -0.5,
        fuse_proj=fuse_proj,
        wps=wps,
        combined=combined,
    )
    if combined:
        def qkvmap(g, qi, ki):
            wy, wx = (g // nwx) % nw, g % nwx
            return (g // (nw * nwx), wy, wx, 0)

        in_specs = [
            pl.BlockSpec((1, block_qy, wps * window, 3 * c), qkvmap),
            pl.BlockSpec((1, block_qy, wps * window, 2 * heads * wk), omap),
        ]
        inputs = [qkv, rhw]
    else:
        in_specs = [
            pl.BlockSpec((1, block_qy, wps * window, c), qmap),
            pl.BlockSpec((1, block_ky, wps * window, c), kmap),
            pl.BlockSpec((1, block_ky, wps * window, c), vmap_),
            pl.BlockSpec((1, block_qy, wps * window, 2 * heads * wk), omap),
        ]
        inputs = [qkv, qkv, qkv, rhw]
    if fuse_proj:
        in_specs += [
            pl.BlockSpec((c, c), lambda g, qi, ki: (0, 0)),
            pl.BlockSpec((1, c), lambda g, qi, ki: (0, 0)),
        ]
        inputs += [
            wproj.astype(qkv.dtype),
            bproj.reshape(1, c).astype(jnp.float32),
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_qy, wps * window, c), omap),
        out_shape=jax.ShapeDtypeStruct((b, s, s, c), qkv.dtype),
        scratch_shapes=(
            [  # online-softmax state, only touched when num_k > 1
                pltpu.VMEM((heads * nq, 128), jnp.float32),
                pltpu.VMEM((heads * nq, 128), jnp.float32),
                pltpu.VMEM((heads * nq, hd), jnp.float32),
            ]
            if num_k > 1
            else [
                pltpu.VMEM((8, 128), jnp.float32),
                pltpu.VMEM((8, 128), jnp.float32),
                pltpu.VMEM((8, 128), jnp.float32),
            ]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # default scoped-vmem budget is 16 MB; the global layer sits at
            # that cliff (several r5 variants OOM by <1 MB) and the r5
            # default tiles (global bqy=16, merged windows) need ~23 MB.
            # 64 MB default for the measured c<1024 configs; SAM_FLASH_VMEM
            # overrides either way.
            # 64 MB for every config: v5e executes the 22.5M bqy=16 tiles
            # fine under this budget, and ViT-H's global layer sits 1.2M
            # over the 16M default with the clamp softmax's liveness
            vmem_limit_bytes=(
                int(os.environ["SAM_FLASH_VMEM"])
                if os.environ.get("SAM_FLASH_VMEM")
                else 64 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )(*inputs)
    return out


# ------------------------------------------------------ rel-pos score tables


def _relpos_tables_kernel(
    q_ref, rt_ref, wt_ref, o_ref, *, heads: int, hd: int, w: int, s: int
):
    """Build the (rh || rw) score tables for one (image, w-row) block.

    q_ref: (1, w, s, C) — the q slice of the fused qkv tensor. rt/wt:
    (2w-1, hd) REVERSED rel-pos tables. o_ref: (1, w, s, 2*heads*w).

    rh[token(i, x), h, j] = q_h . tab_h[i - j + w - 1] for window-local rows
    i, j. With the reversed table, f = q @ rev(tab)^T gives
    rh[i, :, j] = f[:, w-1-i+j] — a STATIC forward lane-slice per local row,
    so the whole table build is one batched MXU contraction (heads share the
    table) plus w cheap VMEM slices, instead of the per-token einsum +
    concat chain that cost ~10 ms/iter in HBM round-trips at bench shape.
    """
    q = q_ref[0]  # (w, s, C)
    c = heads * hd
    d2 = 2 * w - 1
    q2 = q.reshape(w * s, c)  # major-collapse only (mosaic-safe)
    qt2 = q.transpose(1, 0, 2).reshape(s * w, c)  # column-major tokens

    # Per-head contraction against the tiny reversed tables (lane-splitting
    # (.., C) -> (.., heads, hd) is not a mosaic-supported shape cast, so
    # heads are separated by static lane slices instead).
    rh_parts = [[] for _ in range(w)]  # rh_parts[i][h]: (s, w)
    rw_parts = [[] for _ in range(s)]  # rw_parts[x][h]: (w, w)
    for h in range(heads):
        qh = q2[:, h * hd : (h + 1) * hd]
        f = jax.lax.dot_general(
            qh, rt_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(w, s, d2)
        qth = qt2[:, h * hd : (h + 1) * hd]
        g = jax.lax.dot_general(
            qth, wt_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(s, w, d2)
        for i in range(w):
            rh_parts[i].append(
                jax.lax.slice(f[i], (0, w - 1 - i), (s, d2 - i))
            )
        for x in range(s):
            j = x % w
            rw_parts[x].append(
                jax.lax.slice(g[x], (0, w - 1 - j), (w, d2 - j))
            )

    rh = jnp.stack(
        [jnp.concatenate(p, axis=-1) for p in rh_parts], axis=0
    )  # (w, s, heads*w)
    rw = jnp.stack(
        [jnp.concatenate(p, axis=-1) for p in rw_parts], axis=0
    ).transpose(1, 0, 2)  # (w, s, heads*w)
    o_ref[0] = jnp.concatenate([rh, rw], axis=-1).astype(o_ref.dtype)


def _relpos_tables_kernel_tiled_v2(
    q_ref, th_ref, tw_ref, o_ref,
    *, heads: int, hd: int, w: int, sc: int, pack: int,
):
    """Dot-only variant of :func:`_relpos_tables_kernel` (same
    class-expanded tables as :func:`_relpos_tables_kernel_v2`): the block's
    rows ARE the row classes (blocks start at multiples of w) and its
    columns cycle classes every w (sc is a multiple of w), so the shift
    selection again folds into one contraction per head group followed by
    lane-aligned pack*w block slices."""
    q = q_ref[0]  # (w, sc, C)
    c = heads * hd
    pw = pack * w
    groups = heads // pack
    repsx = sc // w

    q2 = q.reshape(w * sc, c)  # row-major tokens: class = row index
    qt2 = q.transpose(1, 0, 2).reshape(sc * w, c)  # col-major: class = x % w

    rh_parts, rw_parts = [], []
    for g in range(groups):
        lo = g * pack * hd
        f = jax.lax.dot_general(
            q2[:, lo : lo + pack * hd], th_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (w*sc, w*pw)
        f4 = f.reshape(1, w, sc, w * pw)
        rh_parts.append(
            jnp.concatenate(
                [
                    jax.lax.slice(
                        f4, (0, i, 0, i * pw), (1, i + 1, sc, (i + 1) * pw)
                    )
                    for i in range(w)
                ],
                axis=1,
            )
        )  # (1, w, sc, pw)
        gm = jax.lax.dot_general(
            qt2[:, lo : lo + pack * hd], tw_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (sc*w, w*pw); token row = (xr*w + k)*w + i, class k = x % w
        g4 = gm.reshape(repsx, w, w, w * pw)
        rw_parts.append(
            jnp.concatenate(
                [
                    jax.lax.slice(
                        g4, (0, k, 0, k * pw), (repsx, k + 1, w, (k + 1) * pw)
                    )
                    for k in range(w)
                ],
                axis=1,
            )
        )  # (repsx, w, w, pw)
    rh = jnp.concatenate(rh_parts, axis=-1).reshape(w, sc, heads * w)
    rw = jnp.concatenate(rw_parts, axis=-1).reshape(sc, w, heads * w)
    o_ref[0] = jnp.concatenate(
        [rh, rw.transpose(1, 0, 2)], axis=-1
    ).astype(o_ref.dtype)


def _relpos_class_tables(rel_pos_h, rel_pos_w, w, hd, pack, dtype):
    """(2w-1, hd) raw tables -> class-expanded (pack*hd, w*pack*w):
    T[p*hd + d, i*pack*w + q*w + j] = tab[i - j + w - 1, d]."""
    idx = np.arange(w)[:, None] - np.arange(w)[None, :] + w - 1
    eyep = jnp.eye(pack, dtype=dtype)
    tbh = jnp.einsum(
        "pq,ijd->pdiqj", eyep, rel_pos_h[idx].astype(dtype)
    ).reshape(pack * hd, w * pack * w)
    tbw = jnp.einsum(
        "pq,ijd->pdiqj", eyep, rel_pos_w[idx].astype(dtype)
    ).reshape(pack * hd, w * pack * w)
    return tbh, tbw


def _relpos_tables_kernel_big(
    q_ref, th_ref, tw_ref, o_ref,
    *, heads: int, hd: int, w: int, s: int, pack: int,
):
    """Full-image variant: block-diagonal table contractions over ``pack``
    heads at a time (pack chosen so pack*hd = the MXU's 128-lane contraction
    depth — only (pack-1)/pack FLOP waste instead of (heads-1)/heads for one
    all-heads contraction), then static-slice assembly. Used when the
    (s, s, C) block fits VMEM (every 512-input layer)."""
    q = q_ref[0]  # (s, s, C)
    c = heads * hd
    d2 = 2 * w - 1
    groups = heads // pack
    q2 = q.reshape(s * s, c)
    qt2 = q.transpose(1, 0, 2).reshape(s * s, c)
    fs, gs_ = [], []
    for gi in range(groups):
        qg = q2[:, gi * pack * hd : (gi + 1) * pack * hd]
        fs.append(
            jax.lax.dot_general(
                qg, th_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # (s*s, pack*d2)
        qtg = qt2[:, gi * pack * hd : (gi + 1) * pack * hd]
        gs_.append(
            jax.lax.dot_general(
                qtg, tw_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    f = jnp.concatenate(fs, axis=-1).reshape(s, s, heads * d2)
    g = jnp.concatenate(gs_, axis=-1).reshape(s, s, heads * d2)

    if os.environ.get("SAM_RELPOS_ABL") == "noassm":
        # measurement-only (wrong values): null the per-row slice assembly
        # below to bound its share of the kernel's ~2.2x-over-BW-floor cost
        o_ref[0] = jnp.concatenate(
            [f[..., : heads * w], g[..., : heads * w]], axis=-1
        ).astype(o_ref.dtype)
        return

    if os.environ.get("SAM_RELPOS_V3", "0") == "1":
        # v3 assembly (A/B candidate for the r5 open-lead ledger: the
        # noassm ablation bounds this assembly at ~0.35 ms/call): one
        # lane-sliced candidate per ROW CLASS + a row-mask select — w*heads
        # big ops instead of s*heads per-row slices. Copies w/2x more
        # data in 2x fewer, 32x larger ops; wins iff per-op overhead
        # dominates (the same trade every r5 kernel win made).
        rowc = jax.lax.broadcasted_iota(
            jnp.int32, (s, s, heads * w), 0
        ) % w

        def assemble(t):
            outv = jnp.zeros((s, s, heads * w), jnp.float32)
            for cidx in range(w):
                shift = w - 1 - cidx
                cand = jnp.concatenate(
                    [
                        jax.lax.slice(
                            t, (0, 0, h * d2 + shift),
                            (s, s, h * d2 + shift + w),
                        )
                        for h in range(heads)
                    ],
                    axis=-1,
                )
                outv = jnp.where(rowc == cidx, cand, outv)
            return outv

        rh = assemble(f)
        rw = assemble(g).transpose(1, 0, 2)
        o_ref[0] = jnp.concatenate([rh, rw], axis=-1).astype(o_ref.dtype)
        return

    def rows(fy, shift):
        return jnp.concatenate(
            [
                jax.lax.slice(
                    fy, (0, h * d2 + shift), (s, h * d2 + shift + w)
                )
                for h in range(heads)
            ],
            axis=-1,
        )  # (s, heads*w)

    rh = jnp.stack([rows(f[y], w - 1 - y % w) for y in range(s)], axis=0)
    rw = jnp.stack(
        [rows(g[x], w - 1 - x % w) for x in range(s)], axis=0
    ).transpose(1, 0, 2)
    o_ref[0] = jnp.concatenate([rh, rw], axis=-1).astype(o_ref.dtype)


def _relpos_tables_kernel_v2(
    q_ref, th_ref, tw_ref, o_ref, *, heads: int, hd: int, w: int, s: int,
    pack: int,
):
    """Dot-only full-image table builder (no slice-assembly chains).

    The rel-pos tables are SHARED across heads, so one class-expanded table
    serves every ``pack``-head group: ``T[p*hd + d, i*pack*w + p*w + j] =
    tab[i - j + w - 1, d]`` folds the per-row-class shift selection into the
    contraction itself. One full-lane MXU dot per head group yields ALL
    window-local biases for ALL row classes at once; rows of class ``i``
    then read the lane-ALIGNED block ``[i*pack*w, (i+1)*pack*w)`` — w
    aligned block slices per group, vs. the predecessor's heads*s
    misaligned (s, w) slices + concat chains per image, which made the op
    VPU-slicing-bound (~12.8 ms/iter of the r2 bench profile).

    q_ref: (1, s, s, C) q slice of the fused qkv tensor. th/tw:
    (pack*hd, w*pack*w) class-expanded tables. o_ref: (1, s, s, 2*heads*w).
    """
    q = q_ref[0]  # (s, s, C)
    c = heads * hd
    reps = s // w
    pw = pack * w
    groups = heads // pack

    def build(q2, t_ref):
        # q2: (s*s, C) tokens, class of a token = (row index) % w
        parts = []
        for g in range(groups):
            qg = q2[:, g * pack * hd : (g + 1) * pack * hd]
            f = jax.lax.dot_general(
                qg, t_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (s*s, w*pw): per token, biases for EVERY row class
            f4 = f.reshape(reps, w, s, w * pw)
            parts.append(
                jnp.concatenate(
                    [
                        jax.lax.slice(
                            f4, (0, i, 0, i * pw), (reps, i + 1, s, (i + 1) * pw)
                        )
                        for i in range(w)
                    ],
                    axis=1,
                )
            )  # (reps, w, s, pw)
        # group-major lane concat = head-major h*w+j layout: lane
        # g*pw + p*w + j == (g*pack + p)*w + j
        return jnp.concatenate(parts, axis=-1).reshape(s, s, heads * w)

    rh = build(q.reshape(s * s, c), th_ref)
    rw = build(q.transpose(1, 0, 2).reshape(s * s, c), tw_ref).transpose(
        1, 0, 2
    )
    o_ref[0] = jnp.concatenate([rh, rw], axis=-1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "window", "interpret", "v2")
)
def relpos_tables(
    qkv: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    heads: int,
    window: int,
    interpret: bool = False,
    v2: Optional[bool] = None,
) -> jnp.ndarray:
    """(B, S, S, 3C) fused qkv + raw (2w-1, hd) tables -> rhw (B, S, S, 2*heads*w).

    Output layout matches :func:`flash_attention_grid`'s ``rhw`` operand:
    rh || rw, head-major within each half, window-local k indices.
    """
    b, s, _, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    w = window
    d2 = 2 * w - 1
    assert rel_pos_h.shape == (2 * w - 1, hd), (rel_pos_h.shape, w, hd)
    rt = rel_pos_h[::-1].astype(qkv.dtype)
    wt = rel_pos_w[::-1].astype(qkv.dtype)
    use_v2 = _RELPOS_V2 if v2 is None else v2

    if s <= 32 and s % w == 0 and use_v2:
        pack = max(
            d for d in range(1, heads + 1)
            if heads % d == 0 and d * hd <= 128
        )
        pw = pack * w
        tbh, tbw = _relpos_class_tables(
            rel_pos_h, rel_pos_w, w, hd, pack, qkv.dtype
        )
        kernel = functools.partial(
            _relpos_tables_kernel_v2, heads=heads, hd=hd, w=w, s=s, pack=pack
        )
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, s, s, c), lambda bi: (bi, 0, 0, 0)),
                pl.BlockSpec((pack * hd, w * pw), lambda bi: (0, 0)),
                pl.BlockSpec((pack * hd, w * pw), lambda bi: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, s, s, 2 * heads * w), lambda bi: (bi, 0, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((b, s, s, 2 * heads * w), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(qkv, tbh, tbw)

    if s <= 32:
        # full-image blocks; tables packed pack-heads-at-a-time so each dot
        # contracts the full 128 MXU lanes with minimal block-diagonal waste
        pack = max(
            d for d in range(1, heads + 1)
            if heads % d == 0 and d * hd <= 128
        )
        eye = jnp.eye(pack, dtype=qkv.dtype)[:, None, :, None]
        tbh = (eye * rt.T[None, :, None, :]).reshape(pack * hd, pack * d2)
        tbw = (eye * wt.T[None, :, None, :]).reshape(pack * hd, pack * d2)
        kernel = functools.partial(
            _relpos_tables_kernel_big, heads=heads, hd=hd, w=w, s=s, pack=pack
        )
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, s, s, c), lambda bi: (bi, 0, 0, 0)),
                pl.BlockSpec((pack * hd, pack * d2), lambda bi: (0, 0)),
                pl.BlockSpec((pack * hd, pack * d2), lambda bi: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, s, s, 2 * heads * w), lambda bi: (bi, 0, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((b, s, s, 2 * heads * w), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(qkv, tbh, tbw)

    # column tiling keeps wide-channel blocks (ViT-L/H at 1024-input) inside
    # VMEM; sc must be a multiple of w so window-local x stays static
    sc = max(
        [
            d for d in range(w, s + 1, w)
            if s % d == 0 and w * d * c * 2 <= 1_800_000
        ]
        or [w]
    )
    if use_v2 and s % w == 0:
        pack = max(
            d for d in range(1, heads + 1)
            if heads % d == 0 and d * hd <= 128
        )
        tbh, tbw = _relpos_class_tables(
            rel_pos_h, rel_pos_w, w, hd, pack, qkv.dtype
        )
        kernel = functools.partial(
            _relpos_tables_kernel_tiled_v2,
            heads=heads, hd=hd, w=w, sc=sc, pack=pack,
        )
        return pl.pallas_call(
            kernel,
            grid=(b, s // w, s // sc),
            in_specs=[
                pl.BlockSpec((1, w, sc, c), lambda bi, yi, xi: (bi, yi, xi, 0)),
                pl.BlockSpec(
                    (pack * hd, w * pack * w), lambda bi, yi, xi: (0, 0)
                ),
                pl.BlockSpec(
                    (pack * hd, w * pack * w), lambda bi, yi, xi: (0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, w, sc, 2 * heads * w), lambda bi, yi, xi: (bi, yi, xi, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (b, s, s, 2 * heads * w), qkv.dtype
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            interpret=interpret,
        )(qkv, tbh, tbw)

    kernel = functools.partial(
        _relpos_tables_kernel, heads=heads, hd=hd, w=w, s=sc
    )
    return pl.pallas_call(
        kernel,
        grid=(b, s // w, s // sc),
        in_specs=[
            pl.BlockSpec((1, w, sc, c), lambda bi, yi, xi: (bi, yi, xi, 0)),
            pl.BlockSpec((2 * w - 1, hd), lambda bi, yi, xi: (0, 0)),
            pl.BlockSpec((2 * w - 1, hd), lambda bi, yi, xi: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, w, sc, 2 * heads * w), lambda bi, yi, xi: (bi, yi, xi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, s, 2 * heads * w), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(qkv, rt, wt)


def reference_attention_relpos(q, k, v, rh, rw, grid_s):
    """Naive oracle with the same bias decomposition (for tests)."""
    bh, n, hd = q.shape
    s = jnp.einsum("bqc,bkc->bqk", q * (hd ** -0.5), k).astype(jnp.float32)
    ky = jnp.arange(n) // grid_s
    kx = jnp.arange(n) % grid_s
    bias = rh[:, :, ky] + rw[:, :, kx]  # (BH, N, N) — test sizes only
    attn = jax.nn.softmax(s + bias, axis=-1)
    return jnp.einsum("bqk,bkc->bqc", attn, v.astype(jnp.float32)).astype(v.dtype)
