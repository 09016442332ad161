"""Fused SAM-decoder image-to-token update as one Pallas pass.

The decoder's i2t step updates every image token of every prompt stream:

    kk   = keys + img_pe
    qp   = kk @ Wq + bq                      (per-token query)
    attn = softmax_h(qp . k_tokens) @ v_tokens   (7-token axis per head)
    keys = LayerNorm(keys + (attn @ Wout + bout))

XLA executes this as ~6 HBM round-trips over the (B*K, T, C) keys stream
(268 MB at bench shape — the decoder's dominant cost). Everything here is
LOCAL to a keys tile, so one Pallas pass does read-keys -> write-keys.

Tricks:
* the per-head (T, tq) logits/attention products are packed into single
  full-tile matmuls with block-diagonal k/v factors (`kbd` (dh, H*tq),
  `vbd` (H*tq, dh)) built host-side per prompt — the zero waste is free
  next to full-lane MXU issues;
* the per-head softmax over tq tokens subtracts the ROW-global max instead
  of per-group maxima (mathematically identical — the shift cancels in the
  normalized ratio; fp32 exp keeps far-below-max groups representable), so
  no lane-split reshapes are needed; group sums and their broadcast back
  ride two tiny matmuls against the group-indicator matrix.

K-sharing: at decoder layer 0 the keys source is per-image ((B, T, C));
``k_share`` = K makes prompt n read source row n // K (reference semantics:
all K prompts of an image share the untouched image tokens).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SAM_I2T_V2=1 opt-in (A/B pending device measurement): on shared-source
# passes (decoder layer 0, k_share=K) hoist the per-image query projection
# out of the per-prompt loop (it only depends on the shared keys block) and
# run 4 prompts per grid step instead of 2 (fewer grid steps, kk/qp
# amortized 4x).
_I2T_V2 = os.environ.get("SAM_I2T_V2", "0") == "1"


def _i2t_update_kernel(
    keys_ref, pe_ref, kbd_ref, vbd_ref, g_ref,
    wq_ref, bq_ref, wout_ref, bout_ref, lns_ref, lnb_ref,
    *rest,
    heads: int, tq: int, scale: float, eps: float, with_t2i: bool,
    out_grid: int = 0, pb: int = 1, shared_src: bool = False,
    hoist_qp: bool = False,
):
    if with_t2i:
        (qbd_ref, wk2_ref, bk2_ref, wv2_ref, bv2_ref,
         o_ref, t2i_ref) = rest
    else:
        (o_ref,) = rest
    qp = None
    if hoist_qp and shared_src and pb > 1:
        # every prompt of this step reads keys_ref[0] (pb divides k_share),
        # so kk + the query projection are identical across the loop
        qp = _i2t_query_proj(keys_ref[0], pe_ref, wq_ref, bq_ref, scale)
    for _p in range(pb):
        _i2t_one_prompt(
            keys_ref, pe_ref, kbd_ref, vbd_ref, g_ref,
            wq_ref, bq_ref, wout_ref, bout_ref, lns_ref, lnb_ref,
            rest, heads=heads, tq=tq, scale=scale, eps=eps,
            with_t2i=with_t2i, out_grid=out_grid, p=_p,
            src=0 if shared_src else _p, qp=qp,
        )


def _i2t_query_proj(keys, pe_ref, wq_ref, bq_ref, scale):
    """(T, C) keys -> scaled (T, dh) fp32 query projection."""
    kk = keys + pe_ref[...].astype(keys.dtype)
    return (
        jax.lax.dot_general(
            kk, wq_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bq_ref[...]
    ) * scale


def _i2t_one_prompt(
    keys_ref, pe_ref, kbd_ref, vbd_ref, g_ref,
    wq_ref, bq_ref, wout_ref, bout_ref, lns_ref, lnb_ref,
    rest,
    *, heads: int, tq: int, scale: float, eps: float, with_t2i: bool,
    out_grid: int, p: int, src: int, qp=None,
):
    if with_t2i:
        (qbd_ref, wk2_ref, bk2_ref, wv2_ref, bv2_ref,
         o_ref, t2i_ref) = rest
    else:
        (o_ref,) = rest
    abl = os.environ.get("SAM_I2T_ABL", "")  # measurement-only ablations
    keys = keys_ref[src]  # (T, C)
    if abl == "noqp":
        qp = jnp.zeros((keys.shape[0], wq_ref.shape[1]), jnp.float32)
    elif qp is None:
        qp = _i2t_query_proj(keys, pe_ref, wq_ref, bq_ref, scale)
    if abl == "nosmall":
        attn = qp[:, : vbd_ref.shape[2]].astype(keys.dtype)
    else:
        logits = jax.lax.dot_general(
            qp.astype(keys.dtype), kbd_ref[p],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, H*tq)
        rowmax = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - rowmax)  # fp32: below-max groups stay finite
        gsum = jax.lax.dot_general(
            e, g_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, H) per-head sums
        rden = jax.lax.dot_general(
            1.0 / gsum, g_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, H*tq) broadcast back
        p_ = (e * rden).astype(keys.dtype)
        attn = jax.lax.dot_general(
            p_, vbd_ref[p], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(keys.dtype)  # (T, dh)
    if abl == "noout":
        out = jnp.broadcast_to(
            bout_ref[...], (keys.shape[0], bout_ref.shape[1])
        ) + attn[:, :1].astype(jnp.float32)
    else:
        out = (
            jax.lax.dot_general(
                attn, wout_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bout_ref[...]
        )  # (T, C) fp32
    y = keys.astype(jnp.float32) + out
    mean = jnp.mean(y, axis=1, keepdims=True)
    d = y - mean
    var = jnp.mean(d * d, axis=1, keepdims=True)
    keys_new = (
        d * jax.lax.rsqrt(var + eps) * lns_ref[...] + lnb_ref[...]
    ).astype(o_ref.dtype)
    if out_grid:
        # final layer: store straight into the (gs, gs, C) grid layout the
        # mask head consumes (saves a 268 MB relayout copy downstream)
        o_ref[p] = keys_new.reshape(out_grid, out_grid, keys_new.shape[-1])
    else:
        o_ref[p] = keys_new

    if not with_t2i:
        return
    # ---- next stage's token-to-image attention, same pass -----------------
    # the whole T axis sits in this block, so the softmax over image tokens
    # is local; qbd is the block-diagonal (scaled) query factor of the NEXT
    # layer's t2i (or the final t2i), built host-side AFTER that layer's
    # self-attn+LN1 (legal reorder: i2t never touches the queries).
    kk2 = keys_new + pe_ref[...].astype(keys_new.dtype)
    kp2 = (
        jax.lax.dot_general(
            kk2, wk2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bk2_ref[...]
    ).astype(keys_new.dtype)  # (T, dh2)
    vp2 = (
        jax.lax.dot_general(
            keys_new, wv2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bv2_ref[...]
    ).astype(keys_new.dtype)
    logits2 = jax.lax.dot_general(
        qbd_ref[p], kp2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H*tq, T) — row = (head, query token)
    m2 = jnp.max(logits2, axis=1, keepdims=True)
    e2 = jnp.exp(logits2 - m2)
    p2 = (e2 / jnp.sum(e2, axis=1, keepdims=True)).astype(keys_new.dtype)
    # full (H*tq, dh2) product; only each row-group's own head-block is
    # consumed host-side (the off-diagonal waste is tiny next to the
    # projections above)
    t2i_ref[p] = jax.lax.dot_general(
        p2, vp2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(t2i_ref.dtype)


def _t2i_shared_kernel(
    keys_ref, pe_ref, qbd_ref, wk_ref, bk_ref, wv_ref, bv_ref, o_ref,
    *, kpi: int,
):
    kk = keys_ref[0] + pe_ref[...].astype(keys_ref.dtype)
    kp = (
        jax.lax.dot_general(
            kk, wk_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bk_ref[...]
    ).astype(kk.dtype)  # (T, dh2)
    vp = (
        jax.lax.dot_general(
            keys_ref[0], wv_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bv_ref[...]
    ).astype(kk.dtype)
    for p in range(kpi):
        logits = jax.lax.dot_general(
            qbd_ref[p], kp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H*tq, T)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        pr = (e / jnp.sum(e, axis=1, keepdims=True)).astype(kk.dtype)
        o_ref[p] = jax.lax.dot_general(
            pr, vp, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "k_share", "interpret"))
def t2i_shared_attend(
    keys_img: jnp.ndarray,
    img_pe: jnp.ndarray,
    qp: jnp.ndarray,
    wk: jnp.ndarray,
    bk: jnp.ndarray,
    wv: jnp.ndarray,
    bv: jnp.ndarray,
    heads: int,
    k_share: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Decoder layer-0 token-to-image attention against PER-IMAGE keys.

    keys_img: (B, T, C); qp: (N, tq, dh2) ALREADY-SCALED query projections
    with N = B * k_share. The k/v projections of the image tokens run once
    per image inside the kernel, and each prompt's (H*tq, T) softmax stays
    in VMEM (XLA's path round-trips the fp32 logits through HBM). Returns
    the attention output (N, tq, dh2), head-major.
    """
    b, t, c = keys_img.shape
    n, tq, dh2 = qp.shape
    hd2 = dh2 // heads
    interpret = interpret or jax.default_backend() == "cpu"
    eye = jnp.eye(heads, dtype=qp.dtype)
    qph = qp.reshape(n, tq, heads, hd2).transpose(0, 2, 1, 3)
    qbd = jnp.einsum("hg,ngtd->nhtgd", eye, qph).reshape(n, heads * tq, dh2)
    raw = pl.pallas_call(
        functools.partial(_t2i_shared_kernel, kpi=k_share),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((t, c), lambda i: (0, 0)),
            pl.BlockSpec((k_share, heads * tq, dh2), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, dh2), lambda i: (0, 0)),
            pl.BlockSpec((1, dh2), lambda i: (0, 0)),
            pl.BlockSpec((c, dh2), lambda i: (0, 0)),
            pl.BlockSpec((1, dh2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((k_share, heads * tq, dh2), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, heads * tq, dh2), keys_img.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        keys_img,
        img_pe.reshape(t, c),
        qbd.astype(keys_img.dtype),
        wk.astype(keys_img.dtype),
        bk.reshape(1, dh2).astype(jnp.float32),
        wv.astype(keys_img.dtype),
        bv.reshape(1, dh2).astype(jnp.float32),
    )
    return jnp.concatenate(
        [
            raw[:, h * tq : (h + 1) * tq, h * hd2 : (h + 1) * hd2]
            for h in range(heads)
        ],
        axis=-1,
    )


@functools.partial(
    jax.jit,
    static_argnames=("heads", "k_share", "eps", "interpret", "out_grid", "v2"),
)
def i2t_keys_update(
    keys_src: jnp.ndarray,
    img_pe: jnp.ndarray,
    kp: jnp.ndarray,
    vp: jnp.ndarray,
    wq: jnp.ndarray,
    bq: jnp.ndarray,
    wout: jnp.ndarray,
    bout: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    heads: int,
    k_share: int = 1,
    eps: float = 1e-6,
    interpret: bool = False,
    t2i: Optional[dict] = None,
    out_grid: int = 0,
    v2: Optional[bool] = None,
):
    """One fused i2t + residual + LayerNorm pass over the keys stream.

    keys_src: (N, T, C) per-prompt keys, or (B, T, C) with ``k_share=K``
    (prompt n reads row n // K). kp/vp: (N, tq, dh) projected k/v of the
    prompt tokens (queries + point_pe / queries). Returns (N, T, C) with
    N = keys_src.shape[0] * k_share.

    ``t2i``: optionally fuse the NEXT stage's token-to-image attention into
    the same pass: {"qp": (N, tq2, dh2) ALREADY-SCALED query projections,
    "wk", "bk", "wv", "bv"}. Then returns (keys_new, t2i_attn (N, tq2, dh2)).
    """
    nsrc, t, c = keys_src.shape
    n = nsrc * k_share
    tq = kp.shape[1]
    dh = kp.shape[2]
    hd = dh // heads
    scale = hd ** -0.5
    interpret = interpret or jax.default_backend() == "cpu"
    use_v2 = _I2T_V2 if v2 is None else v2

    # block-diagonal per-prompt factors (the off-diagonal zeros are free:
    # the packed dots run full-lane either way)
    eye = jnp.eye(heads, dtype=kp.dtype)
    kph = kp.reshape(n, tq, heads, hd).transpose(0, 2, 3, 1)  # (N, H, hd, tq)
    kbd = jnp.einsum("hg,ngdt->nhdgt", eye, kph).reshape(n, dh, heads * tq)
    vph = vp.reshape(n, tq, heads, hd).transpose(0, 2, 1, 3)  # (N, H, tq, hd)
    vbd = jnp.einsum("hg,ngtd->nhtgd", eye, vph).reshape(n, heads * tq, dh)
    g = jnp.repeat(jnp.eye(heads, dtype=jnp.float32), tq, axis=0)  # (H*tq, H)

    kernel = functools.partial(
        _i2t_update_kernel, heads=heads, tq=tq, scale=scale, eps=eps,
        with_t2i=t2i is not None, out_grid=out_grid,
    )
    # prompt pairs per grid step (halves the step count; legal whenever the
    # pair shares a keys-source block: always for per-prompt keys, and for
    # k_share >= pb sharing since pb divides k_share). VMEM-gated: at the
    # ViT-H/2048 config (t=4096) a paired keys block is 4 MB and the kernel
    # sits at the 16 MB scoped-vmem limit — the lax.map-chunked wrapper's
    # stack overhead then tips it over, so large-t blocks stay unpaired.
    pb = (
        2
        if n % 2 == 0 and (k_share == 1 or k_share % 2 == 0) and t * c <= 2**18
        else 1
    )
    if (
        use_v2
        and (k_share == 1 or k_share % 4 == 0)
        and n % 4 == 0
        and t * c <= 2**18
    ):
        # 4 prompts per grid step: shared-source (layer 0) steps amortize
        # one hoisted kk/qp 4x; per-prompt (layer 1+) steps just halve the
        # grid-step count. A 4-prompt keys block at t*c <= 2**18 is half
        # the bytes of the proven t=4096 pb=2 block.
        pb = 4
    shared_src = k_share > 1
    if shared_src:
        keys_spec = pl.BlockSpec(
            (1, t, c), lambda i: ((i * pb) // k_share, 0, 0)
        )
    else:
        keys_spec = pl.BlockSpec((pb, t, c), lambda i: (i, 0, 0))
    in_specs = [
        keys_spec,
        pl.BlockSpec((t, c), lambda i: (0, 0)),
        pl.BlockSpec((pb, dh, heads * tq), lambda i: (i, 0, 0)),
        pl.BlockSpec((pb, heads * tq, dh), lambda i: (i, 0, 0)),
        pl.BlockSpec((heads * tq, heads), lambda i: (0, 0)),
        pl.BlockSpec((c, dh), lambda i: (0, 0)),
        pl.BlockSpec((1, dh), lambda i: (0, 0)),
        pl.BlockSpec((dh, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
    ]
    inputs = [
        keys_src,
        img_pe.reshape(t, c),
        kbd,
        vbd,
        g,
        wq.astype(keys_src.dtype),
        bq.reshape(1, dh).astype(jnp.float32),
        wout.astype(keys_src.dtype),
        bout.reshape(1, c).astype(jnp.float32),
        ln_scale.reshape(1, c).astype(jnp.float32),
        ln_bias.reshape(1, c).astype(jnp.float32),
    ]
    if out_grid:
        assert out_grid * out_grid == t
        out_specs = pl.BlockSpec(
            (pb, out_grid, out_grid, c), lambda i: (i, 0, 0, 0)
        )
        out_shape = jax.ShapeDtypeStruct(
            (n, out_grid, out_grid, c), keys_src.dtype
        )
    else:
        out_specs = pl.BlockSpec((pb, t, c), lambda i: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct((n, t, c), keys_src.dtype)
    if t2i is not None:
        qp2 = t2i["qp"]
        tq2, dh2 = qp2.shape[1], qp2.shape[2]
        hd2 = dh2 // heads
        qph = qp2.reshape(n, tq2, heads, hd2).transpose(0, 2, 1, 3)
        qbd = jnp.einsum("hg,ngtd->nhtgd", eye.astype(qp2.dtype), qph).reshape(
            n, heads * tq2, dh2
        )
        in_specs += [
            pl.BlockSpec((pb, heads * tq2, dh2), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, dh2), lambda i: (0, 0)),
            pl.BlockSpec((1, dh2), lambda i: (0, 0)),
            pl.BlockSpec((c, dh2), lambda i: (0, 0)),
            pl.BlockSpec((1, dh2), lambda i: (0, 0)),
        ]
        inputs += [
            qbd.astype(keys_src.dtype),
            t2i["wk"].astype(keys_src.dtype),
            t2i["bk"].reshape(1, dh2).astype(jnp.float32),
            t2i["wv"].astype(keys_src.dtype),
            t2i["bv"].reshape(1, dh2).astype(jnp.float32),
        ]
        out_specs = [
            out_specs,
            pl.BlockSpec((pb, heads * tq2, dh2), lambda i: (i, 0, 0)),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((n, heads * tq2, dh2), keys_src.dtype),
        ]
    kernel = functools.partial(
        kernel, pb=pb, shared_src=shared_src, hoist_qp=use_v2
    )
    result = pl.pallas_call(
        kernel,
        grid=(n // pb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*inputs)
    if t2i is None:
        return result
    keys_new, raw = result
    # each row-group h consumes only its own head's value block
    attn = jnp.concatenate(
        [
            raw[:, h * tq2 : (h + 1) * tq2, h * hd2 : (h + 1) * hd2]
            for h in range(heads)
        ],
        axis=-1,
    )  # (N, tq2, dh2) head-major
    return keys_new, attn
