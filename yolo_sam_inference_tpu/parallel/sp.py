"""Sequence-parallel SAM image encoder over an (optional dp,) sp device mesh.

Motivation (BENCH_NOTES r3, config 4): at ViT-H/2048 the single-chip bench
sits on the bf16 MXU roofline (~5.2 TFLOP of encoder matmul per image) —
there is no more single-chip headroom without quantization. The TPU-native
way past a single-chip roofline is to shard the *sequence*: the encoder's
token grid is split row-wise over the 'sp' mesh axis so every layer's
matmuls, LayerNorms and MLPs run on S/sp of the tokens per chip, cutting
per-image encoder latency ~sp-fold for FLOP-bound configs. (The reference
can only thread-replicate whole GPU models over images —
reference ``pipeline.py:440-467`` — i.e. throughput scaling; latency
scaling of one image is inexpressible there.)

Sharding per layer (activations sharded, weights replicated — the dual of
``parallel/tp.py``, which shards weights and replicates activations):

* patch embed: stride-``ps`` VALID conv has no cross-patch halo, so each
  shard embeds only its pixel-row block — input images are laid out
  ``P(('dp',) 'sp', None, None)`` over height;
* pos embed: row-sliced with the same spec (it is data, not compute);
* windowed attention layers: windows are ``ws``-aligned row blocks; with
  ``(S/sp) % ws == 0`` every window lies inside one shard — zero
  communication;
* global attention layers: q stays local; k/v are ``all_gather``-ed over
  'sp' (one collective per global layer, riding ICI), and the decomposed
  rel-pos bias is rebuilt with the shard's absolute row offset
  (``lax.axis_index('sp') * rows_local``) so local q rows index the
  replicated ``(2S-1, hd)`` tables at their true grid positions;
* LN / MLP / residuals: token-local by construction — zero communication;
* neck: the 3x3 conv needs a one-row halo, so the grid is gathered once
  at the very end (one ``all_gather`` of the (B, S, S, C) tokens) and the
  neck itself is computed replicated (<<1% of encoder FLOPs).

Communication total: ``len(global_attn_indexes) + 1`` all-gathers per
image — 5 for every standard SAM config. Everything else is local.

Numerics match the single-device einsum attention path
(``models/sam/model.py:215-266``) contraction-for-contraction: fp32 logit
accumulation cast to the activation dtype, bias added pre-softmax, fp32
softmax. Parity: ``tests/test_parallel.py::test_sp_encoder_matches_single_device``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.sam.config import SamTPUConfig
from ..models.sam.model import (
    _FLASH_MIN_GRID,
    _encoder_neck,
    _gelu,
    _layer_norm,
    _linear,
    _softmax_fp32,
)
from ..ops.flash_attention import flash_attention_relpos

Params = Dict[str, Any]


def _win_part_rect(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, Hl, W, C) -> (B*nwh*nww, ws, ws, C); Hl and W must divide by ws.

    The model's ``_window_partition`` assumes a square grid; a sequence
    shard is a row *block* (Hl = S/sp rows of the full S-wide grid).
    """
    b, hh, ww, c = x.shape
    x = x.reshape(b, hh // ws, ws, ww // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c)


def _win_unpart_rect(win: jnp.ndarray, ws: int, b: int, hh: int, ww: int) -> jnp.ndarray:
    c = win.shape[-1]
    x = win.reshape(b, hh // ws, ww // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hh, ww, c)


def _window_attention_local(
    a: Params, h: jnp.ndarray, heads: int, ws: int, use_rel_pos: bool = True
) -> jnp.ndarray:
    """Windowed attention on a row-block shard: all windows are local."""
    b, hl, ww, c = h.shape
    hd = c // heads
    win = _win_part_rect(h, ws)  # (B*nw, ws, ws, C)
    n = ws * ws
    qkv = _linear(a["qkv"], win.reshape(-1, n, c))
    qkv = qkv.reshape(-1, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B*nw, H, n, hd)
    logits = jnp.einsum(
        "bhqc,bhkc->bhqk", q * (hd**-0.5), k,
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)
    if use_rel_pos:
        # window-local rel-pos: static (ws, ws) index tables, same as the
        # single-device _vision_rel_bias at size=ws
        idx = np.arange(ws)[:, None] - np.arange(ws)[None, :] + ws - 1
        rh_t = a["rel_pos_h"][idx]  # (ws, ws, hd)
        rw_t = a["rel_pos_w"][idx]
        qg = q.reshape(-1, heads, ws, ws, hd)
        bias_h = jnp.einsum("bhqwc,qkc->bhqwk", qg, rh_t)
        bias_w = jnp.einsum("bhqwc,wkc->bhqwk", qg, rw_t)
        bias = (bias_h[..., :, None] + bias_w[..., None, :]).reshape(
            -1, heads, n, n
        )
        logits = logits + bias.astype(h.dtype)
    attn = _softmax_fp32(logits).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(-1, n, c)
    out = _linear(a["proj"], out).reshape(-1, ws, ws, c)
    return _win_unpart_rect(out, ws, b, hl, ww)


def _global_attention_sp(
    a: Params, h: jnp.ndarray, heads: int, s: int, sp_axis: str,
    use_rel_pos: bool = True,
) -> jnp.ndarray:
    """Global attention with local q rows vs all-gathered k/v.

    h: (B, S/sp, S, C) — this shard's row block. The rel-pos height bias is
    rebuilt at the shard's absolute rows (offset = axis_index * rows_local);
    the width bias is fully local (all columns are present). On TPU at
    S >= 32 the local q block runs through the same flash kernel as the
    single-chip path (``flash_attention_relpos`` accepts a row-aligned q
    subset — the folded bias is q/k-separable); the einsum branch is the
    CPU-mesh / small-grid oracle.
    """
    b, hl, ww, c = h.shape
    hd = c // heads
    nl = hl * ww
    qkv = _linear(a["qkv"], h.reshape(b, nl, c))
    qkv = qkv.reshape(b, nl, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, nl, hd)
    # one collective each: (B, H, nl, hd) -> (B, H, S*S, hd), row-major
    # token order preserved because shard r holds row block r
    k_full = jax.lax.all_gather(k, sp_axis, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, sp_axis, axis=2, tiled=True)

    if use_rel_pos:
        off = jax.lax.axis_index(sp_axis) * hl
        rows = jnp.arange(hl) + off  # absolute q rows (traced)
        rel_h = rows[:, None] - jnp.arange(s)[None, :] + s - 1  # (hl, s)
        rh_t = jnp.take(a["rel_pos_h"], rel_h, axis=0)  # (hl, s, hd)
        idx_w = np.arange(s)[:, None] - np.arange(s)[None, :] + s - 1
        rw_t = a["rel_pos_w"][idx_w]  # (s, s, hd)

    if use_rel_pos and s >= _FLASH_MIN_GRID and jax.default_backend() != "cpu":
        # flash path (same kernel + tile policy as model.py's global
        # layers): no materialized (nl, S^2) logits, bias folded into the
        # contraction via the local q rows' score tables
        n = s * s
        qg = q.reshape(b, heads, hl, ww, hd).astype(jnp.float32)
        rh = jnp.einsum(
            "bhqwc,qkc->bhqwk", qg, rh_t.astype(jnp.float32)
        ).reshape(b * heads, nl, s)
        rw = jnp.einsum(
            "bhqwc,wkc->bhqwk", qg, rw_t.astype(jnp.float32)
        ).reshape(b * heads, nl, s)
        bq = max(d for d in range(8, min(1024, nl) + 1, 8) if nl % d == 0)
        bk = max(m for m in range(s, min(1024, n) + 1, s) if n % m == 0)
        out = flash_attention_relpos(
            q.reshape(b * heads, nl, hd),
            k_full.reshape(b * heads, n, hd),
            v_full.reshape(b * heads, n, hd),
            rh, rw, grid_s=s, block_q=bq, block_k=bk,
        ).reshape(b, heads, nl, hd)
    else:
        logits = jnp.einsum(
            "bhqc,bhkc->bhqk", q * (hd**-0.5), k_full,
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        if use_rel_pos:
            qg = q.reshape(b, heads, hl, ww, hd)
            bias_h = jnp.einsum("bhqwc,qkc->bhqwk", qg, rh_t)  # (B,H,hl,s,kh)
            bias_w = jnp.einsum("bhqwc,wkc->bhqwk", qg, rw_t)  # (B,H,hl,s,kw)
            bias = (bias_h[..., :, None] + bias_w[..., None, :]).reshape(
                b, heads, nl, s * s
            )
            logits = logits + bias.astype(h.dtype)
        attn = _softmax_fp32(logits).astype(v_full.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v_full)  # (B, H, nl, hd)
    out = out.transpose(0, 2, 1, 3).reshape(b, nl, c)
    return _linear(a["proj"], out).reshape(b, hl, ww, c)


def _encoder_local(
    p: Params, pix_local: jnp.ndarray, pos_local: jnp.ndarray,
    cfg: SamTPUConfig, sp_axis: str = "sp",
) -> jnp.ndarray:
    """One shard's row block of the SP encoder (runs inside shard_map)."""
    ps = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        pix_local, p["patch_embed"]["w"], window_strides=(ps, ps),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["patch_embed"]["b"]
    x = x + pos_local
    s, ws = cfg.grid_size, cfg.window_size

    for i, lp in enumerate(p["layers"]):
        h = _layer_norm(lp["ln1"], x, cfg.layer_norm_eps)
        if i in cfg.global_attn_indexes:
            h = _global_attention_sp(
                lp["attn"], h, cfg.vision_heads, s, sp_axis, cfg.use_rel_pos
            )
        else:
            h = _window_attention_local(
                lp["attn"], h, cfg.vision_heads, ws, cfg.use_rel_pos
            )
        x = x + h
        h = _layer_norm(lp["ln2"], x, cfg.layer_norm_eps)
        h = _gelu(h @ lp["mlp1"]["w"] + lp["mlp1"]["b"])
        h = h @ lp["mlp2"]["w"] + lp["mlp2"]["b"]
        x = x + h

    # the 3x3 neck conv needs a one-row halo: gather the (cheap) token grid
    # once and run the neck replicated (<1% of encoder FLOPs)
    full = jax.lax.all_gather(x, sp_axis, axis=1, tiled=True)  # (B, S, S, C)
    return _encoder_neck(p, full)


def sam_image_encoder_sp(
    params: Params,
    pixel_values: jnp.ndarray,
    cfg: SamTPUConfig,
    mesh: Mesh,
) -> jnp.ndarray:
    """Sequence-parallel SAM image encoder.

    ``pixel_values``: (B, H, W, 3) normalized pixels, sharded row-wise over
    'sp' (and over 'dp' on the batch axis when the mesh has one). Weights
    are replicated; only activations shard. Returns (B, gs, gs, out_c)
    embeddings, replicated over 'sp'.

    Requires ``grid_size % sp == 0`` and, when any windowed layer exists,
    ``(grid_size / sp) % window_size == 0`` (window-aligned row blocks:
    sp in {2, 4} for every standard SAM config at the 1024 canvas).
    """
    sp = int(mesh.shape["sp"])
    s, ws = cfg.grid_size, cfg.window_size
    if s % sp:
        raise ValueError(f"sp={sp} must divide grid_size={s}")
    rows_local = s // sp
    has_windowed = len(cfg.global_attn_indexes) < cfg.vision_layers
    if has_windowed and rows_local % ws:
        raise ValueError(
            f"sp={sp} leaves {rows_local} token rows per shard, not a "
            f"multiple of window_size={ws}"
        )

    has_dp = "dp" in mesh.axis_names
    data_spec = P("dp", "sp", None, None) if has_dp else P(None, "sp", None, None)

    v_sharded = shard_sam_encoder_sp(params, cfg, mesh)
    treedef = jax.tree_util.tree_structure(v_sharded["vision"])
    run = _sp_runner(cfg, mesh, has_dp, treedef)
    pix = jax.device_put(pixel_values, NamedSharding(mesh, data_spec))
    return run(v_sharded["vision"], pix)


_POS_SPEC = P(None, "sp", None, None)


def shard_sam_encoder_sp(params: Params, cfg: SamTPUConfig, mesh: Mesh) -> Params:
    """Place the vision tree on ``mesh`` for SP: weights replicated, the
    pos embed row-sharded over 'sp'. Idempotent — pass the result back
    through :func:`sam_image_encoder_sp` (or call it with raw params once)
    and repeat calls skip the host->device weight transfer."""
    v = params.get("vision", params)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    v_sharded = jax.tree_util.tree_map(lambda x: put(x, P()), v)
    v_sharded["pos_embed"] = put(v["pos_embed"], _POS_SPEC)
    return {"vision": v_sharded}


@functools.lru_cache(maxsize=8)
def _sp_runner(cfg: SamTPUConfig, mesh: Mesh, has_dp: bool, treedef):
    """Jitted shard_map closure, cached per (cfg, mesh, param layout) so
    repeated calls reuse one trace/compile instead of rebuilding the jit
    each time (the treedef key keeps the spec tree in lockstep with
    whatever vision-tree layout the caller holds)."""
    data_spec = P("dp", "sp", None, None) if has_dp else P(None, "sp", None, None)
    out_spec = P("dp", None, None, None) if has_dp else P()
    param_specs = jax.tree_util.tree_unflatten(
        treedef, [P()] * treedef.num_leaves
    )
    param_specs["pos_embed"] = _POS_SPEC

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(param_specs, data_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    def run(p_local, pix_local):
        return _encoder_local(
            p_local, pix_local, p_local["pos_embed"], cfg
        )

    return run
