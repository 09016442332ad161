"""Tensor-parallel SAM image encoder over a (dp, tp) device mesh.

The reference scales only by thread-replicating whole models over images
(reference ``pipeline.py:440-467``) — data parallelism, which this repo
already provides (``CellSegmentationPipeline(mesh=...)`` shards batches
over 'dp'). For the big encoders (ViT-L 0.3 GFLOP/token, ViT-H 0.6) the
TPU-native scale-out axis the reference cannot express is *tensor*
parallelism: shard each layer's heads and MLP hidden dim over 'tp' so a
single image's encoder latency drops ~tp-fold, with two ``psum``s per
layer riding the ICI mesh (the standard Megatron partitioning; see
docs/scaling.md).

Partitioning per vision layer:

* qkv weight ``(C, 3C)`` -> ``(C, 3, heads, hd)`` sharded on heads;
  each shard projects only its head group (column parallelism);
* attention runs per-shard on ``heads/tp`` heads — rel-pos tables carry
  no per-head parameters and stay replicated;
* output projection ``(C, C)`` -> ``(heads, hd, C)`` sharded on heads
  (row parallelism): shards produce partial sums -> ``psum`` #1;
* MLP: ``w1 (C, H)`` column-sharded, ``w2 (H, C)`` row-sharded ->
  ``psum`` #2. Biases of the row-parallel matmuls are added once, after
  the psum.

LayerNorms, residuals, patch embed, pos embed and the neck are
replicated over 'tp' (negligible FLOPs). Batches shard over 'dp'
independently, so one mesh serves throughput (dp) x latency (tp).

The per-shard attention math reuses the model's ``_vision_attention``
verbatim (local head count) — on TPU the shards run the flash kernels on
their head group; on the CPU test mesh they run the einsum path. Parity:
``tests/test_parallel.py::test_tp_encoder_matches_single_device``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.sam.config import SamTPUConfig
from ..models.sam.model import (
    _encoder_neck,
    _gelu,
    _layer_norm,
    _softmax_fp32,
    _vision_rel_bias,
    _window_partition,
    _window_unpartition,
)

Params = Dict[str, Any]


def shard_sam_encoder_tp(
    params: Params, cfg: SamTPUConfig, mesh: Mesh
) -> Tuple[Params, Any]:
    """Reshape + device_put the SAM vision tree for head/hidden 'tp' sharding.

    Returns ``(tp_params, tp_specs)``: a new vision-param tree whose qkv /
    proj weights are reshaped to expose the head axis, placed on ``mesh``
    with the PartitionSpecs above, plus the matching spec tree (for
    ``shard_map`` in_specs). Requires ``heads % tp == 0`` and
    ``mlp_dim % tp == 0``.
    """
    tp = int(mesh.shape["tp"])
    heads, c = cfg.vision_heads, cfg.vision_hidden
    hd = c // heads
    if heads % tp or cfg.vision_mlp_dim % tp:
        raise ValueError(
            f"tp={tp} must divide heads={heads} and mlp_dim={cfg.vision_mlp_dim}"
        )
    v = params["vision"]

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    layers, specs = [], []
    for lp in v["layers"]:
        qkv_w = jnp.reshape(lp["attn"]["qkv"]["w"], (c, 3, heads, hd))
        qkv_b = jnp.reshape(lp["attn"]["qkv"]["b"], (3, heads, hd))
        proj_w = jnp.reshape(lp["attn"]["proj"]["w"], (heads, hd, c))
        layer = {
            "attn": {
                "qkv_w": put(qkv_w, P(None, None, "tp", None)),
                "qkv_b": put(qkv_b, P(None, "tp", None)),
                "proj_w": put(proj_w, P("tp", None, None)),
                "proj_b": put(lp["attn"]["proj"]["b"], P()),
                "rel_pos_h": put(lp["attn"]["rel_pos_h"], P()),
                "rel_pos_w": put(lp["attn"]["rel_pos_w"], P()),
            },
            "ln1": jax.tree_util.tree_map(lambda x: put(x, P()), lp["ln1"]),
            "ln2": jax.tree_util.tree_map(lambda x: put(x, P()), lp["ln2"]),
            "mlp1": {
                "w": put(lp["mlp1"]["w"], P(None, "tp")),
                "b": put(lp["mlp1"]["b"], P("tp")),
            },
            "mlp2": {
                "w": put(lp["mlp2"]["w"], P("tp", None)),
                "b": put(lp["mlp2"]["b"], P()),
            },
        }
        spec = {
            "attn": {
                "qkv_w": P(None, None, "tp", None),
                "qkv_b": P(None, "tp", None),
                "proj_w": P("tp", None, None),
                "proj_b": P(),
                "rel_pos_h": P(),
                "rel_pos_w": P(),
            },
            "ln1": jax.tree_util.tree_map(lambda _: P(), lp["ln1"]),
            "ln2": jax.tree_util.tree_map(lambda _: P(), lp["ln2"]),
            "mlp1": {"w": P(None, "tp"), "b": P("tp")},
            "mlp2": {"w": P("tp", None), "b": P()},
        }
        layers.append(layer)
        specs.append(spec)

    rep = {
        "patch_embed": v["patch_embed"],
        "pos_embed": v["pos_embed"],
        "neck": v["neck"],
    }
    tp_params = {
        "layers": layers,
        **jax.tree_util.tree_map(lambda x: put(x, P()), rep),
    }
    tp_specs = {
        "layers": specs,
        **jax.tree_util.tree_map(lambda _: P(), rep),
    }
    return tp_params, tp_specs


def _attention_tp(lp: Params, h: jnp.ndarray, heads_local: int, use_rel_pos: bool,
                  tp_axis: str) -> jnp.ndarray:
    """Per-shard attention on the local head group; psum'd row-parallel
    output projection (the proj bias is added once, post-psum).

    The model's ``_vision_attention`` can't be reused verbatim: it infers
    ``hd = C // heads`` from the (full, replicated) input channels, which
    breaks once heads are sharded — so the local head-group math is spelled
    out here with the true per-head dim taken from the sharded qkv weight.
    Same numerics as the einsum branch of ``_vision_attention``
    (models/sam/model.py:255-266): fp32 logit accumulation + softmax,
    decomposed rel-pos bias from the replicated tables."""
    a = lp["attn"]
    hd = a["qkv_w"].shape[-1]
    c = a["proj_w"].shape[-1]
    b, s, _, _ = h.shape
    n = s * s
    qkv = h.reshape(b, n, -1) @ a["qkv_w"].reshape(-1, 3 * heads_local * hd)
    qkv = qkv + a["qkv_b"].reshape(-1)
    qkv = qkv.reshape(b, n, 3, heads_local, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, hl, N, hd)
    logits = jnp.einsum(
        "bhqc,bhkc->bhqk", q * (hd**-0.5), k, preferred_element_type=jnp.float32
    ).astype(h.dtype)
    if use_rel_pos:
        bias = _vision_rel_bias(q, a["rel_pos_h"], a["rel_pos_w"], s)
        logits = logits + bias.astype(h.dtype)
    attn = _softmax_fp32(logits).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)  # (B, hl, N, hd)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, heads_local * hd)
    partial = (out @ a["proj_w"].reshape(heads_local * hd, c)).reshape(b, s, s, c)
    return jax.lax.psum(partial, tp_axis) + a["proj_b"]


def _encoder_local(p_local: Params, pix: jnp.ndarray, cfg: SamTPUConfig,
                   tp: int, tp_axis: str = "tp") -> jnp.ndarray:
    """One shard's slice of the TP encoder (runs inside shard_map)."""
    heads_local = cfg.vision_heads // tp
    ps = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        pix, p_local["patch_embed"]["w"], window_strides=(ps, ps),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p_local["patch_embed"]["b"]
    x = x + p_local["pos_embed"]
    s = x.shape[1]
    ws = cfg.window_size

    for i, lp in enumerate(p_local["layers"]):
        h = _layer_norm(lp["ln1"], x, cfg.layer_norm_eps)
        if i in cfg.global_attn_indexes:
            h = _attention_tp(lp, h, heads_local, cfg.use_rel_pos, tp_axis)
        else:
            win, padded = _window_partition(h, ws)
            win = _attention_tp(lp, win, heads_local, cfg.use_rel_pos, tp_axis)
            h = _window_unpartition(win, ws, padded, s)
        x = x + h
        h = _layer_norm(lp["ln2"], x, cfg.layer_norm_eps)
        h = _gelu(h @ lp["mlp1"]["w"] + lp["mlp1"]["b"])
        h = jax.lax.psum(h @ lp["mlp2"]["w"], tp_axis) + lp["mlp2"]["b"]
        x = x + h
    return _encoder_neck(p_local, x)


def sam_image_encoder_tp(
    tp_params: Params,
    tp_specs: Any,
    pixel_values: jnp.ndarray,
    cfg: SamTPUConfig,
    mesh: Mesh,
) -> jnp.ndarray:
    """TP (+optional dp) SAM image encoder: ``(B, H, W, 3)`` normalized
    pixels -> ``(B, gs, gs, out_c)`` embeddings, batch sharded over 'dp',
    per-layer compute sharded over 'tp'. Params from
    :func:`shard_sam_encoder_tp`."""
    has_dp = "dp" in mesh.axis_names
    data_spec = P("dp", None, None, None) if has_dp else P()
    specs_key = jax.tree_util.tree_structure(tp_params)
    run = _tp_runner(cfg, mesh, has_dp, specs_key, _freeze(tp_specs))
    pix = jax.device_put(pixel_values, NamedSharding(mesh, data_spec))
    return run(tp_params, pix)


def _freeze(tree):
    """Hashable snapshot of a PartitionSpec tree (for the runner cache)."""
    return tuple(jax.tree_util.tree_flatten(tree, is_leaf=lambda x: isinstance(x, P))[0])


@functools.lru_cache(maxsize=8)
def _tp_runner(cfg: SamTPUConfig, mesh: Mesh, has_dp: bool, treedef, flat_specs):
    """Jitted shard_map closure, cached per (cfg, mesh, spec layout) so
    repeated calls reuse one trace/compile (the same treatment as
    parallel/sp.py and parallel/pp.py)."""
    tp = int(mesh.shape["tp"])
    data_spec = P("dp", None, None, None) if has_dp else P()
    tp_specs = jax.tree_util.tree_unflatten(treedef, list(flat_specs))

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(tp_specs, data_spec),
        out_specs=data_spec,
        check_vma=False,
    )
    def run(p_local, pix_local):
        return _encoder_local(p_local, pix_local, cfg, tp)

    return run
