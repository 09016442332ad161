"""Pipeline-parallel SAM image encoder over a 'pp' device mesh axis.

Completes the parallelism matrix next to dp (``pipeline/engine.py mesh=``),
tp (``tp.py``) and sp (``sp.py``): the encoder's layer stack is split into
``pp`` contiguous stages, one stage per device, and microbatches flow
through the stages GPipe-style with ``lax.ppermute`` hops over ICI. Each
device holds ONLY its stage's layer weights (the real PP win: per-chip
weight memory drops pp-fold — the axis that matters when an encoder
outgrows one chip's HBM, which none of the SAM configs do today; dp/tp/sp
are the axes this framework actually recommends, see docs/SCALING.md).

Mechanics (classic GPipe schedule, M microbatches, ``M + pp - 1`` steps):

* layer weights are stacked along a leading layer axis and sharded
  ``P('pp')`` — stage d holds layers ``[d*L/pp, (d+1)*L/pp)``; windowed
  layers' ``(2*ws-1, hd)`` rel-pos tables are zero-padded to the global
  ``(2*S-1, hd)`` shape so the stack is homogeneous (the windowed branch
  only ever indexes the first ``2*ws-1`` rows);
* at step t, stage 0 injects microbatch ``min(t, M-1)``; every stage runs
  its layer group (``lax.scan`` over stacked weights, ``lax.cond``
  selecting windowed vs global attention per layer); activations hop to
  the next stage via one ``ppermute``;
* the last stage accumulates finished microbatches; a final masked
  ``psum`` replicates them (stages other than the last contribute zeros);
* patch embed + pos embed + neck run replicated outside the pipelined
  region (<1% of encoder FLOPs).

Bubble fraction is ``(pp-1)/(M+pp-1)`` — choose ``microbatches >> pp``
when throughput matters. The attention inside the pipelined region uses
the XLA einsum path (scaling infrastructure, not the single-chip kernel
path). Parity: ``tests/test_parallel.py::test_pp_encoder_matches_single_device``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.sam.config import SamTPUConfig
from ..models.sam.model import (
    _encoder_neck,
    _gelu,
    _layer_norm,
    _linear,
    _softmax_fp32,
    _vision_rel_bias,
)
from .sp import _window_attention_local

Params = Dict[str, Any]


def _global_attention_full(
    a: Params, h: jnp.ndarray, heads: int, use_rel_pos: bool
) -> jnp.ndarray:
    """Global attention on the full (B, S, S, C) grid, einsum path —
    numerics of ``_vision_attention``'s non-flash branch."""
    b, s, _, c = h.shape
    hd = c // heads
    n = s * s
    qkv = _linear(a["qkv"], h.reshape(b, n, c))
    qkv = qkv.reshape(b, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    logits = jnp.einsum(
        "bhqc,bhkc->bhqk", q * (hd**-0.5), k,
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)
    if use_rel_pos:
        bias = _vision_rel_bias(q, a["rel_pos_h"], a["rel_pos_w"], s)
        logits = logits + bias.astype(h.dtype)
    attn = _softmax_fp32(logits).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return _linear(a["proj"], out).reshape(b, s, s, c)


def stack_sam_encoder_pp(params: Params, cfg: SamTPUConfig, mesh: Mesh) -> Params:
    """Stack per-layer trees along a leading layer axis and place the stack
    P('pp')-sharded; rel tables are zero-padded to the global (2S-1, hd)
    shape so windowed and global layers stack.

    The stack is assembled on the HOST (numpy) and device_put with the
    sharding in one step, so no single device ever materializes the whole
    model — the point of PP is relieving per-chip HBM, and a full-model
    jnp.stack on the default device would defeat it before the pipeline
    ever ran.
    """
    d2 = 2 * cfg.grid_size - 1

    def pad_tab(t):
        t = np.asarray(t)
        return np.pad(t, ((0, d2 - t.shape[0]), (0, 0)))

    norm = []
    for lp in params["vision"]["layers"]:
        lp = dict(lp)
        lp["attn"] = dict(lp["attn"])
        lp["attn"]["rel_pos_h"] = pad_tab(lp["attn"]["rel_pos_h"])
        lp["attn"]["rel_pos_w"] = pad_tab(lp["attn"]["rel_pos_w"])
        norm.append(lp)
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *norm
    )
    return jax.tree_util.tree_map(
        lambda t: jax.device_put(t, NamedSharding(mesh, P("pp"))), stacked
    )


def sam_image_encoder_pp(
    params: Params,
    pixel_values: jnp.ndarray,
    cfg: SamTPUConfig,
    mesh: Mesh,
    microbatches: Optional[int] = None,
    stacked: Optional[Params] = None,
) -> jnp.ndarray:
    """Pipeline-parallel SAM image encoder on a mesh with a 'pp' axis.

    ``pixel_values``: (B, H, W, 3) normalized pixels. Requires
    ``vision_layers % pp == 0`` and ``B % microbatches == 0``
    (``microbatches`` defaults to ``pp``). Returns (B, gs, gs, out_c),
    replicated. Pass ``stacked`` (from :func:`stack_sam_encoder_pp`) to
    skip the per-call host stack+placement of the layer weights.
    """
    pp = int(mesh.shape["pp"])
    nl = cfg.vision_layers
    if nl % pp:
        raise ValueError(f"pp={pp} must divide vision_layers={nl}")
    b = pixel_values.shape[0]
    m = int(microbatches) if microbatches else pp
    if b % m:
        raise ValueError(f"microbatches={m} must divide batch={b}")
    mb = b // m
    s = cfg.grid_size

    v = params["vision"]
    ps = cfg.patch_size
    # replicated pre/post stages (<1% of FLOPs)
    x = jax.lax.conv_general_dilated(
        pixel_values, v["patch_embed"]["w"], window_strides=(ps, ps),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + v["patch_embed"]["b"]
    x = x + v["pos_embed"]
    c = x.shape[-1]
    x_mb = x.reshape(m, mb, s, s, c)

    if stacked is None:
        stacked = stack_sam_encoder_pp(params, cfg, mesh)
    flags = jax.device_put(
        jnp.asarray(
            [i in cfg.global_attn_indexes for i in range(nl)], dtype=bool
        ),
        NamedSharding(mesh, P("pp")),
    )
    x_mb = jax.device_put(x_mb, NamedSharding(mesh, P()))

    treedef = jax.tree_util.tree_structure(stacked)
    run = _pp_runner(cfg, mesh, pp, m, treedef)
    y = run(stacked, flags, x_mb).reshape(b, s, s, c)
    return _encoder_neck(v, y)


@functools.lru_cache(maxsize=8)
def _pp_runner(cfg: SamTPUConfig, mesh: Mesh, pp: int, m: int, treedef):
    """Jitted GPipe schedule, cached per (cfg, mesh, microbatches, param
    layout) so repeated calls reuse one trace/compile."""
    s, ws, heads = cfg.grid_size, cfg.window_size, cfg.vision_heads
    eps = cfg.layer_norm_eps
    stage_specs = jax.tree_util.tree_unflatten(
        treedef, [P("pp")] * treedef.num_leaves
    )

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(stage_specs, P("pp"), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(lp_local, flags_local, mbs):
        stage = jax.lax.axis_index("pp")

        def stage_fn(xc):
            def layer_step(xi, inputs):
                lpi, isg = inputs
                h = _layer_norm(lpi["ln1"], xi, eps)
                a = lpi["attn"]
                h = jax.lax.cond(
                    isg,
                    lambda hh: _global_attention_full(
                        a, hh, heads, cfg.use_rel_pos
                    ),
                    lambda hh: _window_attention_local(
                        a, hh, heads, ws, cfg.use_rel_pos
                    ),
                    h,
                )
                xi = xi + h
                h = _layer_norm(lpi["ln2"], xi, eps)
                h = _gelu(h @ lpi["mlp1"]["w"] + lpi["mlp1"]["b"])
                h = h @ lpi["mlp2"]["w"] + lpi["mlp2"]["b"]
                return xi + h, None

            out, _ = jax.lax.scan(layer_step, xc, (lp_local, flags_local))
            return out

        def body(t, carry):
            recv, outs = carry
            inj = jax.lax.dynamic_index_in_dim(
                mbs, jnp.minimum(t, m - 1), 0, keepdims=False
            )
            cur = jnp.where(stage == 0, inj, recv)
            y = stage_fn(cur)
            recv = jax.lax.ppermute(
                y, "pp", [(i, i + 1) for i in range(pp - 1)]
            )
            # the last stage banks microbatch t-(pp-1) once it drains
            oi = jnp.clip(t - (pp - 1), 0, m - 1)
            write = jnp.logical_and(stage == pp - 1, t >= pp - 1)
            slot = jax.lax.dynamic_index_in_dim(outs, oi, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, y, slot), oi, 0
            )
            return recv, outs

        recv0 = jnp.zeros_like(mbs[0])
        outs0 = jnp.zeros_like(mbs)
        _, outs = jax.lax.fori_loop(0, m + pp - 1, body, (recv0, outs0))
        # replicate the last stage's results (everyone else holds zeros)
        outs = jnp.where(stage == pp - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, "pp")

    return run
