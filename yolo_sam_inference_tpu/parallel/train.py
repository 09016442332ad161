"""Sharded SAM fine-tuning step (dp x tp) for multi-chip training.

The reference is inference-only (its training happened elsewhere; it only
*prepares* training data — reference ``examples/deformability_training_data.py``).
For production cytometry the realistic training workload is fine-tuning SAM
on box->mask supervision, so that is the framework's canonical train step:

* **dp**: image batch sharded over the 'dp' mesh axis — gradients are
  all-reduced over ICI by XLA.
* **tp**: the ViT encoder's MLP and QKV projections are sharded over the
  'tp' axis (Megatron-style column/row split), so activations all-reduce
  inside each layer. SP/PP/EP are deliberate non-goals (SURVEY.md §2.6/5.7:
  the reference has no such axes; SAM's 4096-token sequences fit one chip).

Loss: per-box sigmoid BCE on low-res mask logits + MSE between the IoU head
and the actual predicted-vs-target IoU.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.sam import SamTPUConfig, init_sam_params
from ..models.sam.model import sam_mask_decoder, sam_image_encoder, sam_prompt_boxes


def _param_spec(path: Tuple, leaf) -> P:
    """Tensor-parallel sharding rule for SAM parameters."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    names = [k for k in keys if isinstance(k, str)]
    if "vision" in names:
        if "mlp1" in names or "qkv" in names:
            # column-parallel: split output features
            if leaf.ndim == 2:
                return P(None, "tp")
            if leaf.ndim == 1:
                return P("tp")
        if "mlp2" in names or ("proj" in names and "patch_embed" not in names):
            # row-parallel: split input features; bias replicated
            if leaf.ndim == 2:
                return P("tp", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a SAM parameter pytree on the mesh with tp sharding."""

    def place(path, leaf):
        if leaf is None:
            return None
        spec = _param_spec(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def make_train_state(
    rng: jax.Array,
    cfg: SamTPUConfig,
    mesh: Mesh,
    learning_rate: float = 1e-4,
) -> Dict[str, Any]:
    """Initialize sharded params + optimizer state."""
    params = init_sam_params(rng, cfg)
    params = shard_params(params, mesh)
    tx = optax.adamw(learning_rate)
    opt_state = jax.jit(tx.init)(params)
    return {"params": params, "opt_state": opt_state, "tx": tx, "step": 0}


def _loss_fn(params, batch, cfg: SamTPUConfig):
    emb = sam_image_encoder(params, batch["images"], cfg)
    sparse = sam_prompt_boxes(params, batch["boxes"], cfg)
    logits, iou_pred = sam_mask_decoder(
        params, emb, sparse, cfg, multimask_output=False
    )
    logits = logits[:, :, 0]  # (B, K, l, l)
    iou_pred = iou_pred[:, :, 0]  # (B, K)
    targets = batch["masks"].astype(jnp.float32)

    bce = optax.sigmoid_binary_cross_entropy(logits, targets).mean(axis=(-2, -1))
    pred_bin = (logits > 0).astype(jnp.float32)
    inter = (pred_bin * targets).sum(axis=(-2, -1))
    union = jnp.maximum((pred_bin + targets - pred_bin * targets).sum(axis=(-2, -1)), 1.0)
    actual_iou = inter / union
    iou_mse = (iou_pred - jax.lax.stop_gradient(actual_iou)) ** 2

    valid = batch["valid"].astype(jnp.float32)  # (B, K)
    denom = jnp.maximum(valid.sum(), 1.0)
    loss = ((bce + 0.1 * iou_mse) * valid).sum() / denom
    return loss


@functools.lru_cache(maxsize=16)
def _make_step(tx, cfg: SamTPUConfig, mesh: Mesh):
    """Build the jitted step once per (tx, cfg, mesh); cached so repeated
    calls with the same train state hit the jit cache instead of retracing
    (a fresh closure per call would recompile every step)."""

    @jax.jit
    def step(params, opt_state, batch):
        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
            ),
            batch,
        )
        loss, grads = jax.value_and_grad(_loss_fn)(params, batch, cfg)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, loss

    return step


def sam_decoder_train_step(state, batch, cfg: SamTPUConfig, mesh: Mesh):
    """One jitted dp x tp training step. ``batch``: images (B,H,W,3) fp32
    normalized, boxes (B,K,4), masks (B,K,l,l), valid (B,K)."""
    tx = state["tx"]
    step = _make_step(tx, cfg, mesh)
    params, opt_state, loss = step(state["params"], state["opt_state"], batch)
    return {
        "params": params,
        "opt_state": opt_state,
        "tx": tx,
        "step": state["step"] + 1,
    }, loss
