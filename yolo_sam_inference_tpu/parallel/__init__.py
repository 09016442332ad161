"""Parallelism layer: device meshes, sharding rules, multi-host runs.

The reference's only parallelism was thread-replicated models on one device
and process pools for CPU work (SURVEY.md §2.6). Here scaling is TPU-native:

* data-parallel inference over a ``jax.sharding.Mesh`` (images sharded on the
  batch axis, weights replicated) — ICI collectives only for metric gathers;
* optional tensor-parallel sharding of the SAM ViT encoder for large models
  (``tp.py``: weights sharded, activations replicated);
* optional sequence-parallel sharding of the encoder token grid
  (``sp.py``: activations sharded, weights replicated — the
  past-the-single-chip-roofline lever for ViT-H latency);
* optional pipeline-parallel stage splitting (``pp.py``: GPipe microbatches
  over ppermute hops — the memory-bound fallback axis);
* multi-host folder sharding by ``jax.process_index()`` striding with
  per-host CSV shards (``multihost.py``).
"""

from .mesh import make_mesh, make_mesh_axes, data_sharding, replicate_sharding
from .pp import sam_image_encoder_pp, stack_sam_encoder_pp
from .sp import sam_image_encoder_sp, shard_sam_encoder_sp
from .tp import sam_image_encoder_tp, shard_sam_encoder_tp
from .train import sam_decoder_train_step, make_train_state

__all__ = [
    "make_mesh",
    "make_mesh_axes",
    "data_sharding",
    "replicate_sharding",
    "sam_decoder_train_step",
    "make_train_state",
    "sam_image_encoder_tp",
    "shard_sam_encoder_tp",
    "sam_image_encoder_sp",
    "shard_sam_encoder_sp",
    "sam_image_encoder_pp",
    "stack_sam_encoder_pp",
]
