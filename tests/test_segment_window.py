"""Windowed mask head must reproduce the full-grid decoder path exactly
(up to fp rounding) wherever the metric crop looks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_sam_inference_tpu.models.sam import (
    init_sam_params,
    sam_mask_decoder,
    sam_prompt_boxes,
    sam_tiny_test,
)
from yolo_sam_inference_tpu.models.yolo import YoloConfig
from yolo_sam_inference_tpu.pipeline.engine import (
    PipelineOptions,
    _bilinear_crop_sample,
    segment_stage,
)


def test_windowed_segment_matches_full_path(rng):
    import dataclasses

    scfg = dataclasses.replace(sam_tiny_test(), image_size=64)
    params = init_sam_params(0, scfg)
    opts = PipelineOptions(
        batch_size=2, max_det=3, metric_crop=48, compute_dtype=jnp.float32
    )
    h, w = 56, 64
    b, k = 2, 3
    emb = jnp.asarray(rng.normal(size=(b, scfg.grid_size, scfg.grid_size,
                                       scfg.output_channels)).astype(np.float32))
    boxes = jnp.asarray(
        rng.uniform(4, 40, size=(b, k, 4)).astype(np.float32)
    )
    boxes = jnp.concatenate(
        [jnp.minimum(boxes[..., :2], boxes[..., 2:]),
         jnp.maximum(boxes[..., :2], boxes[..., 2:]) + 4.0], axis=-1
    )
    valid = jnp.ones((b, k), dtype=bool)

    # fast path
    crops, offsets = segment_stage(params, emb, boxes, valid, (h, w), scfg, opts)

    # reference path: full-grid decoder + full-map crop sampling
    sam_scale = scfg.image_size / max(h, w)
    sparse = sam_prompt_boxes(params, boxes * sam_scale, scfg)
    low, _ = sam_mask_decoder(params, emb, sparse, scfg, multimask_output=False)
    low = low[:, :, 0]
    scale_to_low = sam_scale / (scfg.image_size / scfg.low_res_size)
    import functools

    sample = functools.partial(
        _bilinear_crop_sample, crop=min(48, h, w), scale_to_low=scale_to_low
    )
    want = jax.vmap(jax.vmap(sample))(low, offsets)
    want_masks = (want > 0.0) & valid[..., None, None]

    agree = np.asarray(crops) == np.asarray(want_masks)
    assert agree.mean() > 0.999, agree.mean()


# heavy suite (torch parity / e2e pipeline / 8-device mesh): run the
# quick loop with `pytest -m "not slow" tests/`
pytestmark = pytest.mark.slow
