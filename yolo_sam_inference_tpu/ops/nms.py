"""On-device batched non-maximum suppression with static shapes.

The reference relied on ultralytics' host-side NMS inside ``YOLO(image)``
(reference ``pipeline.py:84-87``). Under ``jit`` everything must be fixed
shape: we take the top ``num_candidates`` scoring boxes, run an O(K^2)
greedy suppression (the exact sequential-greedy result, vectorized per
step), and emit ``max_det`` padded boxes with a validity mask — ragged
detections never leave the device.

Defaults follow ultralytics predict-mode: conf 0.25, IoU 0.7.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (K, 4) xyxy boxes -> (K, K)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def _nms_single(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_det: int,
    iou_threshold: float,
    conf_threshold: float,
    num_candidates: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One image. boxes (N, 4), scores (N,) -> (max_det, 4), (max_det,), valid."""
    k = min(num_candidates, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[idx]
    iou = _iou_matrix(top_boxes)

    # Greedy: in score order, keep box i iff no higher-scoring *kept* box
    # overlaps it above the threshold. Sequential greedy scan (exact). With
    # random/degraded detectors the candidate set is dense and suppression
    # chains run deep, so fixpoint sweeps don't converge quickly — the plain
    # K-step scan with heavy unrolling (launch overhead amortized 32x) is
    # the robust choice.
    conf_ok = top_scores >= conf_threshold
    suppress = iou > iou_threshold

    def body(i, kept):
        # kept: (K,) bool of decisions so far (only entries < i are final)
        earlier = jax.lax.broadcasted_iota(jnp.int32, (k,), 0) < i
        blocked = jnp.any(earlier & kept & suppress[i], axis=0)
        keep_i = jnp.logical_and(conf_ok[i], ~blocked)
        return kept.at[i].set(keep_i)

    kept = jax.lax.fori_loop(
        0, k, body, jnp.zeros((k,), dtype=bool), unroll=32
    )

    # compact kept detections to the front, pad to max_det
    order = jnp.argsort(~kept, stable=True)  # kept first, score order preserved
    kept_sorted = kept[order]
    boxes_sorted = top_boxes[order]
    scores_sorted = top_scores[order]
    out_boxes = boxes_sorted[:max_det]
    out_scores = jnp.where(kept_sorted[:max_det], scores_sorted[:max_det], 0.0)
    out_valid = kept_sorted[:max_det]
    out_boxes = jnp.where(out_valid[:, None], out_boxes, 0.0)
    return out_boxes, out_scores, out_valid


@functools.partial(
    jax.jit, static_argnames=("max_det", "iou_threshold", "conf_threshold", "num_candidates")
)
def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_det: int = 64,
    iou_threshold: float = 0.7,
    conf_threshold: float = 0.25,
    num_candidates: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched NMS. boxes (B, N, 4), scores (B, N) ->
    (B, max_det, 4), (B, max_det), (B, max_det) validity."""
    fn = functools.partial(
        _nms_single,
        max_det=max_det,
        iou_threshold=iou_threshold,
        conf_threshold=conf_threshold,
        num_candidates=num_candidates,
    )
    return jax.vmap(fn)(boxes, scores)
