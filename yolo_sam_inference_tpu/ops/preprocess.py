"""Fused on-device preprocessing: letterbox for YOLO, resize+pad for SAM.

The reference preprocessed on the host per image (ultralytics letterbox
inside ``YOLO(image)``; ``SamProcessor`` resize/normalize re-run per *box*,
reference ``pipeline.py:97-101``). Here preprocessing is part of the jitted
program: uint8 image batches upload once and everything else happens on
device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# SAM (ImageNet) normalization constants, matching SamProcessor defaults.
SAM_MEAN = (123.675, 116.28, 103.53)
SAM_STD = (58.395, 57.12, 57.375)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize (align_corners=False / half-pixel centers), NHWC float."""
    if img.shape[-3] == out_h and img.shape[-2] == out_w:
        return img  # identity resizes still build costly gather graphs
    return jax.image.resize(
        img, img.shape[:-3] + (out_h, out_w, img.shape[-1]), method="bilinear"
    )


def letterbox_batch(
    images: jnp.ndarray, size: int, pad_value: float = 114.0
) -> Tuple[jnp.ndarray, float, Tuple[int, int]]:
    """Letterbox a uint8/float batch (B, H, W, 3) to (B, size, size, 3) in [0,1].

    Aspect-preserving resize to fit, centered gray padding (ultralytics
    convention). H, W are static under jit, so scale/offsets are python
    floats; returns (batch01, scale, (pad_x, pad_y)) for box back-mapping.
    """
    b, h, w, c = images.shape
    r = min(size / h, size / w)
    nh, nw = round(h * r), round(w * r)
    resized = resize_bilinear(images.astype(jnp.float32), nh, nw)
    pad_y, pad_x = (size - nh) // 2, (size - nw) // 2
    out = jnp.full((b, size, size, c), pad_value, dtype=jnp.float32)
    out = jax.lax.dynamic_update_slice(out, resized, (0, pad_y, pad_x, 0))
    return out / 255.0, r, (pad_x, pad_y)


def sam_preprocess_batch(
    images: jnp.ndarray, size: int = 1024
) -> Tuple[jnp.ndarray, float, Tuple[int, int]]:
    """SAM preprocessing: resize longest side to ``size``, pad bottom/right,
    ImageNet-normalize. Returns (batch (B, size, size, 3), scale, (new_h, new_w)).

    Matches SamProcessor semantics (resize longest edge -> pad to square,
    used by the reference at ``pipeline.py:97-101``).
    """
    b, h, w, c = images.shape
    r = size / max(h, w)
    nh, nw = int(h * r + 0.5), int(w * r + 0.5)
    resized = resize_bilinear(images.astype(jnp.float32), nh, nw)
    mean = jnp.asarray(SAM_MEAN, dtype=jnp.float32)
    std = jnp.asarray(SAM_STD, dtype=jnp.float32)
    resized = (resized - mean) / std
    # SamProcessor pads with zeros AFTER normalization
    out = jnp.zeros((b, size, size, c), dtype=jnp.float32)
    out = jax.lax.dynamic_update_slice(out, resized, (0, 0, 0, 0))
    return out, r, (nh, nw)


def scale_boxes_from_letterbox(
    boxes: jnp.ndarray, scale: float, pad: Tuple[int, int]
) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed coords back to original image coords."""
    px, py = pad
    shift = jnp.asarray([px, py, px, py], dtype=boxes.dtype)
    return (boxes - shift) / scale


def boxes_to_sam_coords(boxes: jnp.ndarray, sam_scale: float) -> jnp.ndarray:
    """Map xyxy boxes in original-image coords to SAM 1024-input coords."""
    return boxes * sam_scale


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def upsample_masks_bilinear(masks: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear mask upsampling (..., h, w) -> (..., out_h, out_w)."""
    return jax.image.resize(masks, masks.shape[:-2] + (out_h, out_w), method="bilinear")
