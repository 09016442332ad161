"""Batched image morphology / filtering ops for the classical pipeline.

TPU-native replacements for the OpenCV calls in the reference's model-free
pipeline (reference ``examples/opencv_project_inference.py:186-225`` and
``tools/ms_opencv_process.py:219-284``): absdiff -> blur -> threshold ->
dilate/erode/open/close run as one jitted program over a whole frame batch,
instead of per-frame cv2 calls on the host. All ops are (..., H, W) and
vmappable/batchable.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _window_reduce(x: jnp.ndarray, k: int, op, init) -> jnp.ndarray:
    pad = k // 2
    return jax.lax.reduce_window(
        x,
        init,
        op,
        window_dimensions=(1,) * (x.ndim - 2) + (k, k),
        window_strides=(1,) * x.ndim,
        padding=((0, 0),) * (x.ndim - 2) + ((pad, pad), (pad, pad)),
    )


def dilate(mask: jnp.ndarray, k: int = 3, iterations: int = 1) -> jnp.ndarray:
    """Binary dilation with a k x k rectangular structuring element."""
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m = _window_reduce(m, k, jax.lax.max, -jnp.inf)
    return m > 0.5


def erode(mask: jnp.ndarray, k: int = 3, iterations: int = 1) -> jnp.ndarray:
    """Binary erosion (border treated as 0, matching cv2 default for binary)."""
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m = _window_reduce(m, k, jax.lax.min, jnp.inf)
    return m > 0.5


def morph_open(mask: jnp.ndarray, k: int = 3, iterations: int = 1) -> jnp.ndarray:
    return dilate(erode(mask, k, iterations), k, iterations)


def morph_close(mask: jnp.ndarray, k: int = 3, iterations: int = 1) -> jnp.ndarray:
    return erode(dilate(mask, k, iterations), k, iterations)


@functools.lru_cache(maxsize=16)
def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel semantics (sigma<=0 -> derived from ksize)."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 5, sigma: float = 0.0) -> jnp.ndarray:
    """Separable Gaussian blur over (..., H, W) float images (reflect border,
    cv2's BORDER_REFLECT_101 approximation)."""
    k = jnp.asarray(_gaussian_kernel_1d(ksize, sigma))
    pad = ksize // 2

    def conv_axis(x, axis):
        xp = jnp.moveaxis(x, axis, -1)
        xp = jnp.pad(
            xp, [(0, 0)] * (xp.ndim - 1) + [(pad, pad)], mode="reflect"
        )
        # windowed dot along the last axis
        out = sum(xp[..., i : i + x.shape[axis]] * k[i] for i in range(ksize))
        return jnp.moveaxis(out, -1, axis)

    img = img.astype(jnp.float32)
    return conv_axis(conv_axis(img, -1), -2)


def subtract_clip(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cv2.subtract semantics: saturating (clipped at 0) subtraction."""
    return jnp.maximum(a.astype(jnp.float32) - b.astype(jnp.float32), 0.0)


def absdiff(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))


def threshold_binary(img: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """cv2.THRESH_BINARY: > thresh -> True."""
    return img > thresh


def contrast(img: jnp.ndarray, alpha: float, beta: float) -> jnp.ndarray:
    """cv2.convertScaleAbs-style linear contrast (clipped to [0, 255])."""
    return jnp.clip(img.astype(jnp.float32) * alpha + beta, 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("threshold", "blur_kernel", "blur_sigma",
                                              "dilate_iterations", "erode_iterations"))
def classical_detect_batch(
    frames: jnp.ndarray,
    background: jnp.ndarray,
    threshold: float = 10.0,
    blur_kernel: int = 5,
    blur_sigma: float = 0.0,
    dilate_iterations: int = 2,
    erode_iterations: int = 2,
) -> jnp.ndarray:
    """The reference's contour-detection preprocessing, batched.

    frames: (B, H, W) grayscale uint8/float; background: (H, W).
    Pipeline (reference ``examples/opencv_project_inference.py:186-225``):
    absdiff(frame, background) -> Gaussian blur -> binary threshold ->
    dilate -> erode -> open. Returns (B, H, W) bool foreground masks.
    """
    diff = absdiff(frames, background[None])
    blurred = gaussian_blur(diff, blur_kernel, blur_sigma)
    binary = threshold_binary(blurred, threshold)
    m = dilate(binary, 3, dilate_iterations)
    m = erode(m, 3, erode_iterations)
    m = morph_open(m, 3, 1)
    return m
