"""Device-side parity check for the fused TinyViT kernels (Mosaic path).

The CPU test suite exercises these kernels in interpret mode
(tests/test_tinyvit.py); this tool runs the SAME plain-vs-fused
comparisons on the real TPU at the bench geometries, so a rework of the
BlockSpec/index-map plumbing (e.g. the clamped-halo unpadded-input
rework) is validated under the actual Mosaic lowering before a bench
A/B. Prints one PASS/FAIL line per case and exits non-zero on any FAIL.

Usage:  timeout 900 python tools/device_parity_tv.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_sam_inference_tpu.models.sam.tinyvit import (
    _conv_bn,
    _gelu,
    _layer_norm,
)
from yolo_sam_inference_tpu.ops.dw_ln_mlp import dw_ln_mlp
from yolo_sam_inference_tpu.ops.mbconv_fused import mbconv_block
from yolo_sam_inference_tpu.ops.merge_fused import patch_merge_block


def _sync(x):
    return np.asarray(x.reshape(-1)[0])  # scalar fetch = real sync on axon


def _check(name, fused, plain, atol, rtol):
    f = np.asarray(fused, np.float32)
    p = np.asarray(plain, np.float32)
    err = np.max(np.abs(f - p) / (atol + rtol * np.abs(p)))
    ok = err <= 1.0
    print(f"{'PASS' if ok else 'FAIL'} {name}: max rel err unit {err:.3f}")
    return ok


def main() -> int:
    rng = np.random.default_rng(0)
    ok = True

    # MBConv: stage-0 geometry at the 512 canvas (128x128, C=64, E=256)
    for b, h, w, c in [(2, 128, 128, 64), (2, 16, 16, 64)]:
        e = 4 * c
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
        w1 = jnp.asarray(rng.normal(0, 0.1, (c, e)), jnp.float32)
        b1 = jnp.asarray(rng.normal(0, 0.3, (e,)), jnp.float32)
        wd = jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, e)), jnp.float32)
        bd = jnp.asarray(rng.normal(0, 0.3, (e,)), jnp.float32)
        w3 = jnp.asarray(rng.normal(0, 0.1, (e, c)), jnp.float32)
        b3 = jnp.asarray(rng.normal(0, 0.3, (c,)), jnp.float32)
        h1 = _gelu(_conv_bn({"w": w1.reshape(1, 1, c, e), "b": b1}, x))
        h2 = _gelu(_conv_bn({"w": wd, "b": bd}, h1, groups=e))
        plain = _gelu(x + _conv_bn({"w": w3.reshape(1, 1, e, c), "b": b3}, h2))
        fused = mbconv_block(x, w1, b1, wd, bd, w3, b3)
        _sync(fused)
        ok &= _check(f"mbconv {h}x{w}x{c}", fused, plain, 3e-4, 3e-3)

    # PatchMerging: both merge geometries at the 512 canvas
    for b, h, w, ci, co in [(2, 128, 128, 64, 128), (2, 64, 64, 128, 160)]:
        e = 4 * ci
        x = jnp.asarray(rng.normal(size=(b, h, w, ci)), jnp.float32)
        w1 = jnp.asarray(rng.normal(0, 0.1, (ci, e)), jnp.float32)
        b1 = jnp.asarray(rng.normal(0, 0.3, (e,)), jnp.float32)
        wd = jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, e)), jnp.float32)
        bd = jnp.asarray(rng.normal(0, 0.3, (e,)), jnp.float32)
        w3 = jnp.asarray(rng.normal(0, 0.1, (e, co)), jnp.float32)
        b3 = jnp.asarray(rng.normal(0, 0.3, (co,)), jnp.float32)
        h1 = _gelu(_conv_bn({"w": w1.reshape(1, 1, ci, e), "b": b1}, x))
        h2 = _gelu(
            _conv_bn({"w": wd, "b": bd}, h1, stride=2, groups=e)
        )
        plain = _conv_bn({"w": w3.reshape(1, 1, e, co), "b": b3}, h2)
        fused = patch_merge_block(x, w1, b1, wd, bd, w3, b3)
        _sync(fused)
        ok &= _check(f"merge {h}x{w} {ci}->{co}", fused, plain, 3e-4, 3e-3)

    # stride-1 merge (residual-free MBConv kernel): merge2 at the 512 canvas
    for b, h, w, ci, co in [(2, 32, 32, 160, 320)]:
        e = 4 * ci
        x = jnp.asarray(rng.normal(size=(b, h, w, ci)), jnp.float32)
        w1 = jnp.asarray(rng.normal(0, 0.1, (ci, e)), jnp.float32)
        b1 = jnp.asarray(rng.normal(0, 0.3, (e,)), jnp.float32)
        wd = jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, e)), jnp.float32)
        bd = jnp.asarray(rng.normal(0, 0.3, (e,)), jnp.float32)
        w3 = jnp.asarray(rng.normal(0, 0.1, (e, co)), jnp.float32)
        b3 = jnp.asarray(rng.normal(0, 0.3, (co,)), jnp.float32)
        h1 = _gelu(_conv_bn({"w": w1.reshape(1, 1, ci, e), "b": b1}, x))
        h2 = _gelu(_conv_bn({"w": wd, "b": bd}, h1, groups=e))
        plain = _conv_bn({"w": w3.reshape(1, 1, e, co), "b": b3}, h2)
        fused = mbconv_block(x, w1, b1, wd, bd, w3, b3, residual=False)
        _sync(fused)
        ok &= _check(f"merge_s1 {h}x{w} {ci}->{co}", fused, plain, 3e-4, 3e-3)

    # dw+LN+MLP block tail: the three stage geometries at the 512 canvas
    for b, h, w, c in [(2, 64, 64, 128), (2, 32, 32, 160), (2, 32, 32, 320)]:
        hidden = 4 * c
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
        wd = jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, c)), jnp.float32)
        bd = jnp.asarray(rng.normal(0, 0.3, (c,)), jnp.float32)
        sc = jnp.asarray(rng.normal(1, 0.1, (c,)), jnp.float32)
        bi_ = jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
        w1 = jnp.asarray(rng.normal(0, 0.1, (c, hidden)), jnp.float32)
        b1 = jnp.asarray(rng.normal(0, 0.1, (hidden,)), jnp.float32)
        w2 = jnp.asarray(rng.normal(0, 0.1, (hidden, c)), jnp.float32)
        b2 = jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
        y = _conv_bn({"w": wd, "b": bd}, x, groups=c)
        hh = _gelu(_layer_norm({"scale": sc, "bias": bi_}, y) @ w1 + b1)
        plain = y + (hh @ w2 + b2)
        fused = dw_ln_mlp(x, wd, bd, sc, bi_, w1, b1, w2, b2)
        _sync(fused)
        ok &= _check(f"dw_ln_mlp {h}x{w}x{c}", fused, plain, 3e-4, 3e-3)

    print("ALL PASS" if ok else "SOME FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
