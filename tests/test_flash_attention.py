"""Flash-attention kernel vs naive oracle (Pallas interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_sam_inference_tpu.ops.flash_attention import (
    flash_attention_relpos,
    reference_attention_relpos,
)


@pytest.mark.parametrize("grid_s,block_q,block_k", [(8, 16, 16), (8, 32, 64), (16, 64, 128)])
def test_flash_matches_reference(grid_s, block_q, block_k):
    rng = np.random.default_rng(0)
    bh, hd = 3, 32
    n = grid_s * grid_s
    q = rng.normal(size=(bh, n, hd)).astype(np.float32)
    k = rng.normal(size=(bh, n, hd)).astype(np.float32)
    v = rng.normal(size=(bh, n, hd)).astype(np.float32)
    rh = rng.normal(size=(bh, n, grid_s)).astype(np.float32) * 0.5
    rw = rng.normal(size=(bh, n, grid_s)).astype(np.float32) * 0.5

    got = flash_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rh), jnp.asarray(rw),
        grid_s=grid_s, block_q=block_q, block_k=block_k, interpret=True,
    )
    want = reference_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rh), jnp.asarray(rw), grid_s
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_flash_extreme_logits_stable():
    """Online softmax must survive large-magnitude logits."""
    rng = np.random.default_rng(1)
    grid_s, bh, hd = 8, 1, 16
    n = grid_s * grid_s
    q = (rng.normal(size=(bh, n, hd)) * 10).astype(np.float32)
    k = (rng.normal(size=(bh, n, hd)) * 10).astype(np.float32)
    v = rng.normal(size=(bh, n, hd)).astype(np.float32)
    rh = np.zeros((bh, n, grid_s), dtype=np.float32)
    rw = np.zeros((bh, n, grid_s), dtype=np.float32)
    got = flash_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rh), jnp.asarray(rw),
        grid_s=grid_s, block_q=16, block_k=16, interpret=True,
    )
    want = reference_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rh), jnp.asarray(rw), grid_s
    )
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)


def test_flash_bf16_io():
    rng = np.random.default_rng(2)
    grid_s, bh, hd = 8, 2, 32
    n = grid_s * grid_s
    q = rng.normal(size=(bh, n, hd)).astype(np.float32)
    k = rng.normal(size=(bh, n, hd)).astype(np.float32)
    v = rng.normal(size=(bh, n, hd)).astype(np.float32)
    rh = rng.normal(size=(bh, n, grid_s)).astype(np.float32) * 0.3
    rw = rng.normal(size=(bh, n, grid_s)).astype(np.float32) * 0.3
    got = flash_attention_relpos(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(rh), jnp.asarray(rw),
        grid_s=grid_s, block_q=32, block_k=32, interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    want = reference_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rh), jnp.asarray(rw), grid_s
    )
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want), rtol=0.05, atol=0.02
    )
