"""Flash-attention kernel vs naive oracle (Pallas interpret mode on CPU)."""

import functools

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


def test_flash_partial_q_rows_match_full():
    """A row-aligned q subset (the sequence-parallel encoder's local block)
    returns exactly the matching rows of the full-q result — the folded
    bias is q/k-separable, so nq < nk needs only the subset's own tables."""
    rng = np.random.default_rng(3)
    grid_s, bh, hd = 8, 2, 32
    n = grid_s * grid_s
    q = rng.normal(size=(bh, n, hd)).astype(np.float32)
    k = rng.normal(size=(bh, n, hd)).astype(np.float32)
    v = rng.normal(size=(bh, n, hd)).astype(np.float32)
    rh = rng.normal(size=(bh, n, grid_s)).astype(np.float32) * 0.5
    rw = rng.normal(size=(bh, n, grid_s)).astype(np.float32) * 0.5

    full = reference_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(rh), jnp.asarray(rw), grid_s,
    )
    # shard 1 of 4: rows [16, 32) of the 64-token grid
    sl = slice(16, 32)
    got = flash_attention_relpos(
        jnp.asarray(q[:, sl]), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(rh[:, sl]), jnp.asarray(rw[:, sl]),
        grid_s=grid_s, block_q=16, block_k=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(full)[:, sl], rtol=2e-4, atol=2e-5
    )


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


# ------------------------------------------------------- grid (layout-native)


def _oracle_grid_attention(qkv, rhw, heads, window):
    """Numpy oracle for flash_attention_grid: window-confined attention with
    the decomposed local rel-pos bias, straight from the qkv tensor."""
    b, s, _, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    nw = s // window
    q = np.asarray(qkv[..., :c], np.float32).reshape(b, s, s, heads, hd)
    k = np.asarray(qkv[..., c : 2 * c], np.float32).reshape(b, s, s, heads, hd)
    v = np.asarray(qkv[..., 2 * c :], np.float32).reshape(b, s, s, heads, hd)
    rh = np.asarray(rhw[..., : heads * window], np.float32).reshape(
        b, s, s, heads, window
    )
    rw = np.asarray(rhw[..., heads * window :], np.float32).reshape(
        b, s, s, heads, window
    )
    out = np.zeros((b, s, s, heads, hd), np.float32)
    n = window * window
    ky = np.arange(n) // window
    kx = np.arange(n) % window
    for bi in range(b):
        for wy in range(nw):
            for wx in range(nw):
                ys = slice(wy * window, (wy + 1) * window)
                xs = slice(wx * window, (wx + 1) * window)
                for h in range(heads):
                    qw = q[bi, ys, xs, h].reshape(-1, hd)
                    kw = k[bi, ys, xs, h].reshape(-1, hd)
                    vw = v[bi, ys, xs, h].reshape(-1, hd)
                    sc = qw @ kw.T * hd**-0.5
                    sc += rh[bi, ys, xs, h].reshape(-1, window)[:, ky]
                    sc += rw[bi, ys, xs, h].reshape(-1, window)[:, kx]
                    p = np.exp(sc - sc.max(1, keepdims=True))
                    p /= p.sum(1, keepdims=True)
                    out[bi, ys, xs, h] = (p @ vw).reshape(window, window, hd)
    return out.reshape(b, s, s, c)


@pytest.mark.parametrize(
    "window,bqy,bky",
    [(4, None, None), (8, None, None), (8, 2, 4), (8, 4, 2), (4, 2, 2)],
)
def test_flash_grid_matches_oracle(window, bqy, bky):
    from yolo_sam_inference_tpu.ops.flash_attention import flash_attention_grid

    rng = np.random.default_rng(0)
    b, s, heads, hd = 2, 8, 3, 16
    c = heads * hd
    qkv = jnp.asarray(rng.normal(size=(b, s, s, 3 * c)), jnp.float32)
    rhw = jnp.asarray(rng.normal(size=(b, s, s, 2 * heads * window)) * 0.3,
                      jnp.float32)
    got = flash_attention_grid(qkv, rhw, heads=heads, window=window,
                               block_qy=bqy, block_ky=bky, interpret=True)
    want = _oracle_grid_attention(qkv, rhw, heads, window)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_flash_grid_combined_qkv_read_matches_default(monkeypatch):
    """SAM_FLASH_QKV1=1 (single contiguous (.., 3C) qkv block per step
    instead of three lane-sliced reads) is bit-compatible with the default
    path on the windowed (num_q == num_k == 1) geometry."""
    from yolo_sam_inference_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(5)
    b, s, heads, hd, window = 2, 8, 3, 16, 4
    c = heads * hd
    qkv = jnp.asarray(rng.normal(size=(b, s, s, 3 * c)), jnp.float32)
    rhw = jnp.asarray(rng.normal(size=(b, s, s, 2 * heads * window)) * 0.3,
                      jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    monkeypatch.delenv("SAM_FLASH_QKV1", raising=False)
    base = np.asarray(fa.flash_attention_grid(
        qkv, rhw, heads=heads, window=window, wproj=wproj, bproj=bproj,
        interpret=True))
    monkeypatch.setenv("SAM_FLASH_QKV1", "1")
    fa.flash_attention_grid.clear_cache()
    got = np.asarray(fa.flash_attention_grid(
        qkv, rhw, heads=heads, window=window, wproj=wproj, bproj=bproj,
        interpret=True))
    fa.flash_attention_grid.clear_cache()  # do not leak the env-keyed jit
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s,window", [(8, 4), (16, 4)])  # wps = 2 and 4
def test_flash_grid_wpair_matches_oracle(monkeypatch, s, window):
    """SAM_FLASH_WPAIR=1 (wps windows merged into one contraction with
    +-sqrt(M) window-indicator lanes) matches the window oracle at both
    merge widths the selector can pick."""
    from yolo_sam_inference_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(7)
    b, heads, hd = 2, 3, 16
    c = heads * hd
    qkv = jnp.asarray(rng.normal(size=(b, s, s, 3 * c)), jnp.float32)
    rhw = jnp.asarray(rng.normal(size=(b, s, s, 2 * heads * window)) * 0.3,
                      jnp.float32)
    monkeypatch.setenv("SAM_FLASH_WPAIR", "1")
    fa.flash_attention_grid.clear_cache()
    got = np.asarray(fa.flash_attention_grid(
        qkv, rhw, heads=heads, window=window, interpret=True))
    fa.flash_attention_grid.clear_cache()
    monkeypatch.setenv("SAM_FLASH_WPAIR", "0")
    want = _oracle_grid_attention(qkv, rhw, heads, window)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # cross-window suppression is EXACT (softmax rows renormalize over the
    # in-window entries only): verify against the default kernel too
    fa.flash_attention_grid.clear_cache()
    base = np.asarray(fa.flash_attention_grid(
        qkv, rhw, heads=heads, window=window, interpret=True))
    fa.flash_attention_grid.clear_cache()
    np.testing.assert_allclose(got, base, rtol=2e-3, atol=2e-3)


def test_flash_grid_vsum_matches_default(monkeypatch):
    """SAM_FLASH_VSUM=1 (softmax denominator via a ones-column on the PV
    contraction) is numerics-equivalent to the VPU row-sum path."""
    from yolo_sam_inference_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(6)
    b, s, heads, hd, window = 2, 8, 3, 16, 4
    c = heads * hd
    qkv = jnp.asarray(rng.normal(size=(b, s, s, 3 * c)), jnp.float32)
    rhw = jnp.asarray(rng.normal(size=(b, s, s, 2 * heads * window)) * 0.3,
                      jnp.float32)
    monkeypatch.delenv("SAM_FLASH_VSUM", raising=False)
    base = np.asarray(fa.flash_attention_grid(
        qkv, rhw, heads=heads, window=window, interpret=True))
    monkeypatch.setenv("SAM_FLASH_VSUM", "1")
    fa.flash_attention_grid.clear_cache()
    got = np.asarray(fa.flash_attention_grid(
        qkv, rhw, heads=heads, window=window, interpret=True))
    fa.flash_attention_grid.clear_cache()
    np.testing.assert_allclose(got, base, rtol=2e-6, atol=2e-6)


def test_vision_attention_grid_matches_naive_path():
    """The full fused path (qkv + local rel tables + grid kernel) must equal
    the window-partition + naive-attention path used on CPU."""
    import dataclasses

    from yolo_sam_inference_tpu.models.sam import sam_tiny_test, init_sam_params
    from yolo_sam_inference_tpu.models.sam.model import (
        _vision_attention,
        _vision_attention_grid,
        _window_partition,
        _window_unpartition,
    )
    from yolo_sam_inference_tpu.ops import flash_attention as fa

    cfg = sam_tiny_test()
    params = init_sam_params(1, cfg)
    lp = params["vision"]["layers"][0]["attn"]
    # give the rel tables real values (init zeros would hide bias bugs)
    rng = np.random.default_rng(3)
    ws = cfg.window_size
    lp["rel_pos_h"] = jnp.asarray(rng.normal(size=(2 * ws - 1, 16)) * 0.3,
                                  jnp.float32)
    lp["rel_pos_w"] = jnp.asarray(rng.normal(size=(2 * ws - 1, 16)) * 0.3,
                                  jnp.float32)
    s = 4  # grid 4, window 2
    x = jnp.asarray(rng.normal(size=(2, s, s, cfg.vision_hidden)), jnp.float32)

    win, padded = _window_partition(x, ws)
    naive = _window_unpartition(
        _vision_attention(lp, win, cfg.vision_heads, True), ws, padded, s
    )

    orig = fa.flash_attention_grid
    fa.flash_attention_grid = functools.partial(orig, interpret=True)
    try:
        got = _vision_attention_grid(lp, x, cfg.vision_heads, ws)
    finally:
        fa.flash_attention_grid = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(naive),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("s,window", [(8, 4), (8, 8), (4, 2), (40, 8)])
def test_relpos_tables_matches_einsum(s, window):
    """Pallas score-table builder == the einsum construction it replaces."""
    from yolo_sam_inference_tpu.ops.flash_attention import relpos_tables

    rng = np.random.default_rng(5)
    b, heads, hd = 2, 3, 16
    c = heads * hd
    qkv = jnp.asarray(rng.normal(size=(b, s, s, 3 * c)), jnp.float32)
    rel_h = jnp.asarray(rng.normal(size=(2 * window - 1, hd)), jnp.float32)
    rel_w = jnp.asarray(rng.normal(size=(2 * window - 1, hd)), jnp.float32)

    got = relpos_tables(qkv, rel_h, rel_w, heads=heads, window=window,
                        interpret=True)

    idx = np.arange(window)[:, None] - np.arange(window)[None, :] + window - 1
    th = np.tile(np.asarray(rel_h)[idx], (s // window, 1, 1))
    tw = np.tile(np.asarray(rel_w)[idx], (s // window, 1, 1))
    qp = np.asarray(qkv[..., :c]).reshape(b, s, s, heads, hd)
    rh = np.einsum("byxhc,ykc->byxhk", qp, th)
    rw = np.einsum("byxhc,xkc->byxhk", qp, tw)
    want = np.concatenate(
        [rh.reshape(b, s, s, heads * window), rw.reshape(b, s, s, heads * window)],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "s,window,heads,hd",
    [
        (8, 4, 3, 16), (8, 8, 3, 16), (4, 2, 3, 16), (32, 16, 12, 64),
        # s > 32 exercises the column-tiled v2 kernel (ViT at 1024 canvas)
        (40, 8, 3, 16), (64, 16, 4, 80),
    ],
)
def test_relpos_tables_v2_matches_einsum(s, window, heads, hd):
    """Dot-only (v2) table builder == the einsum construction. (32,16,12,64)
    is the exact bench-default shape (512px ViT-B windowed layer: pack=2,
    full-128-lane class tables); (64,16,4,80) is the ViT-H-at-1024-canvas
    shape on the tiled path (pack=1)."""
    from yolo_sam_inference_tpu.ops.flash_attention import relpos_tables

    rng = np.random.default_rng(7)
    b = 2
    c = heads * hd
    qkv = jnp.asarray(rng.normal(size=(b, s, s, 3 * c)), jnp.float32)
    rel_h = jnp.asarray(rng.normal(size=(2 * window - 1, hd)), jnp.float32)
    rel_w = jnp.asarray(rng.normal(size=(2 * window - 1, hd)), jnp.float32)

    got = relpos_tables(qkv, rel_h, rel_w, heads=heads, window=window,
                        interpret=True, v2=True)

    idx = np.arange(window)[:, None] - np.arange(window)[None, :] + window - 1
    th = np.tile(np.asarray(rel_h)[idx], (s // window, 1, 1))
    tw = np.tile(np.asarray(rel_w)[idx], (s // window, 1, 1))
    qp = np.asarray(qkv[..., :c]).reshape(b, s, s, heads, hd)
    rh = np.einsum("byxhc,ykc->byxhk", qp, th)
    rw = np.einsum("byxhc,xkc->byxhk", qp, tw)
    want = np.concatenate(
        [rh.reshape(b, s, s, heads * window), rw.reshape(b, s, s, heads * window)],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


# heavy suite (torch parity / e2e pipeline / 8-device mesh): run the
# quick loop with `pytest -m "not slow" tests/`
pytestmark = pytest.mark.slow


def test_relpos_v3_assembly_matches_default(monkeypatch):
    """SAM_RELPOS_V3 (per-row-class assembly) is bit-equal to the per-row
    slicing builder on the full-image path."""
    from yolo_sam_inference_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(9)
    b, s, heads, hd, window = 2, 8, 3, 16, 4
    c = heads * hd
    qkv = jnp.asarray(rng.normal(size=(b, s, s, 3 * c)), jnp.float32)
    th = jnp.asarray(rng.normal(size=(2 * window - 1, hd)) * 0.1, jnp.float32)
    tw = jnp.asarray(rng.normal(size=(2 * window - 1, hd)) * 0.1, jnp.float32)
    monkeypatch.delenv("SAM_RELPOS_V3", raising=False)
    base = np.asarray(fa.relpos_tables(
        qkv, th, tw, heads=heads, window=window, interpret=True))
    monkeypatch.setenv("SAM_RELPOS_V3", "1")
    fa.relpos_tables.clear_cache()
    got = np.asarray(fa.relpos_tables(
        qkv, th, tw, heads=heads, window=window, interpret=True))
    fa.relpos_tables.clear_cache()
    np.testing.assert_allclose(got, base, rtol=1e-6, atol=1e-6)
