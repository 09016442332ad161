"""Fused i2t keys-update kernel vs the naive decoder formulas."""

import numpy as np
import pytest

import jax.numpy as jnp


def _naive(keys, pe, q_tokens_pe, v_tokens, wq, bq, wk, bk, wv, bv,
           wout, bout, lns, lnb, heads, eps):
    """reference: _decoder_attention(i2t, keys+pe, q_tokens_pe, v_tokens)
    then LayerNorm(keys + attn)."""
    n, t, c = keys.shape
    kk = keys + pe
    qp = kk @ wq + bq
    kp = q_tokens_pe @ wk + bk
    vp = v_tokens @ wv + bv
    dh = qp.shape[-1]
    hd = dh // heads
    tq = kp.shape[1]
    qh = qp.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    kh = kp.reshape(n, tq, heads, hd).transpose(0, 2, 1, 3)
    vh = vp.reshape(n, tq, heads, hd).transpose(0, 2, 1, 3)
    logits = np.einsum("nhtc,nhqc->nhtq", qh * hd**-0.5, kh)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    out = np.einsum("nhtq,nhqc->nhtc", p, vh)
    out = out.transpose(0, 2, 1, 3).reshape(n, t, dh) @ wout + bout
    y = keys + out
    mean = y.mean(-1, keepdims=True)
    var = ((y - mean) ** 2).mean(-1, keepdims=True)
    return (y - mean) / np.sqrt(var + eps) * lns + lnb


@pytest.mark.parametrize(
    "k_share,v2",
    [(1, None), (2, None), (1, True), (2, True), (4, True), (8, True)],
)
def test_i2t_keys_update_matches_naive(k_share, v2):
    """v2=True exercises the shared-source fast path: hoisted per-image
    query projection + 4 prompts per grid step (k_share in {4, 8})."""
    from yolo_sam_inference_tpu.ops.decoder_fused import i2t_keys_update

    rng = np.random.default_rng(2)
    heads, hd, tq = 2, 8, 3
    dh = heads * hd
    # nsrc=4 so the v2 k_share=1 case hits pb=4 on per-prompt keys
    nsrc, t, c = 4, 16, 32
    n = nsrc * k_share
    eps = 1e-6
    f = lambda *s: rng.normal(size=s).astype(np.float32)
    keys_src = f(nsrc, t, c)
    pe = f(1, t, c)
    qtok = f(n, tq, c)   # queries + point_pe
    vtok = f(n, tq, c)   # queries
    wq, bq = f(c, dh) * 0.3, f(dh) * 0.1
    wk, bk = f(c, dh) * 0.3, f(dh) * 0.1
    wv, bv = f(c, dh) * 0.3, f(dh) * 0.1
    wout, bout = f(dh, c) * 0.3, f(c) * 0.1
    lns, lnb = 1.0 + f(c) * 0.1, f(c) * 0.1

    kp = qtok @ wk + bk
    vp = vtok @ wv + bv
    got = i2t_keys_update(
        jnp.asarray(keys_src), jnp.asarray(pe), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(wq), jnp.asarray(bq), jnp.asarray(wout), jnp.asarray(bout),
        jnp.asarray(lns), jnp.asarray(lnb),
        heads=heads, k_share=k_share, eps=eps, interpret=True, v2=v2,
    )

    keys_full = np.repeat(keys_src, k_share, axis=0)
    want = _naive(keys_full, pe, qtok, vtok, wq, bq, wk, bk, wv, bv,
                  wout, bout, lns, lnb, heads, eps)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_i2t_v2_matches_v1_with_t2i():
    """Shared-source v2 (hoisted qp, 4 prompts/step) == v1 on the full
    fused signature incl. the pipelined next-stage t2i output."""
    from yolo_sam_inference_tpu.ops.decoder_fused import i2t_keys_update

    rng = np.random.default_rng(3)
    heads, hd, tq, tq2 = 2, 8, 3, 4
    dh = heads * hd
    nsrc, t, c, k_share = 2, 16, 32, 4
    n = nsrc * k_share
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    keys_src, pe = f(nsrc, t, c), f(1, t, c)
    kp, vp = f(n, tq, dh) * 0.3, f(n, tq, dh) * 0.3
    wq, bq = f(c, dh) * 0.3, f(dh) * 0.1
    wout, bout = f(dh, c) * 0.3, f(c) * 0.1
    lns, lnb = 1.0 + f(c) * 0.1, f(c) * 0.1
    t2i = {
        "qp": f(n, tq2, dh) * 0.3,
        "wk": f(c, dh) * 0.3, "bk": f(dh) * 0.1,
        "wv": f(c, dh) * 0.3, "bv": f(dh) * 0.1,
    }
    outs = [
        i2t_keys_update(
            keys_src, pe, kp, vp, wq, bq, wout, bout, lns, lnb,
            heads=heads, k_share=k_share, interpret=True, v2=v,
            t2i=t2i, out_grid=4,
        )
        for v in (False, True)
    ]
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fused_decoder_matches_reference_path(monkeypatch):
    """Full decoder with the pipelined fused keys-stream == the plain path
    (interpret-mode Pallas on CPU)."""
    import jax

    from yolo_sam_inference_tpu.models.sam import init_sam_params, sam_tiny_test
    from yolo_sam_inference_tpu.models.sam import model as m

    cfg = sam_tiny_test()
    params = init_sam_params(5, cfg)
    rng = np.random.default_rng(9)
    b, k = 2, 3
    gs = cfg.grid_size
    emb = jnp.asarray(rng.normal(size=(b, gs, gs, cfg.prompt_hidden)), jnp.float32)
    sparse = jnp.asarray(rng.normal(size=(b, k, 2, cfg.prompt_hidden)) * 0.3,
                         jnp.float32)

    monkeypatch.setattr(m, "_fused_i2t_enabled", lambda c: False)
    iou_ref, hyper_ref, keys_ref = m.sam_mask_decoder_tokens(params, emb, sparse, cfg)

    monkeypatch.setattr(m, "_fused_i2t_enabled", lambda c: True)
    iou_f, hyper_f, keys_f = m.sam_mask_decoder_tokens(params, emb, sparse, cfg)

    np.testing.assert_allclose(np.asarray(iou_f), np.asarray(iou_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(hyper_f), np.asarray(hyper_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(keys_f), np.asarray(keys_ref),
                               rtol=2e-4, atol=2e-4)


# heavy suite (torch parity / e2e pipeline / 8-device mesh): run the
# quick loop with `pytest -m "not slow" tests/`
pytestmark = pytest.mark.slow


def test_window_crop_matches_vmap_slice():
    """The pallas per-prompt window crop (gather-free, reads the i2t
    output's native layout) equals vmap(dynamic_slice)."""
    import jax
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.ops.window_crop import window_crop

    rng = np.random.default_rng(11)
    n, gs, c, wg = 6, 16, 128, 5
    grid = jnp.asarray(rng.normal(size=(n, gs, gs, c)), jnp.float32)
    r0 = jnp.asarray(rng.integers(0, gs - wg + 1, n), jnp.int32)
    c0 = jnp.asarray(rng.integers(0, gs - wg + 1, n), jnp.int32)
    got = window_crop(grid, r0, c0, wg, interpret=True)
    want = jax.vmap(
        lambda g, r, cc: jax.lax.dynamic_slice(g, (r, cc, 0), (wg, wg, c))
    )(grid, r0, c0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
