"""Tests for the dynamic-int8 (w8a8) SAM encoder path (ops/quant.py).

The quantized path is an opt-in TPU throughput lever for ViT-L/H
(``PipelineOptions.quant='int8'``); these tests pin its numerics on CPU:
per-op error bounds, param-tree surgery, full-encoder drift, and
end-to-end mask agreement against the exact float pipeline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_sam_inference_tpu.models.sam import sam_tiny_test
from yolo_sam_inference_tpu.models.sam.model import (
    init_sam_params,
    sam_forward_boxes,
    sam_image_encoder,
)
from yolo_sam_inference_tpu.models.yolo import YoloConfig
from yolo_sam_inference_tpu.ops.quant import (
    int8_linear,
    quantize_linear_params,
    quantize_sam_encoder_params,
    quantize_weight,
)
from yolo_sam_inference_tpu.pipeline.engine import (
    CellSegmentationPipeline,
    PipelineOptions,
)

from synth import make_cell_image


def test_quantize_weight_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    wq, scale = quantize_weight(w)
    assert wq.dtype == jnp.int8 and scale.shape == (512,)
    deq = wq.astype(jnp.float32) * scale[None, :]
    # symmetric rounding: per-element error bounded by half a quant step
    step = np.asarray(scale)[None, :]
    assert (np.abs(np.asarray(deq - w)) <= 0.5 * step + 1e-7).all()


def test_quantize_weight_zero_column():
    w = jnp.zeros((8, 4), jnp.float32)
    wq, scale = quantize_weight(w)
    assert (np.asarray(wq) == 0).all()
    assert (np.asarray(scale) == 1.0).all()
    out = int8_linear(jnp.ones((3, 8)), wq, scale, jnp.zeros((4,)))
    assert (np.asarray(out) == 0).all()


def test_int8_linear_matches_float_linear():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(512,)).astype(np.float32))
    p = quantize_linear_params({"w": w, "b": b})
    got = np.asarray(int8_linear(x, p["wq"], p["wscale"], b))
    want = np.asarray(x @ w + b)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want - np.asarray(b))
    assert rel < 0.02, rel


def test_int8_linear_leading_dims_and_dtype():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 32)).astype(np.float32))
    p = quantize_linear_params(
        {"w": jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32)),
         "b": jnp.zeros((16,))}
    )
    out = int8_linear(x.astype(jnp.bfloat16), p["wq"], p["wscale"], p["b"])
    assert out.shape == (2, 4, 4, 16)
    assert out.dtype == jnp.bfloat16


def test_quantize_sam_encoder_params_tree_surgery():
    cfg = sam_tiny_test()
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    q = quantize_sam_encoder_params(params)
    for lp, lq in zip(params["vision"]["layers"], q["vision"]["layers"]):
        for rec in (lq["attn"]["qkv"], lq["mlp1"], lq["mlp2"]):
            assert "wq" in rec and "wscale" in rec and "w" not in rec
        # the output projection rides inside the flash kernel — stays float
        assert "w" in lq["attn"]["proj"] and "wq" not in lq["attn"]["proj"]
        # the source tree is untouched
        assert "w" in lp["attn"]["qkv"] and "wq" not in lp["attn"]["qkv"]
    # decoder / prompt encoder / neck untouched
    assert q["decoder"] is params["decoder"]
    assert q["prompt"] is params["prompt"]
    # TinyViT trees (no "vision" subtree) pass through unchanged
    tiny = {"tinyvit": {"x": jnp.zeros((2,))}}
    assert quantize_sam_encoder_params(tiny) is tiny


def test_encoder_int8_drift_bounded():
    """Full tiny ViT encoder: int8 embeddings stay close to fp32."""
    cfg = sam_tiny_test()
    params = init_sam_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    pix = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(sam_image_encoder(params, pix, cfg))
    got = np.asarray(sam_image_encoder(quantize_sam_encoder_params(params), pix, cfg))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel


@pytest.mark.slow
def test_pipeline_quant_masks_match_float():
    """End-to-end: quant='int8' pipeline masks agree with the exact float
    run (same seed => same weights; only the encoder numerics differ)."""
    kw = dict(
        sam_config=sam_tiny_test(),
        yolo_config=YoloConfig(num_classes=1),
    )
    opts = dict(batch_size=2, max_det=8, metric_crop=48, yolo_size=64,
                nms_candidates=64, compute_dtype=jnp.float32)
    pipe_f = CellSegmentationPipeline(options=PipelineOptions(**opts), **kw)
    pipe_q = CellSegmentationPipeline(
        options=PipelineOptions(quant="int8", **opts), **kw
    )
    rng = np.random.default_rng(7)
    imgs = np.stack([make_cell_image(rng) for _ in range(2)])
    out_f = pipe_f.process_batch_arrays(imgs)
    out_q = pipe_q.process_batch_arrays(imgs)
    both = np.asarray(out_f["valid"]) & np.asarray(out_q["valid"])
    assert both.any()  # tiny random model still detects the synthetic cells
    mf = np.asarray(out_f["mask_crops"])[both]
    mq = np.asarray(out_q["mask_crops"])[both]
    inter = (mf & mq).sum(axis=(-2, -1))
    union = (mf | mq).sum(axis=(-2, -1))
    iou = inter / np.maximum(union, 1)
    assert (iou >= 0.95).all(), iou
    # deformability (the scientific headline metric) stays tight
    df = np.asarray(out_f["metrics"]["deformability"])[both]
    dq = np.asarray(out_q["metrics"]["deformability"])[both]
    assert np.max(np.abs(df - dq)) < 0.02


def _oracle_int8_tail(x, attn, scale, bias, w1q, w1s, b1, w2q, w2s, b2,
                      eps=1e-6, chunks=4):
    """jnp oracle of fused_ln_mlp_int8's exact scheme (same chunking, same
    round-half-to-even quantization, fp32 epilogues) for interpret-mode
    kernel parity."""
    y = x + attn if attn is not None else x
    yf = y.astype(jnp.float32)
    mean = yf.mean(-1, keepdims=True)
    d = yf - mean
    inv = jax.lax.rsqrt((d * d).mean(-1, keepdims=True) + eps)
    ln = ((d * inv).astype(y.dtype) * scale + bias).astype(jnp.float32)
    m = ln.reshape(-1, ln.shape[-1])

    def quant_rows(v):
        amax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
        s = jnp.where(amax > 0, amax / 127.0, 1.0)
        return jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8), s

    xq, xs = quant_rows(m)
    hidden = w1q.shape[-1]
    ch = hidden // chunks
    out = jnp.broadcast_to(b2.astype(jnp.float32), (m.shape[0], w2q.shape[-1]))
    from yolo_sam_inference_tpu.ops.fused_ln import _erf_as
    for i in range(chunks):
        sl = slice(i * ch, (i + 1) * ch)
        acc = jax.lax.dot_general(xq, w1q[:, sl], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        h = acc.astype(jnp.float32) * (xs * w1s[None, sl]) + b1[None, sl]
        # the kernel's own erf (rational by default, A-S under SAM_ERF_AS=1):
        # gelu output is requantized to int8 right after, so even a 3e-5 erf
        # difference vs an exact oracle would flip rounding buckets — the
        # approximation itself is bounded by test_erf_rational_accuracy
        h = h * 0.5 * (1.0 + _erf_as(h * 2.0 ** -0.5))
        hq, hs = quant_rows(h)
        acc2 = jax.lax.dot_general(hq, w2q[sl, :], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        out = out + acc2.astype(jnp.float32) * (hs * w2s[None, :])
    return y + out.reshape(y.shape).astype(y.dtype)


def _int8_tail_case(rng, rows=64, c=128, hidden=512, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(rows, c)), dtype)
    a = jnp.asarray(rng.normal(size=(rows, c)), dtype)
    scale = jnp.asarray(rng.normal(1, 0.1, size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, size=(c,)).astype(np.float32))
    p1 = quantize_linear_params(
        {"w": jnp.asarray(rng.normal(0, 0.06, size=(c, hidden)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(0, 0.05, size=(hidden,)).astype(np.float32))})
    p2 = quantize_linear_params(
        {"w": jnp.asarray(rng.normal(0, 0.06, size=(hidden, c)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(0, 0.05, size=(c,)).astype(np.float32))})
    return x, a, scale, bias, p1, p2


def _assert_quant_parity(got, want):
    """Kernel-vs-oracle comparison tolerant of isolated rounding-tie flips:
    an LN value landing exactly on an int8 rounding boundary can resolve
    differently between the jit-fused kernel and the oracle's composition
    (1-ulp input difference -> one quant-step output difference on that
    row). Bulk must match tightly; ties are rare and step-bounded."""
    d = np.abs(got - want)
    bad_rows = (d.max(axis=-1) > 2e-5)
    # a tie flips one quantized int of a row, moving that whole row by one
    # quant step — so the unit of disagreement is a row, not an element
    assert bad_rows.mean() <= 0.06, bad_rows.mean()
    assert d.max() < 5e-3, d.max()


def test_fused_ln_mlp_int8_matches_oracle():
    """Interpret-mode kernel == jnp oracle of the identical w8a8 scheme."""
    from yolo_sam_inference_tpu.ops.fused_ln import fused_ln_mlp_int8

    rng = np.random.default_rng(11)
    x, a, scale, bias, p1, p2 = _int8_tail_case(rng)
    got = np.asarray(fused_ln_mlp_int8(
        x, a, scale, bias, p1["wq"], p1["wscale"], p1["b"],
        p2["wq"], p2["wscale"], p2["b"], interpret=True))
    want = np.asarray(_oracle_int8_tail(
        x, a, scale, bias, p1["wq"], p1["wscale"], p1["b"],
        p2["wq"], p2["wscale"], p2["b"]))
    _assert_quant_parity(got, want)


def test_fused_ln_mlp_int8_no_attn_matches_oracle():
    from yolo_sam_inference_tpu.ops.fused_ln import fused_ln_mlp_int8

    rng = np.random.default_rng(12)
    x, _, scale, bias, p1, p2 = _int8_tail_case(rng)
    got = np.asarray(fused_ln_mlp_int8(
        x, None, scale, bias, p1["wq"], p1["wscale"], p1["b"],
        p2["wq"], p2["wscale"], p2["b"], interpret=True))
    want = np.asarray(_oracle_int8_tail(
        x, None, scale, bias, p1["wq"], p1["wscale"], p1["b"],
        p2["wq"], p2["wscale"], p2["b"]))
    _assert_quant_parity(got, want)


def test_fused_ln_mlp_int8_close_to_float_tail():
    """The w8a8 fused tail's MLP contribution stays within quantization
    error of the exact fp32 fused tail on the same weights."""
    from yolo_sam_inference_tpu.ops.fused_ln import fused_ln_mlp, fused_ln_mlp_int8

    rng = np.random.default_rng(13)
    c, hidden = 128, 512
    x = jnp.asarray(rng.normal(size=(64, c)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(64, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1, 0.1, size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, size=(c,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.06, size=(c, hidden)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.05, size=(hidden,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.06, size=(hidden, c)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.05, size=(c,)).astype(np.float32))
    p1 = quantize_linear_params({"w": w1, "b": b1})
    p2 = quantize_linear_params({"w": w2, "b": b2})
    exact = np.asarray(fused_ln_mlp(x, a, scale, bias, w1, b1, w2, b2,
                                    interpret=True))
    q = np.asarray(fused_ln_mlp_int8(
        x, a, scale, bias, p1["wq"], p1["wscale"], p1["b"],
        p2["wq"], p2["wscale"], p2["b"], interpret=True))
    y = np.asarray(x + a)
    rel = np.linalg.norm(q - exact) / np.linalg.norm(exact - y)
    assert rel < 0.02, rel


def test_fused_ln_mlp_tiled_int8_matches_oracle():
    """Interpret-mode weight-tiled w8a8 tail == the jnp oracle with
    chunks = hidden tiles (per-tile activation scales): the ViT-H int8
    path, where the MLP exceeds even the int8 VMEM-residency budget."""
    from yolo_sam_inference_tpu.ops.fused_ln import fused_ln_mlp_tiled_int8

    rng = np.random.default_rng(17)
    x, a, scale, bias, p1, p2 = _int8_tail_case(rng)
    # force 4 hidden tiles of 128 and 2 row blocks of 32
    got = np.asarray(fused_ln_mlp_tiled_int8(
        x, a, scale, bias, p1["wq"], p1["wscale"], p1["b"],
        p2["wq"], p2["wscale"], p2["b"],
        block_rows=32, block_hidden=128, interpret=True))
    want = np.asarray(_oracle_int8_tail(
        x, a, scale, bias, p1["wq"], p1["wscale"], p1["b"],
        p2["wq"], p2["wscale"], p2["b"], chunks=4))
    _assert_quant_parity(got, want)


def test_fused_ln_mlp_tiled_int8_single_tile_equals_resident():
    """With one hidden tile the tiled kernel is the resident kernel's
    scheme with chunks=1 — both must match the chunks=1 oracle."""
    from yolo_sam_inference_tpu.ops.fused_ln import fused_ln_mlp_tiled_int8

    rng = np.random.default_rng(18)
    x, a, scale, bias, p1, p2 = _int8_tail_case(rng)
    got = np.asarray(fused_ln_mlp_tiled_int8(
        x, a, scale, bias, p1["wq"], p1["wscale"], p1["b"],
        p2["wq"], p2["wscale"], p2["b"],
        block_hidden=512, interpret=True))
    want = np.asarray(_oracle_int8_tail(
        x, a, scale, bias, p1["wq"], p1["wscale"], p1["b"],
        p2["wq"], p2["wscale"], p2["b"], chunks=1))
    _assert_quant_parity(got, want)


def test_fused_ln_mlp_tiled_int8_close_to_float_tail():
    """The tiled w8a8 tail's MLP contribution stays within quantization
    error of the exact fp32 tiled kernel on the same weights."""
    from yolo_sam_inference_tpu.ops.fused_ln import (
        fused_ln_mlp_tiled,
        fused_ln_mlp_tiled_int8,
    )

    rng = np.random.default_rng(19)
    c, hidden = 128, 512
    x = jnp.asarray(rng.normal(size=(64, c)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(64, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1, 0.1, size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, size=(c,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.06, size=(c, hidden)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.05, size=(hidden,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.06, size=(hidden, c)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.05, size=(c,)).astype(np.float32))
    p1 = quantize_linear_params({"w": w1, "b": b1})
    p2 = quantize_linear_params({"w": w2, "b": b2})
    exact = np.asarray(fused_ln_mlp_tiled(x, a, scale, bias, w1, b1, w2, b2,
                                          interpret=True))
    q = np.asarray(fused_ln_mlp_tiled_int8(
        x, a, scale, bias, p1["wq"], p1["wscale"], p1["b"],
        p2["wq"], p2["wscale"], p2["b"],
        block_rows=32, block_hidden=128, interpret=True))
    y = np.asarray(x + a)
    rel = np.linalg.norm(q - exact) / np.linalg.norm(exact - y)
    assert rel < 0.02, rel


def test_fused_ln_matmul_int8_matches_unfused_path():
    """Interpret-mode fused LN+int8-qkv kernel vs the separate-pass oracle
    (jnp LayerNorm -> ops/quant.py:int8_linear): identical quant scheme,
    so agreement is tie-flip-bounded."""
    from yolo_sam_inference_tpu.ops.fused_ln import fused_ln_matmul_int8

    rng = np.random.default_rng(15)
    c, o = 128, 384
    x = jnp.asarray(rng.normal(size=(64, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1, 0.1, size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, size=(c,)).astype(np.float32))
    p = quantize_linear_params(
        {"w": jnp.asarray(rng.normal(0, 0.06, size=(c, o)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(0, 0.05, size=(o,)).astype(np.float32))})
    got = np.asarray(fused_ln_matmul_int8(
        x, scale, bias, p["wq"], p["wscale"], p["b"], interpret=True))

    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    d = xf - mean
    inv = jax.lax.rsqrt((d * d).mean(-1, keepdims=True) + 1e-6)
    ln = (d * inv) * scale + bias
    want = np.asarray(int8_linear(ln, p["wq"], p["wscale"], p["b"]))
    _assert_quant_parity(got, want)


def test_fused_ln_mlp_int8_bf16_activations():
    from yolo_sam_inference_tpu.ops.fused_ln import fused_ln_mlp_int8

    rng = np.random.default_rng(14)
    x, a, scale, bias, p1, p2 = _int8_tail_case(rng, dtype=jnp.bfloat16)
    out = fused_ln_mlp_int8(
        x, a, scale, bias, p1["wq"], p1["wscale"], p1["b"],
        p2["wq"], p2["wscale"], p2["b"], interpret=True)
    assert out.shape == x.shape and out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))


@pytest.mark.slow
def test_quant_report_tool(tmp_path, rng):
    """apps/quant_report.py — the int8 calibration story: bf16 and int8
    pipelines over the same images, report with per-metric |Δ| + mask IoU
    (CSV + summary + return dict). Same seed => same weights, so the only
    divergence is the 8-bit rounding."""
    from PIL import Image

    from yolo_sam_inference_tpu.apps.quant_report import run_report
    from yolo_sam_inference_tpu.models.sam import sam_tiny_test
    from yolo_sam_inference_tpu.pipeline.engine import (
        CellSegmentationPipeline,
        PipelineOptions,
    )

    src = tmp_path / "imgs"
    src.mkdir()
    files = []
    for i in range(3):
        p = src / f"i{i}.png"
        Image.fromarray(make_cell_image(rng)).save(p)
        files.append(p)

    mk = lambda quant: CellSegmentationPipeline(
        sam_config=sam_tiny_test(),
        options=PipelineOptions(batch_size=2, max_det=4, quant=quant),
    )
    out = tmp_path / "report"
    summary = run_report(mk("none"), mk("int8"), files, out, batch_size=2)

    assert (out / "quant_calibration.csv").exists()
    text = (out / "quant_calibration_summary.txt").read_text()
    assert "calibration report" in text and "3 images" in text
    assert "iou" in summary and summary["iou"]["n"] > 0
    # random tiny weights are a worst case for quantization noise; still,
    # identical weights + int8 rounding must keep masks broadly intact
    assert summary["iou"]["mean"] > 0.5
    assert "deformability" in summary
    import csv as _csv

    rows = {r["quantity"] for r in _csv.DictReader(open(out / "quant_calibration.csv"))}
    assert {"iou", "deformability", "area", "perimeter"} <= rows
