"""TinyViT (MobileSAM) encoder tests: shapes, jit, engine integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_sam_inference_tpu.models.sam.tinyvit import (
    TinyViTConfig,
    init_tinyvit_params,
    tinyvit_encoder,
)


@pytest.mark.slow
def test_encoder_shapes_and_jit():
    cfg = TinyViTConfig(image_size=128, output_channels=32)
    params = init_tinyvit_params(0, cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 128, 128, 3)).astype(np.float32))
    out = jax.jit(lambda p, x: tinyvit_encoder(p, x, cfg))(params, x)
    assert out.shape == (2, 8, 8, 32)  # 128/16 grid
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_resolution_independent_weights():
    """Same params run at multiple resolutions (no abs pos embed)."""
    cfg128 = TinyViTConfig(image_size=128, output_channels=32)
    cfg256 = TinyViTConfig(image_size=256, output_channels=32)
    params = init_tinyvit_params(0, cfg128)
    x = jnp.zeros((1, 256, 256, 3), dtype=jnp.float32)
    out = tinyvit_encoder(params, x, cfg256)
    assert out.shape == (1, 16, 16, 32)


def test_window_attention_bias_index():
    from yolo_sam_inference_tpu.models.sam.tinyvit import _offset_index

    idx = _offset_index(3)
    assert idx.shape == (9, 9)
    assert idx.max() == 24 and idx.min() == 0  # (2*3-1)^2 = 25 offsets
    # mirrored pairs sum to the max offset code
    assert idx[0, 8] + idx[8, 0] == 24
    assert idx[4, 4] == 12  # zero offset = center code


@pytest.mark.slow
def test_fused_block_matches_plain():
    """The Pallas window-attention + fused-MLP block path (interpret mode)
    must match the plain jnp reference for every TinyViT-5M stage geometry
    (c, heads, ws), including non-dividing window sizes (padding path)."""
    from yolo_sam_inference_tpu.models.sam.tinyvit import _tinyvit_block

    cfg = TinyViTConfig()
    params = init_tinyvit_params(1, cfg)
    rng = np.random.default_rng(2)
    for si, hw in ((1, 16), (2, 15), (3, 9)):
        p = params[f"stage{si}"][0]
        heads, ws = cfg.num_heads[si], cfg.window_sizes[si]
        c = cfg.embed_dims[si]
        # init leaves attention-bias tables and qkv biases at zero — fill
        # them so the kernel's bias add + softmax path is actually exercised
        p["attn"]["attn_bias"] = jnp.asarray(
            rng.normal(0, 0.5, p["attn"]["attn_bias"].shape), jnp.float32
        )
        p["attn"]["qkv_b"] = jnp.asarray(
            rng.normal(0, 0.1, p["attn"]["qkv_b"].shape), jnp.float32
        )
        x = jnp.asarray(rng.normal(size=(2, hw, hw, c)), jnp.float32)
        plain = _tinyvit_block(p, x, heads, ws, cfg)
        fused = _tinyvit_block(p, x, heads, ws, cfg, fused=True, interpret=True)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(plain), atol=3e-4, rtol=1e-4,
            err_msg=f"stage {si} (c={c}, heads={heads}, ws={ws})",
        )


def test_fused_block_pack2_rectangular():
    """pack=2 window packing (nwin = 2 x odd) + a rectangular, non-padding
    grid — geometry not hit by the square stage cases above."""
    from yolo_sam_inference_tpu.models.sam.tinyvit import _offset_index
    from yolo_sam_inference_tpu.ops.tinyvit_attention import (
        _pick_nwin,
        tinyvit_window_block,
    )

    c, heads, ws = 128, 4, 7
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 14, 21, c)), jnp.float32)  # 2x3 windows
    n, tp = 6, 56
    assert _pick_nwin(n, tp, heads) == 6  # -> pack=2 in the wrapper
    bias = jnp.asarray(
        rng.normal(0, 0.5, (heads, (2 * ws - 1) ** 2)), jnp.float32
    )[:, _offset_index(ws)]
    args = [
        jnp.asarray(rng.normal(0, 0.1, s), jnp.float32)
        for s in [(c,), (c,), (c, 3 * c), (3 * c,), (c, c), (c,)]
    ]
    fused = tinyvit_window_block(x, bias, *args, heads, ws, interpret=True)

    # plain-path oracle: the reference window-attention math spelled out
    # with the pre-expanded bias (the module's _window_attention expands
    # from the offset table itself, so it can't take this bias directly)
    win = x.reshape(1, 2, ws, 3, ws, c).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(6, ws * ws, c)
    xf = win.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, -1, keepdims=True)
    win_n = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * args[0] + args[1]
    qkv = win_n @ args[2] + args[3]
    hd = c // heads
    qkv = qkv.reshape(6, ws * ws, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    logits = jnp.einsum("nhqc,nhkc->nhqk", q * (hd ** -0.5), k) + bias[None]
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nhqk,nhkc->nhqc", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(6, ws * ws, c) @ args[4] + args[5]
    out = out.reshape(1, 2, 3, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    plain = x + out.reshape(1, 14, 21, c)

    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), atol=3e-5, rtol=1e-4
    )


def test_fused_mbconv_matches_plain():
    """The Pallas MBConv kernel (interpret mode) must match the plain conv
    formulation, including the zero-padded-expanded-tensor edge semantics
    (the halo mask: padded x rows would otherwise leak gelu(conv1_bias))."""
    from yolo_sam_inference_tpu.models.sam.tinyvit import _mbconv

    cfg = TinyViTConfig()
    params = init_tinyvit_params(3, cfg)
    p = params["stage0"][0]
    rng = np.random.default_rng(4)
    p["conv1"]["b"] = jnp.asarray(rng.normal(0, 0.3, p["conv1"]["b"].shape), jnp.float32)
    p["conv2"]["b"] = jnp.asarray(rng.normal(0, 0.3, p["conv2"]["b"].shape), jnp.float32)
    p["conv3"]["b"] = jnp.asarray(rng.normal(0, 0.3, p["conv3"]["b"].shape), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, cfg.embed_dims[0])), jnp.float32)
    plain = _mbconv(p, x)
    fused = _mbconv(p, x, fused=True, interpret=True)
    # atol 3e-4: the kernel's rational erf-GELU differs from the exact-erf
    # plain path by <=9.3e-5/element (bounded by test_erf_rational_accuracy);
    # plumbing bugs produce >=1e-2 errors and are still caught
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), atol=3e-4, rtol=1e-4
    )


def test_fused_stride1_merge_matches_plain():
    """The residual-free MBConv kernel (residual=False) must reproduce the
    stride-1 PatchMerging: conv3(gelu(dw3x3_s1(gelu(conv1(x))))) with
    co != ci, no residual, no outer activation — merge2's path at S/16."""
    from yolo_sam_inference_tpu.models.sam.tinyvit import (
        _conv_bn,
        _gelu,
    )
    from yolo_sam_inference_tpu.ops.mbconv_fused import mbconv_block

    rng = np.random.default_rng(22)
    ci, co = 160, 320
    e = 4 * ci
    x = jnp.asarray(rng.normal(size=(2, 16, 16, ci)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.1, (ci, e)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.3, (e,)), jnp.float32)
    wd = jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, e)), jnp.float32)
    bd = jnp.asarray(rng.normal(0, 0.3, (e,)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.1, (e, co)), jnp.float32)
    b3 = jnp.asarray(rng.normal(0, 0.3, (co,)), jnp.float32)

    h = _gelu(_conv_bn({"w": w1.reshape(1, 1, ci, e), "b": b1}, x))
    h = _gelu(_conv_bn({"w": wd, "b": bd}, h, groups=e))
    plain = _conv_bn({"w": w3.reshape(1, 1, e, co), "b": b3}, h)
    fused = mbconv_block(
        x, w1, b1, wd, bd, w3, b3, interpret=True, residual=False
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), atol=3e-4, rtol=1e-4
    )


def test_dw_ln_mlp_matches_plain():
    """The fused local_conv+LN+MLP tail kernel (interpret mode) must match
    the plain formulation y = dw3x3(x)+b; y + mlp(LN(y)) — including the
    'same'-padding edge taps and the strip-boundary halo rows."""
    from yolo_sam_inference_tpu.models.sam.tinyvit import (
        _conv_bn,
        _gelu,
        _layer_norm,
    )
    from yolo_sam_inference_tpu.ops.dw_ln_mlp import dw_ln_mlp

    cfg = TinyViTConfig()
    params = init_tinyvit_params(14, cfg)
    p = params["stage1"][0]
    c = cfg.embed_dims[1]
    rng = np.random.default_rng(15)
    p["local_conv"]["b"] = jnp.asarray(rng.normal(0, 0.3, (c,)), jnp.float32)
    # H=16 picks strip height 8 -> 2 strips; W=16 pads to 24
    x = jnp.asarray(rng.normal(size=(2, 16, 16, c)), jnp.float32)

    y = _conv_bn(p["local_conv"], x, groups=c)
    h = _layer_norm(p["ln2"], y)
    h = _gelu(h @ p["mlp1_w"] + p["mlp1_b"])
    plain = y + (h @ p["mlp2_w"] + p["mlp2_b"])

    fused = dw_ln_mlp(
        x, p["local_conv"]["w"], p["local_conv"]["b"],
        p["ln2"]["scale"], p["ln2"]["bias"],
        p["mlp1_w"], p["mlp1_b"], p["mlp2_w"], p["mlp2_b"],
        eps=1e-5, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), atol=3e-4, rtol=1e-4
    )


def test_fused_patch_merge_matches_plain():
    """The Pallas stride-2 patch-merge kernel (interpret mode) must match
    the plain conv formulation: q-major s2d quadrant decomposition of the
    stride-2 depthwise, top/left-only halo, and the gelu(conv1_bias) leak
    re-masking on the padded columns / first-strip halo row."""
    from yolo_sam_inference_tpu.models.sam.tinyvit import _patch_merge
    from yolo_sam_inference_tpu.ops.merge_fused import patch_merge_block

    cfg = TinyViTConfig()
    params = init_tinyvit_params(5, cfg)
    p = params["merge0"]
    rng = np.random.default_rng(6)
    for key in ("conv1", "conv2", "conv3"):
        p[key]["b"] = jnp.asarray(rng.normal(0, 0.3, p[key]["b"].shape), jnp.float32)
    # H/2=16 picks strip height 8 -> 2 strips (multi-strip halo row path);
    # W/2=16 pads to 24 (right-column re-mask path)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, cfg.embed_dims[0])), jnp.float32)
    plain = _patch_merge(p, x, stride=2)
    fused = patch_merge_block(
        x,
        p["conv1"]["w"][0, 0], p["conv1"]["b"],
        p["conv2"]["w"], p["conv2"]["b"],
        p["conv3"]["w"][0, 0], p["conv3"]["b"],
        interpret=True,
    )
    assert fused.shape == (2, 16, 16, cfg.embed_dims[1])
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), atol=3e-4, rtol=1e-4
    )


def test_fused_patch_merge_bf16_compute_bound():
    """compute="bf16" patch merge: VPU stretch in bf16, same bound shape as
    the MBConv variant (vs the fp32 plain path on identical bf16 inputs)."""
    from yolo_sam_inference_tpu.models.sam.tinyvit import _patch_merge
    from yolo_sam_inference_tpu.ops.merge_fused import patch_merge_block

    cfg = TinyViTConfig()
    params = init_tinyvit_params(8, cfg)
    p = params["merge0"]
    rng = np.random.default_rng(9)
    for key in ("conv1", "conv2", "conv3"):
        p[key]["b"] = jnp.asarray(rng.normal(0, 0.3, p[key]["b"].shape), jnp.float32)
    x8 = jnp.asarray(
        rng.normal(size=(2, 32, 32, cfg.embed_dims[0])), jnp.float32
    ).astype(jnp.bfloat16)
    ref = np.asarray(_patch_merge(p, x8.astype(jnp.float32), stride=2))
    got = np.asarray(
        patch_merge_block(
            x8,
            p["conv1"]["w"][0, 0], p["conv1"]["b"],
            p["conv2"]["w"], p["conv2"]["b"],
            p["conv3"]["w"][0, 0], p["conv3"]["b"],
            interpret=True, compute="bf16",
        )
    ).astype(np.float32)
    err = np.abs(got - ref)
    scale = np.abs(ref).max()
    assert err.max() <= 0.08 * scale, (err.max(), scale)
    assert err.mean() <= 0.01 * scale, (err.mean(), scale)


def test_mbconv_bf16_compute_bound():
    """Opt-in bf16 MBConv compute (engine tinyvit_mbconv_compute="bf16"):
    the VPU stretch (GELUs + 9-tap depthwise chain) runs in bf16. Bound the
    numerics vs the fp32 plain path on the same bf16 inputs — production
    activations are bf16 either way, so this isolates the compute-dtype
    error (must stay well under the decoder's logit scale)."""
    from yolo_sam_inference_tpu.models.sam.tinyvit import _mbconv

    cfg = TinyViTConfig()
    params = init_tinyvit_params(3, cfg)
    p = params["stage0"][0]
    rng = np.random.default_rng(7)
    for key in ("conv1", "conv2", "conv3"):
        p[key]["b"] = jnp.asarray(rng.normal(0, 0.3, p[key]["b"].shape), jnp.float32)
    x8 = jnp.asarray(
        rng.normal(size=(2, 16, 16, cfg.embed_dims[0])), jnp.float32
    ).astype(jnp.bfloat16)
    ref = np.asarray(_mbconv(p, x8.astype(jnp.float32)))
    got = np.asarray(
        _mbconv(p, x8, fused=True, interpret=True, compute="bf16")
    ).astype(np.float32)
    err = np.abs(got - ref)
    scale = np.abs(ref).max()
    assert err.max() <= 0.08 * scale, (err.max(), scale)
    assert err.mean() <= 0.01 * scale, (err.mean(), scale)


def test_stem_s2d_exact():
    """The s2d patch-embed rewrite computes exactly the stems' function
    (same transform family as models/yolo/s2d — parity must be tight)."""
    from yolo_sam_inference_tpu.models.sam.tinyvit import (
        _conv_bn,
        _gelu,
        _stems_s2d,
        transform_stem_s2d,
    )

    cfg = TinyViTConfig()
    params = init_tinyvit_params(11, cfg)
    rng = np.random.default_rng(12)
    for key in ("stem1", "stem2"):
        params[key]["b"] = jnp.asarray(
            rng.normal(0, 0.3, params[key]["b"].shape), jnp.float32
        )
    x = jnp.asarray(rng.normal(size=(2, 48, 48, 3)), jnp.float32)
    plain = _conv_bn(params["stem2"], _gelu(_conv_bn(params["stem1"], x, stride=2)), stride=2)
    s2d = _stems_s2d(transform_stem_s2d(params), x)
    np.testing.assert_allclose(
        np.asarray(s2d), np.asarray(plain), atol=2e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_fused_encoder_composition_matches_plain():
    """Force the TPU wiring (fused=True) through the Pallas interpreter for
    the WHOLE TinyViT encoder and compare against the plain jnp path: this
    exercises the real kernel composition at stage boundaries (param
    plumbing, merge gate, s2d stems, neck fused-LN) that per-kernel unit
    tests cannot see."""
    import yolo_sam_inference_tpu.models.sam.tinyvit as tv

    cfg = TinyViTConfig()
    params = init_tinyvit_params(21, cfg)
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)), jnp.float32)

    plain = np.asarray(tinyvit_encoder(params, x, cfg, fused=False))

    old = tv._FUSED_MERGE_MIN_H
    tv._FUSED_MERGE_MIN_H = 8  # engage the merge kernel at test size
    try:
        fused = np.asarray(
            tinyvit_encoder(params, x, cfg, fused=True, interpret=True)
        )
        # + the exact-equivalent s2d stems on the fused path
        p2 = dict(params)
        p2["stem_s2d"] = tv.transform_stem_s2d(params)
        fused_s2d = np.asarray(
            tinyvit_encoder(p2, x, cfg, fused=True, interpret=True)
        )
    finally:
        tv._FUSED_MERGE_MIN_H = old

    scale = np.abs(plain).max()
    assert np.abs(fused - plain).max() <= 2e-3 * scale
    assert np.abs(fused_s2d - plain).max() <= 2e-3 * scale


@pytest.mark.slow
def test_mobile_sam_engine_integration():
    from yolo_sam_inference_tpu.models.sam import sam_tiny_test
    from yolo_sam_inference_tpu.models.yolo import YoloConfig
    from yolo_sam_inference_tpu.pipeline.engine import (
        CellSegmentationPipeline,
        PipelineOptions,
    )

    import dataclasses

    # TinyViT always emits an S/16 grid, so the decoder config must use
    # patch_size 16 (the tiny ViT test config uses 8)
    pipe = CellSegmentationPipeline(
        sam_model_type="mobile-sam",
        sam_config=dataclasses.replace(sam_tiny_test(), image_size=64, patch_size=16),
        yolo_config=YoloConfig(num_classes=1),
        options=PipelineOptions(
            batch_size=1, max_det=4, metric_crop=48, yolo_size=64,
            nms_candidates=32, compute_dtype=jnp.float32, sam_encoder_size=64,
        ),
    )
    assert "tinyvit" in pipe.sam_params
    from synth import make_cell_image

    img = make_cell_image(np.random.default_rng(0))
    out = pipe.process_batch_arrays(img[None])
    assert out["mask_crops"].shape[0] == 1




@pytest.mark.slow
def test_cells_attention_matches_v1():
    """SAM_TV_ATTN_V2 cell-layout attention == the v1 window-partition
    kernel (itself parity-pinned to the plain path) for every TinyViT-5M
    stage geometry, including non-dividing windows (spatial pad), the
    ws=14 cell-pad case, and small grids where nb>1 packs several images
    per step."""
    from yolo_sam_inference_tpu.models.sam.tinyvit import _offset_index
    from yolo_sam_inference_tpu.ops.tinyvit_attention import (
        tinyvit_window_block,
        tinyvit_window_block_cells,
    )

    rng = np.random.default_rng(7)
    for b, hw, c, heads, ws in (
        (2, 16, 128, 4, 7),   # stage1 geometry, pad 16->21
        (2, 15, 160, 5, 14),  # stage2: ws=14 cells (pad cols 14->16)
        (4, 9, 320, 10, 7),   # stage3 tiny grid -> nb>1 per step
        (1, 14, 128, 4, 7),   # exact tiling, no spatial pad
    ):
        bias = jnp.asarray(
            rng.normal(0, 0.5, (heads, (2 * ws - 1) ** 2)), jnp.float32
        )[:, _offset_index(ws)]
        args = [
            jnp.asarray(rng.normal(0, 0.1, s), jnp.float32)
            for s in [(c,), (c,), (c, 3 * c), (3 * c,), (c, c), (c,)]
        ]
        x = jnp.asarray(rng.normal(size=(b, hw, hw, c)), jnp.float32)
        v1 = tinyvit_window_block(x, bias, *args, heads, ws, interpret=True)
        v2 = tinyvit_window_block_cells(
            x, bias, *args, heads, ws, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v1), atol=3e-5, rtol=1e-4,
            err_msg=f"(b={b}, hw={hw}, c={c}, heads={heads}, ws={ws})",
        )


@pytest.mark.slow
def test_cells_attention_engine_geometries():
    """Cell-layout attention at the exact 512-canvas bench geometries
    (stage1 64^2/ws7, stage2 32^2/ws14, stage3 16^2/ws7) == v1."""
    from yolo_sam_inference_tpu.models.sam.tinyvit import _offset_index
    from yolo_sam_inference_tpu.ops.tinyvit_attention import (
        tinyvit_window_block,
        tinyvit_window_block_cells,
    )

    rng = np.random.default_rng(11)
    for b, hw, c, heads, ws in (
        (1, 64, 128, 4, 7),
        (1, 32, 160, 5, 14),
        (2, 16, 320, 10, 7),
    ):
        bias = jnp.asarray(
            rng.normal(0, 0.5, (heads, (2 * ws - 1) ** 2)), jnp.float32
        )[:, _offset_index(ws)]
        args = [
            jnp.asarray(rng.normal(0, 0.1, s), jnp.float32)
            for s in [(c,), (c,), (c, 3 * c), (3 * c,), (c, c), (c,)]
        ]
        x = jnp.asarray(rng.normal(size=(b, hw, hw, c)), jnp.float32)
        v1 = tinyvit_window_block(x, bias, *args, heads, ws, interpret=True)
        v2 = tinyvit_window_block_cells(
            x, bias, *args, heads, ws, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v1), atol=3e-5, rtol=1e-4,
            err_msg=f"(b={b}, hw={hw}, c={c}, heads={heads}, ws={ws})",
        )
