"""Numerical parity of our JAX SAM vs the torch reference architecture.

No pretrained weights exist in this environment (zero egress), so we build a
randomly-initialized ``transformers.SamModel`` from a tiny config, convert its
state dict with ``convert_hf_sam_state_dict``, and require the JAX forward to
match torch to float tolerance. This validates the architecture + converter
end to end; with real ``facebook/sam-vit-*`` weights the same path yields the
reference masks (BASELINE target IoU >= 0.99).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from yolo_sam_inference_tpu.models.sam import (
    convert_hf_sam_state_dict,
    sam_forward_boxes,
    sam_image_encoder,
    sam_mask_decoder,
    sam_prompt_boxes,
    sam_tiny_test,
)
from yolo_sam_inference_tpu.models.sam.model import image_wide_positional_embedding


@pytest.fixture(scope="module")
def torch_sam():
    from transformers import SamConfig, SamModel
    from transformers.models.sam.configuration_sam import (
        SamMaskDecoderConfig,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    torch.manual_seed(0)
    vc = SamVisionConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=64,
        patch_size=8,
        global_attn_indexes=[1],
        window_size=2,
        output_channels=16,
        mlp_dim=64,
        num_pos_feats=8,
        attn_implementation="eager",
    )
    pc = SamPromptEncoderConfig(hidden_size=16, image_size=64, patch_size=8, mask_input_channels=4)
    mc = SamMaskDecoderConfig(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2, mlp_dim=32, iou_head_hidden_dim=16
    )
    cfg = SamConfig(
        vision_config=vc.to_dict(),
        prompt_encoder_config=pc.to_dict(),
        mask_decoder_config=mc.to_dict(),
    )
    cfg._attn_implementation = "eager"
    model = SamModel(cfg).eval()
    # rel_pos tables initialize to zero -> randomize so the test exercises them
    with torch.no_grad():
        for layer in model.vision_encoder.layers:
            layer.attn.rel_pos_h.normal_(0, 0.1)
            layer.attn.rel_pos_w.normal_(0, 0.1)
    return model


@pytest.fixture(scope="module")
def jax_params(torch_sam):
    return convert_hf_sam_state_dict(torch_sam.state_dict(), sam_tiny_test())


def test_image_encoder_parity(torch_sam, jax_params):
    cfg = sam_tiny_test()
    rng = np.random.default_rng(1)
    pix = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_sam.vision_encoder(
            torch.from_numpy(pix.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()  # (B, C, gs, gs)
    got = np.asarray(sam_image_encoder(jax_params, jnp.asarray(pix), cfg))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-5)


def test_image_wide_positional_embedding_parity(torch_sam, jax_params):
    cfg = sam_tiny_test()
    with torch.no_grad():
        want = torch_sam.get_image_wide_positional_embeddings().numpy()[0]  # (C, gs, gs)
    got = np.asarray(image_wide_positional_embedding(jax_params, cfg))
    # sin/cos of large random-Fourier args: fp32 rounding ~1e-5
    np.testing.assert_allclose(got.transpose(2, 0, 1), want, rtol=1e-4, atol=5e-5)


def test_box_prompt_parity(torch_sam, jax_params):
    cfg = sam_tiny_test()
    boxes = np.array([[[4.0, 6.0, 40.0, 50.0], [10.0, 12.0, 20.0, 22.0]]], dtype=np.float32)
    with torch.no_grad():
        sparse, dense = torch_sam.prompt_encoder(
            input_points=None,
            input_labels=None,
            input_boxes=torch.from_numpy(boxes),
            input_masks=None,
        )
    got = np.asarray(sam_prompt_boxes(jax_params, jnp.asarray(boxes), cfg))
    np.testing.assert_allclose(got, sparse.numpy(), rtol=1e-4, atol=5e-5)
    # dense path: no-mask embedding broadcast
    from yolo_sam_inference_tpu.models.sam.model import sam_dense_no_mask

    got_dense = np.asarray(sam_dense_no_mask(jax_params, cfg))
    np.testing.assert_allclose(
        got_dense.transpose(2, 0, 1), dense.detach().numpy()[0], rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("multimask", [False, True])
def test_full_forward_parity(torch_sam, jax_params, multimask):
    cfg = sam_tiny_test()
    rng = np.random.default_rng(2)
    pix = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    boxes = np.array(
        [
            [[4.0, 6.0, 40.0, 50.0], [10.0, 12.0, 20.0, 22.0]],
            [[0.0, 0.0, 63.0, 63.0], [30.0, 30.0, 50.0, 60.0]],
        ],
        dtype=np.float32,
    )
    with torch.no_grad():
        out = torch_sam(
            pixel_values=torch.from_numpy(pix.transpose(0, 3, 1, 2)),
            input_boxes=torch.from_numpy(boxes),
            multimask_output=multimask,
        )
    want_masks = out.pred_masks.numpy()  # (B, K, M, h, w)
    want_iou = out.iou_scores.numpy()

    got_masks, got_iou = sam_forward_boxes(
        jax_params, jnp.asarray(pix), jnp.asarray(boxes), cfg, multimask_output=multimask
    )
    np.testing.assert_allclose(np.asarray(got_iou), want_iou, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_masks), want_masks, rtol=5e-3, atol=2e-3)
    # thresholded masks (what the pipeline consumes) must agree wherever the
    # logit is not razor-thin (random weights put many logits at ~0 where the
    # fp32-rounding sign is arbitrary)
    confident = np.abs(want_masks) > 0.05
    if confident.any():
        agree = (np.asarray(got_masks) > 0) == (want_masks > 0)
        assert agree[confident].mean() > 0.999


def test_decoder_softmax_bf16_logits_bound():
    """_decoder_attention stores attention logits in the activation dtype
    (bf16 in production) before the fp32-softmax. Bound the numerics: at
    decoder-realistic logit scales (N(0, 5), hd=32..64 post-1/sqrt(hd)),
    bf16 logit storage shifts attention probabilities by < 3e-2 absolute /
    < 2e-4 mean vs fp32 logits, and rows still sum to 1. (The downstream
    effect is separately bounded by the all-pixel IoU>=0.99 e2e test.)"""
    from yolo_sam_inference_tpu.models.sam.model import _softmax_fp32

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 5.0, size=(4, 8, 7, 4096)), jnp.float32)
    ref = np.asarray(_softmax_fp32(logits))
    got = np.asarray(_softmax_fp32(logits.astype(jnp.bfloat16)))
    err = np.abs(got - ref)
    assert np.max(err) < 3e-2
    assert np.mean(err) < 2e-4
    np.testing.assert_allclose(got.sum(axis=-1), 1.0, atol=1e-5)


# heavy suite (torch parity / e2e pipeline / 8-device mesh): run the
# quick loop with `pytest -m "not slow" tests/`
pytestmark = pytest.mark.slow


def test_resize_linear_np_matches_jax_image():
    """adapt_resolution's host-numpy resampler == jax.image.resize
    (half-pixel centers + antialiased triangle filter on downsample) —
    the r4 numpy-init change must not move adapted-weight numerics."""
    import jax
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.models.sam.convert import _resize_linear_np

    rng = np.random.default_rng(0)
    for (inl, outl) in [(27, 31), (127, 31), (64, 32), (31, 127)]:
        t = rng.normal(size=(inl, 16)).astype(np.float32)
        want = np.asarray(
            jax.image.resize(jnp.asarray(t), (outl, 16), method="linear"))
        got = _resize_linear_np(t, outl, axis=0)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    pos = rng.normal(size=(1, 64, 64, 8)).astype(np.float32)
    want = np.asarray(jax.image.resize(
        jnp.asarray(pos), (1, 32, 32, 8), method="bilinear"))
    got = _resize_linear_np(_resize_linear_np(pos, 32, axis=1), 32, axis=2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
