"""Checkpoint round-trip tests (npz + orbax when importable)."""

import numpy as np
import pytest

import jax

from yolo_sam_inference_tpu.models.sam import init_sam_params, sam_tiny_test
from yolo_sam_inference_tpu.utils.checkpoint import (
    load_params_npz,
    save_params_npz,
)


def test_npz_roundtrip_sam_tree(tmp_path):
    params = init_sam_params(0, sam_tiny_test())
    p = tmp_path / "sam.npz"
    save_params_npz(params, p)
    params2 = init_sam_params(1, sam_tiny_test())  # different values
    restored = load_params_npz(p, params2)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_shape_mismatch_rejected(tmp_path):
    import dataclasses

    params = init_sam_params(0, sam_tiny_test())
    p = tmp_path / "sam.npz"
    save_params_npz(params, p)
    bigger = init_sam_params(0, dataclasses.replace(sam_tiny_test(), vision_hidden=64))
    with pytest.raises((ValueError, KeyError)):
        load_params_npz(p, bigger)


def test_orbax_roundtrip_if_available(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from yolo_sam_inference_tpu.utils.checkpoint import load_params, save_params

    params = init_sam_params(0, sam_tiny_test())
    # orbax cannot store None leaves; drop the unused mask_embed slot
    params["prompt"] = {k: v for k, v in params["prompt"].items() if v is not None}
    path = tmp_path / "ckpt"
    save_params(params, path)
    restored = load_params(path, jax.tree_util.tree_map(np.zeros_like, params))
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
