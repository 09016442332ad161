"""Tests for codecs, TIFF I/O, logging, and reporting helpers."""

import numpy as np
import pytest

from yolo_sam_inference_tpu.utils.mask_encoding import (
    decode_binary_mask,
    encode_binary_mask,
)
from yolo_sam_inference_tpu.io.tiff import read_tiff, write_tiff
from yolo_sam_inference_tpu.utils.image_utils import (
    save_mask_as_tiff,
    save_optimized_tiff,
)
from yolo_sam_inference_tpu.io.images import load_image, save_image, list_image_files
from yolo_sam_inference_tpu.utils.metrics_reporter import calculate_summary_statistics


def test_mask_codec_roundtrip(rng):
    mask = rng.random((37, 53)) > 0.5
    enc = encode_binary_mask(mask)
    assert enc["encoding_type"] == "compressed_binary"
    assert tuple(enc["shape"]) == mask.shape
    dec = decode_binary_mask(enc)
    np.testing.assert_array_equal(dec, mask)


def test_mask_codec_reference_bit_compat(rng):
    """Byte-identical to the reference codec: packbits -> zlib -> base64."""
    import base64
    import zlib

    mask = rng.random((64, 48)) > 0.7
    enc = encode_binary_mask(mask)
    expected = base64.b64encode(zlib.compress(np.packbits(mask))).decode("ascii")
    assert enc["data"] == expected


@pytest.mark.parametrize("shape,dtype", [
    ((100, 130), np.uint8),
    ((256, 256), np.uint8),
    ((300, 211, 3), np.uint8),
    ((64, 70), np.uint16),
])
def test_tiff_roundtrip(tmp_path, rng, shape, dtype):
    info = np.iinfo(dtype)
    img = rng.integers(0, info.max, size=shape).astype(dtype)
    p = tmp_path / "x.tiff"
    write_tiff(p, img, metadata={"k": 1})
    out, meta = read_tiff(p, return_metadata=True)
    np.testing.assert_array_equal(out, img)
    assert meta == {"k": 1}


def test_tiff_uncompressed_stripped(tmp_path, rng):
    img = rng.integers(0, 255, size=(50, 60)).astype(np.uint8)
    p = tmp_path / "x.tiff"
    write_tiff(p, img, compression="none", tile=None)
    np.testing.assert_array_equal(read_tiff(p), img)


def test_tiff_pil_can_read_ours(tmp_path, rng):
    """Interop: PIL must be able to open our tiled deflate TIFFs."""
    from PIL import Image

    img = rng.integers(0, 255, size=(120, 90, 3)).astype(np.uint8)
    p = tmp_path / "x.tiff"
    write_tiff(p, img)
    with Image.open(p) as im:
        arr = np.asarray(im)
    np.testing.assert_array_equal(arr, img)


def test_save_optimized_tiff_normalization(tmp_path):
    img = np.linspace(0.0, 1.0, 64 * 64, dtype=np.float32).reshape(64, 64)
    p = tmp_path / "f.tiff"
    save_optimized_tiff(img, p)
    out = read_tiff(p)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255


def test_save_optimized_tiff_chw_fixup(tmp_path, rng):
    img = rng.integers(0, 255, size=(3, 40, 50)).astype(np.uint8)
    p = tmp_path / "c.tiff"
    save_optimized_tiff(img, p)
    out = read_tiff(p)
    assert out.shape == (40, 50, 3)


def test_save_mask_as_tiff(tmp_path, rng):
    mask = rng.random((80, 80)) > 0.5
    p = tmp_path / "m.tiff"
    save_mask_as_tiff(mask, p)
    out = read_tiff(p)
    np.testing.assert_array_equal(out > 0, mask)


def test_load_image_png_and_tiff(tmp_path, rng):
    from PIL import Image

    arr = rng.integers(0, 255, size=(30, 40)).astype(np.uint8)
    png = tmp_path / "a.png"
    Image.fromarray(arr).save(png)
    rgb = load_image(png)
    assert rgb.shape == (30, 40, 3)
    np.testing.assert_array_equal(rgb[..., 0], arr)

    tif = tmp_path / "b.tiff"
    save_image(tif, arr)
    rgb2 = load_image(tif)
    np.testing.assert_array_equal(rgb2[..., 1], arr)

    files = list_image_files(tmp_path)
    assert [f.name for f in files] == ["a.png", "b.tiff"]


def test_summary_statistics():
    metrics = [
        {"area": 10, "deformability": 0.1},
        {"area": 20, "deformability": 0.3},
    ]
    s = calculate_summary_statistics(metrics)
    assert s["area"]["mean"] == 15.0
    assert abs(s["deformability"]["std"] - 0.1) < 1e-12
    assert calculate_summary_statistics([]) == {}
