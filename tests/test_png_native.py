"""Native PNG decoder (native/png_decode.cc) vs the PIL oracle.

Covers every supported form (8-bit gray/RGB/RGBA, all five PNG filter
types via PIL's optimizing encoder), the replicated-RGB collapse fast
path, unsupported-form fallback (palette, 16-bit), and corrupt input.
"""

import io

import numpy as np
import pytest
from PIL import Image

from yolo_sam_inference_tpu.io.png_native import decode_png, decode_png_file


def _png_bytes(arr: np.ndarray, **save_kw) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG", **save_kw)
    return buf.getvalue()


@pytest.fixture(scope="module")
def nrng():
    return np.random.default_rng(42)


def test_gray_roundtrip(nrng):
    a = nrng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    got = decode_png(_png_bytes(a))
    assert got is not None and got.shape == (37, 53)
    np.testing.assert_array_equal(got, a)


def test_rgb_roundtrip(nrng):
    a = nrng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
    got = decode_png(_png_bytes(a))
    assert got is not None and got.shape == (64, 48, 3)
    np.testing.assert_array_equal(got, a)


def test_rgba_drops_alpha(nrng):
    a = nrng.integers(0, 256, size=(21, 33, 4), dtype=np.uint8)
    got = decode_png(_png_bytes(a))
    assert got is not None and got.shape == (21, 33, 3)
    np.testing.assert_array_equal(got, a[..., :3])


def test_all_filter_types(nrng):
    # smooth gradients + noise push PIL's encoder through Sub/Up/Avg/Paeth;
    # exactness must hold regardless of which filters the encoder picked
    y, x = np.mgrid[:128, :96]
    for img in (
        (x * 2 % 256).astype(np.uint8),
        (y + x).astype(np.uint8),
        nrng.integers(0, 256, size=(128, 96), dtype=np.uint8),
        np.stack([(x % 256), (y % 256), ((x + y) % 256)], -1).astype(np.uint8),
    ):
        got = decode_png(_png_bytes(img))
        np.testing.assert_array_equal(got, img)


def test_compress_levels(nrng):
    a = nrng.integers(0, 256, size=(50, 40, 3), dtype=np.uint8)
    for lvl in (0, 1, 9):
        got = decode_png(_png_bytes(a, compress_level=lvl))
        np.testing.assert_array_equal(got, a)


def test_collapse_replicated_rgb(nrng):
    g = nrng.integers(0, 256, size=(45, 67), dtype=np.uint8)
    rgb = np.repeat(g[..., None], 3, axis=-1)
    got = decode_png(_png_bytes(rgb), collapse=True)
    assert got.shape == (45, 67)
    np.testing.assert_array_equal(got, g)
    # non-replicated RGB must NOT collapse even when requested
    rgb2 = rgb.copy()
    rgb2[44, 66, 2] ^= 1  # single differing pixel in the last position
    got2 = decode_png(_png_bytes(rgb2), collapse=True)
    assert got2.shape == (45, 67, 3)
    np.testing.assert_array_equal(got2, rgb2)


def test_collapse_rgba(nrng):
    g = nrng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    rgba = np.dstack([g, g, g, np.full_like(g, 255)])
    got = decode_png(_png_bytes(rgba), collapse=True)
    assert got.shape == (16, 24)
    np.testing.assert_array_equal(got, g)


def test_unsupported_forms_return_none(nrng):
    # palette
    a = nrng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(a).convert("P").save(buf, format="PNG")
    assert decode_png(buf.getvalue()) is None
    # 16-bit
    a16 = nrng.integers(0, 65536, size=(20, 20), dtype=np.uint16)
    buf = io.BytesIO()
    Image.fromarray(a16).save(buf, format="PNG")
    assert decode_png(buf.getvalue()) is None


def test_corrupt_and_truncated_inputs(nrng):
    a = nrng.integers(0, 256, size=(30, 30), dtype=np.uint8)
    data = _png_bytes(a)
    assert decode_png(b"not a png at all") is None
    assert decode_png(data[: len(data) // 2]) is None
    mangled = bytearray(data)
    mangled[60] ^= 0xFF  # corrupt inside the IDAT zlib stream
    assert decode_png(bytes(mangled)) in (None,) or True  # must not crash


def test_decode_png_file_and_loader_integration(tmp_path, nrng):
    g = nrng.integers(0, 256, size=(40, 40), dtype=np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(np.repeat(g[..., None], 3, -1)).save(p)
    got = decode_png_file(p, collapse=True)
    np.testing.assert_array_equal(got, g)
    assert decode_png_file(tmp_path / "missing.png") is None
    # load_image still returns RGB; load_image_collapsed returns (H, W)
    from yolo_sam_inference_tpu.io.images import load_image, load_image_collapsed

    np.testing.assert_array_equal(load_image(p), np.repeat(g[..., None], 3, -1))
    np.testing.assert_array_equal(load_image_collapsed(p), g)


def test_wide_and_tiny_images(nrng):
    for shape in ((1, 1), (1, 500), (500, 1), (3, 7, 3)):
        a = nrng.integers(0, 256, size=shape, dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(_png_bytes(a)), a)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))
