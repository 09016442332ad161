"""libdeflate-backed compression: wire-format + fallback contract."""

import zlib

import numpy as np

from yolo_sam_inference_tpu.io import deflate


def test_compress_roundtrips_as_zlib_stream():
    rng = np.random.default_rng(0)
    for payload in (
        b"",
        b"a",
        b"abc" * 1000,
        rng.integers(0, 255, size=100_000, dtype=np.uint8).tobytes(),
        np.zeros(256 * 256, np.uint8).tobytes(),
    ):
        for level in (1, 6, 9):
            out = deflate.compress(payload, level)
            assert zlib.decompress(out) == payload


def test_compress_beats_or_matches_stdlib_size():
    # libdeflate at the same nominal level compresses at least comparably;
    # guard against a pathological regression (allow 5% slack for the
    # stdlib-fallback case where sizes are identical)
    rng = np.random.default_rng(1)
    gray = rng.normal(40, 5, size=(256, 256)).clip(0, 255).astype(np.uint8)
    raw = np.repeat(gray[..., None], 3, axis=-1).tobytes()
    ours = len(deflate.compress(raw, 6))
    std = len(zlib.compress(raw, 6))
    assert ours <= std * 1.05, (ours, std)


def test_stdlib_fallback_when_library_missing(monkeypatch):
    monkeypatch.setattr(deflate, "_lib", None)
    monkeypatch.setattr(deflate, "_lib_failed", True)
    payload = b"fallback" * 500
    out = deflate.compress(payload, 6)
    assert out == zlib.compress(payload, 6)


def test_tiff_writer_output_still_reads_back():
    import tempfile
    from pathlib import Path

    from yolo_sam_inference_tpu.io.tiff import read_tiff, write_tiff

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(300, 200, 3), dtype=np.uint8)
    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "x.tiff"
        write_tiff(p, img)
        back = read_tiff(p)
    np.testing.assert_array_equal(back, img)
