"""images.bin stream reader tests: native C++ path vs numpy fallback."""

import numpy as np
import pytest

from yolo_sam_inference_tpu.io import images_bin as ib


@pytest.fixture
def stream(tmp_path, rng):
    imgs = [
        rng.integers(0, 255, size=(32, 48)).astype(np.uint8),
        rng.integers(0, 255, size=(32, 48)).astype(np.uint8),
        rng.integers(0, 65535, size=(32, 48)).astype(np.uint16),
        rng.integers(0, 255, size=(32, 48, 3)).astype(np.uint8),
    ]
    p = tmp_path / "images.bin"
    ib.write_images_bin(p, imgs)
    return p, imgs


def test_scan_frames(stream):
    p, imgs = stream
    frames = ib.scan_frames(p)
    assert len(frames) == 4
    assert [f[1:3] for f in frames] == [(32, 48)] * 4
    assert frames[2][3] == 2          # CV_16UC1
    assert frames[3][3] == 0 + (2 << 3)  # CV_8UC3


def test_native_builds_and_loads():
    lib = ib._load_native()
    # g++ is present in this image, so the native path must be live
    assert lib is not None


def test_read_gray8_matches_fallback(stream, monkeypatch):
    p, imgs = stream
    native = ib.read_frames_gray8(p)
    # force fallback
    monkeypatch.setattr(ib, "_lib", None)
    monkeypatch.setattr(ib, "_lib_failed", True)
    fallback = ib.read_frames_gray8(p)
    assert native.shape == fallback.shape == (4, 32, 48)
    np.testing.assert_array_equal(native, fallback)
    # uint8 single-channel frames decode losslessly
    np.testing.assert_array_equal(native[0], imgs[0])
    np.testing.assert_array_equal(native[1], imgs[1])


def test_iter_frame_batches(stream):
    p, _ = stream
    batches = list(ib.iter_frame_batches(p, batch_size=3))
    assert [b.shape[0] for b in batches] == [3, 1]


def test_corrupt_stream_rejected(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x01\x00\x00\x00\x02\x00\x00\x00\xff\xff\xff\x7f")  # absurd type
    with pytest.raises(ValueError):
        ib.scan_frames(p)


def test_truncated_stream_rejected(tmp_path, rng):
    img = rng.integers(0, 255, size=(16, 16)).astype(np.uint8)
    p = tmp_path / "trunc.bin"
    ib.write_images_bin(p, [img])
    data = p.read_bytes()
    p.write_bytes(data[:-10])  # cut the last frame short
    with pytest.raises(ValueError):
        ib.scan_frames(p)
