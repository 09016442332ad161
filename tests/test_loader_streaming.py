"""Streaming-loader semantics: bounded chunks, cross-chunk batch formation,
mixed shapes, no image lost or duplicated."""

from pathlib import Path

import numpy as np

from yolo_sam_inference_tpu.pipeline.loader import batched_image_loader

from synth import make_cell_image


def _write(tmp_path, rng, n, h, w, prefix):
    from PIL import Image

    paths = []
    for i in range(n):
        p = tmp_path / f"{prefix}_{i:03d}.png"
        Image.fromarray(make_cell_image(rng, h, w)).save(p)
        paths.append(p)
    return paths


def test_streaming_covers_all_images_once(tmp_path, rng):
    files = _write(tmp_path, rng, 37, 64, 96, "a")  # not a multiple of batch
    seen = []
    for batch, paths, n_valid, _ in batched_image_loader(files, batch_size=8):
        # synthetic microscopy frames are replicated-RGB -> the loader
        # collapses them to one channel (3x smaller host->device transfer)
        assert batch.shape == (8, 64, 96)
        assert batch.dtype == np.uint8
        seen.extend(paths[:n_valid])
    assert sorted(str(p) for p in seen) == sorted(str(p) for p in files)


def test_streaming_true_rgb_keeps_channels(tmp_path, rng):
    from PIL import Image

    paths = []
    for i in range(4):
        arr = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
        p = tmp_path / f"rgb_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p)
    (batch, _, n_valid, _), = batched_image_loader(paths, batch_size=4)
    assert batch.shape == (4, 32, 48, 3)
    assert n_valid == 4


def test_streaming_mixed_shapes(tmp_path, rng):
    fa = _write(tmp_path, rng, 10, 64, 96, "a")
    fb = _write(tmp_path, rng, 7, 96, 64, "b")
    counts = {}
    for batch, paths, n_valid, _ in batched_image_loader(sorted(fa + fb), batch_size=4):
        counts[batch.shape[1:3]] = counts.get(batch.shape[1:3], 0) + n_valid
    assert counts == {(64, 96): 10, (96, 64): 7}


def test_streaming_forms_full_batches_across_chunks(tmp_path, rng):
    # chunk size is 4*batch; 4 shapes interleaved force cross-chunk carry
    files = []
    for i in range(24):
        h = 32 + (i % 2) * 16
        files += _write(tmp_path, rng, 1, h, 48, f"x{i:02d}")
    batches = list(batched_image_loader(files, batch_size=8))
    fulls = [b for b in batches if b[2] == 8]
    assert len(fulls) >= 2  # 12 of each shape -> at least one full batch each
    total = sum(b[2] for b in batches)
    assert total == 24


def test_process_pool_decode_matches_inline(tmp_path, monkeypatch):
    """E2E_DECODE_PROCS=N decodes through a process pool with identical
    batches (the multi-core-host knob; threads can't scale PIL's
    GIL-holding PNG decode)."""
    from PIL import Image

    rng = np.random.default_rng(5)
    files = []
    for i in range(6):
        img = rng.integers(0, 255, size=(32, 40), dtype=np.uint8)
        p = tmp_path / f"i{i}.png"
        Image.fromarray(img).save(p)
        files.append(p)
    inline = list(batched_image_loader(files, batch_size=4))
    monkeypatch.setenv("E2E_DECODE_PROCS", "2")
    pooled = list(batched_image_loader(files, batch_size=4))
    assert len(pooled) == len(inline)
    for (bi, pi, ni, _), (bp, pp, np_, _) in zip(inline, pooled):
        np.testing.assert_array_equal(bi, bp)
        assert pi == pp and ni == np_
