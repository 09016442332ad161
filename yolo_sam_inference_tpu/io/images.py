"""Generic image load/save + directory discovery.

Replaces the reference's ``cv2.imread`` loader (reference ``pipeline.py:206-210``)
and its glob logic (``pipeline.py:265-269``). Loading returns RGB uint8
(H, W, 3) regardless of source format, matching the reference's BGR->RGB
conversion contract.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from .tiff import read_tiff, write_tiff

try:  # PIL is available in this environment; keep it soft anyway.
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover
    _PILImage = None

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".tiff", ".tif")


def _to_scaled_uint8(arr: np.ndarray) -> np.ndarray:
    """Dtype normalization only (no channel-count changes)."""
    if arr.dtype == np.uint16:
        arr = (arr / 257.0).astype(np.uint8)  # 65535 -> 255
    elif arr.dtype == np.bool_:
        arr = arr.astype(np.uint8) * 255
    elif arr.dtype != np.uint8:
        amax = float(arr.max()) if arr.size else 1.0
        scale = 255.0 / amax if amax > 0 else 1.0
        arr = np.clip(arr * scale, 0, 255).astype(np.uint8)
    return arr


def _to_rgb_uint8(arr: np.ndarray) -> np.ndarray:
    """Normalize any decoded array to RGB uint8 (H, W, 3)."""
    arr = _to_scaled_uint8(arr)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=2)
    elif arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    elif arr.shape[2] == 4:
        arr = arr[..., :3]
    return np.ascontiguousarray(arr)


def _decode(path: Path, collapse: bool = False) -> np.ndarray:
    arr: Optional[np.ndarray] = None
    suffix = path.suffix.lower()
    if suffix in (".tif", ".tiff"):
        try:
            arr = read_tiff(path)
        except (ValueError, struct_error_types):
            arr = None
    elif suffix == ".png":
        # native zlib decoder for the common 8-bit forms (the loader's
        # measured bottleneck); None -> unsupported form, PIL below
        from .png_native import decode_png_file

        arr = decode_png_file(path, collapse=collapse)
    if arr is None:
        if _PILImage is None:
            raise RuntimeError("PIL unavailable and file not a supported TIFF")
        with _PILImage.open(path) as im:
            arr = np.asarray(im)
    return arr


def load_image(path, grayscale: bool = False) -> np.ndarray:
    """Load an image file as RGB uint8 (or grayscale uint8 if requested)."""
    rgb = _to_rgb_uint8(_decode(Path(path)))
    if grayscale:
        return rgb.mean(axis=2).astype(np.uint8)
    return rgb


def load_image_collapsed(path) -> np.ndarray:
    """Load for the batch loader: (H, W) uint8 when the source is
    single-channel — stored grayscale OR replicated-RGB — else (H, W, 3).

    ``load_image`` expands grayscale sources to RGB only for the loader to
    collapse them straight back for the 1-channel host->device transfer
    (pipeline/loader.py); this skips that expand/collapse round trip (one
    ``np.repeat`` + two channel compares + a copy per image — the host
    loader is the measured e2e bottleneck on a single-core host).
    """
    arr = _to_scaled_uint8(_decode(Path(path), collapse=True))
    if arr.ndim == 2:
        return np.ascontiguousarray(arr)
    if arr.ndim == 3 and arr.shape[2] == 1:
        return np.ascontiguousarray(arr[..., 0])
    if arr.ndim == 3 and arr.shape[2] >= 3:
        c0 = arr[..., 0]
        if np.array_equal(c0, arr[..., 1]) and np.array_equal(c0, arr[..., 2]):
            return np.ascontiguousarray(c0)
        return np.ascontiguousarray(arr[..., :3])
    return _to_rgb_uint8(arr)


struct_error_types = (ValueError,)  # read_tiff raises ValueError on unsupported input


def save_image(path, image: np.ndarray) -> None:
    """Save uint8 image; format chosen by extension (TIFF via our codec)."""
    path = Path(path)
    if path.suffix.lower() in (".tif", ".tiff"):
        write_tiff(path, image)
        return
    if _PILImage is None:  # pragma: no cover
        raise RuntimeError("PIL unavailable for non-TIFF output")
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    _PILImage.fromarray(arr).save(path)


def list_image_files(
    directory, extensions: Sequence[str] = IMAGE_EXTENSIONS, recursive: bool = False
) -> List[Path]:
    """Sorted image files under ``directory`` (reference ``pipeline.py:265-269``)."""
    directory = Path(directory)
    pattern = "**/*" if recursive else "*"
    files = [
        p
        for p in directory.glob(pattern)
        if p.is_file() and p.suffix.lower() in extensions
    ]
    return sorted(files)
