"""ctypes binding for the native PNG decoder (``native/png_decode.cc``).

The batch loader's decode is the measured end-to-end bottleneck on a
single-core host (PIL ~7.5 ms per 512x512 RGB frame, array copies
included). The native path decodes straight into the caller's numpy
buffer — one zlib inflate, in-place unfilter, optional replicated-RGB
collapse — and covers exactly the formats microscopy batches use
(8-bit gray/RGB/RGBA, non-interlaced). Everything else returns None and
callers fall back to PIL, so behavior is format-complete either way.

Build-on-demand with g++ like ``io/images_bin.py``; environments without
a toolchain silently use PIL everywhere.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Union

import numpy as np

from ..utils.logger import setup_logger

logger = setup_logger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libpng_decode.so"

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False

_COLLAPSED = 1  # png_decode8 return code: gray written to first w*h bytes


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        src = _NATIVE_DIR / "png_decode.cc"
        if not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < src.stat().st_mtime:
            base = ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO_PATH),
                    str(src), "-lz"]
            # libdeflate's whole-buffer inflate is ~2x zlib on the decode
            # hot path; build with it when present, plain zlib otherwise
            try:
                subprocess.run(
                    base + ["-DUSE_LIBDEFLATE", "-ldeflate"],
                    check=True, capture_output=True,
                )
                logger.info("Built native PNG decoder (libdeflate) at %s",
                            _SO_PATH)
            except subprocess.CalledProcessError:
                subprocess.run(base, check=True, capture_output=True)
                logger.info("Built native PNG decoder (zlib) at %s", _SO_PATH)
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.png_probe.restype = ctypes.c_int32
        lib.png_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.png_decode8.restype = ctypes.c_int32
        lib.png_decode8.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError) as e:  # pragma: no cover
        logger.warning("native PNG decoder unavailable (%s); using PIL", e)
        _lib_failed = True
    return _lib


def decode_png(
    data: bytes, collapse: bool = False
) -> Optional[np.ndarray]:
    """Decode PNG bytes to a uint8 array, or None to request PIL fallback.

    Returns (H, W, 3) for color sources, (H, W) for grayscale sources —
    and, with ``collapse=True``, also (H, W) for RGB sources whose pixels
    all satisfy R == G == B (replicated-RGB microscopy; the loader's
    1-channel transfer fast path).
    """
    lib = _load_native()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    ch = ctypes.c_int32()
    if lib.png_probe(data, len(data), ctypes.byref(w),
                     ctypes.byref(h), ctypes.byref(ch)) != 0:
        return None  # unsupported form (palette/16-bit/interlaced/...)
    out = np.empty(h.value * w.value * ch.value, dtype=np.uint8)
    rc = lib.png_decode8(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        1 if (collapse and ch.value == 3) else 0,
    )
    if rc == _COLLAPSED:
        return out[: h.value * w.value].reshape(h.value, w.value)
    if rc != 0:
        return None
    if ch.value == 1:
        return out.reshape(h.value, w.value)
    return out.reshape(h.value, w.value, ch.value)


def decode_png_file(
    path: Union[str, Path], collapse: bool = False
) -> Optional[np.ndarray]:
    """Read + decode a PNG file via the native decoder (None -> fallback)."""
    if _lib_failed:
        return None
    try:
        data = Path(path).read_bytes()
    except OSError:
        return None
    return decode_png(data, collapse=collapse)
