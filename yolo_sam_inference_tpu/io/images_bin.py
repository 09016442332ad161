"""Reader for the ``images.bin`` acquisition stream format.

The single binary-format contract in the reference (spec quoted at reference
``tools/ms_opencv_process.py:1-29``; Python parser ``:82-176``): frames of
``int32 rows | int32 cols | int32 cv_type | data``. The fast path is a C++
library (``native/images_bin.cc``) built on demand with g++ and called via
ctypes: one-pass scan + bulk grayscale decode into a preallocated batch
buffer. A pure-numpy fallback covers environments without a compiler.
"""

from __future__ import annotations

import ctypes
import struct
import subprocess
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..utils.logger import setup_logger

logger = setup_logger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libimages_bin.so"

_CV_DEPTH_DTYPES = {
    0: np.uint8,
    1: np.int8,
    2: np.uint16,
    3: np.int16,
    4: np.int32,
    5: np.float32,
    6: np.float64,
}


class _FrameInfo(ctypes.Structure):
    _fields_ = [
        ("data_offset", ctypes.c_int64),
        ("rows", ctypes.c_int32),
        ("cols", ctypes.c_int32),
        ("cv_type", ctypes.c_int32),
    ]


_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load_native() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the C++ reader; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _SO_PATH.exists():
            src = _NATIVE_DIR / "images_bin.cc"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO_PATH), str(src)],
                check=True,
                capture_output=True,
            )
            logger.info("Built native images.bin reader at %s", _SO_PATH)
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.ibin_scan.restype = ctypes.c_int64
        lib.ibin_scan.argtypes = [ctypes.c_char_p, ctypes.POINTER(_FrameInfo), ctypes.c_int64]
        lib.ibin_read_gray8.restype = ctypes.c_int32
        lib.ibin_read_gray8.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(_FrameInfo),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError) as e:  # pragma: no cover
        logger.warning("native images.bin reader unavailable (%s); using numpy fallback", e)
        _lib_failed = True
    return _lib


def cv_type_info(cv_type: int) -> Tuple[np.dtype, int]:
    """(numpy dtype, channels) for an OpenCV Mat type code."""
    depth = cv_type & 7
    channels = (cv_type >> 3) + 1
    if depth not in _CV_DEPTH_DTYPES or not (1 <= channels <= 4):
        raise ValueError(f"unsupported cv_type {cv_type}")
    return np.dtype(_CV_DEPTH_DTYPES[depth]), channels


def scan_frames(path) -> List[Tuple[int, int, int, int]]:
    """Scan a stream -> [(data_offset, rows, cols, cv_type)] (native or numpy)."""
    path = Path(path)
    lib = _load_native()
    if lib is not None:
        n = lib.ibin_scan(str(path).encode(), None, 0)
        if n < 0:
            raise ValueError(f"corrupt images.bin stream: {path} (code {n})")
        arr = (_FrameInfo * n)()
        n2 = lib.ibin_scan(str(path).encode(), arr, n)
        assert n2 == n
        return [(int(f.data_offset), int(f.rows), int(f.cols), int(f.cv_type)) for f in arr]
    # numpy fallback: header-seek scan
    frames = []
    size = path.stat().st_size
    with open(path, "rb") as f:
        while True:
            hdr = f.read(12)
            if not hdr:
                break
            if len(hdr) != 12:
                raise ValueError(f"corrupt images.bin stream: {path}")
            rows, cols, cv_type = struct.unpack("<3i", hdr)
            dtype, channels = cv_type_info(cv_type)
            nbytes = rows * cols * channels * dtype.itemsize
            off = f.tell()
            if off + nbytes > size:
                raise ValueError(f"truncated frame in {path}")
            frames.append((off, rows, cols, cv_type))
            f.seek(nbytes, 1)
    return frames


def _to_gray8(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    if arr.dtype == np.uint16:
        a = a / 257.0
    elif arr.dtype == np.int16:
        a = np.maximum(a, 0) / 128.0
    return np.clip(a + 0.5, 0, 255).astype(np.uint8)


def read_frames_gray8(
    path, frames: Optional[List[Tuple[int, int, int, int]]] = None
) -> np.ndarray:
    """Decode all (or given) frames to a (N, rows, cols) uint8 batch."""
    path = Path(path)
    if frames is None:
        frames = scan_frames(path)
    if not frames:
        return np.zeros((0, 0, 0), dtype=np.uint8)
    rows, cols = frames[0][1], frames[0][2]
    lib = _load_native()
    if lib is not None and all(f[1] == rows and f[2] == cols for f in frames):
        arr = (_FrameInfo * len(frames))()
        for i, (off, r, c, t) in enumerate(frames):
            arr[i].data_offset, arr[i].rows, arr[i].cols, arr[i].cv_type = off, r, c, t
        out = np.empty((len(frames), rows, cols), dtype=np.uint8)
        rc = lib.ibin_read_gray8(
            str(path).encode(),
            arr,
            len(frames),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rows,
            cols,
        )
        if rc != 0:
            raise ValueError(f"native decode failed for {path} (code {rc})")
        return out
    # numpy fallback
    out_list = []
    with open(path, "rb") as f:
        for off, r, c, t in frames:
            dtype, channels = cv_type_info(t)
            f.seek(off)
            raw = np.frombuffer(f.read(r * c * channels * dtype.itemsize), dtype=dtype)
            img = raw.reshape(r, c) if channels == 1 else raw.reshape(r, c, channels)
            out_list.append(_to_gray8(img))
    return np.stack(out_list)


def iter_frame_batches(path, batch_size: int = 64) -> Iterator[np.ndarray]:
    """Stream a large images.bin in fixed-size uint8 batches (never loads
    the whole ~17k-frame stream: reference ``tools/ms_opencv_process.py:605-836``)."""
    frames = scan_frames(path)
    for i in range(0, len(frames), batch_size):
        yield read_frames_gray8(path, frames[i : i + batch_size])


def write_images_bin(path, images: List[np.ndarray]) -> None:
    """Write frames in the stream format (for tests / interop)."""
    with open(path, "wb") as f:
        for img in images:
            img = np.ascontiguousarray(img)
            if img.ndim == 2:
                channels = 1
            else:
                channels = img.shape[2]
            depth = {
                np.dtype(np.uint8): 0,
                np.dtype(np.int8): 1,
                np.dtype(np.uint16): 2,
                np.dtype(np.int16): 3,
                np.dtype(np.int32): 4,
                np.dtype(np.float32): 5,
                np.dtype(np.float64): 6,
            }[img.dtype]
            cv_type = depth + ((channels - 1) << 3)
            f.write(struct.pack("<3i", img.shape[0], img.shape[1], cv_type))
            f.write(img.tobytes())
