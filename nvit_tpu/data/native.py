"""ctypes bindings for the native C++ loader (native/nvit_loader.cpp).

≙ the reference's native decode path (torchvision/PIL C decode inside torch
DataLoader worker PROCESSES, train.py:334-352).  Here a C++ thread pool does
JPEG decode + resize + center-crop + CHW layout without the GIL or worker
processes, writing straight into one contiguous batch buffer.

The library auto-builds on first use (g++ is assumed present on dev/CI
machines); every entry point falls back to the pure-Python implementation if
the build or load fails, so the framework never hard-depends on the .so.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger("nvit_tpu.native")

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libnvit_loader.so"
_lib: ctypes.CDLL | None = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["bash", str(_NATIVE_DIR / "build.sh")],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.nvit_decode_jpeg_batch.restype = ctypes.c_int
        lib.nvit_decode_jpeg_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.nvit_gather_u8.restype = None
        lib.nvit_gather_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.nvit_loader_abi_version.restype = ctypes.c_int
        assert lib.nvit_loader_abi_version() == 1
        _lib = lib
        logger.info("native loader ready: %s", _LIB_PATH)
    except Exception as e:  # missing toolchain/libjpeg → Python fallback
        logger.warning("native loader unavailable (%s); using Python fallback", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_jpeg_batch(paths: list[str | os.PathLike], target: int, num_threads: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Decode JPEGs → (uint8 [n, 3, target, target] CHW, ok mask [n] bool).

    Raises RuntimeError if the native library is unavailable — callers choose
    the fallback (see data/datasets.py ImageFolderDataset.decode).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    encoded = [str(p).encode() for p in paths]
    offsets = np.zeros(len(encoded), dtype=np.int64)
    pos = 0
    blobs = []
    for i, e in enumerate(encoded):
        offsets[i] = pos
        blobs.append(e + b"\0")
        pos += len(e) + 1
    concat = b"".join(blobs)
    n = len(paths)
    out = np.empty((n, 3, target, target), dtype=np.uint8)
    ok = np.empty((n,), dtype=np.uint8)
    lib.nvit_decode_jpeg_batch(
        concat,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        target,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    return out, ok.astype(bool)


def gather_rows(src: np.ndarray, indices: np.ndarray, num_threads: int = 4) -> np.ndarray:
    """dst[i] = src[indices[i]] — multithreaded memcpy for big uint8 arrays;
    falls back to numpy fancy indexing when the library is missing."""
    lib = _load()
    if lib is None or src.dtype != np.uint8 or not src.flags.c_contiguous:
        return src[indices]
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    row_bytes = int(np.prod(src.shape[1:])) * src.itemsize
    dst = np.empty((len(idx),) + src.shape[1:], dtype=np.uint8)
    lib.nvit_gather_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx),
        row_bytes,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    return dst
