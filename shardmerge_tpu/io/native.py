"""ctypes bindings for the native host-IO accelerator (native/stio.cpp).

Builds ``native/libstio.so`` on first use with the system C++ compiler and
falls back to pure numpy when the toolchain or library is unavailable —
every entry point here has identical semantics in both modes.

Why native: the merge pipeline's host side is dominated by multi-GB buffer
copies and bf16<->fp32 conversions that numpy/ml_dtypes run single-threaded.
The C++ versions parallelize them across cores (and the bf16 narrowing is
bit-exact round-to-nearest-even, verified against ml_dtypes in tests).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "available",
    "bf16_to_f32",
    "f32_to_bf16",
    "parallel_copy",
    "read_blocks",
    "prefault_file",
]

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "stio.cpp"
_LIB_PATH = _REPO_ROOT / "native" / "libstio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    for cc in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [
                    cc,
                    "-O3",
                    "-march=native",
                    "-shared",
                    "-fPIC",
                    "-pthread",
                    "-std=c++17",
                    str(_SRC),
                    "-o",
                    str(_LIB_PATH),
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            logger.debug("native build with %s failed: %s", cc, e)
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SHARDMERGE_NO_NATIVE") == "1":
            return None
        try:
            if not _LIB_PATH.exists() or (
                _SRC.exists() and _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
            ):
                if not _SRC.exists() or not _build():
                    return None
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.stio_read_blocks.restype = ctypes.c_int
            lib.stio_read_blocks.argtypes = [
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_int64,
                ctypes.c_int,
            ]
            lib.stio_bf16_to_f32.restype = None
            lib.stio_f32_to_bf16.restype = None
            lib.stio_memcpy.restype = None
            lib.stio_prefault.restype = None
            _lib = lib
            logger.info("native IO accelerator loaded (%s)", _LIB_PATH)
        except OSError as e:
            logger.debug("native IO accelerator unavailable: %s", e)
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


_PARALLEL_MIN = 1 << 22  # below 4 MiB, thread spawn costs more than it saves


def bf16_to_f32(src: np.ndarray, nthreads: int = 0) -> np.ndarray:
    """Widen a bf16 array to fp32 (parallel when native is available)."""
    import ml_dtypes

    assert src.dtype == np.dtype(ml_dtypes.bfloat16)
    lib = _load()
    if lib is None or src.nbytes < _PARALLEL_MIN:
        return src.astype(np.float32)
    src = np.ascontiguousarray(src)
    out = np.empty(src.shape, np.float32)
    lib.stio_bf16_to_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(src.size),
        ctypes.c_int(nthreads),
    )
    return out


def f32_to_bf16(src: np.ndarray, nthreads: int = 0) -> np.ndarray:
    """Narrow fp32 to bf16 with round-to-nearest-even (== ml_dtypes astype)."""
    import ml_dtypes

    assert src.dtype == np.float32
    lib = _load()
    if lib is None or src.nbytes < _PARALLEL_MIN:
        return src.astype(ml_dtypes.bfloat16)
    src = np.ascontiguousarray(src)
    out = np.empty(src.shape, ml_dtypes.bfloat16)
    lib.stio_f32_to_bf16(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_int64(src.size),
        ctypes.c_int(nthreads),
    )
    return out


def _ncores() -> int:
    return os.cpu_count() or 1


def parallel_copy(src: np.ndarray, nthreads: int = 0) -> np.ndarray:
    """Owned copy of a (possibly mmap-backed) array, parallel memcpy.

    On single-core hosts numpy's memcpy is already optimal; the native path
    only engages when threads can actually overlap."""
    lib = _load()
    src = np.ascontiguousarray(src)
    if lib is None or src.nbytes < _PARALLEL_MIN or _ncores() < 2:
        return np.array(src)
    out = np.empty_like(src)
    lib.stio_memcpy(
        out.ctypes.data_as(ctypes.c_char_p),
        src.ctypes.data_as(ctypes.c_char_p),
        ctypes.c_int64(src.nbytes),
        ctypes.c_int(nthreads),
    )
    return out


def read_blocks(path, offsets, sizes, buffers, nthreads: int = 0) -> bool:
    """Parallel pread of byte ranges into numpy buffers. Returns success."""
    lib = _load()
    if lib is None:
        with open(path, "rb") as f:
            for off, size, buf in zip(offsets, sizes, buffers):
                f.seek(off)
                got = f.readinto(memoryview(buf.reshape(-1).view(np.uint8)))
                if got != size:
                    return False
        return True

    n = len(offsets)
    off_arr = (ctypes.c_uint64 * n)(*offsets)
    size_arr = (ctypes.c_uint64 * n)(*sizes)
    # raw pointer values (NOT c_char_p.value, which would read the buffer
    # as a NUL-terminated string)
    dest_arr = (ctypes.c_void_p * n)(*[buf.ctypes.data for buf in buffers])
    fd = os.open(path, os.O_RDONLY)
    try:
        rc = lib.stio_read_blocks(
            fd, off_arr, size_arr, dest_arr, ctypes.c_int64(n), ctypes.c_int(nthreads)
        )
    finally:
        os.close(fd)
    return rc == 0


def prefault_file(path, offset: int = 0, length: Optional[int] = None):
    """Advise the kernel a shard is about to be read (streaming readahead)."""
    lib = _load()
    if lib is None:
        return
    size = os.path.getsize(path)
    if length is None:
        length = size - offset
    fd = os.open(path, os.O_RDONLY)
    try:
        lib.stio_prefault(
            fd,
            ctypes.c_uint64(offset),
            ctypes.c_uint64(min(length, size - offset)),
            None,
            ctypes.c_int(0),
        )
    finally:
        os.close(fd)
