"""Zero-copy safetensors reader/writer on numpy (+ ml_dtypes).

The official ``safetensors.numpy`` backend cannot represent bfloat16 (numpy
has no native bf16), which is the dominant checkpoint dtype for the models
this framework merges. This module implements the safetensors on-disk format
directly:

    [8 bytes u64 LE: header_size][header_size bytes JSON][data buffer]

Reads are zero-copy mmap views so a whole shard can be opened and only the
requested tensors ever touch RAM — the host side of the streaming pipeline
feeds these views straight into ``jax.device_put``.

Format compatibility is tested round-trip against the official safetensors
library (tests/test_safetensors_io.py).
"""

from __future__ import annotations

import json
import mmap
import os
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import ml_dtypes
import numpy as np

__all__ = ["SafeTensorsReader", "read_header", "load_file", "save_file"]

# safetensors dtype tag <-> numpy dtype
_ST_TO_NP = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "F8_E4M3": np.dtype(ml_dtypes.float8_e4m3fn),
    "F8_E5M2": np.dtype(ml_dtypes.float8_e5m2),
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U64": np.dtype(np.uint64),
    "U32": np.dtype(np.uint32),
    "U16": np.dtype(np.uint16),
    "U8": np.dtype(np.uint8),
    "BOOL": np.dtype(np.bool_),
}
_NP_TO_ST = {v: k for k, v in _ST_TO_NP.items()}

_MAX_HEADER_SIZE = 100 * 1024 * 1024  # same sanity bound as the official lib


class SafeTensorsFormatError(ValueError):
    """Raised when a file does not conform to the safetensors format."""


def _np_to_st_dtype(dtype: np.dtype) -> str:
    try:
        return _NP_TO_ST[np.dtype(dtype)]
    except KeyError:
        raise SafeTensorsFormatError(f"Unsupported dtype for safetensors: {dtype}")


def read_header(path: os.PathLike | str) -> Tuple[dict, int]:
    """Return (header_json, data_start_offset) for a safetensors file."""
    with open(path, "rb") as f:
        prefix = f.read(8)
        if len(prefix) != 8:
            raise SafeTensorsFormatError(f"File too small for safetensors: {path}")
        header_size = int.from_bytes(prefix, "little")
        if header_size > _MAX_HEADER_SIZE:
            raise SafeTensorsFormatError(
                f"Header size {header_size} exceeds sanity bound in {path}"
            )
        raw = f.read(header_size)
        if len(raw) != header_size:
            raise SafeTensorsFormatError(f"Truncated safetensors header in {path}")
    try:
        header = json.loads(raw)
    except json.JSONDecodeError as e:
        raise SafeTensorsFormatError(f"Invalid JSON header in {path}: {e}") from e
    if not isinstance(header, dict):
        raise SafeTensorsFormatError(f"Header must be a JSON object in {path}")
    return header, 8 + header_size


class SafeTensorsReader:
    """mmap-backed reader; tensors are zero-copy numpy views.

    Usage::

        with SafeTensorsReader(path) as r:
            names = r.keys()
            arr = r.get_tensor("model.embed_tokens.weight")  # view, not copy

    Views become invalid once the reader is closed; use ``copy=True`` (or
    ``np.array(view)``) to detach.
    """

    def __init__(self, path: os.PathLike | str):
        self.path = Path(path)
        header, data_start = read_header(self.path)
        self.metadata: Optional[Dict[str, str]] = header.pop("__metadata__", None)
        self._entries: Dict[str, dict] = header
        self._data_start = data_start
        self._file = open(self.path, "rb")
        try:
            self._mmap = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        except ValueError:
            # zero-byte data section of an empty file cannot be mmapped
            self._mmap = None
        self._buf = memoryview(self._mmap)[data_start:] if self._mmap else memoryview(b"")
        file_size = self.path.stat().st_size
        self._data_len = file_size - data_start
        for name, entry in self._entries.items():
            self._validate_entry(name, entry)

    def _validate_entry(self, name: str, entry: dict):
        for key in ("dtype", "shape", "data_offsets"):
            if key not in entry:
                raise SafeTensorsFormatError(
                    f"Tensor {name!r} missing {key!r} in {self.path}"
                )
        if entry["dtype"] not in _ST_TO_NP:
            raise SafeTensorsFormatError(
                f"Tensor {name!r} has unsupported dtype {entry['dtype']!r}"
            )
        begin, end = entry["data_offsets"]
        dtype = _ST_TO_NP[entry["dtype"]]
        count = int(np.prod(entry["shape"], dtype=np.int64)) if entry["shape"] else 1
        if end - begin != count * dtype.itemsize:
            raise SafeTensorsFormatError(
                f"Tensor {name!r} byte span {end - begin} != shape {entry['shape']} "
                f"x {entry['dtype']}"
            )
        if begin < 0 or end > self._data_len:
            raise SafeTensorsFormatError(
                f"Tensor {name!r} data_offsets {entry['data_offsets']} outside file"
            )

    def keys(self) -> Iterator[str]:
        return iter(self._entries.keys())

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __len__(self) -> int:
        return len(self._entries)

    def get_shape(self, name: str) -> Tuple[int, ...]:
        return tuple(self._entries[name]["shape"])

    def get_dtype(self, name: str) -> np.dtype:
        return _ST_TO_NP[self._entries[name]["dtype"]]

    def nbytes(self, name: str) -> int:
        begin, end = self._entries[name]["data_offsets"]
        return end - begin

    def get_tensor(self, name: str, copy: bool = False) -> np.ndarray:
        if name not in self._entries:
            raise KeyError(f"Tensor {name!r} not found in {self.path}")
        entry = self._entries[name]
        begin, end = entry["data_offsets"]
        dtype = _ST_TO_NP[entry["dtype"]]
        arr = np.frombuffer(self._buf[begin:end], dtype=dtype)
        arr = arr.reshape(tuple(entry["shape"]))
        if not copy:
            return arr
        from . import native

        return native.parallel_copy(arr)

    def close(self):
        """Release resources (best-effort).

        If tensor views handed out by ``get_tensor`` are still alive, the
        mapping cannot be unmapped; it is left for the GC so those views stay
        valid instead of dangling.
        """
        self._buf = memoryview(b"")
        if self._mmap is not None:
            try:
                self._mmap.close()
            except BufferError:
                pass  # outstanding views; GC reclaims the mapping later
            self._mmap = None
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self) -> "SafeTensorsReader":
        return self

    def __exit__(self, *exc):
        self.close()


def load_file(path: os.PathLike | str) -> Dict[str, np.ndarray]:
    """Load all tensors from a safetensors file as owned numpy arrays."""
    with SafeTensorsReader(path) as reader:
        return {name: reader.get_tensor(name, copy=True) for name in reader.keys()}


def save_file(
    tensors: Dict[str, np.ndarray],
    path: os.PathLike | str,
    metadata: Optional[Dict[str, str]] = None,
):
    """Write tensors in safetensors format.

    Tensors are laid out contiguously in the given dict order (the official
    validator requires ascending, gap-free offsets). The JSON header is padded
    with spaces to an 8-byte boundary, matching the official writer.
    """
    header: Dict[str, dict] = {}
    if metadata is not None:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}

    offset = 0
    arrays = []
    for name, tensor in tensors.items():
        arr = np.asarray(tensor)
        if not arr.flags.c_contiguous:  # ascontiguousarray would promote 0-d to 1-d
            arr = np.ascontiguousarray(arr)
        st_dtype = _np_to_st_dtype(arr.dtype)
        nbytes = arr.nbytes
        header[name] = {
            "dtype": st_dtype,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        offset += nbytes
        arrays.append(arr)

    header_bytes = json.dumps(header, separators=(",", ":")).encode("utf-8")
    pad = (-(8 + len(header_bytes))) % 8
    header_bytes += b" " * pad

    tmp_path = Path(path).with_suffix(Path(path).suffix + ".tmp")
    with open(tmp_path, "wb") as f:
        f.write(len(header_bytes).to_bytes(8, "little"))
        f.write(header_bytes)
        for arr in arrays:
            # custom dtypes (bf16/f8) cannot export a buffer; a uint8 view can
            f.write(arr.reshape(-1).view(np.uint8).data)
    os.replace(tmp_path, path)
