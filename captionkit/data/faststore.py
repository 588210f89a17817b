"""ctypes binding for the native feature store (native/featstore.cpp).

Replaces numpy fancy-indexing in the hot batch-assembly path with a
GIL-free threaded mmap gather — the native twin of the reference's
DataLoader worker machinery (SURVEY.md §2 L2). Falls back silently to
numpy when the library isn't built (`make -C native`).

Only plain little-endian C-contiguous .npy files are supported (that's
what data/prepare.py writes); anything else falls back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.environ.get("CAPTIONKIT_FEATSTORE_LIB", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libfeatstore.so"),
]


def _load_lib() -> ctypes.CDLL:
    if not any(p and os.path.exists(p) for p in _LIB_PATHS):
        from captionkit.utils.nativebuild import ensure_native_built

        ensure_native_built()
    for p in _LIB_PATHS:
        if p and os.path.exists(p):
            lib = ctypes.CDLL(os.path.abspath(p))
            lib.featstore_open.restype = ctypes.c_void_p
            lib.featstore_open.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.featstore_close.argtypes = [ctypes.c_void_p]
            lib.featstore_gather.restype = ctypes.c_int
            lib.featstore_gather.argtypes = [
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int64,
            ]
            lib.featstore_rows.restype = ctypes.c_int64
            lib.featstore_rows.argtypes = [ctypes.c_void_p]
            return lib
    raise FileNotFoundError(
        "libfeatstore.so not built; run `make -C native`"
    )


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except (FileNotFoundError, OSError):
        return False


def _parse_npy_header(path: str):
    """Return (payload_offset, shape, dtype) for a v1/v2 .npy file, or None
    when the layout isn't the simple contiguous little-endian case."""
    with open(path, "rb") as f:
        magic = f.read(6)
        if magic != b"\x93NUMPY":
            return None
        major, _minor = f.read(1)[0], f.read(1)[0]
        if major == 1:
            (hlen,) = struct.unpack("<H", f.read(2))
            header_start = 10
        else:
            (hlen,) = struct.unpack("<I", f.read(4))
            header_start = 12
        header = f.read(hlen).decode("latin1")
    # Tiny literal-eval of the dict numpy writes.
    import ast

    meta = ast.literal_eval(header)
    if meta.get("fortran_order"):
        return None
    descr = meta["descr"]
    if descr not in ("<f4", "<f2", "<i4", "<i8", "|u1"):
        return None
    dtype = np.dtype(descr)
    return header_start + hlen, tuple(meta["shape"]), dtype


class FeatureStore:
    """Row-gather view over an .npy feature file.

    gather(indices) -> [n, *row_shape] array. Uses the native library when
    built, else numpy mmap indexing.
    """

    def __init__(self, path: str, *, threads: Optional[int] = None):
        self.path = path
        self._threads = threads or min(8, os.cpu_count() or 1)
        self._native = None
        self._np = None
        parsed = _parse_npy_header(path) if path.endswith(".npy") else None
        if parsed is not None and native_available():
            offset, shape, dtype = parsed
            self.shape = shape
            self.dtype = dtype
            row_bytes = int(np.prod(shape[1:])) * dtype.itemsize
            lib = _load_lib()
            handle = lib.featstore_open(
                path.encode(), offset, shape[0], row_bytes
            )
            if handle:
                self._native = (lib, ctypes.c_void_p(handle), row_bytes)
                return
        self._np = np.load(path, mmap_mode="r")
        self.shape = self._np.shape
        self.dtype = self._np.dtype

    @property
    def is_native(self) -> bool:
        return self._native is not None

    def gather(self, indices) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        if self._native is not None:
            lib, handle, row_bytes = self._native
            out = np.empty((idx.shape[0], *self.shape[1:]), self.dtype)
            rc = lib.featstore_gather(
                handle, idx, idx.shape[0],
                out.ctypes.data_as(ctypes.c_void_p), self._threads,
            )
            if rc != 0:
                raise IndexError(
                    f"feature index out of range [0, {self.shape[0]})"
                )
            return out
        return np.asarray(self._np[idx])

    def __len__(self) -> int:
        return int(self.shape[0])

    def __getitem__(self, idx) -> np.ndarray:
        if isinstance(idx, (int, np.integer)):
            return self.gather(np.asarray([idx]))[0]
        return self.gather(np.asarray(idx))

    def __array__(self, dtype=None) -> np.ndarray:
        out = self.gather(np.arange(self.shape[0]))
        return out.astype(dtype) if dtype is not None else out

    def close(self) -> None:
        if self._native is not None:
            lib, handle, _ = self._native
            lib.featstore_close(handle)
            self._native = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
