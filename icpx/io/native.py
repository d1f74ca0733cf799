"""ctypes binding to the native C++ IO library (native/icpx_io.cpp).

Mirrors the reference's architecture: the data-loader's byte-level hot
loops are native C++ (the reference uses PCL's C++ readers); Python keeps
header parsing and dispatch. Falls back to numpy transparently when the
library is missing and no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_NAME = "libicpx_io.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[Path]:
    src = _NATIVE_DIR / "icpx_io.cpp"
    out = _NATIVE_DIR / _LIB_NAME
    hash_file = _NATIVE_DIR / (_LIB_NAME + ".srchash")
    if not src.exists():
        return None
    # staleness = source-content hash mismatch (mtimes are not preserved by
    # git checkouts, so a stale prebuilt .so could otherwise shadow newer
    # source)
    import hashlib

    src_hash = hashlib.sha256(src.read_bytes()).hexdigest()
    if out.exists() and hash_file.exists() and hash_file.read_text().strip() == src_hash:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", str(out), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        hash_file.write_text(src_hash)
        return out
    except (OSError, subprocess.SubprocessError):
        return out if out.exists() else None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if
    unavailable (callers fall back to numpy)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("ICPX_NO_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            return None
        lib.icpx_parse_float_table.restype = ctypes.c_int64
        lib.icpx_parse_float_table.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.icpx_parse_float_columns.restype = ctypes.c_int64
        lib.icpx_parse_float_columns.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.icpx_format_float_table.restype = ctypes.c_int64
        lib.icpx_format_float_table.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.icpx_kitti_xyz.restype = ctypes.c_int64
        lib.icpx_kitti_xyz.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        for fn in ("icpx_lzf_compress", "icpx_lzf_decompress"):
            f = getattr(lib, fn)
            f.restype = ctypes.c_int64
            f.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_char_p,
                ctypes.c_int64,
            ]
        if lib.icpx_io_abi_version() != 3:
            return None
        _lib = lib
        return _lib


def parse_float_table(
    text: bytes, n_rows: int, n_cols: int
) -> Optional[np.ndarray]:
    """Parse whitespace-separated floats -> (n_rows, n_cols) float32, or
    None when native is unavailable / input is truncated."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((n_rows, n_cols), np.float32)
    got = lib.icpx_parse_float_table(
        text,
        len(text),
        n_rows * n_cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_cols,
    )
    # negative = malformed line; short = truncated: fall back to numpy,
    # which surfaces a real error instead of silent misalignment
    if got != n_rows * n_cols:
        return None
    return out


def parse_float_columns(
    text: bytes, n_rows: int, row_cols: int, col0: int, n_take: int
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((n_rows, n_take), np.float32)
    got = lib.icpx_parse_float_columns(
        text,
        len(text),
        n_rows,
        row_cols,
        col0,
        n_take,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got != n_rows:
        return None
    return out


def format_float_table(values: np.ndarray) -> Optional[bytes]:
    """(n, c) float32 -> ASCII bytes (space-separated, newline rows)."""
    lib = get_lib()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, np.float32)
    n, c = values.shape
    cap = n * c * 20 + n + 64
    buf = ctypes.create_string_buffer(cap)
    wrote = lib.icpx_format_float_table(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        c,
        buf,
        cap,
    )
    if wrote < 0:
        return None
    return buf.raw[:wrote]


def lzf_compress(data: bytes) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    cap = len(data) + len(data) // 16 + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.icpx_lzf_compress(data, len(data), buf, cap)
    if n <= 0:
        return None
    return buf.raw[:n]


def lzf_decompress(data: bytes, expected: int) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(expected)
    n = lib.icpx_lzf_decompress(data, len(data), buf, expected)
    if n != expected:
        return None
    return buf.raw[:expected]


def kitti_xyz(raw: bytes) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    n = len(raw) // 16
    out = np.empty((n, 3), np.float32)
    lib.icpx_kitti_xyz(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    return out
