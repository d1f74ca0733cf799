"""Raw whitespace-separated xyz text ingest (the `za.txt` path).

Replaces the reference's `fscanf` converter loop (`test.cpp:29-43`) that
turns a tab-separated xyz file into a cloud.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Union

import numpy as np


def _is_number(tok: bytes) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


def read_xyz_txt(path: Union[str, os.PathLike]) -> np.ndarray:
    """Read whitespace/tab-separated xyz rows -> (N, 3) float32.

    Leading non-numeric lines (column headers) are skipped; malformed
    data rows fall back to numpy, which raises a real error (the native
    parser refuses rather than silently misaligning columns).
    """
    raw = Path(path).read_bytes()
    lines = [l for l in raw.splitlines() if l.strip() and not l.lstrip().startswith(b"#")]
    # drop leading header lines (e.g. "x y z")
    n_header = 0
    while n_header < len(lines) and not _is_number(lines[n_header].split()[0]):
        n_header += 1
    lines = lines[n_header:]
    if not lines:
        return np.zeros((0, 3), np.float32)
    row_cols = len(lines[0].split())
    if row_cols < 3:
        raise ValueError(f"xyz txt needs >= 3 columns, got {row_cols}")
    from icpx.io import native

    body = b"\n".join(lines)
    mat = native.parse_float_columns(body, len(lines), row_cols, 0, 3)
    if mat is not None:
        return mat
    # parse the already-filtered buffer (blank/comment lines removed above) —
    # re-reading the file with skiprows would mis-skip when comments precede
    # the header
    import io

    full = np.loadtxt(io.BytesIO(body), dtype=np.float64, ndmin=2)
    return full[:, :3].astype(np.float32)


def write_xyz_txt(path: Union[str, os.PathLike], xyz: np.ndarray) -> None:
    np.savetxt(path, np.asarray(xyz, np.float32), fmt="%.8g", delimiter="\t")
