"""Raw whitespace-separated xyz text ingest (the `za.txt` path).

Replaces the reference's `fscanf` converter loop (`test.cpp:29-43`) that
turns a tab-separated xyz file into a cloud.
"""

from __future__ import annotations

import os
from typing import Union

import numpy as np


def read_xyz_txt(path: Union[str, os.PathLike]) -> np.ndarray:
    """Read whitespace/tab-separated xyz rows -> (N, 3) float32."""
    mat = np.loadtxt(path, dtype=np.float64, ndmin=2)
    if mat.shape[1] < 3:
        raise ValueError(f"xyz txt needs >= 3 columns, got {mat.shape[1]}")
    return mat[:, :3].astype(np.float32)


def write_xyz_txt(path: Union[str, os.PathLike], xyz: np.ndarray) -> None:
    np.savetxt(path, np.asarray(xyz, np.float32), fmt="%.8g", delimiter="\t")
