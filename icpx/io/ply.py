"""PLY reader/writer (ascii + binary_little_endian vertices).

The reference's transform tutorial accepts PLY via `pcl::io::loadPLYFile`
(`matrix-transform.cpp:63`); this is the equivalent ingest/export path.
Only the vertex element is interpreted (positions + optional normals);
other elements (faces, etc.) are skipped on read.
"""

from __future__ import annotations

import io as _io
import os
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

_PLY_TYPES = {
    "char": np.int8,
    "int8": np.int8,
    "uchar": np.uint8,
    "uint8": np.uint8,
    "short": np.int16,
    "int16": np.int16,
    "ushort": np.uint16,
    "uint16": np.uint16,
    "int": np.int32,
    "int32": np.int32,
    "uint": np.uint32,
    "uint32": np.uint32,
    "float": np.float32,
    "float32": np.float32,
    "double": np.float64,
    "float64": np.float64,
}


def read_ply(path: Union[str, os.PathLike, bytes]) -> Dict[str, np.ndarray]:
    """Read PLY -> dict with at least `"xyz"` (N, 3) float32."""
    if isinstance(path, bytes):
        stream = _io.BytesIO(path)
    else:
        stream = open(path, "rb")
    try:
        magic = stream.readline().strip()
        if magic != b"ply":
            raise ValueError("not a PLY file")
        fmt = None
        elements: List[Tuple[str, int, List[Tuple[str, np.dtype]]]] = []
        cur_props: List[Tuple[str, np.dtype]] = []
        cur_name, cur_count = None, 0
        while True:
            line = stream.readline()
            if not line:
                raise ValueError("PLY: EOF in header")
            tok = line.decode("ascii").strip().split()
            if not tok or tok[0] == "comment":
                continue
            if tok[0] == "format":
                fmt = tok[1]
            elif tok[0] == "element":
                if cur_name is not None:
                    elements.append((cur_name, cur_count, cur_props))
                cur_name, cur_count, cur_props = tok[1], int(tok[2]), []
            elif tok[0] == "property":
                if tok[1] == "list":
                    # list property (e.g. face indices): mark with None dtype
                    cur_props.append(
                        (tok[-1], None)  # type: ignore[arg-type]
                    )
                else:
                    cur_props.append((tok[2], np.dtype(_PLY_TYPES[tok[1]])))
            elif tok[0] == "end_header":
                if cur_name is not None:
                    elements.append((cur_name, cur_count, cur_props))
                break
        out: Dict[str, np.ndarray] = {}
        for name, count, props in elements:
            if name != "vertex":
                if "x" in out:
                    break  # vertex already read; ignore trailing elements
                # skip a non-vertex element that precedes vertex
                if any(dt is None for _, dt in props):
                    raise ValueError(
                        "PLY: list-typed element precedes vertex "
                        "(cannot compute skip size)"
                    )
                if fmt == "ascii":
                    for _ in range(count):
                        stream.readline()
                else:
                    stream.seek(
                        np.dtype(props).itemsize * count, 1
                    )
                continue
            if any(dt is None for _, dt in props):
                raise ValueError("PLY: list property in vertex element")
            dtype = np.dtype(props)
            if fmt == "ascii":
                rows = []
                for _ in range(count):
                    rows.append(
                        [float(v) for v in stream.readline().split()]
                    )
                mat = np.asarray(rows, dtype=np.float64)
                rec = np.zeros(count, dtype=dtype)
                for j, (pname, _) in enumerate(props):
                    rec[pname] = mat[:, j]
            elif fmt == "binary_little_endian":
                buf = stream.read(dtype.itemsize * count)
                rec = np.frombuffer(buf, dtype=dtype, count=count).copy()
            elif fmt == "binary_big_endian":
                bedt = dtype.newbyteorder(">")
                buf = stream.read(bedt.itemsize * count)
                rec = (
                    np.frombuffer(buf, dtype=bedt, count=count)
                    .astype(dtype)
                    .copy()
                )
            else:
                raise ValueError(f"PLY: unsupported format {fmt}")
            for pname, _ in props:
                out[pname] = np.asarray(rec[pname])
    finally:
        if not isinstance(path, bytes):
            stream.close()
    if all(k in out for k in ("x", "y", "z")):
        out["xyz"] = np.stack([out["x"], out["y"], out["z"]], -1).astype(np.float32)
    if all(k in out for k in ("nx", "ny", "nz")):
        out["normals"] = np.stack([out["nx"], out["ny"], out["nz"]], -1).astype(
            np.float32
        )
    return out


def write_ply(
    path: Union[str, os.PathLike],
    xyz: np.ndarray,
    *,
    normals: Optional[np.ndarray] = None,
    colors: Optional[np.ndarray] = None,
    binary: bool = True,
) -> None:
    """Write vertices to PLY (binary little-endian by default)."""
    xyz = np.asarray(xyz, np.float32)
    n = xyz.shape[0]
    props = [("x", np.float32), ("y", np.float32), ("z", np.float32)]
    if normals is not None:
        props += [("nx", np.float32), ("ny", np.float32), ("nz", np.float32)]
    if colors is not None:
        props += [("red", np.uint8), ("green", np.uint8), ("blue", np.uint8)]
    dtype = np.dtype(props)
    rec = np.zeros(n, dtype=dtype)
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    if normals is not None:
        normals = np.asarray(normals, np.float32)
        rec["nx"], rec["ny"], rec["nz"] = normals[:, 0], normals[:, 1], normals[:, 2]
    if colors is not None:
        colors = np.asarray(colors, np.uint8)
        rec["red"], rec["green"], rec["blue"] = colors[:, 0], colors[:, 1], colors[:, 2]

    fmt = "binary_little_endian" if binary else "ascii"
    header = ["ply", f"format {fmt} 1.0", f"element vertex {n}"]
    type_names = {np.dtype(np.float32): "float", np.dtype(np.uint8): "uchar"}
    for pname, pdt in props:
        header.append(f"property {type_names[np.dtype(pdt)]} {pname}")
    header.append("end_header\n")
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        if binary:
            f.write(rec.tobytes())
        else:
            body = _io.StringIO()
            for i in range(n):
                vals = []
                for pname, pdt in props:
                    v = rec[pname][i]
                    vals.append(str(int(v)) if np.dtype(pdt) == np.uint8 else repr(float(v)))
                body.write(" ".join(vals) + "\n")
            f.write(body.getvalue().encode("ascii"))
