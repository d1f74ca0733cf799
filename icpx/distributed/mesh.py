"""Device-mesh construction for the registration engine.

The reference is strictly single-process (SURVEY.md §2.3); here the mesh is
the first-class scaling primitive. Axis conventions:

  * ``pairs``  — data parallel over independent scan pairs (P1);
  * ``points`` — tensor/sequence parallel over the point dimension of one
    pair (P2/P3): NN + normal-equation partials per shard, 6x6 psum;
  * ``blocks`` — expert-parallel map blocks for scan-to-map (P7, later).

Collectives ride ICI within a slice / DCN across slices — all emitted by
XLA from `shard_map` + `psum`/`ppermute`; no NCCL/MPI analogue exists or
is needed (reference has none either, `PCL1.9.1_x64_Release.props:14`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(
    n_devices: int, n_pairs: Optional[int] = None
) -> Tuple[int, int]:
    """Factor n_devices into (pairs, points) mesh dims.

    Prefers giving the pairs axis min(n_pairs, largest divisor <= n_pairs)
    devices and the rest to point sharding; with no batch hint, all devices
    go to the points axis (single-pair latency mode).
    """
    if n_pairs is None or n_pairs <= 1:
        return (1, n_devices)
    dp = 1
    for d in range(min(n_pairs, n_devices), 0, -1):
        if n_devices % d == 0:
            dp = d
            break
    return (dp, n_devices // dp)


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("pairs", "points"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over the given (or all) devices.

    `shape=None` puts every device on the last axis.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(np.asarray(devs).reshape(shape), tuple(axis_names))
