"""Data-parallel odometry: every consecutive scan pair registers
SIMULTANEOUSLY across the device mesh, then relative poses compose into
the trajectory on the host.

The sequential frontend (`frontend.run_odometry`) is latency-ordered —
frame k needs frame k-1's pose for its motion-model init. But when
inter-frame motion is small relative to the scene (the common mapping /
offline-processing case), each pair registers fine from identity, and
the whole sequence becomes one embarrassingly-parallel batch: the
SURVEY §2.3 P1 pattern at its purest. F frames = F-1 independent
registrations = one `sharded_register_pairs` call over the ``pairs``
mesh axis (optionally x ``points`` TP within each pair).

Compared to the sequential paths: no constant-velocity init (pairs must
converge from identity), no keyframe gating (every frame is kept), and
composition accumulates drift exactly like scan-to-scan odometry. The
measured relative transforms feed the same pose-graph backend.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from icpx.cloud import PointCloud
from icpx.geometry.se3 import SE3
from icpx.kernels.normals import estimate_normals
from icpx.registration.icp import ICPConfig


def parallel_odometry(
    frames: Sequence[PointCloud],
    config: ICPConfig,
    mesh,
    *,
    pairs_axis: str = "pairs",
    points_axis: str = "points",
) -> Tuple[List[SE3], List[Tuple[int, int, SE3]], jnp.ndarray]:
    """Register all consecutive pairs in parallel; returns
    (world poses per frame, measured edges [(i, i+1, i_T_{i+1})], per-pair
    final RMSE array).

    Frames must share one capacity; the pair count (F-1) must be
    divisible by the `pairs_axis` mesh size (pad by repeating the last
    frame if needed — duplicated pairs cost one extra slot and their
    identity result is discarded here).
    """
    from icpx.distributed.sharded_icp import sharded_register_pairs

    f = len(frames)
    if f < 2:
        return [SE3.identity()] * f, [], jnp.zeros((0,), jnp.float32)
    if config.objective == "gicp":
        from icpx.kernels.normals import estimate_covariances

        frames = [
            fr
            if fr.covs is not None
            else estimate_covariances(fr, k=max(config.k_normals, 15))
            for fr in frames
        ]

        def aux(fr):
            return fr.covs.reshape(fr.capacity, 9)

    else:
        frames = [
            fr
            if fr.normals is not None
            else estimate_normals(fr, k=config.k_normals)
            for fr in frames
        ]

        def aux(fr):
            return fr.normals

    n_pairs = f - 1
    dp = mesh.shape[pairs_axis]
    pad = (-n_pairs) % dp
    srcs = list(frames[1:]) + [frames[-1]] * pad
    tgts = list(frames[:-1]) + [frames[-1]] * pad

    res = sharded_register_pairs(
        jnp.stack([fr.xyz for fr in srcs]),
        jnp.stack([fr.mask for fr in srcs]),
        jnp.stack([aux(fr) for fr in srcs]),
        jnp.stack([fr.xyz for fr in tgts]),
        jnp.stack([fr.mask for fr in tgts]),
        jnp.stack([aux(fr) for fr in tgts]),
        config,
        mesh,
        pairs_axis=pairs_axis,
        points_axis=points_axis,
    )

    poses = [SE3.identity()]
    edges: List[Tuple[int, int, SE3]] = []
    for k in range(n_pairs):
        rel = SE3(R=res.transform.R[k], t=res.transform.t[k])
        edges.append((k, k + 1, rel))
        poses.append(poses[-1] @ rel)
    return poses, edges, res.final_rmse[:n_pairs]
