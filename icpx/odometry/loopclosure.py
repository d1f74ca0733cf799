"""Loop-closure detection & verification for the pose graph.

Candidates: keyframe pairs that the odometry believes are spatially close
but are far apart in time (so drift, not adjacency, explains proximity).
Verification: a bounded ICP registration seeded from the believed
relative pose; accepted closures become weighted pose-graph edges whose
optimization pulls the drifted trajectory back (tests/test_slam.py shows
the ATE drop end-to-end).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from icpx.cloud import PointCloud
from icpx.geometry.se3 import SE3
from icpx.registration.icp import ICPConfig, register


@dataclasses.dataclass(frozen=True)
class LoopClosureConfig:
    min_separation: int = 5  # keyframes apart (time)
    max_candidate_dist: float = 3.0  # meters between believed positions
    max_candidates: int = 10
    icp: ICPConfig = ICPConfig(
        objective="symmetric",
        max_iters=15,
        diff_threshold=0.0,
        rmse_change_tol=1e-6,
        robust="huber",
    )
    # The believed relative pose carries the accumulated drift the closure
    # exists to fix — verification must converge from it, so it runs
    # coarse-to-fine by default.
    pyramid_levels: int = 2
    # Acceptance: rmse below max(accept_rmse, spacing_factor x the cloud's
    # own NN spacing). Two sparse scans of the same surface floor out at
    # the sampling spacing, not at the sensor noise — an absolute
    # threshold alone would reject perfect alignments of sparse scans.
    accept_rmse: float = 0.1
    accept_spacing_factor: float = 1.5
    min_inlier_frac: float = 0.5
    edge_weight: float = 1.0


def detect_loop_closures(
    keyframe_poses: Sequence[SE3],
    keyframe_clouds: Sequence[PointCloud],
    config: LoopClosureConfig = LoopClosureConfig(),
) -> List[Tuple[int, int, SE3, float]]:
    """Find verified loop closures among keyframes.

    Returns [(i, j, i_T_j, rmse)] edges in KEYFRAME indices, suitable for
    `PoseGraph.from_edge_list` after remapping.
    """
    m = len(keyframe_poses)
    if m < 2:
        return []
    pos = np.stack([np.asarray(p.t) for p in keyframe_poses])

    from icpx.kernels.voxel import auto_cell_size

    spacing = float(
        np.asarray(
            auto_cell_size(
                keyframe_clouds[0].xyz, keyframe_clouds[0].mask, scale=1.0
            )
        )
    )
    accept = max(config.accept_rmse, config.accept_spacing_factor * spacing)

    # candidate pairs by believed distance, excluding temporal neighbors
    cands = []
    for i in range(m):
        for j in range(i + config.min_separation, m):
            d = float(np.linalg.norm(pos[i] - pos[j]))
            if d < config.max_candidate_dist:
                cands.append((d, i, j))
    cands.sort()
    cands = cands[: config.max_candidates]

    edges = []
    for _, i, j in cands:
        # believed relative pose seeds the verification ICP
        init = keyframe_poses[i].inverse() @ keyframe_poses[j]
        if config.pyramid_levels > 1:
            from icpx.registration.pyramid import (
                PyramidConfig,
                register_pyramid,
            )

            res, _ = register_pyramid(
                keyframe_clouds[j],
                keyframe_clouds[i],
                PyramidConfig(
                    levels=config.pyramid_levels, base=config.icp
                ),
                init=init,
            )
        else:
            res = register(
                keyframe_clouds[j], keyframe_clouds[i], config.icp, init=init
            )
        rmse = float(res.final_rmse)
        n_valid = float(
            np.asarray(keyframe_clouds[j].num_valid())
        )
        inlier_frac = float(res.inlier_count) / max(n_valid, 1.0)
        if rmse < accept and inlier_frac > config.min_inlier_frac:
            edges.append((i, j, res.transform, rmse))
    return edges
