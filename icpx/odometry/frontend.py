"""Scan-to-keyframe odometry frontend.

The reference registers exactly one pair per process run (`main.cpp:8-10`);
this is the multi-scan extension (SURVEY §7 layer 5): sequential scans are
registered against the current keyframe with a constant-velocity initial
guess, new keyframes spawn when motion exceeds thresholds, and
keyframe-to-keyframe relative transforms accumulate into pose-graph edges
for the backend (`icpx.odometry.posegraph`).

All frames must share one capacity so every registration reuses the same
compiled executable.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icpx.cloud import PointCloud
from icpx.geometry.se3 import SE3
from icpx.kernels.normals import estimate_normals
from icpx.registration.icp import ICPConfig, ICPResult, register
from icpx.registration.pyramid import PyramidConfig, register_pyramid


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    icp: ICPConfig = ICPConfig(
        objective="symmetric",
        max_iters=12,
        diff_threshold=0.0,
        rmse_change_tol=1e-6,
        robust="huber",
    )
    pyramid_levels: int = 1  # 1 = single resolution
    pyramid_subsample: int = 4
    keyframe_trans: float = 0.5  # spawn keyframe beyond this motion
    keyframe_rot: float = 0.15  # radians
    constant_velocity_init: bool = True
    # Velocity-model smoothing factor (EMA in twist space; 1.0 = use the
    # raw last step, the default). In locally-degenerate scenes the raw
    # constant-velocity init forms a positive feedback loop with IRLS
    # correspondence bias (measured runaway 1.27m max rel err -> 0.04m
    # with smoothing on a smooth-ground world, NOTES.md); set ~0.5-0.7
    # there. Smoothing lags aggressive motion (large steps/turns), so it
    # is opt-in.
    velocity_damping: float = 1.0
    # "scan_to_keyframe": register against the latest keyframe cloud.
    # "scan_to_map": register against a maintained voxel map (keyframes
    # merge into it) — drifts less, costs a map insert per keyframe.
    mode: str = "scan_to_keyframe"
    map_capacity: int = 65536
    map_cell: float = 0.1
    # Motion sanity gate: a registration whose pose moved further than
    # this from its initial guess is rejected (finite-but-wrong solutions
    # snowball through the constant-velocity model into divergence); the
    # frame dead-reckons on the motion model instead. <= 0 disables.
    max_correction_trans: float = 1.0
    max_correction_rot: float = 0.5


@dataclasses.dataclass
class OdometryResult:
    poses: List[SE3]  # world_T_frame per input frame
    is_keyframe: List[bool]
    rmse: List[float]
    # pose-graph edges between consecutive keyframes:
    edges: List[Tuple[int, int, SE3]]  # (frame_i, frame_j, i_T_j)
    keyframe_indices: List[int]


def _register_pair(
    src: PointCloud, tgt: PointCloud, cfg: OdometryConfig, init: SE3
) -> ICPResult:
    if cfg.pyramid_levels > 1:
        res, _ = register_pyramid(
            src,
            tgt,
            PyramidConfig(
                levels=cfg.pyramid_levels,
                subsample=cfg.pyramid_subsample,
                base=cfg.icp,
            ),
            init=init,
        )
        return res
    return register(src, tgt, cfg.icp, init=init)


def run_odometry(
    frames: Sequence[PointCloud], config: OdometryConfig = OdometryConfig()
) -> OdometryResult:
    """Sequential odometry over sensor-frame scans.

    Returns world poses with pose[0] = identity (world = first frame).
    """
    if len(frames) == 0:
        return OdometryResult([], [], [], [], [])

    # Pre-compute normals once per frame (each frame serves as src and
    # possibly tgt later).
    frames = [
        f if f.normals is not None else estimate_normals(f, k=config.icp.k_normals)
        for f in frames
    ]

    poses: List[SE3] = [SE3.identity()]
    is_kf = [True]
    rmses = [0.0]
    edges: List[Tuple[int, int, SE3]] = []
    kf_indices = [0]

    use_map = config.mode == "scan_to_map"
    if use_map:
        from icpx.odometry.mapping import VoxelMap, insert_scan

        vmap = VoxelMap.create(config.map_capacity, config.map_cell)
        vmap = insert_scan(vmap, frames[0], SE3.identity())

    kf_cloud = frames[0]
    kf_pose = SE3.identity()
    kf_index = 0
    # kf_T_frame of the previous frame, and the last inter-frame delta.
    prev_rel = SE3.identity()
    velocity = SE3.identity()
    model_warm = False  # motion model untrustworthy until one accept
    consecutive_rejects = 0

    for k in range(1, len(frames)):
        init = prev_rel @ velocity if config.constant_velocity_init else prev_rel
        if use_map:
            # target = the world-frame map; transform is world_T_frame
            world_init = kf_pose @ init
            res = _register_pair(frames[k], vmap.as_cloud(), config, world_init)
            pose = res.transform
            rel = kf_pose.inverse() @ pose
        else:
            res = _register_pair(frames[k], kf_cloud, config, init)
            rel = res.transform  # kf_T_frame
            pose = kf_pose @ rel

        # Motion sanity gate: dead-reckon instead of accepting a jump.
        # Only once the motion model is warm (>= 1 accepted frame) — a
        # cold init IS far from the solution by construction — and with a
        # recovery valve: after 2 consecutive rejections, accept whatever
        # ICP found rather than dead-reckon into divergence forever.
        correction = init.inverse() @ rel
        corr_t = float(jnp.linalg.norm(correction.t))
        corr_r = float(correction.rotation_angle())
        finite = np.isfinite(corr_t) and np.isfinite(
            np.asarray(rel.t)
        ).all()
        gate_on = (
            config.max_correction_trans > 0
            and model_warm
            and consecutive_rejects < 2
        )
        rejected = (not finite) or (
            gate_on
            and (
                corr_t > config.max_correction_trans
                or corr_r > config.max_correction_rot
            )
        )
        if rejected:
            rel = init
            pose = kf_pose @ rel
            rmses.append(float("inf"))
            consecutive_rejects += 1
        else:
            rmses.append(float(res.final_rmse))
            consecutive_rejects = 0
            model_warm = True
        poses.append(pose)
        vel_raw = prev_rel.inverse() @ rel
        if config.velocity_damping < 1.0:
            # EMA in twist space: zero steady-state lag for constant
            # motion, attenuates the registration-error feedback loop
            b = config.velocity_damping
            velocity = SE3.exp(
                (1.0 - b) * velocity.log() + b * vel_raw.log()
            )
        else:
            velocity = vel_raw

        trans = float(jnp.linalg.norm(rel.t))
        rot = float(rel.rotation_angle())
        # rejected (dead-reckoned) frames never become keyframes or map
        # insertions: their pose is uncertain and would poison the map
        if (not rejected) and (
            trans > config.keyframe_trans or rot > config.keyframe_rot
        ):
            edges.append((kf_index, k, rel))
            kf_cloud = frames[k]
            kf_pose = pose
            kf_index = k
            kf_indices.append(k)
            is_kf.append(True)
            prev_rel = SE3.identity()
            if use_map:
                vmap = insert_scan(vmap, frames[k], pose)
        else:
            is_kf.append(False)
            prev_rel = rel

    # close the final segment so the pose graph spans the whole run
    if kf_index != len(frames) - 1:
        edges.append((kf_index, len(frames) - 1, prev_rel))

    return OdometryResult(
        poses=poses,
        is_keyframe=is_kf,
        rmse=rmses,
        edges=edges,
        keyframe_indices=kf_indices,
    )
