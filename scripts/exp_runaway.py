"""Smooth-ground runaway scenario (NOTES round-1): calibrate the adaptive
velocity smoothing default. CPU-forced."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from icpx.geometry.se3 import SE3
from icpx.odometry.frontend import OdometryConfig, run_odometry
from icpx.odometry.kitti import make_trajectory, make_world, simulate_scans
from icpx.registration.icp import ICPConfig


def max_rel_err(poses, gt):
    errs = []
    for k in range(1, len(poses)):
        est_rel = poses[k - 1].inverse() @ poses[k]
        gt_rel = gt[k - 1].inverse() @ gt[k]
        _, terr = est_rel.distance_to(gt_rel)
        errs.append(float(terr))
    return max(errs)


world = make_world(n_points=60000, extent=40.0, seed=4, n_posts=3,
                   ground_frac=0.95)
gt = make_trajectory(30, speed=1.0, turn=0.02)
frames = simulate_scans(world, gt, max_range=18.0, points_per_scan=2048,
                        noise=0.02, seed=5)
gt0 = [gt[0].inverse() @ g for g in gt]

icp = ICPConfig(objective="symmetric", max_iters=15, diff_threshold=0.0,
                rmse_change_tol=1e-6, robust="huber", max_corr_dist=3.0)

for name, kw in {
    "raw (no mitigation)": dict(adaptive_velocity=False),
    "fixed 0.7": dict(adaptive_velocity=False, velocity_damping=0.7),
    "adaptive (default)": dict(),
}.items():
    cfg = OdometryConfig(icp=icp, keyframe_trans=1.5, keyframe_rot=0.3, **kw)
    res = run_odometry(frames, cfg)
    print(f"{name:24s} max_rel_err={max_rel_err(res.poses, gt0):.3f} m",
          flush=True)
