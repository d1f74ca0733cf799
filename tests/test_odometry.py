"""End-to-end odometry on a simulated LiDAR sequence: trajectory recovery
(ATE), keyframing, pose-graph refinement, and the KITTI ingest formats."""

import numpy as np
import pytest

from icpx.geometry.se3 import SE3
from icpx.odometry.evaluate import ate_rmse, rpe
from icpx.odometry.frontend import OdometryConfig, run_odometry
from icpx.odometry.kitti import (
    load_kitti_poses,
    load_kitti_scan,
    make_trajectory,
    make_world,
    simulate_scans,
)
from icpx.odometry.posegraph import PoseGraph, optimize_pose_graph
from icpx.registration.icp import ICPConfig


@pytest.fixture(scope="module")
def sim_sequence():
    world = make_world(n_points=60000, extent=30.0, seed=0)
    traj = make_trajectory(10, speed=0.6, turn=0.04)
    frames = simulate_scans(
        world, traj, max_range=18.0, points_per_scan=3072, noise=0.01, seed=1
    )
    return frames, traj


def test_odometry_recovers_trajectory(sim_sequence):
    frames, gt = sim_sequence
    cfg = OdometryConfig(
        icp=ICPConfig(
            objective="symmetric",
            max_iters=12,
            diff_threshold=0.0,
            rmse_change_tol=1e-6,
            robust="huber",
            max_corr_dist=2.0,
        ),
        keyframe_trans=1.0,
        keyframe_rot=0.2,
    )
    res = run_odometry(frames, cfg)
    assert len(res.poses) == len(frames)
    ate = ate_rmse(res.poses, gt)
    assert ate < 0.05, f"ATE {ate}"
    t_rpe, r_rpe = rpe(res.poses, gt)
    assert t_rpe < 0.05 and r_rpe < 0.02
    assert res.is_keyframe[0]
    assert len(res.edges) >= 1


def test_odometry_posegraph_refinement(sim_sequence):
    frames, gt = sim_sequence
    cfg = OdometryConfig(
        icp=ICPConfig(
            objective="symmetric",
            max_iters=10,
            diff_threshold=0.0,
            rmse_change_tol=1e-6,
            robust="huber",
            max_corr_dist=2.0,
        ),
        keyframe_trans=0.4,  # denser keyframes -> more edges
    )
    res = run_odometry(frames, cfg)
    import jax.numpy as jnp

    kf = res.keyframe_indices
    if len(kf) < 3 or len(res.edges) < 2:
        pytest.skip("not enough keyframes for a graph")
    kf_poses = SE3(
        R=jnp.stack([res.poses[i].R for i in kf]),
        t=jnp.stack([res.poses[i].t for i in kf]),
    )
    remap = {f: i for i, f in enumerate(kf)}
    edges = [
        (remap[i], remap[j], T)
        for (i, j, T) in res.edges
        if i in remap and j in remap
    ]
    graph = PoseGraph.from_edge_list(kf_poses, edges)
    opt, chi2 = optimize_pose_graph(graph, iters=5)
    assert np.isfinite(np.asarray(chi2)).all()
    assert float(chi2[-1]) <= float(chi2[0]) + 1e-6


def test_kitti_scan_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(500, 4)).astype(np.float32)
    path = tmp_path / "000000.bin"
    pts.tofile(path)
    back = load_kitti_scan(path)
    assert back.shape == (500, 3)
    assert np.allclose(back, pts[:, :3])


def test_kitti_poses_roundtrip(tmp_path, key):
    poses = SE3.random(key, batch_shape=(5,))
    lines = []
    for k in range(5):
        m = np.concatenate(
            [np.asarray(poses.R[k]), np.asarray(poses.t[k])[:, None]], axis=1
        )
        lines.append(" ".join(f"{v:.9g}" for v in m.reshape(-1)))
    path = tmp_path / "00.txt"
    path.write_text("\n".join(lines) + "\n")
    back = load_kitti_poses(path)
    assert len(back) == 5
    assert np.allclose(np.asarray(back[2].R), np.asarray(poses.R[2]), atol=1e-6)


def test_ate_invariance(key):
    """ATE after alignment is invariant to a global rigid motion."""
    import jax

    k1, k2 = jax.random.split(key)
    gt = [SE3.random(k) for k in jax.random.split(k1, 6)]
    offset = SE3.random(k2)
    est = [offset @ p for p in gt]
    assert ate_rmse(est, gt) < 1e-4