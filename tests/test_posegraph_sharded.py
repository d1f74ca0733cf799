"""Edge-sharded pose-graph GN equals the single-device optimizer."""

import jax
import jax.numpy as jnp
import numpy as np

from icpx.distributed.mesh import make_mesh
from icpx.geometry.se3 import SE3
from icpx.odometry.posegraph import (
    PoseGraph,
    optimize_pose_graph,
    optimize_pose_graph_sharded,
    pad_edges,
)


def _graph(key, m=10):
    deltas = SE3.exp(0.25 * jax.random.normal(key, (m - 1, 6)))
    poses = [SE3.identity()]
    for k in range(m - 1):
        poses.append(poses[-1] @ SE3(R=deltas.R[k], t=deltas.t[k]))
    gt = SE3(R=jnp.stack([p.R for p in poses]), t=jnp.stack([p.t for p in poses]))
    edges = [(k, k + 1, SE3(R=deltas.R[k], t=deltas.t[k])) for k in range(m - 1)]
    loop = SE3(R=gt.R[0], t=gt.t[0]).inverse() @ SE3(R=gt.R[-1], t=gt.t[-1])
    edges.append((0, m - 1, loop))
    noise = SE3.exp(0.08 * jax.random.normal(jax.random.fold_in(key, 1), (m, 6)))
    init = SE3(
        R=jnp.concatenate([gt.R[:1], (gt.R @ noise.R)[1:]]),
        t=jnp.concatenate([gt.t[:1], (gt.t + noise.t)[1:]]),
    )
    return PoseGraph.from_edge_list(init, edges), gt


def test_sharded_matches_single(key):
    graph, gt = _graph(key, m=10)
    mesh = make_mesh(axis_names=("points",))
    padded = pad_edges(graph, 8)
    opt_s, chi2_s = optimize_pose_graph_sharded(padded, mesh, iters=8)
    opt_1, chi2_1 = optimize_pose_graph(graph, iters=8)
    assert np.allclose(np.asarray(opt_s.t), np.asarray(opt_1.t), atol=1e-4)
    assert np.allclose(np.asarray(opt_s.R), np.asarray(opt_1.R), atol=1e-4)
    assert np.allclose(np.asarray(chi2_s), np.asarray(chi2_1), rtol=1e-3, atol=1e-6)
    # and it solves the problem
    _, t_err = opt_s.distance_to(gt)
    assert np.asarray(t_err).max() < 5e-3


def test_pad_edges_zero_weight_is_noop(key):
    graph, _ = _graph(key, m=6)
    padded = pad_edges(graph, 8)
    assert padded.n_edges % 8 == 0
    o1, _ = optimize_pose_graph(graph, iters=5)
    o2, _ = optimize_pose_graph(padded, iters=5)
    assert np.allclose(np.asarray(o1.t), np.asarray(o2.t), atol=1e-5)