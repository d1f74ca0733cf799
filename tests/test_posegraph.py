"""Pose-graph Gauss-Newton + Schur condensation."""

import jax
import jax.numpy as jnp
import numpy as np

from icpx.geometry.se3 import SE3
from icpx.odometry.posegraph import (
    PoseGraph,
    optimize_pose_graph,
    schur_condense,
)


def _chain_gt(m, key):
    """Ground-truth chain of poses + exact consecutive edges."""
    deltas = SE3.exp(0.3 * jax.random.normal(key, (m - 1, 6)))
    poses = [SE3.identity()]
    for k in range(m - 1):
        poses.append(poses[-1] @ SE3(R=deltas.R[k], t=deltas.t[k]))
    gt = SE3(R=jnp.stack([p.R for p in poses]), t=jnp.stack([p.t for p in poses]))
    edges = [
        (k, k + 1, SE3(R=deltas.R[k], t=deltas.t[k])) for k in range(m - 1)
    ]
    return gt, edges


def test_recovers_chain_from_noisy_init(key):
    m = 12
    k1, k2 = jax.random.split(key)
    gt, edges = _chain_gt(m, k1)
    # loop closure edge first->last (true relative pose)
    loop = SE3(R=gt.R[0], t=gt.t[0]).inverse() @ SE3(R=gt.R[-1], t=gt.t[-1])
    edges.append((0, m - 1, loop))
    # perturb all but the anchor
    noise = SE3.exp(0.1 * jax.random.normal(k2, (m, 6)))
    init = SE3(
        R=jnp.concatenate([gt.R[:1], (gt.R @ noise.R)[1:]]),
        t=jnp.concatenate([gt.t[:1], (gt.t + noise.t)[1:]]),
    )
    graph = PoseGraph.from_edge_list(init, edges)
    opt, chi2 = optimize_pose_graph(graph, iters=10)
    # chi2 decreases and final poses match GT (up to anchor gauge)
    assert float(chi2[-1]) < float(chi2[0]) * 1e-4
    rot_err = np.asarray(SE3(R=opt.R, t=opt.t).distance_to(gt)[0])
    t_err = np.asarray(SE3(R=opt.R, t=opt.t).distance_to(gt)[1])
    assert rot_err.max() < 2e-3, rot_err.max()
    assert t_err.max() < 2e-3, t_err.max()


def test_consistent_graph_stays_put(key):
    m = 6
    gt, edges = _chain_gt(m, key)
    graph = PoseGraph.from_edge_list(gt, edges)
    opt, chi2 = optimize_pose_graph(graph, iters=3)
    assert float(chi2[0]) < 1e-8
    assert np.allclose(np.asarray(opt.t), np.asarray(gt.t), atol=1e-4)


def test_edge_weights_downweight_bad_edge(key):
    m = 8
    k1, k2 = jax.random.split(key)
    gt, edges = _chain_gt(m, k1)
    # corrupt one edge but give it (near) zero weight
    bad = SE3.exp(jnp.asarray([0.5, -0.3, 0.2, 1.0, -1.0, 0.5]))
    edges.append((1, 5, bad))
    weights = [1.0] * (len(edges) - 1) + [1e-6]
    noise = SE3.exp(0.05 * jax.random.normal(k2, (m, 6)))
    init = SE3(R=gt.R @ noise.R, t=gt.t + noise.t)
    graph = PoseGraph.from_edge_list(init, edges, weights)
    opt, _ = optimize_pose_graph(graph, iters=10)
    # the anchor was initialized noisy: compare in the anchor's gauge
    rel_opt = SE3(R=opt.R[0], t=opt.t[0]).inverse() @ SE3(R=opt.R, t=opt.t)
    rel_gt = SE3(R=gt.R[0], t=gt.t[0]).inverse() @ gt
    _, t_err = rel_opt.distance_to(rel_gt)
    assert np.asarray(t_err).max() < 5e-3


def test_schur_condense_matches_full_solve(rng):
    n, keep = 30, 18
    A = rng.normal(size=(n, n)).astype(np.float32)
    H = A @ A.T + n * np.eye(n, dtype=np.float32)
    b = rng.normal(size=(n,)).astype(np.float32)
    x_full = np.linalg.solve(H, b)
    Hs, bs = schur_condense(jnp.asarray(H), jnp.asarray(b), keep)
    x_kept = np.linalg.solve(np.asarray(Hs), np.asarray(bs))
    assert np.allclose(x_kept, x_full[:keep], atol=1e-3)
