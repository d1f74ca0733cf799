"""Pose-graph backend: batched Gauss-Newton over SE(3) with Schur
marginalization (SURVEY §2.3 P9).

Nodes are keyframe poses, edges are relative-pose measurements from the
frontend (or loop closures). Everything is batched and jit-compiled:

  * per-edge residual r_e = log(meas^-1 . (T_i E(d_i))^-1 . (T_j E(d_j)))
    with E = SE3.exp; the (6,6) Jacobian blocks w.r.t. d_i, d_j come from
    `jax.jacfwd` vmapped over edges — exact linearization, no hand-derived
    adjoint approximations to get wrong;
  * the 6Mx6M normal system assembles by scatter-add of edge blocks
    (edges are the DP axis: per-edge contributions are plain sums, so a
    sharded variant just psums them — same pattern as the ICP JtJ);
  * gauge freedom fixed by a strong prior on the anchor node;
  * `schur_condense` eliminates a chosen block of nodes from (H, b) via
    the Schur complement — the sliding-window marginalization primitive.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from icpx.geometry.se3 import SE3


@struct.dataclass
class PoseGraph:
    poses: SE3  # batched (M,)
    edge_i: jax.Array  # (E,) int32
    edge_j: jax.Array  # (E,) int32
    edge_meas: SE3  # batched (E,)  measured i_T_j
    edge_weight: jax.Array  # (E,) scalar information weights

    @property
    def n_nodes(self) -> int:
        return self.poses.t.shape[0]

    @property
    def n_edges(self) -> int:
        return self.edge_i.shape[0]

    @classmethod
    def from_edge_list(cls, poses: SE3, edges, weights=None) -> "PoseGraph":
        """edges: sequence of (i, j, SE3 i_T_j) (host-side constructor)."""
        ei = jnp.asarray([e[0] for e in edges], jnp.int32)
        ej = jnp.asarray([e[1] for e in edges], jnp.int32)
        R = jnp.stack([e[2].R for e in edges])
        t = jnp.stack([e[2].t for e in edges])
        w = (
            jnp.ones((len(edges),), jnp.float32)
            if weights is None
            else jnp.asarray(weights, jnp.float32)
        )
        return cls(
            poses=poses, edge_i=ei, edge_j=ej, edge_meas=SE3(R=R, t=t), edge_weight=w
        )


def _edge_residual(
    Ti: SE3, Tj: SE3, meas: SE3, di: jax.Array, dj: jax.Array
) -> jax.Array:
    """(6,) residual of one edge at local perturbations (di, dj)."""
    Ti_p = Ti @ SE3.exp(di)
    Tj_p = Tj @ SE3.exp(dj)
    err = meas.inverse() @ Ti_p.inverse() @ Tj_p
    return err.log()


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    graph: PoseGraph,
    *,
    iters: int = 10,
    damping: float = 1e-6,
    anchor: int = 0,
    anchor_weight: float = 1e6,
) -> Tuple[SE3, jax.Array]:
    """Damped Gauss-Newton. Returns (optimized poses, per-iter chi2)."""
    m = graph.n_nodes

    zero6 = jnp.zeros((6,), jnp.float32)

    def linearize(poses: SE3):
        Ti = SE3(R=poses.R[graph.edge_i], t=poses.t[graph.edge_i])
        Tj = SE3(R=poses.R[graph.edge_j], t=poses.t[graph.edge_j])

        r = jax.vmap(
            lambda a_R, a_t, b_R, b_t, m_R, m_t: _edge_residual(
                SE3(R=a_R, t=a_t),
                SE3(R=b_R, t=b_t),
                SE3(R=m_R, t=m_t),
                zero6,
                zero6,
            )
        )(Ti.R, Ti.t, Tj.R, Tj.t, graph.edge_meas.R, graph.edge_meas.t)

        Ji = jax.vmap(
            lambda a_R, a_t, b_R, b_t, m_R, m_t: jax.jacfwd(
                lambda d: _edge_residual(
                    SE3(R=a_R, t=a_t), SE3(R=b_R, t=b_t), SE3(R=m_R, t=m_t), d, zero6
                )
            )(zero6)
        )(Ti.R, Ti.t, Tj.R, Tj.t, graph.edge_meas.R, graph.edge_meas.t)
        Jj = jax.vmap(
            lambda a_R, a_t, b_R, b_t, m_R, m_t: jax.jacfwd(
                lambda d: _edge_residual(
                    SE3(R=a_R, t=a_t), SE3(R=b_R, t=b_t), SE3(R=m_R, t=m_t), zero6, d
                )
            )(zero6)
        )(Ti.R, Ti.t, Tj.R, Tj.t, graph.edge_meas.R, graph.edge_meas.t)
        return r, Ji, Jj

    def gn_step(poses: SE3):
        r, Ji, Jj = linearize(poses)
        w = graph.edge_weight[:, None, None]
        ei, ej = graph.edge_i, graph.edge_j

        H = jnp.zeros((m, m, 6, 6), jnp.float32)
        H = H.at[ei, ei].add(w * jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[ei, ej].add(w * jnp.einsum("eki,ekj->eij", Ji, Jj))
        H = H.at[ej, ei].add(w * jnp.einsum("eki,ekj->eij", Jj, Ji))
        H = H.at[ej, ej].add(w * jnp.einsum("eki,ekj->eij", Jj, Jj))
        b = jnp.zeros((m, 6), jnp.float32)
        wr = graph.edge_weight[:, None] * r
        b = b.at[ei].add(jnp.einsum("eki,ek->ei", Ji, wr))
        b = b.at[ej].add(jnp.einsum("eki,ek->ei", Jj, wr))

        # gauge: strong prior pinning the anchor node at its current pose
        H = H.at[anchor, anchor].add(
            anchor_weight * jnp.eye(6, dtype=jnp.float32)
        )

        Hd = H.transpose(0, 2, 1, 3).reshape(6 * m, 6 * m)
        bd = b.reshape(6 * m)
        diag = jnp.diagonal(Hd)
        Hd = Hd + jnp.diag(damping * diag + 1e-9)
        delta = -jnp.linalg.solve(Hd, bd).reshape(m, 6)
        new_poses = jax.vmap(lambda R, t, d: (SE3(R=R, t=t) @ SE3.exp(d)))(
            poses.R, poses.t, delta
        )
        chi2 = jnp.sum(graph.edge_weight * jnp.sum(r * r, axis=1))
        return SE3(R=new_poses.R, t=new_poses.t), chi2

    def body(poses, _):
        new_poses, chi2 = gn_step(poses)
        return new_poses, chi2

    poses, chi2s = jax.lax.scan(body, graph.poses, None, length=iters)
    return poses, chi2s


@partial(jax.jit, static_argnames=("n_keep",))
def schur_condense(
    H: jax.Array, b: jax.Array, n_keep: int
) -> Tuple[jax.Array, jax.Array]:
    """Schur-complement reduction of the trailing block.

    Given the (N, N) system partitioned as [[A, B], [B^T, C]] with the
    first `n_keep` rows kept and the rest marginalized, returns
    (A - B C^-1 B^T, b_a - B C^-1 b_c). `n_keep` is static.
    """
    A = H[:n_keep, :n_keep]
    B = H[:n_keep, n_keep:]
    C = H[n_keep:, n_keep:]
    C = C + 1e-9 * jnp.eye(C.shape[0], dtype=H.dtype)
    CinvBt = jnp.linalg.solve(C, B.T)
    Cinvbc = jnp.linalg.solve(C, b[n_keep:])
    return A - B @ CinvBt, b[:n_keep] - B @ Cinvbc
