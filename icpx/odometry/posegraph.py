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
    return _optimize_impl(
        graph,
        iters=iters,
        damping=damping,
        anchor=anchor,
        anchor_weight=anchor_weight,
    )


def _optimize_impl(
    graph: PoseGraph,
    *,
    iters: int,
    damping: float,
    anchor: int,
    anchor_weight: float,
    reduce=lambda x: x,
    anchor_scale: float = 1.0,
) -> Tuple[SE3, jax.Array]:
    """Shared GN core. `reduce` sums the assembled (H, b, chi2) across an
    edge partition (identity on a single device); `anchor_scale` divides
    the gauge prior so psum'd shards contribute it exactly once."""
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
        # (scaled so a psum across edge shards applies it exactly once)
        H = H.at[anchor, anchor].add(
            anchor_scale * anchor_weight * jnp.eye(6, dtype=jnp.float32)
        )
        chi2_local = jnp.sum(graph.edge_weight * jnp.sum(r * r, axis=1))
        H, b, chi2 = reduce((H, b, chi2_local))

        Hd = H.transpose(0, 2, 1, 3).reshape(6 * m, 6 * m)
        bd = b.reshape(6 * m)
        diag = jnp.diagonal(Hd)
        Hd = Hd + jnp.diag(damping * diag + 1e-9)
        delta = -jnp.linalg.solve(Hd, bd).reshape(m, 6)
        new_poses = jax.vmap(lambda R, t, d: (SE3(R=R, t=t) @ SE3.exp(d)))(
            poses.R, poses.t, delta
        )
        return SE3(R=new_poses.R, t=new_poses.t), chi2

    def body(poses, _):
        new_poses, chi2 = gn_step(poses)
        return new_poses, chi2

    poses, chi2s = jax.lax.scan(body, graph.poses, None, length=iters)
    return poses, chi2s


def optimize_pose_graph_sharded(
    graph: PoseGraph,
    mesh,
    *,
    iters: int = 10,
    damping: float = 1e-6,
    anchor: int = 0,
    anchor_weight: float = 1e6,
    edge_axis: str = "points",
) -> Tuple[SE3, jax.Array]:
    """Edge-sharded Gauss-Newton (SURVEY P9: DP over edges).

    Each device linearizes its shard of edges and assembles a partial
    (6M, 6M) normal system; one `psum` merges them and every device runs
    the identical dense solve — the same sufficient-statistics pattern as
    the sharded ICP JtJ. Edge count must be divisible by the axis size
    (pad with zero-weight self-edges via `pad_edges`).
    """
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[edge_axis]
    e = graph.n_edges
    if e % n_dev:
        raise ValueError(
            f"{e} edges not divisible by '{edge_axis}' size {n_dev}; "
            "pad with pad_edges()"
        )
    m = graph.n_nodes

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None, None),  # poses R (replicated)
            P(None, None),  # poses t
            P(edge_axis),  # edge i
            P(edge_axis),  # edge j
            P(edge_axis, None, None),  # meas R
            P(edge_axis, None),  # meas t
            P(edge_axis),  # weights
        ),
        out_specs=(P(None, None, None), P(None, None), P(None)),
        check_vma=False,
    )
    def run(pR, pt, ei, ej, mR, mt, w):
        local = PoseGraph(
            poses=SE3(R=pR, t=pt),
            edge_i=ei,
            edge_j=ej,
            edge_meas=SE3(R=mR, t=mt),
            edge_weight=w,
        )
        poses, chi2 = _optimize_impl(
            local,
            iters=iters,
            damping=damping,
            anchor=anchor,
            anchor_weight=anchor_weight,
            reduce=lambda x: jax.lax.psum(x, edge_axis),
            anchor_scale=1.0 / n_dev,  # each shard adds its 1/n share
        )
        return poses.R, poses.t, chi2

    R, t, chi2 = run(
        graph.poses.R,
        graph.poses.t,
        graph.edge_i,
        graph.edge_j,
        graph.edge_meas.R,
        graph.edge_meas.t,
        graph.edge_weight,
    )
    return SE3(R=R, t=t), chi2


def pad_edges(graph: PoseGraph, multiple: int) -> PoseGraph:
    """Pad the edge list to a multiple with zero-weight self-edges."""
    e = graph.n_edges
    pad = (-e) % multiple
    if pad == 0:
        return graph
    eye_R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (pad, 3, 3))
    return PoseGraph(
        poses=graph.poses,
        edge_i=jnp.concatenate([graph.edge_i, jnp.zeros(pad, jnp.int32)]),
        edge_j=jnp.concatenate([graph.edge_j, jnp.zeros(pad, jnp.int32)]),
        edge_meas=SE3(
            R=jnp.concatenate([graph.edge_meas.R, eye_R]),
            t=jnp.concatenate(
                [graph.edge_meas.t, jnp.zeros((pad, 3), jnp.float32)]
            ),
        ),
        edge_weight=jnp.concatenate(
            [graph.edge_weight, jnp.zeros(pad, jnp.float32)]
        ),
    )


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
