"""Residual linearizations -> 6x6 normal equations (psum-reducible).

Rebuilds the reference's `calculateMatrixNotation` (`func.cpp:43-60`) — the
Rusinkiewicz-2019 symmetric point-to-plane rows
    M_i = (p_i + q_i) x (n_p_i + n_q_i),   N_i = n_p_i + n_q_i,
    c_i = (p_i - q_i) . (n_p_i + n_q_i)
— but, following the paper rather than the reference's shortcuts:
  * points are demeaned by their (weighted) centroids before building the
    system (the reference skips this, `func.cpp:48-59`);
  * the full joint 6-variable system J^T J x = -J^T r is produced, instead
    of the reference's two alternating 3-variable solves (`func.cpp:85-88`).

The outputs (JtJ (6,6), Jtr (6,), scalar stats) are plain sums over points,
so sharded execution just `psum`s them over the point axis — this is the
tensor-parallel collective of the framework (SURVEY.md §2.3 P2).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


class NormalEquations(NamedTuple):
    """Sufficient statistics of a linearized registration step.

    All fields are per-shard partial sums: psum-able across devices.
    """

    JtJ: jax.Array  # (6, 6)
    Jtr: jax.Array  # (6,)
    sq_residual_sum: jax.Array  # scalar: sum w * r^2
    weight_sum: jax.Array  # scalar: sum w
    p_centroid_num: jax.Array  # (3,) sum w * p  (for demeaning across shards)
    q_centroid_num: jax.Array  # (3,) sum w * q


def build_normal_equations_symmetric(
    p: jax.Array,
    q: jax.Array,
    n_p: jax.Array,
    n_q: jax.Array,
    w: jax.Array,
    p_bar: jax.Array,
    q_bar: jax.Array,
) -> NormalEquations:
    """Symmetric point-to-plane system for given correspondences.

    Args:
      p: (N, 3) source points (current frame).
      q: (N, 3) corresponding target points.
      n_p / n_q: (N, 3) source/target normals.
      w: (N,) weights (robust * validity mask).
      p_bar / q_bar: (3,) centroids to demean with (pass the *global*
        weighted centroids when sharding so every shard demeans alike).

    Residual (Rusinkiewicz 2019, eq. linearized):
      r_i = (p~_i - q~_i) . n_i,  J_i = [ (p~_i + q~_i) x n_i , n_i ]
    with n_i = n_p_i + n_q_i and p~, q~ demeaned.
    """
    pt = p - p_bar[None, :]
    qt = q - q_bar[None, :]
    n = n_p + n_q
    r = jnp.sum((pt - qt) * n, axis=-1)  # (N,)
    Mrow = jnp.cross(pt + qt, n)  # (N, 3)
    J = jnp.concatenate([Mrow, n], axis=-1)  # (N, 6)
    return _reduce(J, r, w, p, q)


def build_normal_equations_p2plane(
    p: jax.Array,
    q: jax.Array,
    n_q: jax.Array,
    w: jax.Array,
) -> NormalEquations:
    """Classic point-to-plane: r_i = (p_i - q_i) . n_q_i,
    J_i = [ p_i x n_q_i , n_q_i ] (small-angle about the origin)."""
    r = jnp.sum((p - q) * n_q, axis=-1)
    J = jnp.concatenate([jnp.cross(p, n_q), n_q], axis=-1)
    return _reduce(J, r, w, p, q)


def inv3x3(M: jax.Array) -> jax.Array:
    """Batched explicit 3x3 inverse (cofactor form; VPU-friendly)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > _EPS, det, _EPS)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def build_normal_equations_gicp(
    p: jax.Array,
    q: jax.Array,
    cov_p: jax.Array,  # (N, 3, 3) source covariances IN THE CURRENT FRAME
    cov_q: jax.Array,  # (N, 3, 3) matched target covariances
    w: jax.Array,
    p_bar: jax.Array,
) -> NormalEquations:
    """Generalized ICP (Segal et al. 2009, plane-to-plane).

    Residual r_i = p_i - q_i with per-pair information
    W_i = (C_q_i + C_p_i)^-1; Jacobian about the demeaned source point
    J_i = [-[p~_i]_x | I]. The 6x6 system psums like every other
    objective. Reconstruction: T = T(p_bar) (exp(w), t) T(-p_bar).
    """
    from icpx.geometry.se3 import skew

    W = inv3x3(cov_q + cov_p)  # (N, 3, 3)
    r = p - q
    pt = p - p_bar[None, :]
    S = skew(pt)  # (N, 3, 3) = [p~]_x
    wW = W * w[:, None, None]
    # J = [-S | I]  ->  JtWJ blocks
    StW = jnp.einsum("nji,njk->nik", S, wW)  # S^T (wW)
    H_rr = jnp.einsum("nij,njk->ik", StW, S)
    H_rt = -jnp.sum(StW, axis=0)
    H_tt = jnp.sum(wW, axis=0)
    g_r = -jnp.einsum("nij,nj->i", StW, r)
    g_t = jnp.einsum("nij,nj->i", wW, r)
    JtJ = jnp.block([[H_rr, H_rt], [H_rt.T, H_tt]])
    Jtr = jnp.concatenate([g_r, g_t])
    sq = jnp.sum(w * jnp.einsum("ni,nij,nj->n", r, W, r))
    return NormalEquations(
        JtJ=JtJ,
        Jtr=Jtr,
        sq_residual_sum=sq,
        weight_sum=jnp.sum(w),
        p_centroid_num=jnp.sum(p * w[:, None], axis=0),
        q_centroid_num=jnp.sum(q * w[:, None], axis=0),
    )


def _reduce(J: jax.Array, r: jax.Array, w: jax.Array, p, q) -> NormalEquations:
    wJ = J * w[:, None]
    return NormalEquations(
        JtJ=wJ.T @ J,
        Jtr=wJ.T @ r,
        sq_residual_sum=jnp.sum(w * r * r),
        weight_sum=jnp.sum(w),
        p_centroid_num=jnp.sum(p * w[:, None], axis=0),
        q_centroid_num=jnp.sum(q * w[:, None], axis=0),
    )


def weighted_centroids(
    p: jax.Array, q: jax.Array, w: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Weighted centroids of corresponded pairs (local / single shard)."""
    denom = jnp.maximum(jnp.sum(w), _EPS)
    return (
        jnp.sum(p * w[:, None], axis=0) / denom,
        jnp.sum(q * w[:, None], axis=0) / denom,
    )


# ---- robust weighting ---------------------------------------------------------


def robust_weight(r_abs: jax.Array, kind: str, scale: jax.Array) -> jax.Array:
    """IRLS weights for |residual| under a robust kernel.

    The reference has no outlier handling at all (unweighted LLS,
    `func.cpp:64-73`); robust kernels are required once correspondences are
    real NN matches instead of index-aligned rows.
    """
    s = jnp.maximum(scale, _EPS)
    x = r_abs / s
    if kind == "none":
        return jnp.ones_like(r_abs)
    if kind == "huber":
        return jnp.minimum(1.0, 1.0 / jnp.maximum(x, _EPS))
    if kind == "tukey":
        u = jnp.clip(1.0 - x * x, 0.0, 1.0)
        return u * u
    if kind == "welsch":
        return jnp.exp(-x * x)
    if kind == "cauchy":
        return 1.0 / (1.0 + x * x)
    raise ValueError(f"unknown robust kernel: {kind}")


def mad_scale(r_abs: jax.Array, w_valid: jax.Array) -> jax.Array:
    """1.4826 * median(|r|) over valid entries — auto robust scale.

    Implemented as a masked median via sort (static shape): invalid entries
    are pushed to +inf and the median index is computed from the count.
    """
    n = r_abs.shape[0]
    big = jnp.float32(jnp.inf)
    vals = jnp.sort(jnp.where(w_valid > 0, r_abs, big))
    cnt = jnp.sum((w_valid > 0).astype(jnp.int32))
    mid = jnp.maximum(cnt // 2, 0)
    med = vals[jnp.clip(mid, 0, n - 1)]
    med = jnp.where(jnp.isfinite(med), med, 1.0)
    return 1.4826 * jnp.maximum(med, _EPS)
