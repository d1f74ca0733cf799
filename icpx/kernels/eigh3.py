"""Closed-form 3x3 symmetric eigendecomposition, batched & branchless.

The reference gets its normal PCA from PCL (`pcl::NormalEstimation`,
`myicp.cpp:157-167`), which uses a closed-form 3x3 solver internally. A
LAPACK-style iterative eigensolver is a poor fit for the VPU; the analytic
trigonometric method (Smith 1961 / Eberly) is pure elementwise math that
`vmap`s over millions of neighborhoods. fp32 throughout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def eigh3x3(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Eigenvalues (ascending) of symmetric (..., 3, 3) matrices.

    Returns (eigvals (..., 3) ascending, eigvecs (..., 3, 3) with
    eigvecs[..., :, i] the i-th eigenvector).
    """
    w = eigvalsh3x3(A)
    v0 = _eigenvector_for(A, w[..., 0])
    v2 = _eigenvector_for(A, w[..., 2])
    # Middle eigenvector: orthogonal complement (robust for distinct eigs;
    # for repeated eigs any orthonormal completion is valid).
    v1 = jnp.cross(v2, v0)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), _EPS)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return w, V


def eigvalsh3x3(A: jax.Array) -> jax.Array:
    """Eigenvalues (ascending) of symmetric (..., 3, 3) via the
    trigonometric closed form (branchless, diag-safe)."""
    A = jnp.asarray(A)
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    p_safe = jnp.maximum(p, _EPS)
    # det(B)/2 with B = (A - qI)/p
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    ) / (p_safe * p_safe * p_safe)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    # Degenerate (p ~ 0): matrix is (numerically) q*I.
    isdiag = p < _EPS
    e_lo = jnp.where(isdiag, q, e_lo)
    e_mid = jnp.where(isdiag, q, e_mid)
    e_hi = jnp.where(isdiag, q, e_hi)
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def _eigenvector_for(A: jax.Array, lam: jax.Array) -> jax.Array:
    """Unit eigenvector of symmetric (..., 3, 3) for eigenvalue lam (...).

    Rows of (A - lam I) span the orthogonal complement of the eigenvector,
    so cross products of row pairs all lie along it; take the largest for
    numerical robustness, with a fixed fallback for the isotropic case.
    """
    eye = jnp.eye(3, dtype=A.dtype)
    M = A - lam[..., None, None] * eye
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)  # (..., 3cand, 3)
    norms = jnp.stack([n01, n02, n12], axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    vn = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    # Isotropic fallback: any unit vector is an eigenvector.
    fallback = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], A.dtype), v.shape
    )
    return jnp.where(vn > 1e-20, v / jnp.maximum(vn, _EPS), fallback)


def smallest_eigenvector_3x3(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(unit eigenvector for smallest eigenvalue, eigenvalues ascending).

    The normal-estimation primitive: the smallest-eigenvalue direction of a
    neighborhood covariance is the surface normal.
    """
    w = eigvalsh3x3(A)
    return _eigenvector_for(A, w[..., 0]), w
