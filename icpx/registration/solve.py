"""6x6 damped solves + exact transform reconstruction.

Replaces the reference's `solveLLS` (JacobiSVD pseudo-inverse on the full
N x 3 system, `func.cpp:64-73`) with the normal-equation form: the N-point
system is reduced to 6x6 sufficient statistics (linearize.py) and solved
on-chip with Levenberg damping — O(1) instead of O(N) at the solve, and the
6x6 is exactly what `psum` ships between devices.

Transform reconstruction follows the paper (and fixes the reference's
reversed composition at `func.cpp:94-99`):
    T = T(q_bar) * R(a, theta) * T(t_til * cos(theta)) * R(a, theta) * T(-p_bar)
with theta = atan(||a_til||), a = a_til / ||a_til||.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from icpx.geometry.se3 import SE3, rotation_from_axis_angle

_EPS = 1e-12


def solve_damped_6x6(
    JtJ: jax.Array,
    Jtr: jax.Array,
    damping: float | jax.Array = 1e-6,
    degeneracy_clamp: float = 0.0,
) -> jax.Array:
    """Solve (JtJ + lambda * diag(JtJ) + eps I) x = -Jtr. Returns (..., 6).

    Levenberg-Marquardt-style multiplicative damping keeps the solve
    well-posed for degenerate geometry (planar regions -> rank-deficient
    JtJ; the reference crashes into this, see comment at `func.cpp:87`).

    With `degeneracy_clamp` > 0, the update is additionally projected off
    JtJ eigendirections whose eigenvalue is below clamp * max eigenvalue
    (Zhang & Singh "On Degeneracy of Optimization-based State Estimation"):
    in a flat objective direction ICP has no information, and moving along
    it just chases the init and the IRLS bias.
    """
    diag = jnp.diagonal(JtJ, axis1=-2, axis2=-1)
    damp = damping * diag + 1e-9
    A = JtJ + jnp.zeros_like(JtJ).at[..., jnp.arange(6), jnp.arange(6)].set(damp)
    # cho_solve is the cheap SPD path; 6x6 so cost is negligible either way.
    L, low = jax.scipy.linalg.cho_factor(A, lower=True)
    x = jax.scipy.linalg.cho_solve((L, low), -Jtr)
    if degeneracy_clamp > 0.0:
        w, V = jnp.linalg.eigh(A)
        keep = (w > degeneracy_clamp * w[..., -1:]).astype(x.dtype)
        x = jnp.einsum(
            "...ij,...j->...i",
            V,
            keep * jnp.einsum("...ij,...i->...j", V, x),
        )
    return x


def reconstruct_symmetric_transform(
    x: jax.Array, p_bar: jax.Array, q_bar: jax.Array
) -> SE3:
    """Exact SE(3) from the symmetric solve x = [a_til, t_til].

    The linearization is exact under the substitution a_til = a * tan(theta),
    translation applied between two half-rotations (Rusinkiewicz 2019 §4).
    """
    a_til, t_til = x[..., :3], x[..., 3:]
    norm_a = jnp.linalg.norm(a_til, axis=-1)
    theta = jnp.arctan(norm_a)
    axis = a_til / jnp.maximum(norm_a, _EPS)[..., None]
    # Guard the zero-rotation case with a fixed axis (angle is 0 anyway).
    axis = jnp.where(
        norm_a[..., None] > _EPS,
        axis,
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], x.dtype), axis.shape),
    )
    R_half = rotation_from_axis_angle(axis, theta)
    ct = jnp.cos(theta)[..., None]
    # T = T(q_bar) . R . T(t_til cos(theta)) . R . T(-p_bar), i.e. applied to
    # a point x:  R (R (x - p_bar) + t_til cos(theta)) + q_bar.
    first = SE3(R=R_half, t=jnp.einsum("...ij,...j->...i", R_half, -p_bar))
    second = SE3(R=R_half, t=jnp.einsum("...ij,...j->...i", R_half, t_til * ct))
    lift = SE3.identity(batch_shape=x.shape[:-1], dtype=x.dtype).replace(
        t=q_bar + jnp.zeros_like(t_til)
    )
    return lift @ second @ first


def reconstruct_about_point(x: jax.Array, p_bar: jax.Array) -> SE3:
    """SE(3) from a solve x = [omega, t] linearized about p_bar:
    p' = p_bar + R (p - p_bar) + t  =>  T = (R, t + p_bar - R p_bar)."""
    omega, t = x[..., :3], x[..., 3:]
    angle = jnp.linalg.norm(omega, axis=-1)
    axis = omega / jnp.maximum(angle, _EPS)[..., None]
    axis = jnp.where(
        angle[..., None] > _EPS,
        axis,
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], x.dtype), axis.shape),
    )
    R = rotation_from_axis_angle(axis, angle)
    full_t = t + p_bar - jnp.einsum("...ij,...j->...i", R, p_bar)
    return SE3(R=R, t=full_t)


def reconstruct_p2plane_transform(x: jax.Array) -> SE3:
    """SE(3) from the classic point-to-plane solve x = [omega, t]:
    R = exp([omega]_x) (exact exponential of the linear estimate), t as-is.
    """
    omega, t = x[..., :3], x[..., 3:]
    angle = jnp.linalg.norm(omega, axis=-1)
    axis = omega / jnp.maximum(angle, _EPS)[..., None]
    axis = jnp.where(
        angle[..., None] > _EPS,
        axis,
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], x.dtype), axis.shape),
    )
    return SE3(R=rotation_from_axis_angle(axis, angle), t=t)
