"""Cloud-level transform application & synthetic perturbation fixtures.

Replaces `pcl::transformPointCloud` + the reference's own `applyTransform`
(`func.cpp:104-121`) and the ground-truth generator tutorial
(`matrix-transform.cpp:79-114`). Points get the full rigid transform;
normals are rotated only (the reference translates them too — bug at
`myicp.cpp:137`, see SURVEY.md "bugs to NOT replicate").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icpx.cloud import PointCloud
from icpx.geometry.se3 import SE3


def apply_transform(points: jax.Array, transform: SE3) -> jax.Array:
    """Rigid-transform (N, 3) points."""
    return transform.apply(points)


def rotate_vectors(vectors: jax.Array, transform: SE3) -> jax.Array:
    """Rotate (N, 3) direction vectors (normals): rotation only."""
    return transform.rotate(vectors)


def transform_cloud(cloud: PointCloud, transform: SE3) -> PointCloud:
    """Transform a cloud; normals (if any) are rotated, not translated."""
    out = cloud.with_xyz(transform.apply(cloud.xyz))
    if cloud.normals is not None:
        out = out.with_normals(transform.rotate(cloud.normals))
    return out


def make_rigid_perturbation(
    axis=(0.0, 0.0, 1.0),
    angle: float = jnp.pi / 4,
    translation=(2.5, 0.0, 0.0),
) -> SE3:
    """The demo ground-truth transform family.

    Defaults reproduce the reference fixture: Rz(pi/4) then translate
    (2.5, 0, 0) — the generator at `main.cpp:44-47` /
    `matrix-transform.cpp:82-105` that manufactured `cat_out.pcd`.
    """
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis)
    return SE3.from_axis_angle(axis, jnp.float32(angle), jnp.asarray(translation, jnp.float32))


def perturb_cloud(
    cloud: PointCloud,
    key: jax.Array,
    *,
    max_angle: float = 0.3,
    max_trans: float = 0.5,
    noise_sigma: float = 0.0,
) -> tuple[PointCloud, SE3]:
    """Random rigid perturbation (+ optional Gaussian noise) of a cloud.

    Returns (perturbed cloud, ground-truth SE3 mapping original -> perturbed).
    Formalizes the reference's manual fixture-generation workflow (§3.4).
    """
    k1, k2 = jax.random.split(key)
    gt = SE3.random(k1, max_angle=max_angle, max_trans=max_trans)
    out = transform_cloud(cloud, gt)
    if noise_sigma > 0.0:
        noise = noise_sigma * jax.random.normal(k2, out.xyz.shape)
        out = out.with_xyz(out.xyz + noise)
    return out, gt
