"""kNN + PCA surface-normal estimation.

TPU-native equivalent of `pcl::NormalEstimation` with `setKSearch(k)`
(`myicp.cpp:152-172`, k=10 at `myicp.cpp:160`): for each point, gather its
k nearest neighbors (self included, matching PCL's kNN semantics), form the
3x3 neighborhood covariance, and take the smallest-eigenvalue direction via
the closed-form solver — all batched over the whole cloud, no KD-tree.

Normals are oriented toward the viewpoint (PCL default viewpoint (0,0,0)),
which is what makes the symmetric objective's n_p + n_q sums coherent
across the two clouds.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from icpx.cloud import PointCloud
from icpx.kernels.eigh3 import smallest_eigenvector_3x3
from icpx.kernels.knn import knn


@partial(jax.jit, static_argnames=("k",))
def estimate_normals_xyz(
    xyz: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    k: int = 10,
    viewpoint=(0.0, 0.0, 0.0),
) -> Tuple[jax.Array, jax.Array]:
    """Estimate normals for (N, 3) points.

    Returns (normals (N, 3) unit, curvature (N,)) where curvature is PCL's
    surface-variation lambda_0 / (lambda_0+lambda_1+lambda_2).
    """
    n = xyz.shape[0]
    mask = jnp.ones((n,), bool) if mask is None else mask
    _, idx = knn(xyz, xyz, k, ref_mask=mask)  # (N, k) includes self (d=0)
    neigh = xyz[idx]  # (N, k, 3)
    mean = jnp.mean(neigh, axis=1, keepdims=True)
    centered = neigh - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    normal, w = smallest_eigenvector_3x3(cov)
    total = jnp.maximum(w[..., 0] + w[..., 1] + w[..., 2], 1e-20)
    curvature = jnp.maximum(w[..., 0], 0.0) / total
    # Orient toward viewpoint: flip if n . (vp - p) < 0.
    vp = jnp.asarray(viewpoint, xyz.dtype)
    flip = jnp.sum(normal * (vp[None, :] - xyz), axis=-1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)
    normal = jnp.where(mask[:, None], normal, 0.0)
    curvature = jnp.where(mask, curvature, 0.0)
    return normal, curvature


def estimate_normals(
    cloud: PointCloud, *, k: int = 10, viewpoint=(0.0, 0.0, 0.0)
) -> PointCloud:
    """Return the cloud with PCA normals attached (k=10 default, matching
    the reference's `setKSearch(10)`)."""
    normals, _ = estimate_normals_xyz(
        cloud.xyz, cloud.mask, k=k, viewpoint=viewpoint
    )
    return cloud.replace(normals=normals)
