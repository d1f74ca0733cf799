"""PCA normal estimation vs analytic surfaces (plane/sphere) — the
`pcl::NormalEstimation` replacement (`myicp.cpp:152-172`)."""

import numpy as np

from icpx.cloud import PointCloud
from icpx.kernels.normals import estimate_normals, estimate_normals_xyz


def test_plane_normals(rng):
    pts = rng.uniform(-1, 1, size=(400, 3)).astype(np.float32)
    pts[:, 2] = 5.0  # plane z=5, viewpoint at origin below it
    n, curv = estimate_normals_xyz(pts, k=10)
    n = np.asarray(n)
    # normal is +-z, oriented towards viewpoint (origin): z=5 > 0 so -z
    assert np.allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
    assert np.all(n[:, 2] < 0)
    assert np.all(np.asarray(curv) < 1e-4)


def test_sphere_normals_radial(rng):
    v = rng.normal(size=(2000, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = 3.0 * v
    n, _ = estimate_normals_xyz(pts, k=12)
    n = np.asarray(n)
    # oriented toward viewpoint at origin -> inward radial (-v)
    cos = np.sum(n * (-v), axis=1)
    assert np.mean(cos > 0.95) > 0.97


def test_normals_unit_length(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    n, _ = estimate_normals_xyz(pts, k=8)
    norms = np.linalg.norm(np.asarray(n), axis=1)
    assert np.allclose(norms, 1.0, atol=1e-3)


def test_block_method_matches_brute(rng):
    """Radius-moment normals (block path) agree with kNN-PCA normals.

    The neighborhoods differ by construction (fixed radius vs k nearest),
    so agreement is statistical, not exact."""
    from icpx.io.loaders import synthetic_surface

    pts = synthetic_surface(4000, seed=5)
    n_b, _ = estimate_normals_xyz(pts, k=10, method="brute")
    n_v, _ = estimate_normals_xyz(pts, k=10, method="block")
    n_b, n_v = np.asarray(n_b), np.asarray(n_v)
    nonzero = np.linalg.norm(n_v, axis=1) > 0.5
    assert nonzero.mean() > 0.97  # few degenerate (empty-radius) points
    cos = np.abs((n_b * n_v).sum(1))[nonzero]
    assert np.median(cos) > 0.999
    assert (cos > 0.99).mean() > 0.93


def test_few_points_than_k(rng):
    """k > n: sentinel neighbors must not poison the covariance."""
    pts = rng.normal(size=(3, 3)).astype(np.float32)
    from icpx.cloud import PointCloud

    pc = PointCloud.create(pts)  # capacity 128, 125 masked rows
    n, c = estimate_normals_xyz(pc.xyz, pc.mask, k=10)
    n = np.asarray(n)[:3]
    assert np.isfinite(n).all()
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)


def test_cloud_wrapper_masks_padding(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pc = PointCloud.create(pts)  # capacity 128, 28 padded rows
    out = estimate_normals(pc, k=6)
    n = np.asarray(out.normals)
    assert np.allclose(n[100:], 0.0)
    assert np.allclose(np.linalg.norm(n[:100], axis=1), 1.0, atol=1e-3)
