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


def test_cloud_wrapper_masks_padding(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pc = PointCloud.create(pts)  # capacity 128, 28 padded rows
    out = estimate_normals(pc, k=6)
    n = np.asarray(out.normals)
    assert np.allclose(n[100:], 0.0)
    assert np.allclose(np.linalg.norm(n[:100], axis=1), 1.0, atol=1e-3)
