"""Tiled brute-force NN vs numpy oracle — the KD-tree replacement
(`pcl::search::KdTree`, `myicp.cpp:158`) must be exact, not approximate."""

import numpy as np

from icpx.kernels.knn import knn, nearest_neighbor, pairwise_sqdist


def _np_knn(q, r, k, mask=None):
    d = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    if mask is not None:
        d[:, ~mask] = np.inf
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_pairwise_sqdist(rng):
    q = rng.normal(size=(17, 3)).astype(np.float32)
    r = rng.normal(size=(23, 3)).astype(np.float32)
    d = np.asarray(pairwise_sqdist(q, r))
    d_np = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    assert np.allclose(d, d_np, atol=1e-4)


def test_nearest_neighbor_exact(rng):
    q = rng.normal(size=(300, 3)).astype(np.float32) * 5
    r = rng.normal(size=(450, 3)).astype(np.float32) * 5
    d, i = nearest_neighbor(q, r, tile_q=64, tile_r=128)
    d_np, i_np = _np_knn(q, r, 1)
    assert np.allclose(np.asarray(d), d_np[:, 0], atol=1e-3)
    # indices can differ only on exact ties; verify via distances
    picked = ((q - r[np.asarray(i)]) ** 2).sum(-1)
    assert np.allclose(picked, d_np[:, 0], atol=1e-3)


def test_nearest_neighbor_masked(rng):
    q = rng.normal(size=(50, 3)).astype(np.float32)
    r = rng.normal(size=(80, 3)).astype(np.float32)
    mask = rng.uniform(size=80) > 0.5
    d, i = nearest_neighbor(q, r, ref_mask=mask, tile_q=16, tile_r=32)
    d_np, i_np = _np_knn(q, r, 1, mask)
    assert np.allclose(np.asarray(d), d_np[:, 0], atol=1e-4)
    assert mask[np.asarray(i)].all()


def test_knn_sorted_and_exact(rng):
    q = rng.normal(size=(100, 3)).astype(np.float32)
    r = rng.normal(size=(200, 3)).astype(np.float32)
    k = 10
    d, i = knn(q, r, k, tile_q=32, tile_r=64)
    d, i = np.asarray(d), np.asarray(i)
    d_np, _ = _np_knn(q, r, k)
    assert np.all(np.diff(d, axis=1) >= -1e-6)  # ascending
    assert np.allclose(d, d_np, atol=1e-3)


def test_knn_single_tile_fastpath(rng):
    q = rng.normal(size=(30, 3)).astype(np.float32)
    r = rng.normal(size=(40, 3)).astype(np.float32)
    d, i = knn(q, r, 5)  # tiles larger than data
    d_np, _ = _np_knn(q, r, 5)
    assert np.allclose(np.asarray(d), d_np, atol=1e-4)


def test_self_knn_includes_self(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    d, i = knn(pts, pts, 3)
    assert np.allclose(np.asarray(d)[:, 0], 0.0, atol=1e-5)
    assert np.array_equal(np.asarray(i)[:, 0], np.arange(64))


def test_knn_nonmultiple_sizes(rng):
    q = rng.normal(size=(67, 3)).astype(np.float32)
    r = rng.normal(size=(131, 3)).astype(np.float32)
    d, i = knn(q, r, 4, tile_q=16, tile_r=32)
    d_np, _ = _np_knn(q, r, 4)
    assert np.allclose(np.asarray(d), d_np, atol=1e-4)
