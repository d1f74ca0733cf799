"""Sharded-vs-single-device equivalence on the faked 8-device CPU mesh
(SURVEY §4 'Distributed' plan): psum'd normal equations and ring NN must
reproduce the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icpx.cloud import PointCloud
from icpx.distributed.mesh import make_mesh, mesh_shape_for
from icpx.distributed.ring import ring_nearest_neighbor
from icpx.distributed.sharded_icp import sharded_register, sharded_register_pairs
from icpx.geometry.se3 import SE3
from icpx.io.loaders import synthetic_surface
from icpx.kernels.knn import nearest_neighbor
from icpx.kernels.normals import estimate_normals
from icpx.registration.icp import ICPConfig, register


def _pair(n=1024, seed=0, angle=0.2, trans=0.15):
    xyz = synthetic_surface(n, seed=seed)
    src = PointCloud.create(xyz)
    gt = SE3.from_axis_angle(
        jnp.asarray([0.0, 0.3, 0.954]) / np.linalg.norm([0.0, 0.3, 0.954]),
        angle,
        jnp.asarray([trans, 0.0, -trans]),
    )
    rng = np.random.default_rng(seed + 5)
    tgt_np = np.asarray(gt.apply(src.xyz))[:n][rng.permutation(n)]
    return src, PointCloud.create(tgt_np), gt


def test_mesh_shape_for():
    assert mesh_shape_for(8) == (1, 8)
    assert mesh_shape_for(8, n_pairs=4) == (4, 2)
    assert mesh_shape_for(8, n_pairs=3) == (2, 4)
    assert mesh_shape_for(6, n_pairs=12) == (6, 1)


def test_ring_nn_matches_bruteforce():
    mesh = make_mesh(axis_names=("points",))
    n_dev = 8
    rng = np.random.default_rng(0)
    q = rng.normal(size=(256, 3)).astype(np.float32)
    r = rng.normal(size=(512, 3)).astype(np.float32)
    r_mask = np.ones(512, bool)

    from functools import partial

    from jax.sharding import PartitionSpec as P

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P("points", None), P("points")),
        out_specs=(P("points"), P("points")),
        check_vma=False,
    )
    def run(qq, rr, mm):
        d, i, _ = ring_nearest_neighbor(
            qq, rr, mm, "points", tile_q=64, tile_r=64
        )
        # every device computes the same full answer; emit 1/n_dev each
        me = jax.lax.axis_index("points")
        sl = 256 // n_dev
        return (
            jax.lax.dynamic_slice_in_dim(d, me * sl, sl),
            jax.lax.dynamic_slice_in_dim(i, me * sl, sl),
        )

    d, i = run(q, r, r_mask)
    d_ref, i_ref = nearest_neighbor(q, r)
    assert np.allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)
    picked = ((q - r[np.asarray(i)]) ** 2).sum(-1)
    assert np.allclose(picked, np.asarray(d_ref), atol=1e-4)


@pytest.mark.parametrize("ring", [False, True])
def test_sharded_register_matches_single_device(ring):
    src, tgt, gt = _pair()
    cfg = ICPConfig(
        objective="symmetric",
        max_iters=10,
        diff_threshold=1e-5,
        tile_q=256,
        tile_r=256,
    )
    # Pre-estimate normals once so both paths see identical inputs.
    src = estimate_normals(src, k=cfg.k_normals)
    tgt = estimate_normals(tgt, k=cfg.k_normals)
    res_single = register(src, tgt, cfg)
    mesh = make_mesh(axis_names=("points",))
    res_sharded = sharded_register(src, tgt, cfg, mesh, ring=ring)

    # elementwise comparison: fp32 arccos in distance_to can't resolve
    # sub-5e-4 rad angles, but R/t entries compare directly
    assert np.allclose(
        np.asarray(res_single.transform.R),
        np.asarray(res_sharded.transform.R),
        atol=1e-5,
    )
    assert np.allclose(
        np.asarray(res_single.transform.t),
        np.asarray(res_sharded.transform.t),
        atol=1e-5,
    )
    assert np.allclose(
        np.asarray(res_single.final_rmse),
        np.asarray(res_sharded.final_rmse),
        atol=1e-6,
    )
    # and the sharded run still solves the problem
    rot_err, t_err = res_sharded.transform.distance_to(gt)
    assert float(rot_err) < 5e-3 and float(t_err) < 5e-3


def test_sharded_register_pairs_dp():
    mesh = make_mesh(shape=(2, 4), axis_names=("pairs", "points"))
    b, n = 4, 512
    srcs, tgts, gts = [], [], []
    for i in range(b):
        s, t, g = _pair(n=n, seed=10 + i, angle=0.15, trans=0.1)
        s = estimate_normals(s, k=8)
        t = estimate_normals(t, k=8)
        srcs.append(s)
        tgts.append(t)
        gts.append(g)
    stack = lambda cs, f: jnp.stack([f(c) for c in cs])
    cfg = ICPConfig(
        objective="symmetric",
        max_iters=10,
        diff_threshold=1e-5,
        k_normals=8,
        tile_q=128,
        tile_r=128,
    )
    res = sharded_register_pairs(
        stack(srcs, lambda c: c.xyz),
        stack(srcs, lambda c: c.mask),
        stack(srcs, lambda c: c.normals),
        stack(tgts, lambda c: c.xyz),
        stack(tgts, lambda c: c.mask),
        stack(tgts, lambda c: c.normals),
        cfg,
        mesh,
    )
    assert res.transform.R.shape == (b, 3, 3)
    for i in range(b):
        one = SE3(R=res.transform.R[i], t=res.transform.t[i])
        rot_err, t_err = one.distance_to(gts[i])
        assert float(rot_err) < 5e-3, f"pair {i}: rot {float(rot_err)}"
        assert float(t_err) < 5e-3, f"pair {i}: t {float(t_err)}"
