"""Pipeline-parallel pyramid (P6): L stages over the mesh, B pairs stream
through; results match per-pair expectations."""

import jax.numpy as jnp
import numpy as np

from icpx.cloud import PointCloud
from icpx.distributed.mesh import make_mesh
from icpx.distributed.pipeline import pipelined_pyramid_register
from icpx.geometry.se3 import SE3
from icpx.io.loaders import synthetic_surface
from icpx.kernels.normals import estimate_normals
from icpx.registration.icp import ICPConfig


def test_pipelined_pairs_converge():
    import jax

    mesh = make_mesh(shape=(2,), axis_names=("stages",), devices=jax.devices()[:2])
    b, n = 3, 1024
    srcs, tgts, gts = [], [], []
    for i in range(b):
        xyz = synthetic_surface(n, seed=20 + i)
        src = estimate_normals(PointCloud.create(xyz, capacity=n), k=8)
        axis = np.array([0.1, 0.15, 0.98]) / np.linalg.norm([0.1, 0.15, 0.98])
        gt = SE3.from_axis_angle(
            jnp.asarray(axis, jnp.float32),
            0.25,
            jnp.asarray([0.12, -0.08, 0.05], jnp.float32),
        )
        rng = np.random.default_rng(i)
        tgt_xyz = np.asarray(gt.apply(src.xyz))[:n][rng.permutation(n)]
        tgt = estimate_normals(PointCloud.create(tgt_xyz, capacity=n), k=8)
        srcs.append(src)
        tgts.append(tgt)
        gts.append(gt)

    stack = lambda cs, f: jnp.stack([f(c) for c in cs])
    cfg = ICPConfig(
        objective="symmetric",
        max_iters=6,
        diff_threshold=0.0,
        robust="huber",
        tile_q=256,
        tile_r=256,
    )
    out = pipelined_pyramid_register(
        stack(srcs, lambda c: c.xyz),
        stack(srcs, lambda c: c.mask),
        stack(srcs, lambda c: c.normals),
        stack(tgts, lambda c: c.xyz),
        stack(tgts, lambda c: c.mask),
        stack(tgts, lambda c: c.normals),
        cfg,
        mesh,
        iters_per_level=8,
        subsample=4,
    )
    for i in range(b):
        est = SE3(R=out.R[i], t=out.t[i])
        rot_err, t_err = est.distance_to(gts[i])
        assert float(rot_err) < 8e-3, f"pair {i} rot {float(rot_err)}"
        assert float(t_err) < 8e-3, f"pair {i} t {float(t_err)}"