"""Experiment: full 1M registration wall vs tile-size/candidate configs.

Times the complete flagship path (_register_jit with in-jit normals) per
config, cache-busted, and reports GT recovery errors so recall loss is
visible as quality degradation.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from icpx.cloud import PointCloud
from icpx.geometry.se3 import SE3
from icpx.geometry.transforms import make_rigid_perturbation
from icpx.io.loaders import synthetic_surface
from icpx.registration.icp import ICPConfig, _register_jit

from icpx.cli import _enable_compile_cache
_enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20

xyz = synthetic_surface(N, seed=0)
src = PointCloud.create(xyz, capacity=N)
gt = make_rigid_perturbation(angle=0.2, translation=(0.12, -0.06, 0.03))
rng = np.random.default_rng(1)
tgt_np = np.asarray(gt.apply(src.xyz))[:N]
perm = rng.permutation(N)
tgt = PointCloud.create(tgt_np[perm], capacity=N)

CONFIGS = (
    eval(sys.argv[2])  # dev tool: trusted input
    if len(sys.argv) > 2
    else {
        "S256 k8/6": dict(),
        "S128 k6/4": dict(block_tile=128, block_k=6, block_k_refine=4),
    }
)

for name, kw in CONFIGS.items():
    cfg = ICPConfig(
        objective="symmetric", max_iters=10, diff_threshold=0.0,
        rmse_change_tol=1e-6, **kw)

    def run(sx, sm, tx, tm, eps, cfg=cfg):
        s = PointCloud(xyz=sx + eps, mask=sm)
        t = PointCloud(xyz=tx, mask=tm)
        res = _register_jit(s, t, SE3.identity(), cfg,
                            normals_for=("src", "tgt"))
        return res.transform.R, res.transform.t, res.final_rmse, res.iters

    run_j = jax.jit(run)
    out = run_j(src.xyz, src.mask, tgt.xyz, tgt.mask, jnp.float32(0.0))
    jax.block_until_ready(out)
    ts = []
    for rep in range(3):
        eps = jnp.float32((rep + 1) * 1e-7)
        t0 = time.perf_counter()
        out = run_j(src.xyz, src.mask, tgt.xyz, tgt.mask, eps)
        jax.block_until_ready(out)
        float(out[2])  # relay-proof: force real completion (see exp_fused)
        ts.append(time.perf_counter() - t0)
    est = SE3(R=out[0], t=out[1])
    rot_err, t_err = est.distance_to(gt)
    wall = min(ts)
    print(f"{name:28s} {wall*1e3:7.1f} ms  {N/wall/1e6:5.2f}M pts/s  "
          f"iters={int(out[3])} rmse={float(out[2]):.2e} "
          f"rot={float(rot_err):.1e} t={float(t_err):.1e}", flush=True)
