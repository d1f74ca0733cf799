"""Source-build A/B on the FULL registration (dev tool): the source
(query) tiling doesn't need KD compactness the way reference tiles do —
query-box sprawl only loosens candidate ranking. A Morton source build
is ONE global sort instead of ~7 (saves ~25-35 ms of the ~40 ms KD
build at 1M). Relay-fenced full-pipeline walls + GT recovery so any
recall loss shows up as quality.

Run: python scripts/exp_srcmorton.py [N]
"""

import dataclasses
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20

xyz = synthetic_surface(N, seed=0)
src = PointCloud.create(xyz, capacity=N)
gt = make_rigid_perturbation(angle=0.2, translation=(0.12, -0.06, 0.03))
rng = np.random.default_rng(1)
tgt_np = np.asarray(gt.apply(src.xyz))[:N]
perm = rng.permutation(N)
tgt = PointCloud.create(tgt_np[perm], capacity=N)

base = ICPConfig(
    objective="symmetric", max_iters=10, diff_threshold=0.0,
    rmse_change_tol=1e-6,
)

VARIANTS = [
    ("src=kd (default)", ""),
    ("src=morton", "morton"),
]

for name, sti in VARIANTS:
    cfg = dataclasses.replace(base, src_tile_index=sti)

    def run(sx, sm, tx, tm, eps):
        s = PointCloud(xyz=sx + eps, mask=sm)
        t = PointCloud(xyz=tx, mask=tm)
        res = _register_jit(s, t, SE3.identity(), cfg,
                            normals_for=("src", "tgt"))
        return res.transform.R, res.transform.t, res.final_rmse, res.iters

    run_j = jax.jit(run)
    out = run_j(src.xyz, src.mask, tgt.xyz, tgt.mask, jnp.float32(0.0))
    jax.block_until_ready(out)
    float(out[2])  # relay fence
    ts = []
    for rep in range(3):
        eps = jnp.float32((rep + 1) * 1e-7)
        t0 = time.perf_counter()
        out = run_j(src.xyz, src.mask, tgt.xyz, tgt.mask, eps)
        jax.block_until_ready(out)
        float(out[2])
        ts.append(time.perf_counter() - t0)
    est = SE3(R=out[0], t=out[1])
    rot_err, t_err = est.distance_to(gt)
    wall = min(ts)
    print(f"{name:20s} {wall*1e3:7.1f} ms  {N/wall/1e6:5.2f}M pts/s  "
          f"iters={int(out[3])} rmse={float(out[2]):.2e} "
          f"rot={float(rot_err):.1e} t={float(t_err):.1e}", flush=True)
