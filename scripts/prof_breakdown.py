"""On-chip phase breakdown of the 1M block registration (dev tool).

Times each phase of the flagship block path separately (cache-busted):
KD builds, in-jit normals, one coarse NN+solve iteration, one refine
NN+solve iteration — so perf work targets the real bottleneck.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from icpx.cloud import PointCloud
from icpx.geometry.se3 import SE3
from icpx.geometry.transforms import make_rigid_perturbation
from icpx.io.loaders import synthetic_surface
from icpx.registration.icp import ICPConfig, _register_jit, _index_normals

N = 1 << 20
cfg = ICPConfig(objective="symmetric", max_iters=10, diff_threshold=0.0,
                rmse_change_tol=1e-6, tile_q=2048, tile_r=8192)

xyz = synthetic_surface(N, seed=0)
src = PointCloud.create(xyz, capacity=N)
gt = make_rigid_perturbation(angle=0.2, translation=(0.12, -0.06, 0.03))
rng = np.random.default_rng(1)
tgt_np = np.asarray(gt.apply(src.xyz))[:N]
perm = rng.permutation(N)
tgt = PointCloud.create(tgt_np[perm], capacity=N)


def timed(name, fn, *args, reps=3):
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, jnp.float32((r + 1) * 1e-7))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms")
    return out


builder = cfg.tile_builder()


@jax.jit
def do_build(x, m, eps):
    return builder(x + eps, m, tile_size=cfg.block_tile)


@jax.jit
def do_build_q(x, m, eps):
    return builder(x + eps, m, tile_size=cfg.block_q_tile)


t_idx = timed("KD build tgt (S=256)", do_build, tgt.xyz, tgt.mask)
s_idx = timed("KD build src (Sq=64)", do_build_q, src.xyz, src.mask)


@jax.jit
def do_normals_t(x, m, eps):
    idx = builder(x + eps, m, tile_size=cfg.block_tile)
    return _index_normals(idx, cfg.k_normals, k_tiles=4)


timed("build+normals tgt", do_normals_t, tgt.xyz, tgt.mask)


from icpx.kernels.blocknn import coarsen_index
from icpx.kernels.blocknn_pallas import block_nn_fused4
from icpx.kernels.blocknn import block_nn


@jax.jit
def do_normals_s(x, m, eps):
    idx = builder(x + eps, m, tile_size=cfg.block_q_tile)
    f = cfg.block_tile // cfg.block_q_tile
    cidx = coarsen_index(idx, f)
    return _index_normals(cidx, cfg.k_normals, k_tiles=4)


timed("build+normals src (coarsened)", do_normals_s, src.xyz, src.mask)

sq = cfg.block_q_tile
tq = N // sq
fused = cfg.resolve_fused()
print(f"fused={fused} tq={tq} sq={sq}")


@jax.jit
def nn_refine(ptiles, eps):
    d2, idx = block_nn_fused4(
        ptiles + eps, t_idx, k_tiles=cfg.block_k_refine,
        group=cfg.block_group, u_max=cfg.block_u_max)
    return d2, idx


ptiles = s_idx.tiles
timed("refine NN pass (fused, k=6)", nn_refine, ptiles)


@jax.jit
def nn_refine_xla(ptiles, eps):
    return block_nn(ptiles + eps, t_idx, k_tiles=cfg.block_k_refine)


timed("refine NN pass (XLA fold, k=6)", nn_refine_xla, ptiles)

cs = 4 * sq // cfg.coarse_stride
xyz_c = ptiles.reshape(tq // 4, 4 * sq, 3)[:, ::cfg.coarse_stride]


@jax.jit
def nn_coarse(xc, eps):
    d2, idx = block_nn_fused4(
        xc + eps, t_idx, k_tiles=cfg.block_k,
        group=cfg.block_group, u_max=cfg.block_u_max)
    return d2, idx


timed("coarse NN pass (fused, k=8)", nn_coarse, xyz_c)

# gather + solve cost: one full linearize+solve on refine-size arrays
from icpx.registration.step import correspondence_weights, estimate_increment

d2, idx = jax.jit(nn_refine)(ptiles, jnp.float32(0.0))
jax.block_until_ready((d2, idx))
src_n = jnp.zeros((N, 3), jnp.float32)
tgt_n = jnp.zeros((N, 3), jnp.float32)
mask = s_idx.order >= 0


@jax.jit
def gather_solve(idx, d2, eps):
    p = ptiles.reshape(-1, 3) + eps
    q = tgt.xyz[idx]
    n_q = tgt_n[idx]
    dist = jnp.sqrt(d2)
    w = correspondence_weights(cfg, p, src_n, q, n_q, dist, mask)
    return estimate_increment(cfg, p, q, src_n, n_q, w, lambda x: x)


timed("gather+weights+solve", gather_solve, idx, d2)
