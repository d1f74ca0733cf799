"""On-chip phase breakdown of the 1M block registration (dev tool).

Times each phase of the flagship block path separately (cache-busted):
KD builds (at several _KD_SEG settings), in-jit normals, coarse/refine
NN passes, and the gather+weights+solve epilogue — so perf work targets
the real bottleneck. Current defaults: S=128, Sq=64, k=8 coarse / 6
refine, hierarchical candidate selection above 8192 tiles.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import icpx.kernels.blocknn as bnn
from icpx.cloud import PointCloud
from icpx.geometry.transforms import make_rigid_perturbation
from icpx.io.loaders import synthetic_surface
from icpx.registration.icp import ICPConfig, _index_normals

import sys
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
cfg = ICPConfig(objective="symmetric", max_iters=10, diff_threshold=0.0,
                rmse_change_tol=1e-6)

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
    print(f"{name:38s} {min(ts)*1e3:8.1f} ms", flush=True)
    return out


builder = cfg.tile_builder()


@jax.jit
def build_t(x, m, eps):
    return builder(x + eps, m, tile_size=cfg.block_tile)


@jax.jit
def build_q(x, m, eps):
    return builder(x + eps, m, tile_size=cfg.block_q_tile)


t_idx = timed(f"KD build tgt (S={cfg.block_tile})", build_t, tgt.xyz, tgt.mask)
s_idx = timed(f"KD build src (Sq={cfg.block_q_tile})", build_q, src.xyz,
              src.mask)


@jax.jit
def normals_t(x, m, eps):
    idx = builder(x + eps, m, tile_size=cfg.block_tile)
    return _index_normals(idx, cfg.k_normals, k_tiles=4)


timed("build+normals tgt", normals_t, tgt.xyz, tgt.mask)

sq = cfg.block_q_tile
tq = N // sq
ptiles = s_idx.tiles


@jax.jit
def cand_only(pt, eps):
    return bnn._candidate_tiles(pt + eps, t_idx, cfg.block_k_refine)[0]


timed(f"candidate selection (k={cfg.block_k_refine})", cand_only, ptiles)


@jax.jit
def nn_refine(pt, eps):
    return bnn.block_nn(pt + eps, t_idx, k_tiles=cfg.block_k_refine,
                        return_pos=True)


timed(f"refine NN pass (k={cfg.block_k_refine})", nn_refine, ptiles)

stride = cfg.coarse_stride
xyz_c = ptiles.reshape(tq // 4, 4 * sq, 3)[:, ::stride]


@jax.jit
def nn_coarse(xc, eps):
    return bnn.block_nn(xc + eps, t_idx, k_tiles=cfg.block_k,
                        return_pos=True)


timed(f"coarse NN pass (k={cfg.block_k})", nn_coarse, xyz_c)

from icpx.registration.step import correspondence_weights, estimate_increment

d2, pos = jax.jit(nn_refine)(ptiles, jnp.float32(0.0))
jax.block_until_ready((d2, pos))
src_n = jnp.zeros((N, 3), jnp.float32)
tgt_sorted = t_idx.tiles.reshape(-1, 3)
tgt_n_sorted = jnp.zeros_like(tgt_sorted)
mask = s_idx.order >= 0


@jax.jit
def gather_solve(pos, d2, eps):
    p = ptiles.reshape(-1, 3) + eps
    q = tgt_sorted[pos]
    n_q = tgt_n_sorted[pos]
    dist = jnp.sqrt(d2)
    w = correspondence_weights(cfg, p, src_n, q, n_q, dist, mask)
    return estimate_increment(cfg, p, q, src_n, n_q, w, lambda x: x)


timed("gather+weights+solve (sorted)", gather_solve, pos, d2)
