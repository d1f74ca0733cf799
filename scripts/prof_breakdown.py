"""On-chip phase breakdown of the block registration (dev tool).

Times each phase of the flagship block path separately (cache-busted,
RELAY-FENCED: every rep fetches a scalar from the output — plain
block_until_ready returns early over the axon relay, NOTES.md): KD
builds, in-jit normals, candidate selection, coarse/refine NN passes
(fresh and frozen-candidate), payload delivery, and the
gather+weights+solve epilogue — so perf work targets the real
bottleneck.

Run: python scripts/prof_breakdown.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import icpx.kernels.blocknn as bnn
from icpx.cloud import PointCloud
from icpx.geometry.transforms import make_rigid_perturbation
from icpx.io.loaders import synthetic_surface
from icpx.registration.icp import ICPConfig, _index_normals

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


def _fence(out):
    """Force real device completion: fetch one scalar from a leaf."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def timed(name, fn, *args, reps=3):
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    _fence(out)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, jnp.float32((r + 1) * 1e-7))
        jax.block_until_ready(out)
        _fence(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:8.1f} ms", flush=True)
    return out


builder = cfg.tile_builder()
SQ = cfg.resolve_q_tile(N)
K_REF = cfg.block_k_refine if cfg.block_k_refine > 0 else cfg.block_k


@jax.jit
def build_t(x, m, eps):
    return builder(x + eps, m, tile_size=cfg.block_tile)


@jax.jit
def build_q(x, m, eps):
    return builder(x + eps, m, tile_size=SQ)


t_idx = timed(f"KD build tgt (S={cfg.block_tile})", build_t, tgt.xyz, tgt.mask)
s_idx = timed(f"KD build src (Sq={SQ})", build_q, src.xyz, src.mask)


@jax.jit
def normals_t(x, m, eps):
    idx = builder(x + eps, m, tile_size=cfg.block_tile)
    return _index_normals(idx, cfg.k_normals, k_tiles=2)


timed("build+normals tgt (k_tiles=2)", normals_t, tgt.xyz, tgt.mask)

sq = SQ
tq = N // sq
ptiles = s_idx.tiles


@jax.jit
def cand_only(pt, eps):
    return bnn._candidate_tiles(pt + eps, t_idx, K_REF)[0]


cand = timed(f"candidate selection (k={K_REF})", cand_only, ptiles)


@jax.jit
def nn_refine(pt, eps):
    return bnn.block_nn(pt + eps, t_idx, k_tiles=K_REF, return_pos=True)


timed(f"refine NN fresh-cand (k={K_REF})", nn_refine, ptiles)


@jax.jit
def nn_refine_frozen(pt, c, eps):
    return bnn.block_nn(pt + eps, t_idx, k_tiles=K_REF, return_pos=True,
                        cand_tiles=c)


timed(f"refine NN frozen-cand (k={K_REF})", nn_refine_frozen, ptiles, cand)

# in-fold payload refine (the >=2M default): NN + one-hot payload select
pl_tiles = jnp.concatenate(
    [t_idx.tiles, jnp.zeros_like(t_idx.tiles)], axis=2
)


@jax.jit
def nn_refine_infold(pt, c, eps):
    return bnn.block_nn_payload(pt + eps, t_idx, pl_tiles,
                                k_tiles=K_REF, cand_tiles=c)


timed(f"refine NN infold-payload (k={K_REF})", nn_refine_infold, ptiles,
      cand)

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
tgt_pl = jnp.concatenate([tgt_sorted, jnp.zeros_like(tgt_sorted)], axis=1)
mask = s_idx.order >= 0


@jax.jit
def payload_gather(pos, eps):
    pl = tgt_pl[pos]
    return pl.sum() + eps


timed("payload row gather (N, 6)", payload_gather, pos)


@jax.jit
def gather_solve(pos, d2, eps):
    p = ptiles.reshape(-1, 3) + eps
    pl = tgt_pl[pos]
    q, n_q = pl[:, :3], pl[:, 3:]
    dist = jnp.sqrt(d2)
    w = correspondence_weights(cfg, p, src_n, q, n_q, dist, mask)
    return estimate_increment(cfg, p, q, src_n, n_q, w, lambda x: x)


timed("gather+weights+solve (sorted)", gather_solve, pos, d2)
