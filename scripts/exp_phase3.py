"""Relay-fenced phase breakdown with ROUND-3 resolved defaults (bf16
scoring, scale-aware Sq, in-fold payload above 2M). K reps inside one
jit via lax.scan, operands as ARGUMENTS, scalar fetched per measurement.

Usage: python scripts/exp_phase3.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import icpx.kernels.blocknn as bnn
from icpx.cloud import PointCloud
from icpx.io.loaders import synthetic_surface
from icpx.registration.icp import ICPConfig, _index_normals

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8388608
K = 3
cfg = ICPConfig()
q_tile = cfg.resolve_q_tile(N)
prec = cfg.resolve_score_prec()
payload = cfg.resolve_payload(N)
print(f"N={N}  Sq={q_tile}  prec={prec}  payload={payload}", flush=True)

xyz = synthetic_surface(N, seed=0)
src = PointCloud.create(xyz, capacity=N)
rng = np.random.default_rng(1)
tgt = PointCloud.create(np.asarray(src.xyz)[rng.permutation(N)], capacity=N)

builder = cfg.tile_builder()
t_idx = jax.jit(
    lambda x, m: bnn.trim_index(
        builder(x, m, tile_size=cfg.block_tile), N, multiple=bnn._SUPER_G)
)(tgt.xyz, tgt.mask)
s_idx = jax.jit(
    lambda x, m: bnn.trim_index(
        builder(x, m, tile_size=q_tile), N, multiple=4)
)(src.xyz, src.mask)
cand = jax.jit(
    lambda q: bnn._candidate_tiles(q, t_idx, cfg.block_k_refine)[0]
)(s_idx.tiles)
pl_sorted = jnp.concatenate(
    [t_idx.tiles.reshape(-1, 3),
     jnp.zeros((t_idx.tiles.shape[0] * t_idx.tiles.shape[1], 3),
               jnp.float32)], axis=1)
pl_tiles = pl_sorted.reshape(t_idx.tiles.shape[0], t_idx.tiles.shape[1], 6)
jax.block_until_ready((t_idx, s_idx, cand))
_ = float(t_idx.centroids[0, 0])  # fence


def bench(name, make_body, *args):
    @jax.jit
    def run(eps, *a):
        def step(carry, i):
            s = make_body(carry + i * 1e-7 + eps, *a)
            return carry + s * 0.0, s
        total, scalars = jax.lax.scan(
            step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32)
        )
        return scalars.sum()

    try:
        v = float(run(jnp.float32(0.0), *args))
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            v = float(run(jnp.float32((r + 1) * 1e-7), *args))
            ts.append((time.perf_counter() - t0) / K)
        print(f"{name:44s} {min(ts)*1e3:8.1f} ms", flush=True)
        return min(ts) * 1e3
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {e}", flush=True)
        return 0.0


def build_t(eps, x, m):
    idx = bnn.trim_index(
        builder(x + eps, m, tile_size=cfg.block_tile), N,
        multiple=bnn._SUPER_G)
    return idx.centroids[0, 0]


def build_q(eps, x, m):
    idx = bnn.trim_index(
        builder(x + eps, m, tile_size=q_tile), N, multiple=4)
    return idx.centroids[0, 0]


bench(f"KD build tgt S={cfg.block_tile}", build_t, tgt.xyz, tgt.mask)
bench(f"KD build src Sq={q_tile}", build_q, src.xyz, src.mask)


def normals_only(eps, tiles, blo, bhi, cent, order):
    idx = bnn.TileIndex(tiles=tiles + eps, box_lo=blo, box_hi=bhi,
                        centroids=cent, order=order)
    n = _index_normals(idx, cfg.k_normals, k_tiles=2)
    return n[0, 0]


bench("normals (moments k_tiles=2)", normals_only, t_idx.tiles,
      t_idx.box_lo, t_idx.box_hi, t_idx.centroids, t_idx.order)


def cand_only(eps, qt, tiles, blo, bhi, cent, order):
    idx = bnn.TileIndex(tiles=tiles, box_lo=blo, box_hi=bhi,
                        centroids=cent, order=order)
    c = bnn._candidate_tiles(qt + eps, idx, cfg.block_k_refine)[0]
    return c[0, 0].astype(jnp.float32)


bench("candidate selection (once, frozen)", cand_only, s_idx.tiles,
      t_idx.tiles, t_idx.box_lo, t_idx.box_hi, t_idx.centroids,
      t_idx.order)


def refine_gather(eps, qt, cd, tiles, blo, bhi, cent, order, table):
    idx = bnn.TileIndex(tiles=tiles, box_lo=blo, box_hi=bhi,
                        centroids=cent, order=order)
    d2, pos = bnn.block_nn(qt + eps, idx, k_tiles=cfg.block_k_refine,
                           return_pos=True, cand_tiles=cd,
                           score_prec=prec)
    pl = table[pos]
    return d2[0] + pl[0, 0]


def refine_infold(eps, qt, cd, tiles, blo, bhi, cent, order, plt):
    idx = bnn.TileIndex(tiles=tiles, box_lo=blo, box_hi=bhi,
                        centroids=cent, order=order)
    d2, pl = bnn.block_nn_payload(qt + eps, idx, plt,
                                  k_tiles=cfg.block_k_refine,
                                  cand_tiles=cd, score_prec=prec)
    return d2[0] + pl[0, 0]


bench("refine iter: NN+payload (gather)", refine_gather, s_idx.tiles,
      cand, t_idx.tiles, t_idx.box_lo, t_idx.box_hi, t_idx.centroids,
      t_idx.order, pl_sorted)
bench("refine iter: NN+payload (infold)", refine_infold, s_idx.tiles,
      cand, t_idx.tiles, t_idx.box_lo, t_idx.box_hi, t_idx.centroids,
      t_idx.order, pl_tiles)


def nn_only(eps, qt, cd, tiles, blo, bhi, cent, order):
    idx = bnn.TileIndex(tiles=tiles, box_lo=blo, box_hi=bhi,
                        centroids=cent, order=order)
    d2, pos = bnn.block_nn(qt + eps, idx, k_tiles=cfg.block_k_refine,
                           return_pos=True, cand_tiles=cd,
                           score_prec=prec)
    return d2[0] + pos[0].astype(jnp.float32)


bench("refine iter: NN only (no payload)", nn_only, s_idx.tiles,
      cand, t_idx.tiles, t_idx.box_lo, t_idx.box_hi, t_idx.centroids,
      t_idx.order)
