"""Relay-fenced phase breakdown at any N (dev): K reps inside one jit
via lax.scan, operands as ARGUMENTS (closure constants blow the relay's
request-size limit at 8M), scalar fetched per measurement."""

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

xyz = synthetic_surface(N, seed=0)
src = PointCloud.create(xyz, capacity=N)
rng = np.random.default_rng(1)
tgt = PointCloud.create(np.asarray(src.xyz)[rng.permutation(N)], capacity=N)

builder = cfg.tile_builder()
t_idx = jax.jit(lambda x, m: builder(x, m, tile_size=cfg.block_tile))(
    tgt.xyz, tgt.mask)
s_idx = jax.jit(lambda x, m: builder(x, m, tile_size=cfg.block_q_tile))(
    src.xyz, src.mask)
jax.block_until_ready((t_idx, s_idx))
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
        print(f"{name:40s} {min(ts)*1e3:8.1f} ms", flush=True)
    except Exception as e:
        print(f"{name:40s} FAILED {type(e).__name__}: {e}", flush=True)


def build_t(eps, x, m):
    idx = builder(x + eps, m, tile_size=cfg.block_tile)
    return idx.centroids[0, 0]


def build_q(eps, x, m):
    idx = builder(x + eps, m, tile_size=cfg.block_q_tile)
    return idx.centroids[0, 0]


bench("KD build tgt S=128", build_t, tgt.xyz, tgt.mask)
bench("KD build src Sq=64", build_q, src.xyz, src.mask)


def normals_only(eps, tiles, blo, bhi, cent, order):
    idx = bnn.TileIndex(tiles=tiles + eps, box_lo=blo, box_hi=bhi,
                        centroids=cent, order=order)
    n = _index_normals(idx, cfg.k_normals, k_tiles=2)
    return n[0, 0]


bench("normals (moments k_tiles=2)", normals_only, t_idx.tiles,
      t_idx.box_lo, t_idx.box_hi, t_idx.centroids, t_idx.order)


def cand_only(eps, pt, tiles, blo, bhi, cent, order):
    idx = bnn.TileIndex(tiles=tiles, box_lo=blo, box_hi=bhi,
                        centroids=cent, order=order)
    c = bnn._candidate_tiles(pt + eps, idx, cfg.block_k_refine)[0]
    return c[0, 0].astype(jnp.float32)


bench("candidate selection k=6", cand_only, s_idx.tiles, t_idx.tiles,
      t_idx.box_lo, t_idx.box_hi, t_idx.centroids, t_idx.order)


def refine_iter(eps, pt, tiles, blo, bhi, cent, order):
    idx = bnn.TileIndex(tiles=tiles, box_lo=blo, box_hi=bhi,
                        centroids=cent, order=order)
    d2, pos = bnn.block_nn(pt + eps, idx, k_tiles=cfg.block_k_refine,
                           return_pos=True)
    pl = jnp.concatenate(
        [tiles.reshape(-1, 3), jnp.zeros((tiles.shape[0] * tiles.shape[1],
                                          3), jnp.float32)], axis=1)[pos]
    return d2[0] + pl[0, 0]


bench("refine NN + payload gather", refine_iter, s_idx.tiles, t_idx.tiles,
      t_idx.box_lo, t_idx.box_hi, t_idx.centroids, t_idx.order)
