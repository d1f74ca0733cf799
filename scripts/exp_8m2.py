"""8M-focused A/Bs (dev): in-fold payload select vs table gather, and
radius-moment chunk size. Relay-fenced, operands as args."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import icpx.kernels.blocknn as bnn
from icpx.cloud import PointCloud
from icpx.io.loaders import synthetic_surface
from icpx.kernels.voxel import auto_cell_size
from icpx.registration.icp import ICPConfig

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
_ = float(t_idx.centroids[0, 0])


def bench(name, body, *args):
    @jax.jit
    def run(eps, *a):
        def step(carry, i):
            s = body(carry + i * 1e-7 + eps, *a)
            return carry * 0.0, s
        _, scalars = jax.lax.scan(
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
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {e}", flush=True)


def mk_idx(tiles, blo, bhi, cent, order):
    return bnn.TileIndex(tiles=tiles, box_lo=blo, box_hi=bhi,
                         centroids=cent, order=order)


IDX_ARGS = (t_idx.tiles, t_idx.box_lo, t_idx.box_hi, t_idx.centroids,
            t_idx.order)


def iter_gather(eps, pt, tiles, blo, bhi, cent, order):
    idx = mk_idx(tiles, blo, bhi, cent, order)
    d2, pos = bnn.block_nn(pt + eps, idx, k_tiles=cfg.block_k_refine,
                           return_pos=True)
    n = tiles.shape[0] * tiles.shape[1]
    pl = jnp.concatenate(
        [tiles.reshape(-1, 3), jnp.zeros((n, 3), jnp.float32)], axis=1
    )[pos]
    return d2[0] + pl[0, 0]


bench("refine: NN + table gather", iter_gather, s_idx.tiles, *IDX_ARGS)


def iter_payload(eps, pt, tiles, blo, bhi, cent, order):
    idx = mk_idx(tiles, blo, bhi, cent, order)
    n_t, s, _ = tiles.shape
    plt = jnp.concatenate(
        [tiles, jnp.zeros((n_t, s, 3), jnp.float32)], axis=2
    )
    d2, pl = bnn.block_nn_payload(pt + eps, idx, plt,
                                  k_tiles=cfg.block_k_refine)
    return d2[0] + pl[0, 0]


bench("refine: NN in-fold payload", iter_payload, s_idx.tiles, *IDX_ARGS)

flat = t_idx.tiles.reshape(-1, 3)
radius = auto_cell_size(flat, t_idx.order >= 0, scale=3.0)


def mom(chunk):
    def body(eps, tiles, blo, bhi, cent, order):
        idx = mk_idx(tiles, blo, bhi, cent, order)
        cnt, mean, cov = bnn.block_radius_moments(
            tiles + eps * 0, idx, radius + eps, k_tiles=2, max_chunk=chunk
        )
        return cnt[0] + mean[0, 0]

    return body


for chunk in (8192, 16384, 32768):
    bench(f"moments k2 max_chunk={chunk}", mom(chunk), *IDX_ARGS)
