"""Relay-fenced A/B: NN + payload-table gather vs in-fold payload
selection (block_nn_payload). Round-1 rejected the in-fold variant at
'4x slower' using block_until_ready timings, now known unreliable."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import icpx.kernels.blocknn as bnn
from icpx.cloud import PointCloud
from icpx.io.loaders import synthetic_surface
from icpx.registration.icp import ICPConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
K = 4
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
ptiles = s_idx.tiles
t3 = t_idx.tiles.reshape(-1, 3)
pl_flat = jnp.concatenate([t3, jnp.zeros_like(t3)], axis=1)  # (N,6)
pl_tiles = pl_flat.reshape(t_idx.n_tiles, t_idx.tile_size, 6)


def bench(name, body):
    @jax.jit
    def run(pt, eps):
        def step(carry, i):
            out = body(pt + carry * 0 + i * 1e-7 + eps)
            return carry + out[0][0], out[0][0] + out[1][0, 0]
        total, scalars = jax.lax.scan(
            step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32)
        )
        return total + scalars.sum()

    try:
        v = float(run(ptiles, jnp.float32(0.0)))
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            v = float(run(ptiles, jnp.float32((r + 1) * 1e-7)))
            ts.append((time.perf_counter() - t0) / K)
        print(f"{name:44s} {min(ts)*1e3:8.1f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {e}", flush=True)


def nn_gather(pt):
    d2, pos = bnn.block_nn(pt, t_idx, k_tiles=cfg.block_k_refine,
                           return_pos=True)
    pl = pl_flat[pos]
    return d2, pl


def nn_payload(pt):
    d2, pl = bnn.block_nn_payload(pt, t_idx, pl_tiles,
                                  k_tiles=cfg.block_k_refine)
    return d2, pl


bench("NN + (N,6) table gather", nn_gather)
bench("NN with in-fold payload select", nn_payload)
