"""8M A/B (dev): in-fold payload refine max_chunk {32768, 65536, 131072}
— fewer serialized lax.map chunks vs per-fold score-tensor HBM pressure
(score is chunk*Sq*S*4 B; 131072*64*128*4 = 4.3 GB). Relay-fenced."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import icpx.kernels.blocknn as bnn
from icpx.cloud import PointCloud
from icpx.io.loaders import synthetic_surface
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

n_t = t_idx.tiles.shape[0]
plt = jnp.concatenate(
    [t_idx.tiles, jnp.zeros_like(t_idx.tiles)], axis=2
)  # (T, S, 6)


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


def payload(chunk):
    def body(eps, pt, tiles, blo, bhi, cent, order):
        idx = mk_idx(tiles, blo, bhi, cent, order)
        d2, pl = bnn.block_nn_payload(pt + eps, idx, plt,
                                      k_tiles=cfg.block_k_refine,
                                      max_chunk=chunk)
        return d2[0] + pl[0, 0]

    return body


for chunk in (32768, 65536, 131072):
    bench(f"in-fold refine max_chunk={chunk}", payload(chunk),
          s_idx.tiles, *IDX_ARGS)


# candidate selection alone (it is chunked implicitly inside block_nn via
# the same max_chunk; measure standalone cost at refine k)
def cand(eps, pt, tiles, blo, bhi, cent, order):
    idx = mk_idx(tiles, blo, bhi, cent, order)
    return jnp.sum(
        bnn._candidate_tiles(pt + eps, idx, cfg.block_k_refine)[0]
    ).astype(jnp.float32)


bench("candidate selection (full, k=6)", cand, s_idx.tiles, *IDX_ARGS)
