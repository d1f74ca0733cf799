"""On-chip experiments for the current perf levers (dev tool).

Sections: payload-gather layout, KD build depth (_KD_SEG), fused vs jnp
radius moments, candidate-selection pool size. Run: python
scripts/exp_levers.py [N] [sections...]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
SECTIONS = set(sys.argv[2:]) or {"gather", "kdseg", "moments", "cand"}
cfg = ICPConfig()

xyz = synthetic_surface(N, seed=0)
src = PointCloud.create(xyz, capacity=N)
rng = np.random.default_rng(1)
tgt = PointCloud.create(
    np.asarray(src.xyz)[rng.permutation(N)], capacity=N
)


def timed(name, fn, *args, reps=3):
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, jnp.float32((r + 1) * 1e-7))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1e3:8.1f} ms", flush=True)
    return out


builder = cfg.tile_builder()
t_idx = jax.jit(
    lambda x, m: builder(x, m, tile_size=cfg.block_tile)
)(tgt.xyz, tgt.mask)
s_idx = jax.jit(
    lambda x, m: builder(x, m, tile_size=cfg.block_q_tile)
)(src.xyz, src.mask)
jax.block_until_ready((t_idx, s_idx))
ptiles = s_idx.tiles

d2, pos = jax.jit(
    lambda p: bnn.block_nn(p, t_idx, k_tiles=cfg.block_k_refine,
                           return_pos=True)
)(ptiles)
jax.block_until_ready((d2, pos))

if "gather" in SECTIONS:
    t3 = t_idx.tiles.reshape(-1, 3)
    n3 = jnp.zeros_like(t3)
    p6 = jnp.concatenate([t3, n3], axis=1)
    p8 = jnp.concatenate([t3, n3, jnp.zeros((t3.shape[0], 2))], axis=1)

    @jax.jit
    def g2x3(pos, eps):
        return t3[pos] + eps, n3[pos]

    @jax.jit
    def g1x6(pos, eps):
        pl = p6[pos] + eps
        return pl[:, :3], pl[:, 3:]

    @jax.jit
    def g1x8(pos, eps):
        pl = p8[pos] + eps
        return pl[:, :3], pl[:, 3:6]

    timed("gather 2x(N,3)", g2x3, pos)
    timed("gather 1x(N,6)", g1x6, pos)
    timed("gather 1x(N,8)", g1x8, pos)

if "kdseg" in SECTIONS:
    for seg in (65536, 16384, 4096):
        bnn._KD_SEG = seg

        @jax.jit
        def build(x, m, eps, _seg=seg):
            return builder(x + eps, m, tile_size=64)

        idx = timed(f"KD build Sq=64 _KD_SEG={seg}", build, src.xyz,
                    src.mask)
    bnn._KD_SEG = 65536

if "moments" in SECTIONS:
    from icpx.kernels.blocknn_pallas import block_radius_moments_fused
    from icpx.kernels.voxel import auto_cell_size

    flat = t_idx.tiles.reshape(-1, 3)
    radius = auto_cell_size(flat, t_idx.order >= 0, scale=3.0)

    @jax.jit
    def mom_jnp(eps):
        return bnn.block_radius_moments(
            t_idx.tiles, t_idx, radius + eps, k_tiles=4
        )

    @jax.jit
    def mom_fused(eps):
        return block_radius_moments_fused(
            t_idx.tiles, t_idx, radius + eps, k_tiles=4, group=1,
            u_max=6,
        )

    timed("radius moments jnp (k=4)", mom_jnp)
    try:
        timed("radius moments fused (k=4,u=6)", mom_fused)
    except Exception as e:
        print(f"fused moments failed: {type(e).__name__} {e}")

if "cand" in SECTIONS:
    @jax.jit
    def cand(pt, eps):
        return bnn._candidate_tiles(pt + eps, t_idx, cfg.block_k_refine)[0]

    timed(f"cand K_s={bnn._SUPER_K}", cand, ptiles)
    bnn._SUPER_K = 4

    @jax.jit
    def cand4(pt, eps):
        return bnn._candidate_tiles(pt + eps, t_idx, cfg.block_k_refine)[0]

    timed("cand K_s=4", cand4, ptiles)
    bnn._SUPER_K = 8

if "pallas" in SECTIONS:
    from icpx.kernels.blocknn_pallas import block_nn_fused4

    @jax.jit
    def nn_xla(pt, eps):
        return bnn.block_nn(pt + eps, t_idx, k_tiles=cfg.block_k_refine,
                            return_pos=True)

    timed("NN XLA fold (k=6)", nn_xla, ptiles)

    for grp, um in ((4, 12), (2, 8), (8, 16)):
        if ptiles.shape[0] % grp:
            continue

        @jax.jit
        def nn_p(pt, eps, g=grp, u=um):
            return block_nn_fused4(pt + eps, t_idx,
                                   k_tiles=cfg.block_k_refine,
                                   group=g, u_max=u, return_pos=True)

        try:
            timed(f"NN fused4 g={grp} u={um}", nn_p, ptiles)
        except Exception as e:
            print(f"fused4 g={grp} u={um} failed: {type(e).__name__}")
