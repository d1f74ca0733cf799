"""Round-5: fold kernel group sweep at 8M (fold measured 35% of VPU
bound in exp_stage5 — same DMA-amortization question as the moments
kernel). Usage: python scripts/exp_fold5.py [N] [K]"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from icpx.geometry.transforms import make_rigid_perturbation
from icpx.io.loaders import synthetic_surface
from icpx.kernels.blocknn import (_SUPER_G, _candidate_tiles,
                                  build_kd_index, trim_index)
from icpx.kernels.blocknn_pallas import block_fold_fused_pre, fold6_prepare
from icpx.registration.icp import ICPConfig, _index_normals
from icpx.cli import _enable_compile_cache
_enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8 << 20
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
cfg = ICPConfig()
S, SQ, K_REF = cfg.block_tile, cfg.resolve_q_tile(N), cfg.block_k_refine
xyz = jnp.asarray(synthetic_surface(N, seed=0))
mask = jnp.ones((N,), bool)
gt = make_rigid_perturbation(angle=0.2, translation=(0.12, -0.06, 0.03))
rng = np.random.default_rng(1)
tgt_xyz = jnp.asarray(np.asarray(gt.apply(xyz))[rng.permutation(N)])
t_idx = trim_index(build_kd_index(tgt_xyz, mask, tile_size=S), N,
                   multiple=_SUPER_G)
s_idx = trim_index(build_kd_index(xyz, mask, tile_size=SQ), N, multiple=4)
src_sorted = s_idx.tiles.reshape(-1, 3)
tq = src_sorted.shape[0] // SQ
p0 = gt.apply(src_sorted).reshape(tq, SQ, 3)
tgt_n = _index_normals(t_idx, 10, k_tiles=2, mode="vmem", group=8)
tgt_pl = jnp.concatenate([t_idx.tiles.reshape(-1, 3), tgt_n], axis=1)
tgt_pl_tiles = tgt_pl.reshape(t_idx.n_tiles, t_idx.tile_size, 6)
cand = _candidate_tiles(p0, t_idx, K_REF)[0]


def scan_time(step_fn, label, k=K, args=()):
    eps = jnp.arange(1, k + 1, dtype=jnp.float32) * 1e-6

    @jax.jit
    def run(e, *a):
        acc, _ = lax.scan(
            lambda acc, ei: (acc + step_fn(ei, *a), None),
            jnp.float32(0.0), e)
        return acc

    float(run(eps, *args))
    best = float("inf")
    for r in range(2):
        e2 = eps + jnp.float32(0.01 * (r + 1)) + jnp.float32(
            (time.time_ns() % 997) * 1e-9)
        t0 = time.perf_counter()
        float(run(e2, *args))
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"{label:40s} {best * 1e3:8.2f} ms "
          f"({best / N * 1e9:6.2f} ns/pt)", flush=True)
    return best


for g in (8, 16, 32):
    rt_c, pl_c, dpl = fold6_prepare(cand, t_idx, tgt_pl_tiles, group=g)

    def step(e, p, a, b, gg=g):
        d, pl = block_fold_fused_pre(p + e, a, b, dpl, group=gg)
        return jnp.sum(jnp.where(jnp.isfinite(d[:512]), d[:512], 0.0)) \
            + jnp.sum(pl[:512])

    scan_time(step, f"fold6 pre group={g}", args=(p0, rt_c, pl_c))
