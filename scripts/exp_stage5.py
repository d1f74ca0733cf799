"""Round-5 roofline: per-stage timing at the take-6 defaults + a
fraction-of-peak accounting per stage (VERDICT r4 next-round #1 — the
round-4 stage table predates the vmem kernels, so the "structural"
large-cloud claim was asserted, not proven).

Three accounting classes, each auditable:

  xla   — stage compiled alone; flops / bytes-accessed from XLA's own
          cost model (`compiled.cost_analysis()`), fractions against
          the v5e peaks in utils/profiling.PEAKS.
  pallas— take-6 kernels are custom calls XLA cannot cost; ops/bytes
          hand-modeled from the kernel's loop structure (printed, so
          the model is checkable).
  sort  — comparison sorts have no closed-form byte cost on TPU;
          the build's bound is PRIMITIVE-FLOOR accounting: the sum of
          its irreducible `lax.sort` calls measured in isolation at
          the same shapes (NOTES: the bitonic/radix/scatter routes
          are all measured-closed), i.e. build_frac = floor / measured.

Timing protocol: K in-jit reps per stage via lax.scan with per-rep
varied inputs + scalar fence (relay memoization + early
block_until_ready — NOTES measurement gotchas).

Usage: python scripts/exp_stage5.py [N] [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from icpx.cloud import PointCloud  # noqa: F401
from icpx.geometry.transforms import make_rigid_perturbation
from icpx.io.loaders import synthetic_surface
from icpx.kernels.blocknn import (
    _SUPER_G,
    _candidate_tiles,
    build_kd_index,
    trim_index,
)
from icpx.registration.icp import ICPConfig, _index_normals
from icpx.utils.profiling import PEAKS

from icpx.cli import _enable_compile_cache
_enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8 << 20
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4

cfg = ICPConfig()
S = cfg.block_tile  # 128
SQ = cfg.resolve_q_tile(N)
K_REF = cfg.block_k_refine  # 6
VG = cfg.vmem_group
print(f"# N={N} S={S} Sq={SQ} k_ref={K_REF} K={K} "
      f"payload={cfg.resolve_payload(N)} moments={cfg.resolve_moments(N)}")

xyz = jnp.asarray(synthetic_surface(N, seed=0))
mask = jnp.ones((N,), bool)
gt = make_rigid_perturbation(angle=0.2, translation=(0.12, -0.06, 0.03))
rng = np.random.default_rng(1)
tgt_xyz = jnp.asarray(np.asarray(gt.apply(xyz))[rng.permutation(N)])

rows = []  # (stage, ms, class, frac, bound_by)


def scan_time(step_fn, label, k=K, args=()):
    eps = jnp.arange(1, k + 1, dtype=jnp.float32) * 1e-6

    @jax.jit
    def run(e, *a):
        def body(acc, ei):
            return acc + step_fn(ei, *a), None

        acc, _ = lax.scan(body, jnp.float32(0.0), e)
        return acc

    float(run(eps, *args))  # compile + warm (scalar fence)
    best = float("inf")
    for r in range(2):
        e2 = eps + jnp.float32(0.01 * (r + 1)) + jnp.float32(
            (time.time_ns() % 997) * 1e-9
        )
        t0 = time.perf_counter()
        float(run(e2, *args))
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"{label:36s} {best * 1e3:8.2f} ms "
          f"({best / N * 1e9:6.2f} ns/pt)", flush=True)
    return best


def xla_cost(step_fn, args):
    """flops + bytes accessed of the single-step program, per XLA."""
    try:
        comp = jax.jit(step_fn).lower(jnp.float32(1e-6), *args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0)
        )
    except Exception as e:  # relay may refuse cost analysis
        print(f"# cost_analysis unavailable: {e!r}")
        return 0.0, 0.0


def frac_of(seconds, flops=0.0, vpu=0.0, hbm=0.0):
    f = {}
    if flops:
        f["f32"] = flops / seconds / PEAKS["f32_flops"]
    if vpu:
        f["vpu"] = vpu / seconds / PEAKS["vpu_ops"]
    if hbm:
        f["hbm"] = hbm / seconds / PEAKS["hbm_bytes"]
    if not f:
        return 0.0, "n/a"
    key = max(f, key=f.get)
    return f[key], key


# ---------------------------------------------------------------- builds
def build_step(e, tx):
    return jnp.sum(
        build_kd_index(tx + e, mask, tile_size=S).centroids[:8]
    )


t_build = scan_time(build_step, f"tgt KD build (S={S})", args=(tgt_xyz,))
t_build_q = scan_time(
    lambda e, sx: jnp.sum(
        build_kd_index(sx + e, mask, tile_size=SQ).centroids[:8]
    ),
    f"src KD build (Sq={SQ})", args=(xyz,),
)

# sort primitive floor: the build's irreducible lax.sort calls measured
# in isolation. Build structure (build_kd_index): ONE global 5-operand
# Morton sort + fan-4 level sorts (~log4 levels at 3 ops) + epilogue.
keys0 = jnp.argsort(tgt_xyz[:, 0]).astype(jnp.int32)  # arbitrary i32 keys
c1 = tgt_xyz[:, 0]
c2 = tgt_xyz[:, 1]
c3 = tgt_xyz[:, 2]
c4 = keys0.astype(jnp.float32)


def sort5_step(e, k_, a, b, c, d):
    out = lax.sort((k_ + (e * 1e6).astype(jnp.int32) % 2, a, b, c, d),
                   dimension=0, num_keys=1, is_stable=True)
    return jnp.sum(out[1][:64])


t_sort5 = scan_time(sort5_step, "isolated 5-op global lax.sort",
                    args=(keys0, c1, c2, c3, c4))

# level sorts: segment-shaped 3-operand sorts; NOTES (sort_pallas
# negative result) measured lax.sort at 1M nearly segmentation-
# independent, so ONE representative shape stands in per level.
n_tiles_t = trim_index(
    build_kd_index(tgt_xyz, mask, tile_size=S), N, multiple=_SUPER_G
).n_tiles
import math
n_levels = max(1, math.ceil(math.log(max(n_tiles_t, 2), 4)) - 1)
seg = jnp.reshape(c1[: (N // 64) * 64], (64, -1))
sg2 = jnp.reshape(c2[: (N // 64) * 64], (64, -1))
sg3 = jnp.reshape(c3[: (N // 64) * 64], (64, -1))


def sort3_step(e, a, b, c):
    out = lax.sort((a + e, b, c), dimension=1, num_keys=1, is_stable=True)
    return jnp.sum(out[1][:64])


t_sort3 = scan_time(sort3_step, "isolated 3-op segmented lax.sort",
                    args=(seg, sg2, sg3))
floor_build = t_sort5 + n_levels * t_sort3
print(f"# build sort floor = 5-op + {n_levels} x 3-op = "
      f"{floor_build * 1e3:.1f} ms -> build at "
      f"{floor_build / t_build:.0%} of its sort floor")
rows.append(("tgt KD build", t_build, "sort",
             floor_build / t_build, "lax.sort floor"))
rows.append(("src KD build", t_build_q, "sort",
             floor_build / t_build_q, "lax.sort floor"))

# -------------------------------------------------------- shared state
t_idx = trim_index(build_kd_index(tgt_xyz, mask, tile_size=S), N,
                   multiple=_SUPER_G)
s_idx = trim_index(build_kd_index(xyz, mask, tile_size=SQ), N, multiple=4)
src_sorted = s_idx.tiles.reshape(-1, 3)
tq = src_sorted.shape[0] // SQ
p0 = gt.apply(src_sorted).reshape(tq, SQ, 3)
tgt_n = _index_normals(t_idx, 10, k_tiles=2,
                       mode=cfg.resolve_moments(N), group=VG)
tgt_pl = jnp.concatenate([t_idx.tiles.reshape(-1, 3), tgt_n], axis=1)
tgt_pl_tiles = tgt_pl.reshape(t_idx.n_tiles, t_idx.tile_size, 6)
cand = _candidate_tiles(p0, t_idx, K_REF)[0]

# --------------------------------------------------- normals (take-6)
def normals_step(e, ti):
    return jnp.sum(
        _index_normals(
            ti.replace(tiles=ti.tiles + e), 10, k_tiles=2,
            mode=cfg.resolve_moments(N), group=VG,
        )[:64]
    )


t_norm = scan_time(normals_step, "normals (take-6 defaults)",
                   k=max(2, K // 2), args=(t_idx,))
# hand model (pallas class): radius-moment fold over k_tiles=2 x S
# candidates per query: per query 2*S candidate rows, each ~12 VPU ops
# (3 sub, 3 mul-add dist, radius cmp, 6 weighted moment accums ~ 12);
# moments output 10 f32/query; candidate reads 2S*16B/query tile-shared.
cand_rows = 2 * S
vpu_norm = N * cand_rows * 12.0
hbm_norm = (
    N * 3 * 4  # query coords
    + t_idx.n_tiles * cand_rows * 4 * 4  # candidate rows (3+pad, f32)
    + N * 10 * 4  # moment outputs
)
fr, by = frac_of(t_norm, vpu=vpu_norm, hbm=hbm_norm)
rows.append(("normals take-6", t_norm, "pallas", fr, by))
print(f"#   normals model: vpu={vpu_norm:.3g} ops hbm={hbm_norm:.3g} B "
      f"-> {fr:.0%} of {by}")

# --------------------------------------------- candidate ranking (once)
def rank_step(e, p, ti):
    return jnp.sum(_candidate_tiles(p + e, ti, K_REF)[0][:64])


t_rank = scan_time(rank_step, "candidate ranking (once)",
                   args=(p0, t_idx))
fl, hb = xla_cost(lambda e, p, ti: rank_step(e, p, ti), (p0, t_idx))
fr, by = frac_of(t_rank, flops=fl, hbm=hb)
rows.append(("candidate ranking", t_rank, "xla", fr, by))
print(f"#   ranking xla cost: flops={fl:.3g} bytes={hb:.3g} "
      f"-> {fr:.0%} of {by}")

# ------------------------------------------- take-6 fold (per iter)
from icpx.kernels.blocknn_pallas import (  # noqa: E402
    block_fold_fused_pre,
    fold6_prepare,
)

rt_c, pl_c, dpl = fold6_prepare(cand, t_idx, tgt_pl_tiles, group=VG)


def fold6_step(e, p, a, b):
    d, pl = block_fold_fused_pre(p + e, a, b, dpl, group=VG)
    return jnp.sum(jnp.where(jnp.isfinite(d[:512]), d[:512], 0.0)) + \
        jnp.sum(pl[:512])


t_fold = scan_time(fold6_step, "take-6 fold (score+min+payload)",
                   args=(p0, rt_c, pl_c))
# hand model: per query k_ref*S candidates, ~8 VPU ops each for the
# score (3 sub, 3 fma, cmp, select) + payload min-select ~ (3+dpl) more
# on the winner lane; HBM: prepped candidates (Tq,k,3,S) + payload
# (Tq,k,dpl,S) read once per iter + queries + outputs.
kS = K_REF * S
vpu_fold = N * kS * 8.0
hbm_fold = (
    tq * K_REF * (3 + dpl) * S * 4  # rt_c + pl_c
    + N * 3 * 4
    + N * (1 + 6) * 4
)
fr, by = frac_of(t_fold, vpu=vpu_fold, hbm=hbm_fold)
rows.append(("take-6 fold /iter", t_fold, "pallas", fr, by))
print(f"#   fold model: vpu={vpu_fold:.3g} ops hbm={hbm_fold:.3g} B "
      f"-> {fr:.0%} of {by}")

# ------------------------------------------- fold6 prep (once/phase)
def prep_step(e, cd, ti, tpt):
    a, b, _ = fold6_prepare(
        cd, ti.replace(tiles=ti.tiles + e), tpt, group=VG
    )
    return jnp.sum(a[:2, :2, :2, :2]) + jnp.sum(b[:2, :2, :2, :2])


t_prep = scan_time(prep_step, "fold6 prepare (once/phase)",
                   k=max(2, K // 2), args=(cand, t_idx, tgt_pl_tiles))
fl, hb = xla_cost(lambda e, cd, ti, tpt: prep_step(e, cd, ti, tpt),
                  (cand, t_idx, tgt_pl_tiles))
fr, by = frac_of(t_prep, flops=fl, hbm=hb)
rows.append(("fold6 prepare", t_prep, "xla", fr, by))

# ------------------------------------------------- linearize + solve
from icpx.registration.linearize import (  # noqa: E402
    build_normal_equations_symmetric,
)
from icpx.registration.solve import solve_damped_6x6  # noqa: E402

q0 = tgt_pl[:, :3][: N]
nq0 = tgt_pl[:, 3:][: N]
w0 = jnp.ones((N,), jnp.float32)
zero3 = jnp.zeros((3,), jnp.float32)


def solve_step(e, p, q, n_q, w):
    p2 = p.reshape(-1, 3) + e
    ne = build_normal_equations_symmetric(
        p2, q, n_q, n_q, w, zero3, zero3
    )
    x = solve_damped_6x6(ne.JtJ, ne.Jtr, 1e-6)
    return jnp.sum(x)


t_solve = scan_time(solve_step, "linearize + solve /iter",
                    args=(p0, q0, nq0, w0))
fl, hb = xla_cost(lambda e, p, q, n_q, w: solve_step(e, p, q, n_q, w),
                  (p0, q0, nq0, w0))
fr, by = frac_of(t_solve, flops=fl, hbm=hb)
rows.append(("linearize+solve /iter", t_solve, "xla", fr, by))

# ----------------------------------------------------------- summary
print("\n# stage | ms | class | frac-of-bound | bound")
for name, sec, cls, frac, by in rows:
    print(f"{name:26s} {sec * 1e3:8.2f}  {cls:6s} {frac:6.0%}  {by}")

iters = 4
model = (
    2 * t_build + 2 * t_norm + t_rank + t_prep
    + iters * (t_fold + t_solve)
)
print(f"\n# modeled registration ({iters} refine iters incl. 2 builds + "
      f"2 normals): {model * 1e3:.0f} ms")
