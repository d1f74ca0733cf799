"""Round-4 experiment: per-STAGE timing at 1M vs 8M to localize the
super-linear cost behind the 75% large-cloud efficiency ratio (NOTES
levers #1; round-3 VERDICT missing #1).

Each stage runs K reps inside ONE jitted lax.scan with per-step varied
inputs (the relay memoizes identical executions and `block_until_ready`
returns early — NOTES measurement gotcha), then we fetch a scalar and
divide by K: the ~60 ms dispatch floor amortizes away.

Usage: python scripts/exp_stage4.py [N] [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from icpx.cloud import PointCloud
from icpx.geometry.transforms import make_rigid_perturbation
from icpx.io.loaders import synthetic_surface
from icpx.kernels.blocknn import (
    _SUPER_G,
    _candidate_tiles,
    block_nn,
    block_nn_payload,
    build_kd_index,
    tile_payload,
    trim_index,
)
from icpx.registration.icp import ICPConfig, _index_normals

from icpx.cli import _enable_compile_cache
_enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
K = int(sys.argv[2]) if len(sys.argv) > 2 else (8 if N <= 2 << 20 else 4)

cfg = ICPConfig()
S = cfg.block_tile  # 128
SQ = cfg.resolve_q_tile(N)
K_REF = cfg.block_k_refine  # 6
INFOLD = cfg.resolve_payload(N) == "infold"
print(f"# N={N} S={S} Sq={SQ} k_ref={K_REF} infold={INFOLD} K={K}")

xyz = jnp.asarray(synthetic_surface(N, seed=0))
mask = jnp.ones((N,), bool)
gt = make_rigid_perturbation(angle=0.2, translation=(0.12, -0.06, 0.03))
rng = np.random.default_rng(1)
tgt_xyz = jnp.asarray(np.asarray(gt.apply(xyz))[rng.permutation(N)])


def scan_time(step_fn, label, k=K, args=()):
    """K in-jit reps of step_fn(e, *args). Large device arrays MUST ride
    in `args` (jit parameters): closed-over concrete arrays embed as HLO
    constants and blow the relay's compile-request body limit (HTTP 413
    at the 8M infold step — 200 MB payload table as a constant)."""
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
        e2 = eps + jnp.float32(0.01 * (r + 1))  # defeat relay memoization
        t0 = time.perf_counter()
        float(run(e2, *args))
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"{label:34s} {best * 1e3:8.2f} ms  "
          f"({best / N * 1e9:6.2f} ns/pt)", flush=True)
    return best


# ---- builds -----------------------------------------------------------------
scan_time(
    lambda e, tx: jnp.sum(build_kd_index(tx + e, mask,
                                         tile_size=S).centroids[:8]),
    "tgt KD build (S=128)", args=(tgt_xyz,),
)
scan_time(
    lambda e, sx: jnp.sum(build_kd_index(sx + e, mask,
                                         tile_size=SQ).centroids[:8]),
    f"src KD build (Sq={SQ})", args=(xyz,),
)

# ---- shared fixed state for the per-iteration stages ------------------------
t_idx = trim_index(build_kd_index(tgt_xyz, mask, tile_size=S), N,
                   multiple=_SUPER_G)
s_idx = trim_index(build_kd_index(xyz, mask, tile_size=SQ), N, multiple=4)
src_sorted = s_idx.tiles.reshape(-1, 3)
tq = src_sorted.shape[0] // SQ
p0 = gt.apply(src_sorted).reshape(tq, SQ, 3)  # aligned queries (refine regime)
tgt_n = _index_normals(t_idx, 10, k_tiles=2)
tgt_pl = jnp.concatenate([t_idx.tiles.reshape(-1, 3), tgt_n], axis=1)
tgt_pl_tiles = tgt_pl.reshape(t_idx.n_tiles, t_idx.tile_size, 6)
cand = _candidate_tiles(p0, t_idx, K_REF)[0]
prec = "bf16"

# ---- in-jit normals (once per registration per cloud) -----------------------
scan_time(
    lambda e, ti: jnp.sum(
        _index_normals(
            ti.replace(tiles=ti.tiles + e), 10, k_tiles=2
        )[:64]
    ),
    "normals (radius moments + eigh)",
    k=max(2, K // 2), args=(t_idx,),
)

# ---- take-6 moments kernel (the normals fix under test) ---------------------
from icpx.registration.icp import _index_normals as _idx_n  # noqa: E402

scan_time(
    lambda e, ti: jnp.sum(
        _idx_n(
            ti.replace(tiles=ti.tiles + e), 10, k_tiles=2, mode="vmem"
        )[:64]
    ),
    "normals take6 (VMEM moments)",
    k=max(2, K // 2), args=(t_idx,),
)

# ---- candidate ranking (paid once for refine w/ frozen cands) ---------------
scan_time(
    lambda e, p, ti: jnp.sum(
        _candidate_tiles(p + e, ti, K_REF)[0][:64]
    ),
    "candidate ranking (hierarchical)", args=(p0, t_idx),
)


# ---- NN score fold alone (gather path, return_pos) --------------------------
def nn_step(e, p, ti, cd):
    d, pos = block_nn(
        p + e, ti, k_tiles=K_REF, return_pos=True, cand_tiles=cd,
        score_prec=prec,
    )
    return jnp.sum(jnp.where(jnp.isfinite(d[:512]), d[:512], 0.0)) + jnp.sum(
        pos[:512].astype(jnp.float32)
    )


t_nn = scan_time(nn_step, "block_nn fold (score+min only)",
                 args=(p0, t_idx, cand))


# ---- payload row gather (the <=1M delivery path) ----------------------------
_, pos0 = block_nn(
    p0, t_idx, k_tiles=K_REF, return_pos=True, cand_tiles=cand,
    score_prec=prec,
)


# vary via index jitter to defeat CSE/memoization, keeping coherence
def gather_step_v(e, tp, ps):
    p = jnp.where(ps < tp.shape[0] - 1, ps + jnp.int32(e * 1e6) % 2, ps)
    return jnp.sum(tp[p][:512])


t_g = scan_time(gather_step_v, "payload row gather (N,6)",
                args=(tgt_pl, pos0))


# ---- in-fold payload delivery (the >=2M path) -------------------------------
def infold_step(e, p, ti, tpt, cd):
    d, pl = block_nn_payload(
        p + e, ti, tpt, k_tiles=K_REF, cand_tiles=cd,
        score_prec=prec, payload_prec="high", payload_xyz=3,
    )
    return jnp.sum(jnp.where(jnp.isfinite(d[:512]), d[:512], 0.0)) + jnp.sum(
        pl[:512]
    )


t_if = scan_time(infold_step, "block_nn_payload (score+select)",
                 args=(p0, t_idx, tgt_pl_tiles, cand))


# ---- take-5 fused select (score fold + Pallas VMEM select) ------------------
from icpx.kernels.blocknn_pallas import (  # noqa: E402
    block_fold_fused,
    payload_select_fused,
)


def select_step(e, p, ti, tpt, cd):
    d, pos = block_nn(
        p + e, ti, k_tiles=K_REF, return_pos=True, cand_tiles=cd,
        score_prec=prec,
    )
    pl = payload_select_fused(pos.reshape(tq, SQ), cd, tpt)
    return jnp.sum(jnp.where(jnp.isfinite(d[:512]), d[:512], 0.0)) + jnp.sum(
        pl[:512]
    )


t_sel = scan_time(select_step, "take5: score fold + fused select",
                  args=(p0, t_idx, tgt_pl_tiles, cand))


# ---- take-6 whole-fold VMEM kernel ------------------------------------------
def fold6_step(e, p, ti, tpt, cd):
    d, pl = block_fold_fused(p + e, cd, ti, tpt)
    return jnp.sum(jnp.where(jnp.isfinite(d[:512]), d[:512], 0.0)) + jnp.sum(
        pl[:512]
    )


t_f6 = scan_time(fold6_step, "take6: whole fold in VMEM",
                 args=(p0, t_idx, tgt_pl_tiles, cand))

print(f"# derived: payload-select overhead (infold - score-only) = "
      f"{(t_if - t_nn) * 1e3:.2f} ms")
print(f"# derived: gather-path iter ~= {(t_nn + t_g) * 1e3:.2f} ms, "
      f"infold iter ~= {t_if * 1e3:.2f} ms, take5 iter ~= "
      f"{t_sel * 1e3:.2f} ms, take6 iter ~= {t_f6 * 1e3:.2f} ms")
