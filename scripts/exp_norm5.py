"""Round-5: decompose the normals stage at 8M (the roofline outlier —
exp_stage5 measured 295 ms against a ~13 ms VPU/HBM model, 4% of
bound) and sweep the moments kernel's group size.

Hypothesis: the take-6 moments kernel's grid is DMA-latency-bound —
group=8 puts ~12 KB operand blocks on each of 8192 sequential grid
steps, so per-step DMA latency (not bandwidth, not compute) dominates.
Bigger groups amortize it; the same question is asked of the fold.

Usage: python scripts/exp_norm5.py [N] [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from icpx.geometry.transforms import make_rigid_perturbation
from icpx.io.loaders import synthetic_surface
from icpx.kernels.blocknn import (
    _SUPER_G,
    _candidate_tiles,
    block_radius_moments,
    build_kd_index,
    trim_index,
)
from icpx.kernels.blocknn_pallas import block_radius_moments_fused6
from icpx.kernels.eigh3 import smallest_eigenvector_3x3
from icpx.kernels.voxel import auto_cell_size
from icpx.registration.icp import ICPConfig, _index_normals

from icpx.cli import _enable_compile_cache
_enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8 << 20
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4

cfg = ICPConfig()
S = cfg.block_tile
xyz = jnp.asarray(synthetic_surface(N, seed=0))
mask = jnp.ones((N,), bool)

t_idx = trim_index(build_kd_index(xyz, mask, tile_size=S), N,
                   multiple=_SUPER_G)
flat = t_idx.tiles.reshape(-1, 3)
valid = t_idx.order >= 0
scale = 3.0 * float(np.sqrt(1.0))
radius = auto_cell_size(flat, valid, scale=scale)
cov_example = jnp.tile(jnp.eye(3)[None], (N, 1, 1)) * 0.01


def scan_time(step_fn, label, k=K, args=()):
    eps = jnp.arange(1, k + 1, dtype=jnp.float32) * 1e-6

    @jax.jit
    def run(e, *a):
        def body(acc, ei):
            return acc + step_fn(ei, *a), None

        acc, _ = lax.scan(body, jnp.float32(0.0), e)
        return acc

    float(run(eps, *args))
    best = float("inf")
    for r in range(2):
        e2 = eps + jnp.float32(0.01 * (r + 1)) + jnp.float32(
            (time.time_ns() % 997) * 1e-9
        )
        t0 = time.perf_counter()
        float(run(e2, *args))
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"{label:44s} {best * 1e3:8.2f} ms "
          f"({best / N * 1e9:6.2f} ns/pt)", flush=True)
    return best


# 0. whole stage, both modes (reference points)
scan_time(
    lambda e, ti: jnp.sum(_index_normals(
        ti.replace(tiles=ti.tiles + e), 10, k_tiles=2, mode="vmem",
        group=8)[:64]),
    "_index_normals vmem g8 (whole stage)", k=max(2, K // 2), args=(t_idx,),
)
scan_time(
    lambda e, ti: jnp.sum(_index_normals(
        ti.replace(tiles=ti.tiles + e), 10, k_tiles=2, mode="xla")[:64]),
    "_index_normals xla (whole stage)", k=max(2, K // 2), args=(t_idx,),
)

# 1. pieces
scan_time(
    lambda e, f, v: jnp.sum(auto_cell_size(f + e, v, scale=scale)),
    "auto_cell_size", args=(flat, valid),
)
scan_time(
    lambda e, ti: jnp.sum(
        _candidate_tiles(ti.tiles + e, ti, 2)[0][:64].astype(jnp.float32)
    ),
    "candidate ranking k=2", args=(t_idx,),
)
scan_time(
    lambda e, c: jnp.sum(smallest_eigenvector_3x3(c + e)[0][:64]),
    "eigh3 (N covariances)", args=(cov_example,),
)

# 2. moments kernel group sweep
for g in (8, 16, 32, 64, 128):
    try:
        scan_time(
            lambda e, ti, gg=g: jnp.sum(block_radius_moments_fused6(
                ti.tiles + e, ti, radius, k_tiles=2, group=gg)[2][:64]),
            f"moments6 VMEM kernel group={g}", args=(t_idx,),
        )
    except Exception as ex:
        print(f"moments6 group={g} FAILED: {type(ex).__name__} "
              f"{str(ex)[:100]}", flush=True)

# 3. XLA moments path alone
scan_time(
    lambda e, ti: jnp.sum(block_radius_moments(
        ti.tiles + e, ti, radius, k_tiles=2, prec="highest")[2][:64]),
    "block_radius_moments XLA", args=(t_idx,),
)
