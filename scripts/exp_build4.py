"""Round-4: KD-build cost decomposition (NOTES lever #2 groundwork).

Times the build's three phases separately at a given N — the global
Morton 5-operand sort, the median-cut level sorts, the box/centroid
epilogue — via the same in-jit K-rep scans as exp_stage4. Decides where
a Pallas sort could actually pay before building one.

Usage: python scripts/exp_build4.py [N] [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from icpx.cloud import PAD_COORD
from icpx.io.loaders import synthetic_surface
from icpx.kernels.blocknn import build_kd_index, morton_keys

from icpx.cli import _enable_compile_cache
_enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

xyz = jnp.asarray(synthetic_surface(N, seed=0))
mask = jnp.ones((N,), bool)


def scan_time(step_fn, label, k=K):
    eps = jnp.arange(1, k + 1, dtype=jnp.float32) * 1e-6

    @jax.jit
    def run(e):
        def body(acc, ei):
            return acc + step_fn(ei), None

        acc, _ = lax.scan(body, jnp.float32(0.0), e)
        return acc

    float(run(eps))
    best = float("inf")
    for r in range(2):
        t0 = time.perf_counter()
        float(run(eps + jnp.float32(0.01 * (r + 1))))
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"{label:34s} {best * 1e3:8.2f} ms", flush=True)
    return best


# full build reference
t_full = scan_time(
    lambda e: jnp.sum(
        build_kd_index(xyz + e, mask, tile_size=128).centroids[:8]
    ),
    "full build_kd_index (S=128)",
)


# phase 1: Morton keys + ONE global 5-operand sort
def morton_step(e):
    pts = xyz + e
    lo = jnp.min(pts, axis=0)
    hi = jnp.max(pts, axis=0)
    keys = morton_keys(pts, lo, 1.0 / jnp.maximum(hi - lo, 1e-6))
    orig = jnp.arange(N, dtype=jnp.int32)
    _, x0, x1, x2, og = jax.lax.sort(
        (keys[None, :], pts[None, :, 0], pts[None, :, 1], pts[None, :, 2],
         orig[None, :]),
        dimension=1, num_keys=1, is_stable=True,
    )
    return x0[0, 0] + x1[0, 0] + og[0, 0].astype(jnp.float32)


t_m = scan_time(morton_step, "morton keys + 1 global sort")


# phase 2: ONE level sort at segment granularity (c = 16 segments at 1M)
def level_step(e, c):
    pts = (xyz + e).reshape(c, -1, 3)
    lo = jnp.min(pts, axis=1)
    hi = jnp.max(pts, axis=1)
    widest = jnp.argmax(hi - lo, axis=1)
    vals = jnp.take_along_axis(pts, widest[:, None, None], axis=2)[..., 0]
    orig = jnp.arange(N, dtype=jnp.int32).reshape(c, -1)
    _, x0, x1, x2, og = jax.lax.sort(
        (vals, pts[..., 0], pts[..., 1], pts[..., 2], orig),
        dimension=1, num_keys=1, is_stable=True,
    )
    return x0[0, 0] + og[0, 7].astype(jnp.float32)


for c in (16, 256, 4096):
    if N // c >= 256:
        scan_time(lambda e, c=c: level_step(e, c), f"1 level sort (c={c})")


# phase 3: epilogue (boxes + centroids from sorted tiles)
def epi_step(e):
    tiles = (xyz + e).reshape(-1, 128, 3)
    box_lo = jnp.min(tiles, axis=1)
    box_hi = jnp.max(tiles, axis=1)
    cent = jnp.mean(tiles, axis=1)
    return jnp.sum(box_lo[:4]) + jnp.sum(box_hi[:4]) + jnp.sum(cent[:4])


scan_time(epi_step, "epilogue (boxes + centroids)")

# 2-operand variant of the global sort (key + orig only): how much of
# the sort cost is operand traffic?
def morton2_step(e):
    pts = xyz + e
    lo = jnp.min(pts, axis=0)
    hi = jnp.max(pts, axis=0)
    keys = morton_keys(pts, lo, 1.0 / jnp.maximum(hi - lo, 1e-6))
    orig = jnp.arange(N, dtype=jnp.int32)
    _, og = jax.lax.sort(
        (keys[None, :], orig[None, :]), dimension=1, num_keys=1,
        is_stable=True,
    )
    return og[0, 0].astype(jnp.float32) + og[0, 5].astype(jnp.float32)


t_m2 = scan_time(morton2_step, "morton + 2-operand global sort")


# gather-after-2-op-sort: the alternative data movement
def gather_step(e):
    pts = xyz + e
    lo = jnp.min(pts, axis=0)
    hi = jnp.max(pts, axis=0)
    keys = morton_keys(pts, lo, 1.0 / jnp.maximum(hi - lo, 1e-6))
    orig = jnp.arange(N, dtype=jnp.int32)
    _, og = jax.lax.sort(
        (keys[None, :], orig[None, :]), dimension=1, num_keys=1,
        is_stable=True,
    )
    g = pts[og[0]]
    return g[0, 0] + g[7, 1]


scan_time(gather_step, "2-op sort + (N,3) gather")
print(f"# full={t_full*1e3:.2f} morton5={t_m*1e3:.2f} "
      f"morton2={t_m2*1e3:.2f}")
