"""Chip A/B: Pallas segmented bitonic sort vs lax.sort at the KD-build
level-sort shapes (NOTES lever #2).

Times the 4-operand level sort (key + 2 payload f32 + orig int32) at
every (c, m) the 1M / 8M builds actually dispatch, via in-jit K-rep
scans (relay-safe fencing). Usage: python scripts/exp_psort.py [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from icpx.cli import _enable_compile_cache
from icpx.kernels.sort_pallas import sort_segments

_enable_compile_cache()

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8

# (c, m): the level-sort shapes of the 1M build (t2=8192, seg=65536)
# and the 8M build (t2=65536) — same m ladder, larger c.
SHAPES_1M = [(16, 65536), (64, 16384), (256, 4096), (1024, 1024),
             (4096, 256)]
SHAPES_8M = [(128, 65536), (512, 16384), (2048, 4096), (8192, 1024),
             (32768, 256)]


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
    print(f"{label:38s} {best * 1e3:8.2f} ms", flush=True)
    return best


def bench_shape(c, m):
    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.normal(size=(c, m)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(c, m)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(c, m)).astype(np.float32))
    o = jnp.asarray(
        rng.permutation(c * m).reshape(c, m).astype(np.int32)
    )

    def xla_step(e):
        ks, a_s, b_s, o_s = lax.sort(
            (key0 + e, a, b, o), dimension=1, num_keys=1, is_stable=True
        )
        return ks[0, 0] + a_s[0, 1] + o_s[0, 2].astype(jnp.float32)

    def pl_step(e):
        ks, a_s, b_s, o_s = sort_segments(key0 + e, (a, b, o))
        return ks[0, 0] + a_s[0, 1] + o_s[0, 2].astype(jnp.float32)

    t_x = scan_time(xla_step, f"lax.sort   c={c:6d} m={m:6d}")
    t_p = scan_time(pl_step, f"pallas     c={c:6d} m={m:6d}")
    print(f"  -> ratio pallas/xla = {t_p / t_x:.3f}", flush=True)
    return t_x, t_p


which = sys.argv[2] if len(sys.argv) > 2 else "1m"
shapes = SHAPES_1M if which == "1m" else SHAPES_8M
tot_x = tot_p = 0.0
for c, m in shapes:
    t_x, t_p = bench_shape(c, m)
    tot_x += t_x
    tot_p += t_p
print(f"TOTAL levels: xla {tot_x * 1e3:.2f} ms  pallas "
      f"{tot_p * 1e3:.2f} ms  ratio {tot_p / tot_x:.3f}")
