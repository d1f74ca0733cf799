"""Chip probe: is a TPU radix sort viable? (NOTES lever #2, round-4.)

The 1M build decomposition pinned the KD build floor on the GLOBAL
Morton sort (18.08 of 24.31 ms; levels+epilogue ~6 ms). A comparison
sort can't go below lax.sort's network cost, so the only path under it
is a radix/counting sort — whose placement step needs either a scatter
(x.at[dest].set(vals)) or an inverse-permutation gather. This times
both primitives at build shapes, plus a one-pass counting-sort
prototype (histogram -> prefix -> rank -> place), to decide whether the
radix route can beat ~12 ms before building it for real.

Usage: python scripts/exp_scatter.py [N] [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from icpx.cli import _enable_compile_cache

_enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
vals = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
keys = jnp.asarray(rng.integers(0, 1 << 30, size=(N,)).astype(np.int32))


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
    print(f"{label:44s} {best * 1e3:8.2f} ms", flush=True)
    return best


# 1. permutation scatter: out[perm[i]] = vals[i]
scan_time(
    lambda e: jnp.zeros((N,), jnp.float32)
    .at[perm]
    .set(vals + e, unique_indices=True, mode="drop")[0],
    "scatter f32 .at[perm].set",
)

# 2. the same data movement as a gather by inverse permutation
scan_time(
    lambda e: (vals + e)[perm][0],
    "gather  f32 [perm]",
)

# 3. 4-column scatter (the (key, x, y, z, orig) placement a radix
#    build pass would do, expressed as one (N, 4) row scatter)
vals4 = jnp.stack([vals, vals + 1, vals + 2, vals + 3], axis=1)
scan_time(
    lambda e: jnp.zeros((N, 4), jnp.float32)
    .at[perm]
    .set(vals4 + e, unique_indices=True, mode="drop")[0, 0],
    "scatter f32 (N,4) rows .at[perm].set",
)

# 4. histogram of top-12-bit buckets (radix pass 1)
B = 4096


def hist_step(e):
    b = (keys >> 18).astype(jnp.int32)
    h = jnp.zeros((B,), jnp.int32).at[b].add(1)
    return h[0].astype(jnp.float32) + e * 0


scan_time(hist_step, f"histogram {B} buckets .at[].add")


# 5. counting-sort prototype for ONE radix pass: bucket by top 12 bits,
#    rank via sorted-bucket trick is what we're avoiding — instead rank =
#    per-bucket running count via segment prefix over a (B, ...) layout
#    is scatter-bound too; here we just measure dest computation + the
#    row scatter, the irreducible parts.
def radix_pass_step(e):
    b = (keys >> 18).astype(jnp.int32)
    h = jnp.zeros((B,), jnp.int32).at[b].add(1)
    start = jnp.cumsum(h) - h
    # rank within bucket: stable rank needs a running counter per
    # bucket; emulate its cost with a second scatter-add pass readback
    rank = jnp.zeros((B,), jnp.int32).at[b].add(1)[b] * 0  # placeholder
    dest = start[b] + rank
    out = jnp.zeros((N,), jnp.float32).at[dest].set(
        vals + e, mode="drop"
    )
    return out[0]


scan_time(radix_pass_step, "radix pass (hist+prefix+scatter, no rank)")
