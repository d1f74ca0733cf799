"""Sort cost model on chip: stability, operand count, batching (dev)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 2**30, (N,), dtype=np.int32))
key2 = jnp.asarray(rng.integers(0, 2**30, (2, N), dtype=np.int32))
ops = [jnp.asarray(rng.normal(size=(N,)).astype(np.float32)) for _ in range(4)]
ops2 = [
    jnp.asarray(rng.normal(size=(2, N)).astype(np.float32)) for _ in range(4)
]


def timed(name, fn, *args, reps=3):
    out = fn(*args, 0)
    jax.block_until_ready(out)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, r + 1)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:8.1f} ms", flush=True)


@jax.jit
def sort5_stable(k, a, b, c, d, eps):
    return jax.lax.sort((k + eps, a, b, c, d), dimension=0, num_keys=1,
                        is_stable=True)


@jax.jit
def sort5_unstable(k, a, b, c, d, eps):
    return jax.lax.sort((k + eps, a, b, c, d), dimension=0, num_keys=1,
                        is_stable=False)


@jax.jit
def sort2_stable(k, a, eps):
    return jax.lax.sort((k + eps, a), dimension=0, num_keys=1,
                        is_stable=True)


@jax.jit
def sort5_batched(k, a, b, c, d, eps):
    return jax.lax.sort((k + eps, a, b, c, d), dimension=1, num_keys=1,
                        is_stable=True)


@jax.jit
def sort5_seg16(k, a, b, c, d, eps):
    args = tuple(x.reshape(16, -1) for x in (k + eps, a, b, c, d))
    return jax.lax.sort(args, dimension=1, num_keys=1, is_stable=True)


timed("sort 1M 5-operand stable", sort5_stable, key, *ops)
timed("sort 1M 5-operand unstable", sort5_unstable, key, *ops)
timed("sort 1M 2-operand stable", sort2_stable, key, ops[0])
timed("sort (2,1M) 5-operand stable (batched)", sort5_batched, key2, *ops2)
timed("sort (16,64k) 5-op stable (segmented)", sort5_seg16, key, *ops)
