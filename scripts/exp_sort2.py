"""Sort cost model, relay-proof (dev): run K reps INSIDE one jit via
lax.scan (carry-perturbed so nothing is constant-folded or memoized),
fetch one scalar, divide. block_until_ready alone returns early over the
axon relay — see exp_build history."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
K = 8
rng = np.random.default_rng(0)
key0 = jnp.asarray(rng.integers(0, 2**30, (N,), dtype=np.int32))
ops0 = jnp.asarray(rng.normal(size=(4, N)).astype(np.float32))


def bench(name, body, *inputs):
    @jax.jit
    def run(k, o, eps):
        def step(carry, i):
            kk, oo = carry
            out = body(kk + i + eps, oo)
            # fold output back so every step depends on the previous
            return (out[0].astype(jnp.int32), jnp.stack(out[1:5])), out[0][0]
        (kf, of), scalars = jax.lax.scan(
            step, (k, o), jnp.arange(K, dtype=jnp.int32)
        )
        return scalars.sum() + of.sum()

    v = float(run(*inputs, jnp.int32(0)))  # compile+warm
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        v = float(run(*inputs, jnp.int32(r + 1)))
        ts.append((time.perf_counter() - t0) / K)
    print(f"{name:44s} {min(ts)*1e3:8.2f} ms/sort", flush=True)


def sort5_stable(k, o):
    return jax.lax.sort((k, o[0], o[1], o[2], o[3]), dimension=0,
                        num_keys=1, is_stable=True)


def sort5_unstable(k, o):
    return jax.lax.sort((k, o[0], o[1], o[2], o[3]), dimension=0,
                        num_keys=1, is_stable=False)


def sort2(k, o):
    out = jax.lax.sort((k, o[0]), dimension=0, num_keys=1, is_stable=True)
    return (out[0], out[1], o[1], o[2], o[3])


def sort5_seg(k, o):
    c = 16
    outs = jax.lax.sort(
        tuple(x.reshape(c, -1) for x in (k, o[0], o[1], o[2], o[3])),
        dimension=1, num_keys=1, is_stable=True,
    )
    return tuple(x.reshape(-1) for x in outs)


bench("sort 5-operand stable", sort5_stable, key0, ops0)
bench("sort 5-operand unstable", sort5_unstable, key0, ops0)
bench("sort 2-operand stable", sort2, key0, ops0)
bench("sort 5-op stable 16 segments", sort5_seg, key0, ops0)
