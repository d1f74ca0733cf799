"""KD-build internals timing on chip (dev): which phase costs 58ms?"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import icpx.kernels.blocknn as bnn
from icpx.cloud import PAD_COORD
from icpx.io.loaders import synthetic_surface

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
xyz = jnp.asarray(synthetic_surface(N, seed=0))
mask = jnp.ones((N,), bool)


def timed(name, fn, *args, reps=3):
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, jnp.float32((r + 1) * 1e-7))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:8.1f} ms", flush=True)
    return out


@jax.jit
def full_build(x, m, eps):
    return bnn.build_kd_index(x + eps, m, tile_size=64)


timed("full build Sq=64", full_build, xyz, mask)


@jax.jit
def morton_only(x, m, eps):
    pts = x + eps
    lo = jnp.min(jnp.where(m[:, None], pts, PAD_COORD), axis=0)
    hi = jnp.max(jnp.where(m[:, None], pts, -PAD_COORD), axis=0)
    inv = 1.0 / jnp.maximum(hi - lo, 1e-6)
    keys = bnn.morton_keys(pts, lo, inv)
    o = jnp.arange(N, dtype=jnp.int32)
    return jax.lax.sort(
        (keys, pts[:, 0], pts[:, 1], pts[:, 2], o),
        dimension=0, num_keys=1, is_stable=True,
    )


timed("morton phase (keys+sort5)", morton_only, xyz, mask)


def level_fn(c):
    @jax.jit
    def one_level(x, eps):
        pts = x + eps
        total = pts.shape[0]
        m = total // c
        seg = pts.reshape(c, m, 3)
        v = jnp.ones((c, m), bool)
        lo = jnp.min(jnp.where(v[..., None], seg, PAD_COORD), axis=1)
        hi = jnp.max(jnp.where(v[..., None], seg, -PAD_COORD), axis=1)
        widest = jnp.argmax(hi - lo, axis=1)
        vals = jnp.take_along_axis(seg, widest[:, None, None], axis=2)[..., 0]
        key = jnp.where(v, vals, PAD_COORD)
        o = jnp.arange(total, dtype=jnp.int32).reshape(c, m)
        return jax.lax.sort(
            (key, seg[..., 0], seg[..., 1], seg[..., 2], o),
            dimension=1, num_keys=1, is_stable=True,
        )

    return one_level


for c in (16, 256, 4096):
    timed(f"one median level c={c}", level_fn(c), xyz)


@jax.jit
def epilogue(x, eps):
    pts = x + eps
    s = 64
    t2 = pts.shape[0] // s
    tiles = pts.reshape(t2, s, 3)
    tvalid = jnp.ones((t2, s), bool)
    box_lo = jnp.min(jnp.where(tvalid[..., None], tiles, PAD_COORD), axis=1)
    box_hi = jnp.max(jnp.where(tvalid[..., None], tiles, -PAD_COORD), axis=1)
    n_valid = tvalid.sum(axis=1, keepdims=True)
    centroids = jnp.where(tvalid[..., None], tiles, 0.0).sum(axis=1) / (
        jnp.maximum(n_valid, 1)
    )
    return box_lo, box_hi, centroids


timed("epilogue (boxes+centroids)", epilogue, xyz)


@jax.jit
def qboxes(x, eps):
    return bnn._query_boxes((x + eps).reshape(-1, 64, 3))


timed("_query_boxes (Tq,64,3)", qboxes, xyz)
