"""Fused nearest-neighbor Pallas kernel (TPU).

The jnp tiled path (`icpx.kernels.knn`) makes XLA stream (tile_q, tile_r)
distance blocks through HBM; at 65k^2 pairs that's ~17 GB of traffic per
pass and the op is bandwidth-bound. This kernel fuses distance formation
and the argmin into VMEM:

  * grid (query_tiles, ref_tiles), ref-tile dim innermost ("arbitrary"
    semantics): Mosaic pipelines the HBM->VMEM tile DMAs automatically;
  * the cross term q . r^T rides the MXU ((TQ,8) x (8,TR) — coordinates
    padded 3->8 sublanes, transposed ref so points sit in lanes);
  * per-query ||q||^2 is an argmin-invariant constant, so the kernel
    scores d' = ||r||^2 - 2 q.r and adds ||q||^2 back only at the end;
  * the running (best score, best index) lives in VMEM scratch, persists
    across ref tiles (TPU grids execute sequentially), and is written out
    once on the last ref tile.

Masked/padded reference rows must carry the PAD_COORD sentinel coordinate
(distance ~1e16, never the argmin) — `nn_pallas` handles that prep.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icpx.cloud import PAD_COORD

_BIG = 3.0e38  # python float: jnp scalars would be captured consts in the kernel


def _nn_kernel(q_ref, rt_ref, d_out, i_out, best_s, best_c, *, n_rt, tile_r):
    """Lane-parallel running argmin.

    The naive per-tile `argmin(axis=1)` pays O(log TR) cross-lane shuffles
    per tile. Instead keep a (TQ, 128) per-lane running minimum + the
    CHUNK id that produced it (the lane id is implicit in the position),
    fold each 128-wide chunk of the tile with pure elementwise ops, and do
    the single cross-lane argmin once, on the last tile.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_s[...] = jnp.full_like(best_s, _BIG)
        best_c[...] = jnp.zeros_like(best_c)

    q = q_ref[...]  # (TQ, 8) — [-2x, -2y, -2z, 1, 0...]
    rt = rt_ref[...]  # (8, TR) — rows [x, y, z, ||r||^2, 0...]
    # score = ||r||^2 - 2 q.r comes straight off the MXU via the augmented
    # coordinates; it is the squared distance biased by the argmin-invariant
    # -||q||^2 (added back at the end).
    score = jax.lax.dot_general(
        q,
        rt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bs, bc = best_s[...], best_c[...]
    chunk0 = j * (tile_r // 128)
    for c in range(tile_r // 128):
        sc = score[:, c * 128 : (c + 1) * 128]
        better = sc < bs
        bs = jnp.where(better, sc, bs)
        bc = jnp.where(better, chunk0 + c, bc)
    best_s[...] = bs
    best_c[...] = bc

    @pl.when(j == n_rt - 1)
    def _():
        # ||q||^2 from the augmented row: (sum((-2 q_k)^2) + 1^2 - 1) / 4
        qq = (jnp.sum(q * q, axis=1, keepdims=True) - 1.0) * 0.25  # (TQ, 1)
        s = best_s[...]
        smin = jnp.min(s, axis=1, keepdims=True)  # (TQ, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        gidx = best_c[...] * 128 + lane
        # first matching lane wins (ties): take max over the one-hot set
        cand = jnp.where(s == smin, gidx, -1)
        i_out[...] = jnp.max(cand, axis=1, keepdims=True)
        d_out[...] = jnp.maximum(smin + qq, 0.0)


@functools.partial(
    jax.jit, static_argnames=("tile_q", "tile_r", "interpret")
)
def nn_pallas(
    query: jax.Array,
    ref: jax.Array,
    *,
    ref_mask: Optional[jax.Array] = None,
    tile_q: int = 512,
    tile_r: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Single nearest neighbor, fused on TPU.

    Args/returns match `icpx.kernels.knn.nearest_neighbor`:
    (sqdist (Nq,), index (Nq,)). Exact (f32).
    """
    nq, nr = query.shape[0], ref.shape[0]
    if ref_mask is not None:
        ref = jnp.where(ref_mask[:, None], ref, PAD_COORD)

    tile_q = min(tile_q, max(_round_up(nq, 8), 8))
    tile_r = min(tile_r, max(_round_up(nr, 128), 128))
    # VMEM safety: the (tile_q, tile_r) score block must stay well under
    # the ~16 MB budget; shrink tile_q first (callers may pass the jnp
    # path's larger defaults through `nearest_neighbor`).
    tile_r = min(tile_r, 4096)
    while tile_q > 8 and tile_q * tile_r * 4 > 8 * 1024 * 1024:
        tile_q //= 2
    tile_q = max(_round_up(tile_q, 8), 8)
    nq_p = _round_up(nq, tile_q)
    nr_p = _round_up(nr, tile_r)
    # Augmented coordinates: q8 = [-2x, -2y, -2z, 1, 0...] and
    # rt = [x, y, z, ||r||^2, 0...] so the MXU emits the biased score
    # ||r||^2 - 2 q.r directly. Query padding: zeros (rows sliced off
    # afterwards). Ref padding: sentinel so pads never win the argmin.
    q8 = jnp.zeros((nq_p, 8), jnp.float32).at[:nq, :3].set(-2.0 * query)
    q8 = q8.at[:, 3].set(1.0)
    r3 = jnp.full((nr_p, 3), PAD_COORD, jnp.float32).at[:nr].set(ref)
    rt = jnp.zeros((nr_p, 8), jnp.float32).at[:, :3].set(r3)
    rt = rt.at[:, 3].set(jnp.sum(r3 * r3, axis=1))
    rt = rt.T  # (8, Nr_p)

    n_qt = nq_p // tile_q
    n_rt = nr_p // tile_r

    kernel = functools.partial(_nn_kernel, n_rt=n_rt, tile_r=tile_r)
    grid = (n_qt, n_rt)
    d, i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_q, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, tile_r), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_p, 1), jnp.float32),
            jax.ShapeDtypeStruct((nq_p, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, 128), jnp.float32),
            pltpu.VMEM((tile_q, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_p * nr_p * 8 + 4 * nq_p * nr_p,
            bytes_accessed=(nq_p * 32 + nr_p * 36) * n_qt,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q8, rt)
    return d[:nq, 0], i[:nq, 0]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
