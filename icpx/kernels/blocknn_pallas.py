"""Fused Pallas kernel for the block-sparse NN fold (TPU).

The jnp fold in `blocknn.block_nn` materializes the (Tq, Sq, S) score
tensor in HBM every candidate step (~8 GB per 1M-point NN pass). This
kernel keeps the score in VMEM: grid (query_tile, candidate_k) with the
candidate ref-tile id scalar-prefetched so Mosaic's pipeline DMAs the
right (8, S) ref tile per step; the per-lane running minimum persists in
VMEM scratch across the candidate dimension (TPU grids are sequential)
exactly like `knn_pallas`.

Layouts: queries pre-augmented (Tq, Sq, 8) = [-2x,-2y,-2z,1,0...]; ref
tiles pre-augmented + transposed (T, 8, S) = [x,y,z,||r||^2,0...] rows.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icpx.cloud import PAD_COORD
from icpx.kernels.blocknn import TileIndex, _candidate_tiles

_BIG = 3.0e38


def _kernel(cand_ref, q_ref, rt_ref, d_out, p_out, best_s, best_c, *, n_k, s):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        best_s[...] = jnp.full_like(best_s, _BIG)
        best_c[...] = jnp.zeros_like(best_c)

    q = q_ref[0]  # (Sq, 8)
    rt = rt_ref[0]  # (8, S)
    tid = cand_ref[pl.program_id(0) * n_k + k]
    score = jax.lax.dot_general(
        q,
        rt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Sq, S)
    bs, bc = best_s[...], best_c[...]
    chunk0 = tid * (s // 128)
    for c in range(s // 128):
        sc = score[:, c * 128 : (c + 1) * 128]
        better = sc < bs
        bs = jnp.where(better, sc, bs)
        bc = jnp.where(better, chunk0 + c, bc)
    best_s[...] = bs
    best_c[...] = bc

    @pl.when(k == n_k - 1)
    def _():
        qq = (jnp.sum(q * q, axis=1, keepdims=True) - 1.0) * 0.25
        sfin = best_s[...]
        smin = jnp.min(sfin, axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, sfin.shape, 1)
        gpos = best_c[...] * 128 + lane
        cand = jnp.where(sfin == smin, gpos, -1)
        p_out[...] = jnp.max(cand, axis=1, keepdims=True)
        d_out[...] = jnp.maximum(smin + qq, 0.0)


@functools.partial(jax.jit, static_argnames=("k_tiles", "interpret"))
def block_nn_fused(
    query_tiles: jax.Array,
    index: TileIndex,
    *,
    k_tiles: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for `blocknn.block_nn`: (sqdist (N,), original idx (N,))."""
    tq, sq, _ = query_tiles.shape
    t, s, _ = index.tiles.shape
    cand_tiles, _ = _candidate_tiles(query_tiles, index, k_tiles)
    n_k = cand_tiles.shape[1]

    q8 = jnp.zeros((tq, sq, 8), jnp.float32)
    q8 = q8.at[:, :, :3].set(-2.0 * query_tiles)
    q8 = q8.at[:, :, 3].set(1.0)
    rr = jnp.sum(index.tiles**2, axis=2)
    rt = jnp.zeros((t, s, 8), jnp.float32)
    rt = rt.at[:, :, :3].set(index.tiles)
    rt = rt.at[:, :, 3].set(rr)
    rt = jnp.swapaxes(rt, 1, 2)  # (T, 8, S)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tq, n_k),
        in_specs=[
            pl.BlockSpec(
                (1, sq, 8), lambda i, k, c: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, s), lambda i, k, c: (c[i * n_k + k], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((sq, 1), lambda i, k, c: (i, 0)),
            pl.BlockSpec((sq, 1), lambda i, k, c: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((sq, 128), jnp.float32),
            pltpu.VMEM((sq, 128), jnp.int32),
        ],
    )
    d, pos = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, s=s),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tq * sq, 1), jnp.float32),
            jax.ShapeDtypeStruct((tq * sq, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(cand_tiles.reshape(-1), q8, rt)

    d = d.reshape(-1)
    pos = pos.reshape(-1)
    ridx = index.order[pos]
    d = jnp.where(ridx >= 0, d, jnp.inf)
    return d, jnp.maximum(ridx, 0)


# ---- take 2: grouped queries, internal candidate loop, manual DMA -----------


def _kernel2(cand_ref, q_ref, rt_hbm, d_out, p_out, buf, sems, best_s, best_c,
             *, n_k, s):
    """One program per query GROUP: the candidate loop runs inside the
    kernel with double-buffered HBM->VMEM DMAs of the (8, S) ref tiles,
    amortizing program overhead K-fold vs the grid-(Tq, K) variant (which
    measured slower than XLA at 131k programs)."""
    g = pl.program_id(0)
    q = q_ref[0]  # (GQ, 8)

    def get_dma(slot, k):
        tid = cand_ref[g * n_k + k]
        return pltpu.make_async_copy(
            rt_hbm.at[tid], buf.at[slot], sems.at[slot]
        )

    get_dma(0, 0).start()
    best_s[...] = jnp.full_like(best_s, _BIG)
    best_c[...] = jnp.zeros_like(best_c)

    for k in range(n_k):  # static unroll
        if k + 1 < n_k:
            get_dma((k + 1) % 2, k + 1).start()
        get_dma(k % 2, k).wait()
        rt = buf[k % 2]  # (8, S)
        tid = cand_ref[g * n_k + k]
        score = jax.lax.dot_general(
            q,
            rt,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (GQ, S)
        bs, bc = best_s[...], best_c[...]
        chunk0 = tid * (s // 128)
        for c in range(s // 128):
            sc = score[:, c * 128 : (c + 1) * 128]
            better = sc < bs
            bs = jnp.where(better, sc, bs)
            bc = jnp.where(better, chunk0 + c, bc)
        best_s[...] = bs
        best_c[...] = bc

    qq = (jnp.sum(q * q, axis=1, keepdims=True) - 1.0) * 0.25
    sfin = best_s[...]
    smin = jnp.min(sfin, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, sfin.shape, 1)
    gpos = best_c[...] * 128 + lane
    cand = jnp.where(sfin == smin, gpos, -1)
    p_out[...] = jnp.max(cand, axis=1, keepdims=True)
    d_out[...] = jnp.maximum(smin + qq, 0.0)


@functools.partial(
    jax.jit, static_argnames=("k_tiles", "group_q", "interpret")
)
def block_nn_fused2(
    query_tiles: jax.Array,
    index: TileIndex,
    *,
    k_tiles: int = 16,
    group_q: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Grouped-fused block NN: candidates are selected per GROUP of
    `group_q` queries (coarser than block_nn's per-tile selection — use a
    higher k_tiles to keep recall), then one Pallas program per group
    folds all K candidate tiles in VMEM. Returns (sqdist (N,), idx (N,)).
    """
    tq, sq, _ = query_tiles.shape
    t, s, _ = index.tiles.shape
    n = tq * sq
    if n % group_q:
        raise ValueError(f"{n} queries not divisible by group_q={group_q}")
    g = n // group_q

    # group-level candidate selection
    group_tiles = query_tiles.reshape(g, group_q, 3)
    cand_tiles, _ = _candidate_tiles(group_tiles, index, k_tiles)
    n_k = cand_tiles.shape[1]

    q8 = jnp.zeros((g, group_q, 8), jnp.float32)
    q8 = q8.at[:, :, :3].set(-2.0 * group_tiles)
    q8 = q8.at[:, :, 3].set(1.0)
    rr = jnp.sum(index.tiles**2, axis=2)
    rt = jnp.zeros((t, s, 8), jnp.float32)
    rt = rt.at[:, :, :3].set(index.tiles)
    rt = rt.at[:, :, 3].set(rr)
    rt = jnp.swapaxes(rt, 1, 2)  # (T, 8, S)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, group_q, 8), lambda i, c: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # ref tiles stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((group_q, 1), lambda i, c: (i, 0)),
            pl.BlockSpec((group_q, 1), lambda i, c: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, s), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((group_q, 128), jnp.float32),
            pltpu.VMEM((group_q, 128), jnp.int32),
        ],
    )
    d, pos = pl.pallas_call(
        functools.partial(_kernel2, n_k=n_k, s=s),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(cand_tiles.reshape(-1), q8, rt)

    d = d.reshape(-1)
    pos = pos.reshape(-1)
    ridx = index.order[pos]
    d = jnp.where(ridx >= 0, d, jnp.inf)
    return d, jnp.maximum(ridx, 0)
