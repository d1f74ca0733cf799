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


# ---- take 3: per-group candidate UNIONS, dense pre-gather, VMEM fold --------
#
# Round-1 lessons (measured): variant 1 (grid (Tq, K), 131k programs) lost
# to per-program overhead; variant 2 (manual per-candidate DMA) issues tens
# of thousands of 4-8 KB DMAs. Take 3 removes both failure modes:
#   * query tiles are processed in GROUPS (e.g. 4 tiles = 128 queries), so
#     the grid is just (n_groups,);
#   * each group's candidate tiles are DEDUPLICATED into a fixed-width
#     union (adjacent KD query tiles share most candidates — measured mean
#     union 18 of 48 nominal at group=4, K=12), and every query in the
#     group scores against the whole union (a superset of its own top-K,
#     so recall only improves);
#   * the union ref tiles are pre-gathered by XLA into a dense
#     (G, U, 8, S) array — one contiguous-row gather, ~hundreds of MB
#     round-trip at 1M points (~1 ms) — which Mosaic then streams into
#     VMEM as ONE auto-pipelined block per program. The (GQ, S) score
#     blocks live and die in VMEM: the ~8 GB/pass HBM score traffic of the
#     jnp fold (VERDICT round-1 item 1) never happens.


def _union_kernel(q_ref, rt_ref, d_out, p_out, best_s, best_c, *, n_u, s):
    q = q_ref[0]  # (GQ, 8)
    bs = jnp.full_like(best_s, _BIG)
    bc = jnp.zeros_like(best_c)
    for u in range(n_u):  # static unroll: n_u matmuls, all operands VMEM
        rt = rt_ref[0, u]  # (8, S)
        score = jax.lax.dot_general(
            q,
            rt,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (GQ, S)
        chunk0 = u * (s // 128)
        for c in range(s // 128):
            sc = score[:, c * 128 : (c + 1) * 128]
            better = sc < bs
            bs = jnp.where(better, sc, bs)
            bc = jnp.where(better, chunk0 + c, bc)
    best_s[...] = bs
    best_c[...] = bc
    qq = (jnp.sum(q * q, axis=1, keepdims=True) - 1.0) * 0.25
    smin = jnp.min(bs, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, bs.shape, 1)
    lpos = bc * 128 + lane  # local position u*S + in-tile index
    cand = jnp.where(bs == smin, lpos, -1)
    p_out[...] = jnp.max(cand, axis=1, keepdims=True)
    d_out[...] = jnp.maximum(smin + qq, 0.0)


def group_unions(
    cand_tiles: jax.Array, group: int, u_max: int
) -> jax.Array:
    """Deduplicate per-query-tile candidates into per-GROUP unions.

    cand_tiles (Tq, K) int32 -> (Tq//group, u_max) int32. Duplicates are
    removed via sort + first-occurrence compaction; underfull unions are
    padded with the group's first candidate (redundant but harmless work);
    if a union overflows u_max (not observed at the default shapes —
    measured max 27 at u_max 32), the extras overwrite the last slot:
    recall degrades gracefully to genuine-but-larger distances, the
    documented block-NN miss semantics.
    """
    tq, k = cand_tiles.shape
    g = tq // group
    ids = jnp.sort(cand_tiles.reshape(g, group * k), axis=1)
    first = jnp.concatenate(
        [
            jnp.ones((g, 1), bool),
            ids[:, 1:] != ids[:, :-1],
        ],
        axis=1,
    )
    slot = jnp.minimum(jnp.cumsum(first, axis=1) - 1, u_max - 1)
    init = jnp.repeat(ids[:, :1], u_max, axis=1)
    rows = jnp.arange(g, dtype=jnp.int32)[:, None]
    return init.at[rows, slot].set(ids)


@functools.partial(
    jax.jit, static_argnames=("k_tiles", "group", "u_max", "interpret")
)
def block_nn_fused3(
    query_tiles: jax.Array,
    index: TileIndex,
    *,
    k_tiles: int = 12,
    group: int = 4,
    u_max: int = 32,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for `blocknn.block_nn` (same (sqdist, original idx) output),
    with candidate selection per query tile and the fold fused in VMEM."""
    tq, sq, _ = query_tiles.shape
    t, s, _ = index.tiles.shape
    if tq % group:
        raise ValueError(f"tq={tq} not divisible by group={group}")
    g = tq // group
    gq = group * sq
    n = tq * sq

    cand_tiles, _ = _candidate_tiles(query_tiles, index, k_tiles)
    unions = group_unions(cand_tiles, group, u_max)  # (G, U)
    n_u = unions.shape[1]

    # augmented operands: queries (G, GQ, 8); ref tiles (G, U, 8, S)
    q8 = jnp.zeros((n, 8), jnp.float32)
    q8 = q8.at[:, :3].set(-2.0 * query_tiles.reshape(n, 3))
    q8 = q8.at[:, 3].set(1.0)
    q8 = q8.reshape(g, gq, 8)
    rr = jnp.sum(index.tiles**2, axis=2)
    rt = jnp.zeros((t, 8, s), jnp.float32)
    rt = rt.at[:, :3, :].set(jnp.swapaxes(index.tiles, 1, 2))
    rt = rt.at[:, 3, :].set(rr)
    rt_union = rt[unions]  # (G, U, 8, S) contiguous-row gather

    d, lpos = pl.pallas_call(
        functools.partial(_union_kernel, n_u=n_u, s=s),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, gq, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_u, 8, s),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((gq, 1), lambda i: (i, 0)),
            pl.BlockSpec((gq, 1), lambda i: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((gq, 128), jnp.float32),
            pltpu.VMEM((gq, 128), jnp.int32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q8, rt_union)

    lpos = lpos.reshape(-1)
    gid = jnp.arange(n, dtype=jnp.int32) // gq
    tid = unions[gid, lpos // s]
    pos = tid * s + lpos % s
    ridx = index.order[pos]
    d = jnp.where(ridx >= 0, d.reshape(-1), jnp.inf)
    return d, jnp.maximum(ridx, 0)


# ---- take 4: VPU broadcast score, union pre-gather, VMEM fold ---------------
#
# Round-2 lesson (measured on chip at 1M pts): take 3's
# `dot_general((GQ,8),(8,S))` score runs on the MXU at 8/128 = 6% array
# utilization, x6 passes for fp32 HIGHEST — 117 ms/pass, LOSING to the
# XLA jnp fold (47 ms). The distance expansion has contraction depth 3;
# no matmul shape fixes that. Take 4 computes the score on the VPU as
# broadcast FMAs — score = rr - 2(qx*rx + qy*ry + qz*rz) with qx (GQ,1)
# against rx (1,S) — which is ~7 elementwise ops per candidate pair:
# 1M queries x 8 tiles x 256 cands ~ 1.4e10 ops ~ 7 ms at VPU peak.
# Everything else (groups, unions, dense XLA pre-gather, VMEM min-fold,
# lane-tiebreak epilogue) is take 3 unchanged.


def _vpu_kernel(q_ref, rx_ref, d_out, p_out, *, n_u, s):
    q = q_ref[0]  # (GQ, 4) = x, y, z, qq
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    bs = jnp.full((q.shape[0], s), _BIG, jnp.float32)
    bu = jnp.zeros((q.shape[0], s), jnp.int32)
    for u in range(n_u):  # static unroll; operands all VMEM
        r = rx_ref[0, u]  # (4, S) = x, y, z, rr rows
        rx, ry, rz, rr = r[0:1], r[1:2], r[2:3], r[3:4]
        score = rr - 2.0 * (qx * rx + qy * ry + qz * rz)  # (GQ, S) VPU
        better = score < bs
        bs = jnp.where(better, score, bs)
        bu = jnp.where(better, u, bu)
    qq = q[:, 3:4]
    smin = jnp.min(bs, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, bs.shape, 1)
    lpos = bu * s + lane  # local position u*S + in-tile index
    cand = jnp.where(bs == smin, lpos, -1)
    p_out[...] = jnp.max(cand, axis=1, keepdims=True)
    d_out[...] = jnp.maximum(smin + qq, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("k_tiles", "group", "u_max", "interpret", "return_pos"),
)
def block_nn_fused4(
    query_tiles: jax.Array,
    index: TileIndex,
    *,
    k_tiles: int = 8,
    group: int = 4,
    u_max: int = 16,
    interpret: bool = False,
    return_pos: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for `blocknn.block_nn` (same (sqdist, original idx) output):
    per-group candidate unions, VPU-broadcast score, VMEM min-fold."""
    tq, sq, _ = query_tiles.shape
    t, s, _ = index.tiles.shape
    if tq % group:
        raise ValueError(f"tq={tq} not divisible by group={group}")
    g = tq // group
    gq = group * sq
    n = tq * sq

    cand_tiles, _ = _candidate_tiles(query_tiles, index, k_tiles)
    unions = group_unions(cand_tiles, group, u_max)  # (G, U)
    n_u = unions.shape[1]

    qf = query_tiles.reshape(n, 3)
    q4 = jnp.concatenate(
        [qf, jnp.sum(qf * qf, axis=1, keepdims=True)], axis=1
    ).reshape(g, gq, 4)
    rr = jnp.sum(index.tiles**2, axis=2)
    rt = jnp.concatenate(
        [jnp.swapaxes(index.tiles, 1, 2), rr[:, None, :]], axis=1
    )  # (T, 4, S)
    rt_union = rt[unions]  # (G, U, 4, S) contiguous-row gather

    d, lpos = pl.pallas_call(
        functools.partial(_vpu_kernel, n_u=n_u, s=s),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, gq, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_u, 4, s),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((gq, 1), lambda i: (i, 0)),
            pl.BlockSpec((gq, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q4, rt_union)

    lpos = lpos.reshape(-1)
    gid = jnp.arange(n, dtype=jnp.int32) // gq
    tid = unions[gid, lpos // s]
    pos = tid * s + lpos % s
    d = d.reshape(-1)
    if return_pos:
        return jnp.where(d < 1e15, d, jnp.inf), pos
    ridx = index.order[pos]
    d = jnp.where(ridx >= 0, d, jnp.inf)
    return d, jnp.maximum(ridx, 0)


def _vpu_moments_kernel(q_ref, rf_ref, m_out, *, n_u):
    q = q_ref[0]  # (GQ, 4) = xc, yc, zc, qq - r^2
    qx, qy, qz, t2 = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
    m = jnp.zeros_like(m_out[0])  # (16, GQ)
    for u in range(n_u):
        rf = rf_ref[0, u]  # (16, S): x,y,z,rr,1,xx,yy,zz,xy,xz,yz,0*5
        rx, ry, rz, rr = rf[0:1], rf[1:2], rf[2:3], rf[3:4]
        score = rr - 2.0 * (qx * rx + qy * ry + qz * rz) + t2  # d^2 - r^2
        w = (score <= 0.0).astype(jnp.float32)  # (GQ, S)
        # moment accumulation IS a good MXU shape: contraction depth S
        m = m + jax.lax.dot_general(
            rf,
            w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (16, GQ)
    m_out[0] = m


@functools.partial(
    jax.jit, static_argnames=("k_tiles", "group", "u_max", "interpret")
)
def block_radius_moments_fused4(
    query_tiles: jax.Array,
    index: TileIndex,
    radius: jax.Array,
    *,
    k_tiles: int = 8,
    group: int = 1,
    u_max: int = 12,
    interpret: bool = False,
):
    """Drop-in for `blocknn.block_radius_moments`: (count (N,), mean (N,3),
    cov (N,3,3)) in sorted-query order. VPU score (exact fp32 radius
    test), MXU moment accumulation, group-centroid centering for fp32
    conditioning."""
    tq, sq, _ = query_tiles.shape
    t, s, _ = index.tiles.shape
    if tq % group:
        raise ValueError(f"tq={tq} not divisible by group={group}")
    g = tq // group
    gq = group * sq
    n = tq * sq

    cand_tiles, _ = _candidate_tiles(query_tiles, index, k_tiles)
    unions = group_unions(cand_tiles, group, u_max)  # (G, U)
    n_u = unions.shape[1]

    # group centroids (over valid queries) for fp32 conditioning
    qs = query_tiles.reshape(g, gq, 3)
    qvalid = jnp.max(jnp.abs(qs), axis=2) < 1.0e6
    denom = jnp.maximum(qvalid.sum(axis=1), 1).astype(jnp.float32)
    q_cent = jnp.where(qvalid[..., None], qs, 0.0).sum(axis=1) / denom[:, None]

    qc = qs - q_cent[:, None, :]
    qq = jnp.sum(qc * qc, axis=2)
    q4 = jnp.concatenate(
        [qc, (qq - radius * radius)[..., None]], axis=2
    )  # (G, GQ, 4)

    # gather raw coords then center per group and expand features
    rg = index.tiles[unions]  # (G, U, S, 3)
    rc = rg - q_cent[:, None, None, :]
    x, y, z = rc[..., 0], rc[..., 1], rc[..., 2]
    rtf = jnp.stack(
        [x, y, z, x * x + y * y + z * z, jnp.ones_like(x),
         x * x, y * y, z * z, x * y, x * z, y * z,
         jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros_like(x),
         jnp.zeros_like(x), jnp.zeros_like(x)],
        axis=2,
    )  # (G, U, 16, S)

    mT = pl.pallas_call(
        functools.partial(_vpu_moments_kernel, n_u=n_u),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, gq, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_u, 16, s),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, 16, gq), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, 16, gq), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q4, rtf)

    m = jnp.swapaxes(mT, 1, 2).reshape(n, 16)
    cnt = m[:, 4]
    safe = jnp.maximum(cnt, 1.0)[:, None]
    mean_c = m[:, 0:3] / safe
    exx = jnp.stack(
        [
            jnp.stack([m[:, 5], m[:, 8], m[:, 9]], axis=1),
            jnp.stack([m[:, 8], m[:, 6], m[:, 10]], axis=1),
            jnp.stack([m[:, 9], m[:, 10], m[:, 7]], axis=1),
        ],
        axis=1,
    ) / safe[..., None]
    cov = exx - mean_c[:, :, None] * mean_c[:, None, :]
    mean = mean_c + jnp.repeat(q_cent, gq, axis=0)
    return cnt, mean, cov


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


# ---- fused radius moments (normal/covariance estimation hot path) -----------
#
# Same union structure as block_nn_fused3; the epilogue accumulates the
# 10 neighborhood moments (count, sum x, sum x x^T) instead of a min. The
# jnp `block_radius_moments` fold writes a (Tq, Sq, S) weight tensor plus
# a (Tq, S, 10) feature expansion to HBM per candidate step — identical
# traffic to the NN fold (NOTES.md round-1 lever 1); here both live in
# VMEM. The radius test rides the score matmul: with an extra constant
# feature row 1 and query channel qq - r^2, the MXU emits
# d^2 - r^2 directly, so w = (score <= 0) needs no separate distance pass.
#
# Feature-row layout of the pre-gathered (G, U, 16, S) operand:
#   rows 0-3: x, y, z, ||x||^2   (score operand, group-centered coords)
#   row  4:   1                  (count + radius-constant channel)
#   rows 5-10: xx, yy, zz, xy, xz, yz
#   rows 11-15: zero padding
# Sentinel (padding) points carry ||x||^2 ~ 1e16, which drives the score
# positive and zeroes their weight without an explicit validity mask.


def _moments_kernel(q_ref, rtf_ref, m_out, acc, *, n_u):
    q = q_ref[0]  # (GQ, 8)
    m = jnp.zeros_like(acc)
    for u in range(n_u):
        rtf = rtf_ref[0, u]  # (16, S)
        score = jax.lax.dot_general(
            q,
            rtf[0:8],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (GQ, S) = d^2 - r^2
        w = (score <= 0.0).astype(jnp.float32)
        m = m + jax.lax.dot_general(
            rtf,
            w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (16, GQ)
    acc[...] = m
    m_out[0] = m


@functools.partial(
    jax.jit, static_argnames=("k_tiles", "group", "u_max", "interpret")
)
def block_radius_moments_fused(
    query_tiles: jax.Array,
    index: TileIndex,
    radius: jax.Array,
    *,
    k_tiles: int = 8,
    group: int = 4,
    u_max: int = 16,
    interpret: bool = False,
):
    """Drop-in for `blocknn.block_radius_moments`: (count (N,), mean (N,3),
    cov (N,3,3)) in sorted-query order."""
    tq, sq, _ = query_tiles.shape
    t, s, _ = index.tiles.shape
    if tq % group:
        raise ValueError(f"tq={tq} not divisible by group={group}")
    g = tq // group
    gq = group * sq
    n = tq * sq

    cand_tiles, _ = _candidate_tiles(query_tiles, index, k_tiles)
    unions = group_unions(cand_tiles, group, u_max)  # (G, U)
    n_u = unions.shape[1]

    # group centroids (over valid queries) for fp32 conditioning
    qs = query_tiles.reshape(g, gq, 3)
    qvalid = jnp.max(jnp.abs(qs), axis=2) < 1.0e6
    denom = jnp.maximum(qvalid.sum(axis=1), 1).astype(jnp.float32)
    q_cent = jnp.where(qvalid[..., None], qs, 0.0).sum(axis=1) / denom[:, None]

    qc = qs - q_cent[:, None, :]
    qq = jnp.sum(qc * qc, axis=2)
    q8 = jnp.zeros((g, gq, 8), jnp.float32)
    q8 = q8.at[:, :, :3].set(-2.0 * qc)
    q8 = q8.at[:, :, 3].set(1.0)
    q8 = q8.at[:, :, 4].set(qq - radius * radius)

    # gather raw coords then center per group and expand features
    rg = index.tiles[unions]  # (G, U, S, 3)
    rc = rg - q_cent[:, None, None, :]
    x, y, z = rc[..., 0], rc[..., 1], rc[..., 2]
    rtf = jnp.stack(
        [x, y, z, x * x + y * y + z * z, jnp.ones_like(x),
         x * x, y * y, z * z, x * y, x * z, y * z,
         jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros_like(x),
         jnp.zeros_like(x), jnp.zeros_like(x)],
        axis=2,
    )  # (G, U, 16, S)

    mT = pl.pallas_call(
        functools.partial(_moments_kernel, n_u=n_u),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, gq, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_u, 16, s),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, 16, gq), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((16, gq), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((g, 16, gq), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q8, rtf)

    m = jnp.swapaxes(mT, 1, 2).reshape(n, 16)
    cnt = m[:, 4]
    safe = jnp.maximum(cnt, 1.0)[:, None]
    mean_c = m[:, 0:3] / safe
    exx = jnp.stack(
        [
            jnp.stack([m[:, 5], m[:, 8], m[:, 9]], axis=1),
            jnp.stack([m[:, 8], m[:, 6], m[:, 10]], axis=1),
            jnp.stack([m[:, 9], m[:, 10], m[:, 7]], axis=1),
        ],
        axis=1,
    ) / safe[..., None]
    cov = exx - mean_c[:, :, None] * mean_c[:, None, :]
    mean = mean_c + jnp.repeat(q_cent, gq, axis=0)
    return cnt, mean, cov


def use_fused_default() -> bool:
    """Whether the fused Pallas fold should be the default. Measured on
    the real chip (1M pts, S=256/Sq=64/K=8): take 3 = 117 ms (MXU at 6%
    array utilization on the depth-3 contraction), take 4 = 47-54 ms
    (VPU broadcast; the (GQ,S) running-min VMEM traffic offsets the
    score-fusion win), XLA jnp fold = 47 ms. The fused kernels currently
    only TIE the XLA fold, so they stay opt-in (`block_fused="on"`);
    take 4's union superset does give slightly better recall (0.042% vs
    0.076% miss vs exact NN)."""
    return False
