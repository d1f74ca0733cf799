"""Fused Pallas kernels for the block-sparse NN fold (TPU) — and the
documented NEGATIVE RESULT of the four-take fusion campaign.

The hypothesis across rounds 1-2 was that the jnp fold in
`blocknn.block_nn` — which materializes (chunked) (Tq, Sq, S) score
tensors through HBM every candidate step — must lose to a Pallas kernel
keeping the score in VMEM. Four takes, all measured on the real chip
with relay-safe fencing (full-pipeline A/Bs via scripts/exp_fused.py,
kernel timings via scripts/exp_levers.py), say otherwise:

  take 1  grid (Tq, K), one candidate per program, scalar-prefetched
          tile ids: 131k programs; per-program overhead dominated —
          measurably SLOWER than the XLA fold.
  take 2  grouped queries, candidate loop inside the kernel with manual
          double-buffered HBM->VMEM DMAs: tens of thousands of 4-8 KB
          DMAs; still slower.
  take 3  per-group candidate UNIONS (adjacent KD tiles share most
          candidates: mean union 18 of 48 nominal at group=4/K=12),
          dense XLA pre-gather to (G, U, 8, S), VMEM min-fold. Removes
          both prior failure modes, but the score `dot_general((GQ,8),
          (8,S))` runs the MXU at 8/128 = 6% array utilization (x6
          passes for fp32 HIGHEST): 117 ms vs 47 ms XLA at 1M points.
          The distance expansion has contraction depth 3 — no matmul
          shape fixes that.
  take 4  (KEPT, `block_nn_fused4` below) take 3's structure with the
          score on the VPU as broadcast FMAs: 47-54 ms at 1M — a TIE
          with the XLA fold (the (GQ, S) running-min VMEM traffic
          offsets the score-fusion win), and at 8M its (N, 1) outputs
          pad 128x and OOM. Full pipeline: 283 ms vs 203 ms XLA at 1M.

Conclusion (round 3, final): XLA's own pipelining of the chunked fold —
contiguous-row gathers + MXU einsum + fused min — is already at the HBM
roofline for this access pattern; fusion buys nothing because the fold
is bandwidth-bound on the CANDIDATE TILES, which both paths stream
exactly once. The fused kernels stay available behind
`ICPConfig.block_fused="on"`: take 4's union-superset scoring does give
slightly better recall (0.042% vs 0.076% miss vs exact NN at the
defaults), a quality knob rather than a speed one. Takes 1-3 were
deleted in round 3 (this docstring is their record; history in git and
NOTES.md).

`block_radius_moments_fused` (kept, wired the same way) is the moments
analogue: radius test rides the score matmul, moment accumulation IS a
good MXU shape (contraction depth S) — it exactly ties the jnp fold at
1M and 8M.
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


# ---- take 4 (kept): VPU broadcast score, union pre-gather, VMEM fold --------
#
# score = rr - 2(qx*rx + qy*ry + qz*rz) with qx (GQ,1) against rx (1,S):
# ~7 elementwise VPU ops per candidate pair (1M queries x 8 tiles x 256
# cands ~ 1.4e10 ops ~ 7 ms at VPU peak); groups/unions/dense XLA
# pre-gather/lane-tiebreak epilogue shared with the deleted take 3.


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


# ---- fused radius moments (normal/covariance estimation hot path) -----------
#
# Same union structure as the NN kernel; the epilogue accumulates the
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
        # moment accumulation IS a good MXU shape: contraction depth S
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


# ---- take 5 (round 4): fused PAYLOAD SELECT --------------------------------
#
# Takes 1-4 fused the score+min fold and lost/tied: XLA already streams
# candidate tiles at the HBM roofline and fuses the min. What XLA can
# NOT avoid materializing is the infold payload path's one-hot operand
# (lane == win): a (Tq, Sq, S) tensor written to and read from HBM per
# candidate step, which only exists on the >= 2M operating points —
# exactly the regime with the 75% efficiency ratio (NOTES levers #1).
#
# Take 5 therefore fuses ONLY the payload delivery: the XLA fold keeps
# producing (d2, pos); this kernel turns pos into payload rows entirely
# in VMEM — onehot(candidate flat positions == pos) built on the VPU,
# then a contraction-depth-(k*S) batched MXU matmul against the
# pre-gathered candidate payload. fp32 payload exactness comes from the
# classic hi/lo bf16 split (two MXU passes, exact to f32 roundoff;
# the onehot operand is exactly representable). Outputs are written
# (group, D, Sq) — lane dim Sq=128 clean — sidestepping take 4's fatal
# (N, 1)/(.., D) lane-padding write amplification.
#
# With frozen refine candidates the pre-gathered (Tq, D, k*S) operand is
# LOOP-INVARIANT across refine iterations (XLA hoists it out of the
# while_loop), so steady-state per-iteration payload traffic is one
# linear read of the candidate payload + a (Tq, D, Sq) write.


def _select_kernel(pos_ref, cp_ref, pl_ref, out_ref, *, group):
    # static unroll over the group dim: Mosaic's tpu.matmul rejects
    # batched bf16 dot_generals ("Bad lhs type"); per-tile 2D dots with
    # contraction depth k*S compile and keep full MXU utilization.
    for j in range(group):
        pos = pos_ref[j]  # (Sq,) int32 flat sorted positions
        cp = cp_ref[j]  # (kS,) int32 candidate flat positions
        oh = (cp[None, :] == pos[:, None]).astype(jnp.bfloat16)  # (Sq, kS)
        plv = pl_ref[j]  # (D, kS) f32: lane dim = kS (S-minor layout)
        # 3-term bf16 split: 24 mantissa bits => f32-exact selection
        # (a 2-term split leaves ~2^-16 relative error — coordinate
        # payloads at cloud-extent magnitudes cannot afford that).
        hi = plv.astype(jnp.bfloat16)
        r1 = plv - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        # contract over kS on BOTH sides: payload rides (D, kS) transposed
        dn = (((1,), (1,)), ((), ()))
        # precision DEFAULT explicitly: the package pins
        # jax_default_matmul_precision=highest, and Mosaic rejects
        # bf16 operands with an fp32 contract precision ("Bad lhs
        # type") — one native bf16 pass with f32 accumulate is exactly
        # what we want here anyway.
        kw = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        sel = (
            jax.lax.dot_general(oh, hi, dn, **kw)
            + jax.lax.dot_general(oh, mid, dn, **kw)
            + jax.lax.dot_general(oh, lo, dn, **kw)
        )  # (Sq, D)
        out_ref[j] = sel.T  # (D, Sq): lane dim = Sq


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def payload_select_fused(
    pos: jax.Array,  # (Tq, Sq) int32 from block_nn(return_pos=True)
    cand_tiles: jax.Array,  # (Tq, k) — the SAME list the fold used
    payload_tiles: jax.Array,  # (T, S, D)
    *,
    group: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Matched payload rows (Tq*Sq, D) for positions produced by
    `block_nn(..., return_pos=True, cand_tiles=cand_tiles)`.

    Matches the gather path `payload.reshape(-1, D)[pos]` bit-for-bit on
    hit rows (fp32 hi/lo-split selection). Miss rows (fold min stayed
    inf, pos = 0) yield zeros unless tile 0 is among that query tile's
    candidates — in which case they get tile 0 row 0, the same value the
    gather path returns; callers gate misses by d == inf either way.
    """
    tq, sq = pos.shape
    t, s, d_pl = payload_tiles.shape
    k = cand_tiles.shape[1]
    ks = k * s
    d_pad = -(-d_pl // 8) * 8  # sublane-align the (D, Sq) output block
    interpret = interpret or jax.default_backend() != "tpu"

    # S-minor payload layout: (Tq, D, kS). A (.., kS, D) layout puts D
    # in the lane dim and T(8,128) pads it to 128 lanes (16-21x HBM
    # amplification — the 8M fold6 prep OOM'd exactly this way).
    pl_t = jnp.swapaxes(payload_tiles, 1, 2)  # (T, d_pl, S)
    if d_pad != d_pl:
        pl_t = jnp.concatenate(
            [pl_t, jnp.zeros((t, d_pad - d_pl, s), jnp.float32)], axis=1
        )
    pl_cand = jnp.swapaxes(pl_t[cand_tiles], 1, 2).reshape(
        tq, d_pad, ks
    )
    candpos = (
        cand_tiles[:, :, None] * s
        + jnp.arange(s, dtype=jnp.int32)[None, None, :]
    ).reshape(tq, ks)

    pad_t = (-tq) % group
    if pad_t:
        pos = jnp.concatenate(
            [pos, jnp.full((pad_t, sq), -1, jnp.int32)]
        )
        candpos = jnp.concatenate(
            [candpos, jnp.full((pad_t, ks), -2, jnp.int32)]
        )
        pl_cand = jnp.concatenate(
            [pl_cand, jnp.zeros((pad_t, d_pad, ks), jnp.float32)]
        )
    g = (tq + pad_t) // group

    out = pl.pallas_call(
        functools.partial(_select_kernel, group=group),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (group, sq), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (group, ks), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (group, d_pad, ks),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (group, d_pad, sq), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (g * group, d_pad, sq), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(pos, candpos, pl_cand)

    out = jnp.swapaxes(out[:tq], 1, 2).reshape(tq * sq, d_pad)
    return out[:, :d_pl]


# ---- take 6 (round 4): whole-fold VMEM kernel, per-tile candidates ---------
#
# The round-4 stage breakdown (scripts/exp_stage4.py, chip) showed the
# XLA fold's 11.3 ms/iter at 1M matches the HBM cost of MATERIALIZING
# the (Tq, Sq, S) score tensor per candidate step (~6.4 GB/iter), and
# the payload row gather costs another ~25 ms/iter — the two together
# dominate every refine iteration. Take 4 kept the score in VMEM but
# tied anyway because its per-GROUP candidate unions inflate the scored
# set ~2.7x (U~16 union tiles vs k=6 per-tile candidates). Take 6 keeps
# take 4's VPU broadcast score and take 5's MXU payload select, but
# scores each query tile against ITS OWN k candidates (pre-gathered by
# XLA as contiguous tile rows — near-DMA, and loop-invariant under
# frozen refine candidates, so XLA hoists the gather out of the ICP
# while_loop): no union inflation, no score/one-hot HBM round trips, no
# row gather.


def _fold6_kernel(q_ref, rt_ref, pl_ref, d_out, pl_out, *, group, k):
    # Two-pass per-tile fold, everything (Sq, S)-shaped — a (Sq, k*S)
    # concat forces lane relayouts that cost more than the fold itself
    # (first take-6 cut measured 227 vs 176 ms full-pipeline at 1M).
    # Pass 1: running elementwise min over candidates (take-4 style).
    # Pass 2: per-candidate masked one-hot + depth-S MXU select.
    for j in range(group):
        # (3, Sq) S-minor block (a (Sq, 3) operand lane-pads 3 -> 128:
        # 4.3 GB of query HBM at 8M); one small VMEM transpose per tile
        q = q_ref[j].T  # (Sq, 3) current transformed queries
        qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        qq = jnp.sum(q * q, axis=1, keepdims=True)  # (Sq, 1)
        sq = q.shape[0]
        s = rt_ref.shape[3]
        bs = jnp.full((sq, s), _BIG, jnp.float32)
        bc = jnp.zeros((sq, s), jnp.int32)
        for c in range(k):
            r = rt_ref[j, c]  # (3, S) raw candidate coords, transposed
            rx, ry, rz = r[0:1], r[1:2], r[2:3]
            rr = rx * rx + ry * ry + rz * rz  # (1, S) in VMEM
            score = rr - 2.0 * (qx * rx + qy * ry + qz * rz)  # (Sq, S)
            better = score < bs
            bs = jnp.where(better, score, bs)
            bc = jnp.where(better, c, bc)  # earliest c wins ties
        smin = jnp.min(bs, axis=1, keepdims=True)  # (Sq, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, bs.shape, 1)
        # lowest-lane tiebreak among lanes achieving the global min
        win = jnp.min(jnp.where(bs <= smin, lane, s), axis=1,
                      keepdims=True)
        base = (lane == win).astype(jnp.float32)  # (Sq, S) one column
        # contract over S on BOTH sides: payload rides (D, S) transposed
        dn = (((1,), (1,)), ((), ()))
        kw = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        sel = None
        for c in range(k):
            ohc = (base * (bc == c)).astype(jnp.bfloat16)  # (Sq, S)
            plv = pl_ref[j, c]  # (D, S) f32: lane dim = S (see prep)
            hi = plv.astype(jnp.bfloat16)
            r1 = plv - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            part = (
                jax.lax.dot_general(ohc, hi, dn, **kw)
                + jax.lax.dot_general(ohc, mid, dn, **kw)
                + jax.lax.dot_general(ohc, lo, dn, **kw)
            )  # (Sq, D)
            sel = part if sel is None else sel + part
        d_out[j] = jnp.maximum(smin[:, 0] + qq[:, 0], 0.0)
        pl_out[j] = sel.T  # (D, Sq): lane dim = Sq


def fold6_prepare(
    cand_tiles: jax.Array,  # (Tq, k) frozen candidate tile ids
    index: TileIndex,
    payload_tiles: jax.Array,  # (T, S, D)
    group: int = 8,
) -> Tuple[jax.Array, jax.Array, int]:
    """Loop-invariant prep for `block_fold_fused_pre`: candidate coord
    rows (Tq', k, 3, S) and payload rows (Tq', k, d_pad, S), group-padded.

    Call ONCE per frozen-candidate phase (in _register_jit) and close
    over the results: relying on XLA's while-loop LICM to hoist these
    gathers does NOT hold at 8M — the compiler rematerializes the 1.6 GB
    gather inside the loop with double buffering and OOMs HBM (measured:
    a 25.8 GB allocation attempt).

    Both prepped tensors keep S=128 as the MINOR dim: a (..., S, D)
    payload layout puts D in the lane dim, which the TPU's T(8,128)
    tiling pads to 128 lanes — at 8M that turned the 1.6 GB gather into
    a 25.8 GB allocation (the compile-time OOM above) and wasted 16x
    VMEM per kernel block. Transposed, D rides the sublane dim (8-row
    pad only).
    """
    tq, k = cand_tiles.shape
    t, s, d_pl = payload_tiles.shape
    d_pad = -(-d_pl // 8) * 8
    rt3 = jnp.swapaxes(index.tiles, 1, 2)  # (T, 3, S), built once
    rt_cand = rt3[cand_tiles]  # (Tq, k, 3, S) contiguous-row gather
    pl_t = jnp.swapaxes(payload_tiles, 1, 2)  # (T, d_pl, S), built once
    if d_pad != d_pl:
        pl_t = jnp.concatenate(
            [pl_t, jnp.zeros((t, d_pad - d_pl, s), jnp.float32)], axis=1
        )  # padded on the (T, ...) side: cheap, gathered once
    pl_cand = pl_t[cand_tiles]  # (Tq, k, d_pad, S)
    pad_t = (-tq) % group
    if pad_t:
        rt_cand = jnp.concatenate(
            [rt_cand,
             jnp.full((pad_t, k, 3, s), PAD_COORD, jnp.float32)]
        )
        pl_cand = jnp.concatenate(
            [pl_cand, jnp.zeros((pad_t, k, d_pad, s), jnp.float32)]
        )
    return rt_cand, pl_cand, d_pl


@functools.partial(
    jax.jit, static_argnames=("d_pl", "group", "interpret")
)
def block_fold_fused_pre(
    query_tiles: jax.Array,  # (Tq, Sq, 3) CURRENT transformed queries
    rt_cand: jax.Array,  # from fold6_prepare
    pl_cand: jax.Array,  # from fold6_prepare
    d_pl: int,
    *,
    group: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One NN iteration's full fold in VMEM: (sqdist (Tq*Sq,), payload
    rows (Tq*Sq, D)) — drop-in for block_nn + payload delivery on
    frozen-candidate phases (`ICPConfig.payload_mode="vmem"`).

    Score is f32 VPU (same precision class as the tile-centered bf16 MXU
    score: cancellation error ~ near-tie argmin swaps; take 4 measured
    recall BETTER than the XLA fold this way). Payload selection is
    f32-exact (3-term bf16 split). Misses (all candidates sentinel) get
    huge scores -> inf distance, sentinel-row payload — the same
    observable contract as the gather path.
    """
    tq, sq, _ = query_tiles.shape
    k, _, s = rt_cand.shape[1:]
    d_pad = pl_cand.shape[2]  # (Tq', k, d_pad, S): S minor, see prep
    interpret = interpret or jax.default_backend() != "tpu"

    pad_t = rt_cand.shape[0] - tq
    if pad_t:
        query_tiles = jnp.concatenate(
            [query_tiles,
             jnp.full((pad_t, sq, 3), PAD_COORD, jnp.float32)]
        )
    g = (tq + pad_t) // group
    # S-minor query layout (see _fold6_kernel): (Tq', 3, Sq)
    q_t = jnp.swapaxes(query_tiles, 1, 2)

    d, pl_t = pl.pallas_call(
        functools.partial(_fold6_kernel, group=group, k=k),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (group, 3, sq), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, k, 3, s), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, k, d_pad, s), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (group, sq), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (group, d_pad, sq), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g * group, sq), jnp.float32),
            jax.ShapeDtypeStruct((g * group, d_pad, sq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the unrolled group loop's (Sq, kS) score/onehot temps live
            # on the scoped-VMEM stack; the 16M default trips at group=16
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_t, rt_cand, pl_cand)

    d = d[:tq].reshape(-1)
    d = jnp.where(d < 1e15, d, jnp.inf)
    pl_rows = jnp.swapaxes(pl_t[:tq], 1, 2).reshape(tq * sq, d_pad)
    return d, pl_rows[:, :d_pl]


# ---- take 7 (round 5): MXU-scored centered fold -----------------------------
#
# The take-6 fold measured 35% of its VPU bound at 8M (74.5 ms/iter,
# scripts/exp_stage5.py) with group sweeps flat — the per-candidate
# (Sq, S) broadcast score is the time. The XLA fold scores the same
# candidates on the MXU (centered bf16, one pass, f32 accumulate) in
# 38.9 ms including the min. Take 7 moves the kernel's score to the
# MXU: prep builds per-candidate bf16 operands B = [-2*rc; rrc] (4, S)
# CENTERED on the frozen-phase query-tile centroids (centering is what
# makes single-pass bf16 safe — NOTES round-3 lever 0; the shift
# cancels exactly in ||q-r||^2 when applied to both sides), and the
# kernel's pass 1 becomes one (Sq,4)x(4,S) matmul per candidate.
# Payload selection (pass 2) is unchanged f32-exact.


def _fold7_kernel(q_ref, b_ref, pl_ref, d_out, pl_out, *, group, k):
    for j in range(group):
        q = q_ref[j].T  # (Sq, 3) centered queries, f32
        qq = jnp.sum(q * q, axis=1, keepdims=True)  # (Sq, 1)
        sq = q.shape[0]
        s = b_ref.shape[3]
        ones = jnp.ones((sq, 1), jnp.float32)
        q4 = jnp.concatenate([q, ones], axis=1).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        kw = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        bs = jnp.full((sq, s), _BIG, jnp.float32)
        bc = jnp.zeros((sq, s), jnp.int32)
        for c in range(k):
            score = jax.lax.dot_general(
                q4, b_ref[j, c], dn, **kw
            )  # (Sq, S) = -2 q.rc + rrc, f32 accumulate
            better = score < bs
            bs = jnp.where(better, score, bs)
            bc = jnp.where(better, c, bc)
        smin = jnp.min(bs, axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, bs.shape, 1)
        win = jnp.min(jnp.where(bs <= smin, lane, s), axis=1,
                      keepdims=True)
        base = (lane == win).astype(jnp.float32)
        dnp = (((1,), (1,)), ((), ()))
        sel = None
        for c in range(k):
            ohc = (base * (bc == c)).astype(jnp.bfloat16)
            plv = pl_ref[j, c]  # (D, S) f32
            hi = plv.astype(jnp.bfloat16)
            r1 = plv - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            part = (
                jax.lax.dot_general(ohc, hi, dnp, **kw)
                + jax.lax.dot_general(ohc, mid, dnp, **kw)
                + jax.lax.dot_general(ohc, lo, dnp, **kw)
            )
            sel = part if sel is None else sel + part
        d_out[j] = jnp.maximum(smin[:, 0] + qq[:, 0], 0.0)
        pl_out[j] = sel.T


def fold7_prepare(
    cand_tiles: jax.Array,  # (Tq, k) frozen candidate tile ids
    q_cent: jax.Array,  # (Tq, 3) frozen-phase query tile centroids
    index: TileIndex,
    payload_tiles: jax.Array,  # (T, S, D)
    group: int = 8,
) -> Tuple[jax.Array, jax.Array, jax.Array, int]:
    """Loop-invariant prep for `block_fold7_pre`: per-candidate bf16
    score operands B = [-2*(r - q_cent); ||r - q_cent||^2] (Tq', k, 4,
    S), payload rows as in fold6_prepare, and the padded centroids.

    Centering uses the FROZEN-phase centroids (refine motion stays well
    under a tile extent, and the shift cancels exactly in the reported
    distance because the queries are centered by the same vector)."""
    tq, k = cand_tiles.shape
    t, s, d_pl = payload_tiles.shape
    d_pad = -(-d_pl // 8) * 8
    rt3 = jnp.swapaxes(index.tiles, 1, 2)  # (T, 3, S)
    rc = rt3[cand_tiles] - q_cent[:, None, :, None]  # centered (Tq,k,3,S)
    rrc = jnp.sum(rc * rc, axis=2, keepdims=True)  # (Tq, k, 1, S)
    b = jnp.concatenate([-2.0 * rc, rrc], axis=2).astype(
        jnp.bfloat16
    )  # (Tq, k, 4, S)
    pl_t = jnp.swapaxes(payload_tiles, 1, 2)
    if d_pad != d_pl:
        pl_t = jnp.concatenate(
            [pl_t, jnp.zeros((t, d_pad - d_pl, s), jnp.float32)], axis=1
        )
    pl_cand = pl_t[cand_tiles]
    pad_t = (-tq) % group
    if pad_t:
        b = jnp.concatenate(
            [b, jnp.full((pad_t, k, 4, s), jnp.bfloat16(PAD_COORD))]
        )
        pl_cand = jnp.concatenate(
            [pl_cand, jnp.zeros((pad_t, k, d_pad, s), jnp.float32)]
        )
        q_cent = jnp.concatenate(
            [q_cent, jnp.zeros((pad_t, 3), jnp.float32)]
        )
    return b, pl_cand, q_cent, d_pl


@functools.partial(
    jax.jit, static_argnames=("d_pl", "group", "interpret")
)
def block_fold7_pre(
    query_tiles: jax.Array,  # (Tq, Sq, 3) CURRENT transformed queries
    b_cand: jax.Array,  # from fold7_prepare
    pl_cand: jax.Array,
    q_cent: jax.Array,  # from fold7_prepare (padded)
    d_pl: int,
    *,
    group: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Take-7 fold: MXU-scored variant of `block_fold_fused_pre` (same
    outputs, same miss contract; score precision = centered single-pass
    bf16 with f32 accumulate — the class the XLA fold already uses)."""
    tq, sq, _ = query_tiles.shape
    k, _, s = b_cand.shape[1:]
    d_pad = pl_cand.shape[2]
    interpret = interpret or jax.default_backend() != "tpu"

    pad_t = b_cand.shape[0] - tq
    if pad_t:
        query_tiles = jnp.concatenate(
            [query_tiles,
             jnp.full((pad_t, sq, 3), PAD_COORD, jnp.float32)]
        )
    g = (tq + pad_t) // group
    # center queries by the SAME frozen centroids the prep used, then
    # S-minor layout
    q_t = jnp.swapaxes(query_tiles - q_cent[:, None, :], 1, 2)

    d, pl_t = pl.pallas_call(
        functools.partial(_fold7_kernel, group=group, k=k),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (group, 3, sq), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, k, 4, s), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, k, d_pad, s), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (group, sq), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (group, d_pad, sq), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g * group, sq), jnp.float32),
            jax.ShapeDtypeStruct((g * group, d_pad, sq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_t, b_cand, pl_cand)

    d = d[:tq].reshape(-1)
    d = jnp.where(d < 1e15, d, jnp.inf)
    pl_rows = jnp.swapaxes(pl_t[:tq], 1, 2).reshape(tq * sq, d_pad)
    return d, pl_rows[:, :d_pl]


def block_fold_fused(
    query_tiles: jax.Array,
    cand_tiles: jax.Array,
    index: TileIndex,
    payload_tiles: jax.Array,
    *,
    group: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Convenience one-shot wrapper (prep + fold). Production ICP calls
    `fold6_prepare` once per phase and `block_fold_fused_pre` per
    iteration instead (see fold6_prepare's OOM note)."""
    rt_cand, pl_cand, d_pl = fold6_prepare(
        cand_tiles, index, payload_tiles, group=group
    )
    return block_fold_fused_pre(
        query_tiles, rt_cand, pl_cand, d_pl, group=group,
        interpret=interpret,
    )


# ---- take-6 moments: per-tile candidates, per-query-tile centering ----------
#
# Same diagnosis as the fold: `block_radius_moments` materializes
# (Tq, Sq, S) score and weight tensors through HBM per candidate step,
# and the union-based fused kernel (`block_radius_moments_fused`) only
# tied because U >> k_tiles inflated the scored set. This variant scores
# each query tile against its OWN k_tiles candidates with the identical
# per-query-tile centering the jnp path uses (bit-comparable moments),
# entirely in VMEM.


def _moments6_kernel(q_ref, r2_ref, rt_ref, m_out, *, group, k):
    r2 = r2_ref[0, 0]  # scalar radius^2
    for j in range(group):
        # queries arrive PRE-CENTERED on their tile centroid and
        # TRANSPOSED (3, Sq): S-minor layouts only — a (Sq, 3) operand
        # lane-pads 3 -> 128 (4.3 GB at 8M, the mom-vmem HBM OOM), and
        # the old (group, 1, 3) centroid operand padded both dims.
        q = q_ref[j].T  # (Sq, 3)
        qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        qq = jnp.sum(q * q, axis=1, keepdims=True)  # (Sq, 1)
        m = jnp.zeros((16, q.shape[0]), jnp.float32)
        for c in range(k):
            r = rt_ref[j, c]  # (3, S) pre-centered candidates
            rx, ry, rz = r[0:1], r[1:2], r[2:3]
            rr = rx * rx + ry * ry + rz * rz  # (1, S)
            d2 = qq + rr - 2.0 * (qx * rx + qy * ry + qz * rz)  # (Sq, S)
            w = (d2 <= r2).astype(jnp.float32)  # sentinel rows: rr huge
            rtf = jnp.concatenate(
                [r, rr, jnp.ones_like(rr),
                 rx * rx, ry * ry, rz * rz,
                 rx * ry, rx * rz, ry * rz,
                 jnp.zeros((5, r.shape[1]), jnp.float32)],
                axis=0,
            )  # (16, S) built in VMEM — no HBM feature expansion
            m = m + jax.lax.dot_general(
                rtf,
                w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (16, Sq)
        m_out[j] = m


@functools.partial(
    jax.jit, static_argnames=("k_tiles", "group", "interpret", "soa")
)
def block_radius_moments_fused6(
    query_tiles: jax.Array,
    index: TileIndex,
    radius: jax.Array,
    *,
    k_tiles: int = 2,
    group: int = 8,
    interpret: bool = False,
    soa: bool = False,
):
    """Drop-in for `blocknn.block_radius_moments` (count, mean, cov) with
    the whole weight/moment fold in VMEM and no union inflation.

    `soa=True` returns the covariance as six (N,) component vectors
    (c00, c01, c02, c11, c12, c22) instead of a (N, 3, 3) tensor."""
    tq, sq, _ = query_tiles.shape
    t, s, _ = index.tiles.shape
    interpret = interpret or jax.default_backend() != "tpu"

    cand, q_cent = _candidate_tiles(query_tiles, index, k_tiles)
    k = cand.shape[1]

    # XLA prep = pure gathers of once-materialized tables (the feature
    # expansion lives in VMEM — a (Tq, k, 16, S) HBM expansion OOM'd at
    # 8M: full-size HLO temps before fusion). Centering happens HERE
    # (fuses into the gather) so the kernel needs no centroid operand,
    # and queries ship transposed (3, Sq): S-minor layouts throughout.
    rt3 = jnp.swapaxes(index.tiles, 1, 2)  # (T, 3, S)
    rt_cand = rt3[cand] - q_cent[:, None, :, None]  # (Tq, k, 3, S)
    query_tiles = query_tiles - q_cent[:, None, :]
    r2 = (radius * radius).reshape(1, 1).astype(jnp.float32)

    pad_t = (-tq) % group
    if pad_t:
        query_tiles = jnp.concatenate(
            [query_tiles,
             jnp.full((pad_t, sq, 3), PAD_COORD, jnp.float32)]
        )
        rt_cand = jnp.concatenate(
            [rt_cand, jnp.full((pad_t, k, 3, s), PAD_COORD, jnp.float32)]
        )
    g = (tq + pad_t) // group
    q_t = jnp.swapaxes(query_tiles, 1, 2)  # (Tq', 3, Sq)

    mT = pl.pallas_call(
        functools.partial(_moments6_kernel, group=group, k=k),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (group, 3, sq), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (group, k, 3, s), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (group, 16, sq), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((g * group, 16, sq), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_t, r2, rt_cand)

    n = tq * sq
    m = jnp.swapaxes(mT[:tq], 1, 2).reshape(n, 16)
    cnt = m[:, 4]
    safe1 = jnp.maximum(cnt, 1.0)
    mx, my, mz = m[:, 0] / safe1, m[:, 1] / safe1, m[:, 2] / safe1
    if soa:
        # component (SoA) covariance: no lane-padded (N, 3, 3) tensor
        # ever materializes — feeds eigh3.smallest_eigenvector_3x3_soa
        # (round-5: the AoS eigh path measured 216 ms at 8M, 16x over
        # its SoA rewrite; see eigh3.py docstring)
        c00 = m[:, 5] / safe1 - mx * mx
        c11 = m[:, 6] / safe1 - my * my
        c22 = m[:, 7] / safe1 - mz * mz
        c01 = m[:, 8] / safe1 - mx * my
        c02 = m[:, 9] / safe1 - mx * mz
        c12 = m[:, 10] / safe1 - my * mz
        mean = (
            jnp.stack([mx, my, mz], axis=1)
            + jnp.repeat(q_cent, sq, axis=0)
        )
        return cnt, mean, (c00, c01, c02, c11, c12, c22)
    safe = safe1[:, None]
    mean_c = jnp.stack([mx, my, mz], axis=1)
    exx = jnp.stack(
        [
            jnp.stack([m[:, 5], m[:, 8], m[:, 9]], axis=1),
            jnp.stack([m[:, 8], m[:, 6], m[:, 10]], axis=1),
            jnp.stack([m[:, 9], m[:, 10], m[:, 7]], axis=1),
        ],
        axis=1,
    ) / safe[..., None]
    cov = exx - mean_c[:, :, None] * mean_c[:, None, :]
    mean = mean_c + jnp.repeat(q_cent, sq, axis=0)
    return cnt, mean, cov


def use_fused_default() -> bool:
    """Whether the fused Pallas fold should be the default: NO — final
    verdict of the four-take campaign (module docstring). Measured on the
    real chip at 1M pts: best take (4, VPU) 47-54 ms vs XLA jnp fold
    47 ms standalone, 283 vs 203 ms full pipeline, and OOM risk at 8M
    from its (N, 1) outputs padding 128x. The kernels stay opt-in
    (`block_fused="on"`) for their recall edge (0.042% vs 0.076% miss)."""
    return False
