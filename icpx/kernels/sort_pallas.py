"""Pallas segmented multi-operand sort for the KD-build level sorts
(NOTES lever #2 / round-3 VERDICT next-round #2).

The KD builder (`blocknn.build_kd_index`, reference analogue: the
PCL KD-tree the reference leans on at `/root/reference/ICP/myicp.cpp:
128-131,160`) moves data with one multi-operand `lax.sort` per median
level. Those level sorts are SEGMENT-LOCAL (each node sorts
independently), which makes them expressible as one Pallas program per
segment: the whole segment lives in VMEM, the bitonic network runs on
the VPU with `pltpu.roll` lane/sublane exchanges, and each level costs
exactly one HBM read + write instead of a full lax.sort dispatch.

Semantics match `jax.lax.sort((key, *payloads), num_keys=1,
is_stable=True)` BIT-EXACTLY for non-NaN keys: stability comes from
lexicographic (key, position) comparison — (key, pos) pairs are
strictly totally ordered, so the non-stable bitonic network still has a
unique fixed output, which equals the stable sort's. (NaN keys are NOT
ordered like lax.sort's total-order comparator; KD keys are finite —
invalids carry PAD_COORD.)

Layout: a segment of m elements is (m//128, 128) in VMEM, element i at
(row i//128, lane i%128). A bitonic compare-exchange at distance j is a
lane-XOR (j < 128: two `pltpu.roll`s along lanes + select) or a
row-XOR (j >= 128: the same along sublanes). Direction and
lower/upper masks are bit tests on a linear iota.

Measured (chip, scripts/exp_psort.py, 2026-08-20): see NOTES.md — this
kernel exists to A/B against the XLA level sorts; whichever way the
number lands, the result is documented there.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _partner(a: jax.Array, j: int, lane: jax.Array, row: jax.Array):
    """Value of each element's bitonic partner at XOR-distance j."""
    if j < 128:
        lo = (lane & j) == 0
        # pltpu.roll needs shift >= 0: roll(a, -j) == roll(a, n - j)
        return jnp.where(
            lo, pltpu.roll(a, 128 - j, axis=1), pltpu.roll(a, j, axis=1)
        )
    jr = j // 128
    lo = (row & jr) == 0
    n0 = a.shape[0]
    return jnp.where(
        lo, pltpu.roll(a, n0 - jr, axis=0), pltpu.roll(a, jr, axis=0)
    )


def _sort_network(key, pos, payloads, m, lin_m, lane, row):
    """Full bitonic sort of every m-element segment inside the block by
    (key, pos) ascending; returns reordered (key, pos, payloads).
    `lin_m` is each element's SEGMENT-LOCAL linear index — segments are
    m-aligned, XOR partners at distance < m never cross them, so one
    network sorts all segments in the block simultaneously."""
    k_ = 2
    while k_ <= m:
        j = k_ // 2
        while j >= 1:
            kp = _partner(key, j, lane, row)
            pp = _partner(pos, j, lane, row)
            cmp_gt = (key > kp) | ((key == kp) & (pos > pp))
            lower = (lin_m & j) == 0
            ud = (lin_m & k_) == 0  # ascending block? (k_ == m: all asc)
            swap = cmp_gt ^ lower ^ ud
            key = jnp.where(swap, kp, key)
            pos = jnp.where(swap, pp, pos)
            payloads = tuple(
                jnp.where(swap, _partner(p, j, lane, row), p)
                for p in payloads
            )
            j //= 2
        k_ *= 2
    return key, pos, payloads


def _sort_kernel(*refs, m: int, n_payloads: int):
    key_ref = refs[0]
    pay_refs = refs[1 : 1 + n_payloads]
    okey_ref = refs[1 + n_payloads]
    opay_refs = refs[2 + n_payloads :]

    shape = key_ref.shape  # (group * m//128, 128)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    lin_m = (row * 128 + lane) & (m - 1)  # segment-local index

    key = key_ref[...]
    pos = lin_m  # pre-sort position: the stability tiebreak
    payloads = tuple(r[...] for r in pay_refs)
    key, pos, payloads = _sort_network(
        key, pos, payloads, m, lin_m, lane, row
    )
    okey_ref[...] = key
    for r, p in zip(opay_refs, payloads):
        r[...] = p


@functools.partial(
    jax.jit, static_argnames=("seg_len", "interpret")
)
def sort_segments(
    key: jax.Array,  # (c, m) float32 — m a power of two >= 256
    payloads: Tuple[jax.Array, ...],  # each (c, m)
    *,
    seg_len: int | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Drop-in for `lax.sort((key, *payloads), dimension=1, num_keys=1,
    is_stable=True)` on segment-shaped operands: returns
    (sorted_key, *reordered_payloads).
    """
    c, m = key.shape
    if seg_len is None:
        seg_len = m
    # Explicit raise (not assert): under `python -O` a stripped assert
    # would let a bad shape through to the bitonic network, which returns
    # silently WRONG sort output for non-power-of-two segments.
    if not (seg_len == m and m % 256 == 0 and (m & (m - 1)) == 0):
        raise ValueError(
            f"segment length must be a power of two >= 256, got {m}"
        )
    interpret = interpret or jax.default_backend() != "tpu"
    r = m // 128
    n_pay = len(payloads)

    # group small segments into one program (per-program overhead; a
    # 256-pt segment is only 2 sublane rows). group must divide c and
    # keep the block within a comfortable row budget.
    group = 1
    while (
        group * 2 * r <= 512
        and c % (group * 2) == 0
        and group * 2 <= c
    ):
        group *= 2

    def spec():
        return pl.BlockSpec(
            (group * r, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    outs = pl.pallas_call(
        functools.partial(_sort_kernel, m=m, n_payloads=n_pay),
        grid=(c // group,),
        in_specs=[spec()] + [spec() for _ in payloads],
        out_specs=[spec()] + [spec() for _ in payloads],
        out_shape=[jax.ShapeDtypeStruct((c * r, 128), key.dtype)]
        + [
            jax.ShapeDtypeStruct((c * r, 128), p.dtype)
            for p in payloads
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        key.reshape(c * r, 128),
        *[p.reshape(c * r, 128) for p in payloads],
    )
    return tuple(o.reshape(c, m) for o in outs)
