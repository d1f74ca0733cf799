"""Profiling helpers: wall timers, jax.profiler traces, speed-of-light
estimates (SURVEY §5.1 — the reference has no timing code at all).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


class Timer:
    """Wall-clock timer that blocks on device results.

    with Timer() as t: out = f(x)
    t.elapsed -> seconds (f's outputs must be passed to t.block(out) or
    be side-effect-free sync code).
    """

    def __init__(self):
        self.elapsed = 0.0
        self._t0 = 0.0

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._t0

    def block(self, out):
        jax.block_until_ready(out)
        return out


def _fence(out):
    """Force REAL device completion. `jax.block_until_ready` can return
    before execution finishes on relayed backends (measured: a 4.4 s 8M
    KD build 'blocked' in 0.6 ms, the work then materialized at the
    first value fetch — NOTES.md round 2); fetching one scalar is the
    only reliable fence."""
    jax.block_until_ready(out)
    # fetch from EVERY leaf: separate leaves can come from separately
    # dispatched executables, each needing its own completion fence
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            float(jax.device_get(leaf.ravel()[0]))


def time_fn(fn, *args, reps: int = 5, warmup: int = 1, cache_bust=None):
    """Median wall seconds of fn(*args).

    `cache_bust`: optional callable (rep_index) -> extra arg appended to
    args each rep; use on backends that memoize identical executions
    (the axon relay does — see .claude/skills/verify/SKILL.md).

    Each rep is fenced with a scalar fetch (see `_fence`), so the median
    includes one device round trip — negligible against the workloads
    this times, and the only way to get truthful numbers on relayed
    backends.
    """
    for _ in range(warmup):
        _fence(fn(*args, *([cache_bust(0)] if cache_bust else [])))
    times = []
    for r in range(reps):
        extra = [cache_bust(r + 1)] if cache_bust else []
        t0 = time.perf_counter()
        out = fn(*args, *extra)
        _fence(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


@contextlib.contextmanager
def trace_context(log_dir: str):
    """jax.profiler trace scope (view with TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Rough per-chip peaks for speed-of-light accounting (v5e defaults).
PEAKS = {
    "bf16_flops": 197e12,
    "f32_flops": 49e12,
    "hbm_bytes": 820e9,
    "vpu_ops": 2.0e12,
}


def kernel_speed_of_light(
    *,
    seconds: float,
    flops: float = 0.0,
    vpu_ops: float = 0.0,
    hbm_bytes: float = 0.0,
    peaks: Optional[Dict[str, float]] = None,
) -> Dict[str, float]:
    """Fraction-of-peak summary for a measured kernel time.

    Returns utilization fractions + the bound-resource estimate (the max
    fraction: what the kernel is limited by if it were at peak).
    """
    p = dict(PEAKS)
    if peaks:
        p.update(peaks)
    out = {}
    if flops:
        out["f32_flops_frac"] = flops / seconds / p["f32_flops"]
    if vpu_ops:
        out["vpu_frac"] = vpu_ops / seconds / p["vpu_ops"]
    if hbm_bytes:
        out["hbm_frac"] = hbm_bytes / seconds / p["hbm_bytes"]
    out["bound_frac"] = max(out.values()) if out else 0.0
    return out
