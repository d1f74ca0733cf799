"""Iterate-to-convergence ICP: the TPU rebuild of `MyICP::RegisterSymm`
(`myicp.cpp:100-150`) plus the point-to-point mode the reference declared
but never finished (`myicp.h:18`, stub at `myicp.cpp:43-59`).

Differences from the reference, by design (SURVEY.md §7):
  * real nearest-neighbor correspondences each iteration — the reference
    skips this entirely (TODO at `myicp.cpp:128-131`) and only works on
    index-aligned fixtures;
  * joint 6-DoF Gauss-Newton with Levenberg damping instead of alternating
    3-variable solves (`func.cpp:85-88`);
  * robust weights + max-correspondence-distance gating (absent upstream);
  * the whole loop is one `lax.scan` under `jit`: static shapes, no host
    round-trips, per-iteration diagnostics returned as arrays.

Convergence bookkeeping matches the reference observably: `diff` is the
plain sum of corresponded point distances (`evalDiff`, `func.cpp:19-32`)
with default threshold 1.0 and max 10 iterations (`myicp.cpp:6`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from icpx.cloud import PointCloud
from icpx.geometry.se3 import SE3
from icpx.kernels.knn import nearest_neighbor
from icpx.kernels.normals import estimate_normals
from icpx.registration.step import (
    correspondence_weights,
    estimate_increment,
    identity_reduce,
    step_stats,
)

OBJECTIVES = ("symmetric", "p2plane", "p2p", "gicp")


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """Static hyperparameters. Reference hard-codings become named fields
    with the reference values as defaults (SURVEY.md §5.6)."""

    objective: str = "symmetric"
    max_iters: int = 10  # myicp.cpp:6
    diff_threshold: float = 1.0  # myicp.cpp:6 (evalDiff sum)
    rmse_change_tol: float = 0.0  # extra stop: |delta RMSE| below this
    # extra stop (PCL transformation_epsilon analogue): stop once an
    # iteration's increment moves by less than this, measured as
    # rotation angle (rad) + translation norm (cloud units). 0 = off.
    transform_tol: float = 0.0
    k_normals: int = 10  # myicp.cpp:160
    max_corr_dist: float = float("inf")
    robust: str = "none"  # none|huber|tukey|welsch|cauchy
    robust_scale: float = 0.0  # <= 0 -> auto via MAD each iteration
    # Trimmed ICP: keep only the closest fraction of correspondences
    # (1.0 = keep all). Robust to partial overlap.
    trim_fraction: float = 1.0
    damping: float = 1e-6
    # LOAM-style degeneracy handling: zero the update along 6x6-JtJ
    # eigendirections with eigenvalue < clamp * max eigenvalue. In scenes
    # with a flat objective direction (corridors, smooth ground) ICP
    # otherwise WANDERS along it, chasing its init + IRLS bias. 0 = off.
    degeneracy_clamp: float = 0.0
    # NN search: "brute" = tiled O(N^2) (Pallas-fused on TPU), "block" =
    # spatially-tiled IVF-style O(N*K*S) (the large-cloud path), "auto"
    # picks block above `block_auto_threshold` target points.
    nn_method: str = "auto"
    # Reference tile size S = 128 (round-2 default; was 256): halved tiles
    # give the same recall from ~2x fewer candidate points per query —
    # measured 4.3M pts/s at 1M (vs 4.0M at S=256) with refine-regime
    # (aligned-clouds) volume recall 99.9%+ at k=6 candidates.
    block_tile: int = 128
    block_q_tile: int = 64  # query tile size Sq (smaller = tighter boxes)
    # Query tile size for LARGE clouds (>= payload_infold_threshold
    # points): what matters for recall is a tile's SPATIAL extent, which
    # shrinks with density — at 8M a 128-point tile is tighter than 1M's
    # 64-point tile (chip A/B 2026-08-19: 8M wall -8% AND rmse 4.07e-3
    # vs 4.13e-3; at 1M the same Sq=128 costs recall, rmse 1.08e-2 —
    # and Sq=256 at 8M costs it too, rmse 8.3e-3). 0 = always use
    # block_q_tile.
    block_q_tile_large: int = 128
    block_k: int = 8
    # Candidate-tile count for refine-phase iterations (after the coarse
    # phase has aligned the clouds, correspondences are near and a
    # smaller candidate set keeps recall; 0 = use block_k throughout).
    block_k_refine: int = 6
    # Coarse phase: the first `coarse_iters` iterations run on a
    # stride-`coarse_stride` row subsample with 4 sibling KD tiles merged
    # per query tile (the parent box), reusing full-resolution normals —
    # ~4x cheaper NN while the motion is still large. 0 disables.
    coarse_iters: int = 2
    coarse_stride: int = 4
    # Feature-augmented correspondence (block NN only): match in the 4D
    # metric ||p-q||^2 + feat_nn_weight^2 (f_p - f_q)^2 using the named
    # payload column of BOTH clouds (e.g. "intensity"). Disambiguates
    # geometrically degenerate scenes (planes, corridors) where pure
    # point-to-surface ICP is rank-deficient. Scale the weight so
    # feat_nn_weight * (typical feature contrast) ~ the spatial scale
    # you want it to pin. "" disables. NOTE: correspondence distances
    # (max_corr_dist gating, trim_fraction, robust scaling, reported
    # diff/rmse) are then in the AUGMENTED metric — widen max_corr_dist
    # by the expected feature term if it was tuned spatially.
    feat_nn: str = ""
    feat_nn_weight: float = 0.0
    # Rank refine-phase candidate tiles ONCE at the coarse-aligned
    # positions instead of every iteration (safe: post-coarse motion is
    # well under a tile extent; selection is ~15% of a 1M registration).
    freeze_refine_candidates: bool = True
    # Multi-resolution refine (the classic pyramid schedule, cf.
    # Rusinkiewicz & Levoy 2001 "Efficient ICP variants"): run the bulk
    # of the refine iterations on a within-tile row subsample of the
    # source (every refine_stride-th row of each query tile — the tile
    # boxes and frozen candidate lists stay valid), then at most
    # `refine_full_iters` at full resolution. Pose accuracy needs
    # statistical mass, not every point (estimate noise ~ 1/sqrt(N));
    # the full-res tail polishes and produces full-resolution
    # diff/rmse/inlier statistics. `diff` is a SUM over points, so the
    # mid phase gates on diff_threshold / stride; rmse-based stops are
    # scale-invariant. refine_stride: 1 = off, 0 = auto — which now
    # resolves to 1 everywhere: the chip A/B the advisor asked for
    # (8M, 2026-08-20) measured stride 2 at 1843 ms / 6 iters vs
    # stride 1 at 1636 ms / 4 iters, identical rmse — the subsampled
    # mid phase converges SLOWER (noisier solve statistics) and the
    # extra iterations cost more than the per-iteration saving. The
    # knob stays for explicit use (a stride-2 iteration IS ~35%
    # cheaper; workloads with iteration budgets to burn may still
    # want it).
    refine_stride: int = 0
    refine_full_iters: int = 2
    # retired auto-gate size (auto now always resolves to stride 1);
    # kept so existing configs stay constructible
    refine_stride_threshold: int = 2 * 1024 * 1024
    # MEASURED NEGATIVE (chip 2026-08-19, NOTES.md): pre-gathering the
    # frozen candidate tiles into dense (K, Tq, S, ·) arrays so refine
    # iterations read static slices instead of re-gathering rows was a
    # wash at 8M (1736.5 vs 1735.3 ms) and -6 ms at 1M — XLA's
    # contiguous-row tile gathers are already near-DMA speed; the fold
    # cost lives in the score/select einsums, not the gathers.
    #
    # MXU precision of the NN score einsum: the package default pins
    # matmuls to "highest" (~6 bf16 passes emulating fp32) because
    # coordinate-scale squared-distance expansions cancel
    # catastrophically in bf16. "high" = 3 passes (near-f32); "bf16" =
    # ONE native pass on query-tile-CENTERED coordinates, where the
    # expansion's terms scale with the local tile extent and the
    # rounding error stays a small fraction of a point spacing —
    # misses remain genuine near-ties. Applies to block-NN correspondence
    # scoring only (solve/normals stay fp32). Chip A/B 2026-08-19
    # (exp_tiles): rmse/GT IDENTICAL to "highest" at 1M AND 8M, wall
    # 190.5->175.7 ms / 1736->1639 ms — the MXU accumulates bf16
    # products in f32. "auto" = bf16 on accelerators; CPU (tests) keeps
    # "highest" because CPU bf16 emulation lacks the f32-accumulate
    # guarantee (measured rmse floor raise at 40k on CPU).
    score_precision: str = "auto"
    # How matched target rows (coords + normals/covs) reach the solve:
    # "gather" = one coherent (N, 3+D) sorted-table row gather per
    # iteration (fastest at <=1M: 28 vs 32.5 ms/iter); "infold" = one-hot
    # MXU selection inside the NN fold, table-size-independent (the
    # gather scales super-linearly: 263 ms/iter at 8M vs 282 total for
    # the whole in-fold refine — chip A/B 2026-08-19); "auto" switches to
    # infold at >= payload_infold_threshold target points.
    payload_mode: str = "auto"
    payload_infold_threshold: int = 2 * 1024 * 1024
    # Size from which auto payload/moments resolve to the take-6 VMEM
    # kernels on TPU. Separate from payload_infold_threshold (which
    # also gates the Sq=128 large-query tiles — Sq=128 LOSES at 1M):
    # the stacked vmem+mom A/B won at 1M (164.1 vs 168.7-170.9 ms,
    # repeated) with Sq=64 kept.
    vmem_threshold: int = 1024 * 1024
    # Precision of the infold one-hot payload-selection matmul: "high"
    # (3-pass, default) or "bf16" (1 native MXU pass; matched coords are
    # query-tile-centered before selection so quantization is
    # tile-local). Chip A/B at 8M (2026-08-20, exp_tiles): a WASH —
    # 1640 vs 1653 ms full registration, rmse/GT identical — the
    # payload cost is layout/traffic-bound, not matmul-pass-bound, so
    # "auto" keeps "high" (fp32-exact payload values for free).
    payload_prec: str = "auto"
    # Moment-accumulation execution for in-jit normals: "xla" folds via
    # jnp einsums (materializes (Tq,Sq,S) weight tensors through HBM),
    # "vmem" uses the take-6 Pallas kernel (per-tile candidates, fold in
    # VMEM; f32-roundoff-identical moments). "auto" resolves per backend
    # after the round-4 chip A/B.
    moments_mode: str = "auto"
    # Chip A/B 2026-08-20 (compiled odometry): block beats the O(N^2)
    # brute score at every LiDAR scan size measured — 16384-pt scans
    # 88 ms / 228 fps vs 370 ms / 54 fps, and 8192-pt scans 62 ms /
    # 321 fps vs 152 ms / 131 fps (per-step in-jit KD builds included).
    # The old 32768 cutoff was set before the q-form/fan-4 build cuts
    # made small builds cheap. Below 8192 the brute fused Pallas pass
    # keeps the edge (cat-scale clouds have too few tiles to rank).
    block_auto_threshold: int = 8192
    # Tile partitioner: "kd" (median-cut, compact boxes — measured 0.01%
    # NN miss at the defaults vs ~5% for Morton ranges on uniform volumes)
    # or "morton" (cheaper build).
    tile_index: str = "kd"
    # Partitioner for the SOURCE (query) tiling only; "" = tile_index.
    # Hypothesis was that query-tile sprawl only loosens candidate
    # ranking, so a Morton source build (1 global sort vs ~7) could be
    # free speed. MEASURED LOSER (chip, scripts/exp_srcmorton.py,
    # 2026-08-19): sprawling query boxes dilute the shared top-k tile
    # list enough to cost real recall — 1M 186.6->178.8 ms but rmse
    # 5.7e-3 -> 1.6e-2; 8M 1737->1667 ms but rmse 4.1e-3 -> 9.5e-3
    # (GT still recovered; the rmse is inflated miss distances). Same
    # class of recall loss as the rejected _KD_SEG=16384 — "" stands.
    src_tile_index: str = ""
    # Fused Pallas fold (TPU): "auto" = on when the default backend is not
    # CPU, "on"/"off" force. The fused kernel groups `block_group` query
    # tiles per program over a deduplicated candidate union of up to
    # `block_u_max` ref tiles (kernels/blocknn_pallas.py; the measured
    # verdict is the fused fold only TIES the XLA fold — it stays opt-in
    # for its small recall edge, see that module's docstring).
    block_fused: str = "auto"
    block_group: int = 4
    # Query tiles per program for the take-6 VMEM fold/moments kernels.
    # 8 was the pre-S-minor-layout ceiling (the old payload blocks
    # wasted 16x VMEM); the transposed layouts admit 16 — A/B'd on chip
    # before changing the default.
    vmem_group: int = 8
    block_u_max: int = 32
    tile_q: int = 2048
    tile_r: int = 4096

    def __post_init__(self):
        if self.objective not in OBJECTIVES:
            raise ValueError(f"objective must be one of {OBJECTIVES}")
        if self.nn_method not in ("auto", "brute", "block"):
            raise ValueError("nn_method must be auto|brute|block")
        if self.tile_index not in ("kd", "morton"):
            raise ValueError("tile_index must be kd|morton")
        if self.src_tile_index not in ("", "kd", "morton"):
            raise ValueError("src_tile_index must be ''|kd|morton")
        if self.block_fused not in ("auto", "on", "off"):
            raise ValueError("block_fused must be auto|on|off")
        if self.payload_mode not in (
            "auto", "gather", "infold", "select", "vmem", "vmem7"
        ):
            raise ValueError(
                "payload_mode must be auto|gather|infold|select|vmem|"
                "vmem7"
            )
        if self.moments_mode not in ("auto", "xla", "vmem"):
            raise ValueError("moments_mode must be auto|xla|vmem")
        if self.payload_prec not in ("auto", "high", "bf16"):
            raise ValueError("payload_prec must be auto|high|bf16")
        if self.score_precision not in ("auto", "highest", "high", "bf16"):
            raise ValueError(
                "score_precision must be auto|highest|high|bf16"
            )
        if self.refine_stride < 0:
            raise ValueError("refine_stride must be >= 0 (0 = auto)")
        if self.refine_full_iters < 1:
            raise ValueError("refine_full_iters must be >= 1")
        if bool(self.feat_nn) != (self.feat_nn_weight > 0):
            raise ValueError(
                "feature matching needs BOTH feat_nn (channel name) and "
                "feat_nn_weight > 0 — setting one without the other is "
                "almost certainly a mistake"
            )

    def tile_builder(self, kind: str = ""):
        from icpx.kernels.blocknn import build_kd_index, build_tile_index

        k = kind or self.tile_index
        return build_kd_index if k == "kd" else build_tile_index

    def resolve_fused(self) -> bool:
        if self.block_fused != "auto":
            return self.block_fused == "on"
        from icpx.kernels.blocknn_pallas import use_fused_default

        return use_fused_default()

    def resolve_nn(self, tgt_capacity: int) -> str:
        if self.nn_method != "auto":
            return self.nn_method
        return (
            "block" if tgt_capacity >= self.block_auto_threshold else "brute"
        )

    def resolve_score_prec(self) -> str:
        if self.score_precision != "auto":
            return self.score_precision
        import jax

        return "highest" if jax.default_backend() == "cpu" else "bf16"

    def resolve_q_tile(self, capacity: int) -> int:
        if (
            self.block_q_tile_large > 0
            and capacity >= self.payload_infold_threshold
        ):
            return self.block_q_tile_large
        return self.block_q_tile

    def resolve_payload(self, tgt_capacity: int) -> str:
        # Auto above the large-cloud threshold: the take-6 VMEM fold
        # (chip A/B 2026-08-20, NOTES round-4: 8M full pipeline 1516.7
        # ms vmem vs 1634.9 infold vs 1585.9 select). CPU keeps the XLA
        # infold (the Pallas kernel would run in interpret mode). At
        # 1M the kernels are a wash (167.6 vmem / 165.7-170.2 gather
        # across runs) — below the threshold the coherent row gather
        # stays the measured default.
        if self.payload_mode != "auto":
            return self.payload_mode
        import jax

        if (
            jax.default_backend() == "tpu"
            and tgt_capacity >= self.vmem_threshold
        ):
            return "vmem"
        if tgt_capacity >= self.payload_infold_threshold:
            return "infold"
        return "gather"

    def resolve_refine_stride(
        self, src_capacity: int, tgt_capacity: int
    ) -> int:
        # Auto = 1 (off) at every size: the 8M chip A/B (NOTES round-4)
        # measured auto-stride-2 LOSING end-to-end — the subsampled mid
        # phase needs more iterations than it saves per iteration.
        # Explicit strides are honored unchanged.
        if self.refine_stride:
            return self.refine_stride
        return 1

    def resolve_moments(self, capacity: int = 0) -> str:
        # Auto = the take-6 VMEM moments kernel on TPU for large clouds
        # (chip A/B 2026-08-20: 8M full pipeline 1584.9 ms vs 1630.6
        # xla; stacked with the vmem fold: 1473.5). At 1M the delta is
        # inside session noise (167.8 vs 170.4), so the threshold
        # matches the payload one; CPU always folds in XLA.
        if self.moments_mode != "auto":
            return self.moments_mode
        import jax

        if (
            jax.default_backend() == "tpu"
            and capacity >= self.vmem_threshold
        ):
            return "vmem"
        return "xla"

    def resolve_payload_prec(self) -> str:
        # "auto" = "high": bf16 selection measured as a speed WASH at 8M
        # (payload delivery is traffic-bound), so exact fp32 values win.
        if self.payload_prec != "auto":
            return self.payload_prec
        return "high"


def result_struct() -> "ICPResult":
    """Shape-only ICPResult skeleton (for shard_map out_specs trees)."""
    return ICPResult(
        transform=SE3(R=0, t=0),
        iters=0,
        converged=0,
        diff_history=0,
        rmse_history=0,
        final_rmse=0,
        inlier_count=0,
    )


@struct.dataclass
class ICPResult:
    transform: SE3  # accumulated src -> tgt
    iters: jax.Array  # number of iterations actually applied
    converged: jax.Array  # bool
    diff_history: jax.Array  # (max_iters,) evalDiff-style sums (post-update)
    rmse_history: jax.Array  # (max_iters,) inlier euclidean RMSE
    final_rmse: jax.Array
    inlier_count: jax.Array


def register(
    src: PointCloud,
    tgt: PointCloud,
    config: ICPConfig = ICPConfig(),
    init: Optional[SE3] = None,
    *,
    src_weight: Optional[jax.Array] = None,
) -> ICPResult:
    """Register src onto tgt (returns transform with tgt ~= T(src)).

    Estimates normals (k = config.k_normals) for either cloud that lacks
    them when the objective needs normals.

    `src_weight` (N,) optionally scales each source point's vote in the
    solve (sensor confidence / reflectance-derived priors, e.g. a
    payload column via `src.feat("weight")`).

    Both clouds are internally shifted by the target centroid before
    solving and the shift is composed back into the returned transform:
    fp32 squared-distance expansions lose ~half their digits at
    coordinate magnitudes like UTM eastings (1e5-1e7), and the block-NN
    validity heuristics assume post-centering extents << 1e6.
    """
    if init is None:
        init = SE3.identity()

    # Auto-centering FIRST: normal/covariance estimation and NN scoring
    # use ||a||^2+||b||^2-2ab expansions whose fp32 error scales with the
    # squared coordinate magnitude — at offsets ~1e3+ it drowns real
    # point spacings. Solve in target-centroid coordinates, compose back.
    center = tgt.centroid()
    shift = SE3.identity().replace(t=-center)
    unshift = SE3.identity().replace(t=center)
    src = src.with_xyz(src.xyz - center[None, :])
    tgt = tgt.with_xyz(tgt.xyz - center[None, :])
    init_c = shift @ init @ unshift

    needs_normals = config.objective in ("symmetric", "p2plane")
    block = config.resolve_nn(tgt.capacity) == "block"
    if config.feat_nn and config.feat_nn_weight > 0 and not block:
        raise ValueError(
            "feature-augmented matching (feat_nn) needs the block NN "
            "path; set nn_method='block'"
        )
    normals_for = []
    if needs_normals and config.objective == "symmetric" and src.normals is None:
        if block:
            normals_for.append("src")  # estimated in-jit off the shared index
        else:
            src = estimate_normals(src, k=config.k_normals)
    if needs_normals and tgt.normals is None:
        if block:
            normals_for.append("tgt")
        else:
            tgt = estimate_normals(tgt, k=config.k_normals)
    if config.objective == "gicp":
        from icpx.kernels.normals import estimate_covariances

        if src.covs is None:
            src = estimate_covariances(src, k=max(config.k_normals, 15))
        if tgt.covs is None:
            tgt = estimate_covariances(tgt, k=max(config.k_normals, 15))

    res = _register_jit(
        src, tgt, init_c, config, normals_for=tuple(normals_for),
        src_w=src_weight,
    )
    return res.replace(transform=unshift @ res.transform @ shift)


def _icp_scan(
    config: ICPConfig,
    src_xyz: jax.Array,
    src_mask: jax.Array,
    src_n: jax.Array,
    init: SE3,
    nn_fn,
    reduce=identity_reduce,
    aux_rot=None,
    prev_rmse0=None,
    src_w=None,
) -> ICPResult:
    """The ICP iteration core shared by every execution mode.

    `nn_fn(p) -> (q, aux_q, dist)` produces matched target rows for the
    transformed source; `src_n`/`aux_q` are the per-objective auxiliary
    channel (normals (N,3), or flattened covariances (N,9) for GICP).
    `aux_rot(T, aux)` moves the source aux into the current frame
    (default: vector rotation). `reduce` sums pytrees across a points
    partition (identity on a single device, psum when sharded).
    `src_w` (N,) optionally scales each source point's vote in the solve
    (sensor confidence, user priors) on top of the validity/robust
    weights; it does not affect the convergence statistics.

    A `lax.while_loop` so convergence ACTUALLY stops the work (the
    reference's `while diff > threshold` loop, `myicp.cpp:123`) — the
    convergence predicate is reduce()'d, so every shard exits together.
    """
    if aux_rot is None:
        aux_rot = lambda T, aux: T.rotate(aux)

    def cond(state):
        it, _, _, stop, _, *_ = state
        return (it < config.max_iters) & ~stop

    def body(state):
        it, transform, prev_rmse, stop, failed, diffs, rmses, counts = state

        p = transform.apply(src_xyz)
        n_p = aux_rot(transform, src_n)
        q, n_q, dist = nn_fn(p)

        w = correspondence_weights(
            config, p, n_p, q, n_q, dist, src_mask, reduce
        )
        if src_w is not None:
            w = w * src_w
        incre = estimate_increment(config, p, q, n_p, n_q, w, reduce)
        new_transform = incre @ transform

        # Post-update diagnostics against the same correspondences.
        stats = step_stats(
            config, new_transform.apply(src_xyz), q, dist, src_mask, reduce
        )
        # Degraded-mode guard (SURVEY §5.3): a non-finite or correspondence-
        # starved update is rejected, keeping the previous transform. The
        # loop stops AND reports failure (converged stays False).
        from icpx.distributed.fault import degenerate_solve_guard

        new_transform, ok = degenerate_solve_guard(
            new_transform, stats, transform
        )
        diff, rmse, count = stats.diff, stats.rmse, stats.inlier_count
        diff = jnp.where(ok, diff, jnp.float32(jnp.inf))
        rmse = jnp.where(ok, rmse, prev_rmse)

        now_stop = (~ok) | (diff < config.diff_threshold) | (
            (config.rmse_change_tol > 0)
            & (jnp.abs(prev_rmse - rmse) < config.rmse_change_tol)
        )
        if config.transform_tol > 0:
            cos_a = jnp.clip(
                (jnp.trace(incre.R) - 1.0) * 0.5, -1.0, 1.0
            )
            inc_mag = jnp.arccos(cos_a) + jnp.linalg.norm(incre.t)
            now_stop = now_stop | (inc_mag < config.transform_tol)
        return (
            it + 1,
            new_transform,
            rmse,
            now_stop,
            failed | ~ok,
            diffs.at[it].set(diff),
            rmses.at[it].set(rmse),
            counts.at[it].set(count),
        )

    nan_hist = jnp.full((config.max_iters,), jnp.nan, jnp.float32)
    # prev_rmse0 seeds the convergence state (e.g. with the coarse
    # phase's final RMSE, so an already-converged refine phase can stop
    # after ONE iteration instead of needing two to see a stable RMSE).
    state0 = (
        jnp.int32(0),
        init,
        jnp.float32(jnp.inf) if prev_rmse0 is None else prev_rmse0,
        jnp.array(False),
        jnp.array(False),
        nan_hist,
        nan_hist,
        jnp.zeros((config.max_iters,), jnp.float32),
    )
    (it, transform, rmse, stop, failed, diffs, rmses, counts) = (
        jax.lax.while_loop(cond, body, state0)
    )
    last = jnp.maximum(it - 1, 0)
    return ICPResult(
        transform=transform,
        iters=it,
        converged=stop & ~failed,
        diff_history=diffs,
        rmse_history=rmses,
        final_rmse=rmse,
        inlier_count=counts[last].astype(jnp.int32),
    )


def gicp_cov_rot(T, aux):
    """Rotate flattened (N, 9) GICP covariances into T's frame: R C R^T.
    The GICP auxiliary-channel rotator shared by every execution mode."""
    C = aux.reshape(-1, 3, 3)
    return jnp.einsum("ij,njk,lk->nil", T.R, C, T.R).reshape(-1, 9)


def _index_normals(index, k_normals, k_tiles=4, prec="highest", mode="xla", group=8):
    """PCA normals for an index's own tiles (self-query radius moments):
    (normals, valid_count) in SORTED tile order. The shared-index fast
    path — one KD build serves NN search and normal estimation
    (`pcl::NormalEstimation` equivalent, `myicp.cpp:152-172`).

    `mode="vmem"` runs the moment fold in the take-6 Pallas kernel
    (per-tile candidates, whole weight/moment fold in VMEM — matches the
    XLA fold to f32 roundoff, see blocknn_pallas.py)."""
    import numpy as np

    from icpx.kernels.blocknn import block_radius_moments
    from icpx.kernels.eigh3 import smallest_eigenvector_3x3
    from icpx.kernels.voxel import auto_cell_size

    flat = index.tiles.reshape(-1, 3)
    valid = index.order >= 0
    scale = 3.0 * float(np.sqrt(max(k_normals, 1) / 10.0))
    radius = auto_cell_size(flat, valid, scale=scale)
    if mode == "vmem":
        from icpx.kernels.blocknn_pallas import block_radius_moments_fused6
        from icpx.kernels.eigh3 import smallest_eigenvector_3x3_soa

        # the kernel group-pads internally (pad_t = (-tq) % group), so
        # non-divisible tile counts need no fallback here (advice r4).
        # SoA end-to-end: covariance components and the eigenvector stay
        # (N,) vectors — the (N, 3, 3) AoS round trip cost 216 ms at 8M
        # (round-5 decomposition; eigh3.py docstring).
        cnt, _, comps = block_radius_moments_fused6(
            index.tiles, index, radius, k_tiles=k_tiles, group=group,
            soa=True,
        )
        (vx, vy, vz), _ = smallest_eigenvector_3x3_soa(*comps)
        # orient toward the (centered-frame) viewpoint at the origin
        flip = (
            vx * flat[:, 0] + vy * flat[:, 1] + vz * flat[:, 2]
        ) > 0.0
        sign = jnp.where(flip, -1.0, 1.0)
        normal = jnp.stack([vx * sign, vy * sign, vz * sign], axis=1)
        ok = (cnt >= 3.0) & valid
        return jnp.where(ok[:, None], normal, 0.0)
    cnt, _, cov = block_radius_moments(
        index.tiles, index, radius, k_tiles=k_tiles, prec=prec
    )
    normal, _ = smallest_eigenvector_3x3(cov)
    # orient toward the (centered-frame) viewpoint at the origin
    flip = jnp.sum(normal * (-flat), axis=-1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)
    ok = (cnt >= 3.0) & valid
    return jnp.where(ok[:, None], normal, 0.0)


def _effective_payload_mode(
    config: "ICPConfig",
    tgt_capacity: int,
    *,
    use_feat: bool,
    fused: bool,
    will_freeze: bool,
) -> str:
    """The payload-delivery mode a block registration will ACTUALLY run.

    The take-6 vmem kernel scores 3D coordinates only and needs a frozen
    candidate list; feature-augmented (4D-metric), fused-fold, and
    no-frozen-candidate registrations resolve to the table-size-
    independent infold path at large sizes instead of silently degrading
    to the super-linear row gather (review r4 twice: the feat/fused
    carve-out, then the missing no-candidates one — the gather path was
    measured at 263 ms/iter at 8M)."""
    pmode = config.resolve_payload(tgt_capacity)
    if pmode in ("vmem", "vmem7") and (
        use_feat or fused or not will_freeze
    ):
        pmode = (
            "infold"
            if tgt_capacity >= config.payload_infold_threshold
            else "gather"
        )
    return pmode


@partial(jax.jit, static_argnames=("config", "normals_for"))
def _register_jit(
    src: PointCloud,
    tgt: PointCloud,
    init: SE3,
    config: ICPConfig,
    normals_for: tuple = (),
    src_w: Optional[jax.Array] = None,
) -> ICPResult:
    if config.objective == "gicp":
        if src.covs is None or tgt.covs is None:
            raise ValueError(
                "gicp needs covariances (estimate_covariances first)"
            )
        n = src.capacity
        src_n = src.covs.reshape(n, 9)
        tgt_n = tgt.covs.reshape(tgt.capacity, 9)
        aux_rot = gicp_cov_rot
    else:
        src_n = (
            src.normals
            if src.normals is not None
            else jnp.zeros_like(src.xyz)
        )
        tgt_n = (
            tgt.normals
            if tgt.normals is not None
            else jnp.zeros_like(tgt.xyz)
        )
        aux_rot = None

    method = config.resolve_nn(tgt.capacity)
    if normals_for and method != "block":
        raise ValueError(
            "normals_for requires the block NN path (estimate normals "
            "up front for brute-force registration)"
        )
    if method == "block":
        from icpx.cloud import PAD_COORD
        from icpx.kernels.blocknn import block_nn

        # Sort the source spatially once (rigid motion preserves coherence;
        # point order is irrelevant to the solve). Sentinel-fill invalid.
        builder = config.tile_builder()
        from icpx.kernels.blocknn import _SUPER_G, trim_index

        q_tile = config.resolve_q_tile(src.capacity)
        src_order_idx = trim_index(
            config.tile_builder(config.src_tile_index)(
                src.xyz, src.mask, tile_size=q_tile
            ),
            src.capacity,
            multiple=4,  # coarse phase needs tq % 4 == 0
        )
        order = src_order_idx.order
        valid = order >= 0
        safe = jnp.maximum(order, 0)
        # the builder already produced the sorted, sentinel-filled coords
        # (masked-out rows got PAD_COORD and order -1 in the build) — no
        # 1M-row re-gather needed
        src_xyz = src_order_idx.tiles.reshape(-1, 3)
        src_mask = valid
        if src_w is not None:
            src_w = jnp.where(valid, src_w[safe], 0.0)
        use_feat = bool(config.feat_nn) and config.feat_nn_weight > 0
        if use_feat:
            from icpx.kernels.blocknn import tile_payload as _tp

            src_f = jnp.where(valid, src.feat(config.feat_nn)[safe], 0.0)
            tgt_f_tiles = None  # built after tgt_index below
        tgt_index = trim_index(
            builder(tgt.xyz, tgt.mask, tile_size=config.block_tile),
            tgt.capacity,
            multiple=_SUPER_G,  # hierarchical ranking needs T % 64 == 0
        )
        if use_feat:
            tgt_f_tiles = _tp(
                tgt_index, tgt.feat(config.feat_nn)[:, None]
            )[..., 0]

        # In-jit normal estimation off the SAME indexes (one KD build per
        # cloud total — separate estimate_normals builds cost ~28 ms each
        # at 1M pts, half the round-2 registration budget).
        if "src" in normals_for:
            # self-query at the FINE tiling costs a (T, T) candidate
            # ranking (~40 ms at 1M pts); coarsen to parent tiles first
            # (same flat point order, so the result aligns with src_xyz)
            from icpx.kernels.blocknn import coarsen_index

            s_idx = src_order_idx
            f = config.block_tile // q_tile
            if f > 1 and s_idx.n_tiles % f == 0:
                s_idx = coarsen_index(s_idx, f)
            # normals stay at full score precision: bf16 moments were
            # -5 ms at 1M but degraded recovered rotation from exact to
            # 4.9e-4 rad (chip A/B 2026-08-19) — normal noise biases the
            # symmetric solve SYSTEMATICALLY, unlike NN near-tie swaps.
            src_n_s = _index_normals(
                s_idx, config.k_normals, k_tiles=2,
                mode=config.resolve_moments(src.capacity),
                group=config.vmem_group,
            )
        else:
            src_n_s = jnp.where(valid[:, None], src_n[safe], 0.0)
        # Target payload in SORTED tile layout: NN returns sorted flat
        # positions (return_pos=True) and the q / n_q gathers become
        # spatially COHERENT (queries are in KD order, their NNs are in
        # target KD order — neighbors hit neighboring rows), instead of
        # random-row gathers through the original (arbitrary) point
        # order. In-jit target normals come out of _index_normals already
        # sorted, skipping the round-1 unsort scatter entirely.
        tgt_sorted = tgt_index.tiles.reshape(-1, 3)
        if "tgt" in normals_for:
            tgt_n_sorted = _index_normals(
                tgt_index, config.k_normals, k_tiles=2,
                mode=config.resolve_moments(tgt.capacity),
                group=config.vmem_group,
            )
        else:
            from icpx.kernels.blocknn import tile_payload

            tgt_n_sorted = tile_payload(tgt_index, tgt_n).reshape(
                -1, tgt_n.shape[1]
            )
        # one fused (N, 3+D) payload table: a single row gather per
        # iteration instead of two (q then n_q) — measured 418 -> 263 ms
        # for the gathers at 8M points
        tgt_pl = jnp.concatenate([tgt_sorted, tgt_n_sorted], axis=1)

        sq = q_tile
        tq = src_xyz.shape[0] // sq
        fused = config.resolve_fused() and not use_feat
        group = config.block_group if tq % config.block_group == 0 else 1
        # Payload delivery: the coherent (N, 3+D) row gather wins at <=1M
        # (28 vs 32.5 ms/iter) but scales super-linearly with table size
        # (263 ms/iter at 8M); in-fold one-hot MXU selection is
        # table-size-independent (chip A/B 2026-08-19, NOTES.md).
        # Will the refine phases have a FROZEN candidate list? The take-6
        # vmem fold only engages with one (its per-tile candidate prep is
        # loop-invariant); without it, pmode="vmem" used to fall through
        # past the vmem branch to the super-linear row gather with no
        # warning (the path measured at 263 ms/iter at 8M — review r4).
        coarse = (
            config.coarse_iters > 0
            and config.coarse_stride > 1
            and tq % 4 == 0
            and tq >= 8
            and (4 * sq) % config.coarse_stride == 0
        )
        will_freeze = (
            coarse and not fused and config.freeze_refine_candidates
        )
        pmode = _effective_payload_mode(
            config, tgt.capacity,
            use_feat=use_feat, fused=fused, will_freeze=will_freeze,
        )
        infold = not fused and pmode == "infold"
        # "select" (take 5, round 4): XLA fold produces (d2, pos) at its
        # measured roofline; a Pallas kernel turns pos into payload rows
        # entirely in VMEM (kernels/blocknn_pallas.py). Engages on
        # frozen-candidate phases (refine/mid); phases without a frozen
        # list fall back to the coherent row gather.
        select = not fused and pmode == "select"
        # "vmem" (take 6, round 4): the WHOLE per-iteration fold — score,
        # min, payload selection — in one VMEM kernel over per-tile
        # frozen candidates (no HBM score/one-hot round trips, no row
        # gather). Same frozen-candidate gating as "select".
        vmem_fold = not fused and not use_feat and pmode in (
            "vmem", "vmem7"
        )
        if infold or select or vmem_fold:
            from icpx.kernels.blocknn import block_nn_payload

            tgt_pl_tiles = tgt_pl.reshape(
                tgt_index.n_tiles, tgt_index.tile_size, tgt_pl.shape[1]
            )

        def make_nn(n_tiles, tile_rows, k_tiles, cand=None, qfeat=None,
                    qcent=None):
            if vmem_fold and cand is not None:
                from icpx.kernels.blocknn_pallas import (
                    block_fold7_pre,
                    block_fold_fused_pre,
                    fold6_prepare,
                    fold7_prepare,
                )

                # prep is loop-invariant per phase: computed HERE (at
                # closure creation, outside the ICP while loop) so the
                # 1.6 GB-at-8M candidate gathers happen once — XLA's
                # loop LICM does not reliably hoist them (measured: a
                # 25.8 GB remat allocation attempt inside the loop).
                # fold6_prepare/block_fold_fused_pre group-pad internally
                # (pad_t = (-tq) % group) — no divisibility fallback
                # needed (advice r4)
                vg = config.vmem_group
                if pmode == "vmem7" and qcent is not None:
                    # take-7: MXU-scored centered fold (round 5)
                    b_c, pl_c7, qc7, dpl7 = fold7_prepare(
                        cand, qcent, tgt_index, tgt_pl_tiles, group=vg
                    )

                    def nn_fn_vmem7(p):
                        d2, pl = block_fold7_pre(
                            p.reshape(n_tiles, tile_rows, 3),
                            b_c, pl_c7, qc7, dpl7, group=vg,
                        )
                        return pl[:, :3], pl[:, 3:], jnp.sqrt(d2)

                    return nn_fn_vmem7
                rt_c, pl_c, dpl = fold6_prepare(
                    cand, tgt_index, tgt_pl_tiles, group=vg
                )

                def nn_fn_vmem(p):
                    d2, pl = block_fold_fused_pre(
                        p.reshape(n_tiles, tile_rows, 3),
                        rt_c, pl_c, dpl, group=vg,
                    )
                    return pl[:, :3], pl[:, 3:], jnp.sqrt(d2)

                return nn_fn_vmem

            def nn_fn(p):
                ptiles = p.reshape(n_tiles, tile_rows, 3)
                qf = (
                    qfeat.reshape(n_tiles, tile_rows)
                    if qfeat is not None
                    else None
                )
                if fused:
                    from icpx.kernels.blocknn_pallas import block_nn_fused4

                    d2, pos = block_nn_fused4(
                        ptiles,
                        tgt_index,
                        k_tiles=k_tiles,
                        group=group,
                        u_max=config.block_u_max,
                        return_pos=True,
                    )
                elif infold:
                    d2, pl = block_nn_payload(
                        ptiles, tgt_index, tgt_pl_tiles,
                        k_tiles=k_tiles, cand_tiles=cand,
                        query_feat=qf,
                        feat_tiles=tgt_f_tiles if qf is not None else None,
                        feat_weight=config.feat_nn_weight,
                        score_prec=config.resolve_score_prec(),
                        payload_prec=config.resolve_payload_prec(),
                        payload_xyz=3,
                    )
                    # miss/pad rows: d2=inf with zero payload — finite
                    # coords, zero weight downstream, no NaNs
                    return pl[:, :3], pl[:, 3:], jnp.sqrt(d2)
                else:
                    d2, pos = block_nn(
                        ptiles, tgt_index, k_tiles=k_tiles,
                        return_pos=True, cand_tiles=cand,
                        query_feat=qf,
                        feat_tiles=tgt_f_tiles if qf is not None else None,
                        feat_weight=config.feat_nn_weight,
                        score_prec=config.resolve_score_prec(),
                    )
                    if select and cand is not None:
                        from icpx.kernels.blocknn_pallas import (
                            payload_select_fused,
                        )

                        pl = payload_select_fused(
                            pos.reshape(n_tiles, tile_rows), cand,
                            tgt_pl_tiles,
                        )
                        return pl[:, :3], pl[:, 3:], jnp.sqrt(d2)
                # pad/miss rows carry d2=inf (gated by the validity mask
                # downstream); their PAD_COORD coords are finite, so
                # zero-weight rows cannot produce NaNs in the solve.
                pl = tgt_pl[pos]
                return pl[:, :3], pl[:, 3:], jnp.sqrt(d2)

            return nn_fn

        # Coarse phase: stride-subsampled rows of 4 merged sibling KD
        # tiles (the parent node's compact box) — a spatially uniform
        # ~1/stride subsample reusing full-res normals; NN cost drops
        # ~4x while the motion is still large (NOTES round-1 lever 3).
        stride = config.coarse_stride
        # `coarse` was decided above (it feeds the payload-mode carve-out)
        if coarse:
            cs = 4 * sq // stride
            xyz_c = src_xyz.reshape(tq // 4, 4 * sq, 3)[:, ::stride]
            dn = src_n_s.shape[1]  # 3 (normals) or 9 (gicp covariances)
            n_c = src_n_s.reshape(tq // 4, 4 * sq, dn)[:, ::stride]
            m_c = src_mask.reshape(tq // 4, 4 * sq)[:, ::stride]
            f_c = (
                src_f.reshape(tq // 4, 4 * sq)[:, ::stride].reshape(-1)
                if use_feat
                else None
            )
            w_c = (
                src_w.reshape(tq // 4, 4 * sq)[:, ::stride].reshape(-1)
                if src_w is not None
                else None
            )
            cfg_c = dataclasses.replace(
                config, max_iters=config.coarse_iters, diff_threshold=0.0
            )
            res_c = _icp_scan(
                cfg_c,
                xyz_c.reshape(-1, 3),
                m_c.reshape(-1),
                n_c.reshape(-1, dn),
                init,
                make_nn(tq // 4, cs, config.block_k, qfeat=f_c),
                aux_rot=aux_rot,
                src_w=w_c,
            )
            init = res_c.transform
            k_ref = (
                config.block_k_refine
                if config.block_k_refine > 0
                else config.block_k
            )
            prev_rmse0 = res_c.final_rmse
        else:
            k_ref = config.block_k
            prev_rmse0 = None

        # Freeze refine-phase candidate tiles at the coarse-aligned
        # positions: after the coarse phase the residual motion is well
        # under a tile extent, so the per-iteration candidate ranking
        # (~15% of a 1M registration) is paid once instead of per
        # iteration. Only safe when a coarse phase ran (refine starts
        # near-aligned); the fused kernel selects internally.
        cand_ref = qcent_ref = None
        if will_freeze:
            from icpx.kernels.blocknn import _candidate_tiles

            p0 = init.apply(src_xyz).reshape(tq, sq, 3)
            cand_ref, qcent_ref = _candidate_tiles(p0, tgt_index, k_ref)

        # Multi-resolution refine: bulk iterations on every
        # refine_stride-th row WITHIN each query tile (same tiles, same
        # boxes — the frozen candidate list is reused verbatim), full
        # resolution only for the last `refine_full_iters`. The pose from
        # a 1/stride spatially-uniform subsample is statistically within
        # noise of the full solve; the full-res tail polishes it and
        # produces full-res convergence statistics (config docstring).
        stride_r = config.resolve_refine_stride(src.capacity, tgt.capacity)
        mid = (
            stride_r > 1
            and sq % stride_r == 0
            and sq // stride_r >= 8
            and not fused
            and config.max_iters > config.refine_full_iters
        )
        mid_iters = jnp.int32(0)
        orig_config = config
        if mid:
            sq_m = sq // stride_r
            dn = src_n_s.shape[1]

            def substride(arr, d=None):
                a = arr.reshape(tq, sq, d) if d else arr.reshape(tq, sq)
                return a[:, ::stride_r].reshape(-1, d) if d else (
                    a[:, ::stride_r].reshape(-1)
                )

            # The mid phase gets max_iters - refine_full_iters so the
            # documented max_iters cap bounds TOTAL refine work (mid +
            # full-res tail), not each phase separately.
            cfg_m = dataclasses.replace(
                config,
                max_iters=config.max_iters - config.refine_full_iters,
                diff_threshold=config.diff_threshold / stride_r,
            )
            res_m = _icp_scan(
                cfg_m,
                substride(src_xyz, 3),
                substride(src_mask),
                substride(src_n_s, dn),
                init,
                make_nn(
                    tq, sq_m, k_ref, cand=cand_ref, qcent=qcent_ref,
                    qfeat=substride(src_f) if use_feat else None,
                ),
                aux_rot=aux_rot,
                prev_rmse0=prev_rmse0,
                src_w=substride(src_w) if src_w is not None else None,
            )
            init = res_m.transform
            prev_rmse0 = res_m.final_rmse
            mid_iters = res_m.iters
            config = dataclasses.replace(
                config, max_iters=config.refine_full_iters
            )

        res = _icp_scan(
            config, src_xyz, src_mask, src_n_s, init,
            make_nn(
                tq, sq, k_ref, cand=cand_ref, qcent=qcent_ref,
                qfeat=src_f if use_feat else None,
            ),
            aux_rot=aux_rot,
            prev_rmse0=prev_rmse0,
            src_w=src_w,
        )
        if mid:
            # Merge the mid-phase histories ahead of the full-res tail's so
            # diff_history/rmse_history cover ALL refine iterations (sized
            # orig max_iters; entries past the work done stay NaN). The
            # coarse phase's history stays excluded by design: it runs on a
            # different (strided-parent-tile) resolution whose diff sums
            # are not comparable. A mid phase that already met its stop is
            # carried into `converged` — the fixed-budget tail is a polish
            # and may legitimately not re-trigger its own stop.
            m_total = orig_config.max_iters
            i_all = jnp.arange(m_total)
            from_mid = i_all < mid_iters
            mid_idx = jnp.clip(i_all, 0, cfg_m.max_iters - 1)
            tail_idx = jnp.clip(
                i_all - mid_iters, 0, orig_config.refine_full_iters - 1
            )
            in_range = i_all < (mid_iters + res.iters)

            def merge(mid_h, tail_h, fill):
                out = jnp.where(
                    from_mid, mid_h[mid_idx], tail_h[tail_idx]
                )
                return jnp.where(in_range, out, fill)

            res = res.replace(
                iters=res.iters + mid_iters,
                converged=res.converged | res_m.converged,
                diff_history=merge(
                    res_m.diff_history, res.diff_history, jnp.nan
                ),
                rmse_history=merge(
                    res_m.rmse_history, res.rmse_history, jnp.nan
                ),
            )
        if coarse:
            res = res.replace(iters=res.iters + res_c.iters)
        return res

    def nn_fn(p):
        d2, idx = nearest_neighbor(
            p,
            tgt.xyz,
            ref_mask=tgt.mask,
            tile_q=config.tile_q,
            tile_r=config.tile_r,
        )
        return tgt.xyz[idx], tgt_n[idx], jnp.sqrt(d2)

    return _icp_scan(
        config, src.xyz, src.mask, src_n, init, nn_fn, aux_rot=aux_rot,
        src_w=src_w,
    )


@partial(jax.jit, static_argnames=("config",))
def register_batch(
    src_xyz: jax.Array,  # (B, N, 3)
    src_mask: jax.Array,  # (B, N)
    src_normals: jax.Array,  # (B, N, 3)
    tgt_xyz: jax.Array,
    tgt_mask: jax.Array,
    tgt_normals: jax.Array,
    config: ICPConfig = ICPConfig(),
    init: Optional[SE3] = None,  # batched (B,) initial guesses
) -> ICPResult:
    """Register B independent pairs in one vmapped executable.

    The single-chip DP-over-pairs throughput path (SURVEY P1): batching
    keeps the MXU/VPU fed when individual pairs are small (odometry-scale
    scans). Brute-force NN per pair; normals must be precomputed. For
    multi-device DP use `distributed.sharded_register_pairs`.

    Like `register`, each pair is solved in target-centroid coordinates
    (fp32 squared-distance expansions lose precision at large coordinate
    magnitudes) and the shift is composed back into the returned transform.
    """

    if init is None:
        b = src_xyz.shape[0]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))
        init = SE3(R=eye, t=jnp.zeros((b, 3), jnp.float32))

    def one(sx, sm, sn, tx, tm, tn, iR, it):
        denom = jnp.maximum(tm.sum(), 1).astype(jnp.float32)
        center = jnp.where(tm[:, None], tx, 0.0).sum(0) / denom
        sx = jnp.where(sm[:, None], sx - center[None, :], sx)
        tx = jnp.where(tm[:, None], tx - center[None, :], tx)
        shift = SE3.identity().replace(t=-center)
        unshift = SE3.identity().replace(t=center)
        init_c = shift @ SE3(R=iR, t=it) @ unshift

        def nn_fn(p):
            d2, idx = nearest_neighbor(
                p, tx, ref_mask=tm, tile_q=config.tile_q, tile_r=config.tile_r
            )
            return tx[idx], tn[idx], jnp.sqrt(d2)

        res = _icp_scan(config, sx, sm, sn, init_c, nn_fn)
        return res.replace(transform=unshift @ res.transform @ shift)

    return jax.vmap(one)(
        src_xyz, src_mask, src_normals, tgt_xyz, tgt_mask, tgt_normals,
        init.R, init.t,
    )


@partial(jax.jit, static_argnames=("config",))
def register_batch_block(
    src_xyz: jax.Array,  # (B, N, 3)
    src_mask: jax.Array,  # (B, N)
    tgt_xyz: jax.Array,  # (B, N, 3)
    tgt_mask: jax.Array,  # (B, N)
    config: ICPConfig = ICPConfig(),
    init: Optional[SE3] = None,  # batched (B,) initial guesses
) -> ICPResult:
    """Register B independent pairs through the FULL block-NN pipeline in
    one vmapped executable (round-3 VERDICT missing #2: the small-pair
    path to the north star).

    Where `register_batch` vmaps the brute O(N^2) loop (right for
    odometry-scale scans), this vmaps the complete large-cloud machinery
    — per-pair KD index builds, in-jit normals off the shared indexes,
    coarse/refine phases, frozen candidates — so a batch of B x 65k
    pairs costs what one (B*65k)-point registration costs instead of B
    fixed overheads: the batch dimension rides every sort/einsum/gather
    as a leading axis and the chip sees large ops + ONE dispatch.
    Normals are always estimated in-jit (pass clouds, not normals).

    Solves in per-pair target-centroid coordinates like `register`
    (composed back into the returned transforms).
    """
    b = src_xyz.shape[0]
    if config.resolve_nn(tgt_xyz.shape[1]) != "block":
        raise ValueError(
            "register_batch_block needs the block NN path (clouds above "
            "block_auto_threshold or nn_method='block'); use "
            "register_batch for brute-NN scan-scale pairs"
        )
    if init is None:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))
        init = SE3(R=eye, t=jnp.zeros((b, 3), jnp.float32))

    def one(sx, sm, tx, tm, iR, it):
        denom = jnp.maximum(tm.sum(), 1).astype(jnp.float32)
        center = jnp.where(tm[:, None], tx, 0.0).sum(0) / denom
        sx = jnp.where(sm[:, None], sx - center[None, :], sx)
        tx = jnp.where(tm[:, None], tx - center[None, :], tx)
        shift = SE3.identity().replace(t=-center)
        unshift = SE3.identity().replace(t=center)
        init_c = shift @ SE3(R=iR, t=it) @ unshift
        res = _register_jit(
            PointCloud(xyz=sx, mask=sm),
            PointCloud(xyz=tx, mask=tm),
            init_c,
            config,
            normals_for=("src", "tgt"),
        )
        return res.replace(transform=unshift @ res.transform @ shift)

    return jax.vmap(one)(
        src_xyz, src_mask, tgt_xyz, tgt_mask, init.R, init.t
    )


def register_xyz(
    src_xyz,
    tgt_xyz,
    config: ICPConfig = ICPConfig(),
    init: Optional[SE3] = None,
) -> ICPResult:
    """Convenience: register raw (N, 3) arrays (padding handled here)."""
    return register(
        PointCloud.create(src_xyz), PointCloud.create(tgt_xyz), config, init
    )


def format_trace(result: ICPResult) -> str:
    """Reference-style per-iteration trace (`myicp.cpp:125-126`)."""
    import numpy as np

    lines = []
    diffs = np.asarray(result.diff_history)
    for i, d in enumerate(diffs):
        if np.isnan(d):
            break
        lines.append(f"iters#{i + 1} / diff: {d:.6g}")
    lines.append(
        f"converged={bool(result.converged)} iters={int(result.iters)} "
        f"rmse={float(result.final_rmse):.6g}"
    )
    return "\n".join(lines)
