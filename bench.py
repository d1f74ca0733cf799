#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Flagship config: single-pair symmetric ICP (normals precomputed once per
cloud, 10 Gauss-Newton iterations with fresh NN correspondences each
iteration) on synthetic surface clouds, real TPU chip.

Metric: registered points per second per chip = N / median wall time of a
full registration. Baseline for `vs_baseline` is the per-chip share of the
north-star target in BASELINE.json (100M pts/s on a v5e-16 => 6.25M
pts/s/chip); the reference itself publishes no numbers (BASELINE.md).
"""

import argparse
import json
import statistics
import time

import numpy as np

NORTH_STAR_PER_CHIP = 100e6 / 16.0

# Session salt: the axon relay memoizes identical (executable, args)
# executions ACROSS processes — round 4 caught a flagship rep set
# reproducing a prior session's wall to 0.1 ms because neither the 1M
# program nor the per-rep eps had changed since that session. Folding a
# per-invocation salt into every perturbation makes each rep's argument
# values globally fresh (any differing f32 bit defeats the cache) while
# staying a <=1e-6-scale coordinate nudge — the cat parity config
# multiplies eps by 10 and reports ~1e-5-scale transform errors, so the
# salt must sit well below that floor (review r4).
_SALT = (time.time_ns() % 1_000_000) * 1e-12


def rep_eps(rep: int, scale: float = 1.0) -> float:
    """Per-repetition input perturbation, unique across sessions.

    `scale` multiplies only the deterministic per-rep step (configs whose
    converged floor tolerates a larger nudge pass scale=10); the session
    salt is added AFTER scaling so its magnitude stays <=1e-6 in every
    config (review r4: scaling the salt to 1e-5 would reach the cat
    config's ~1e-5 error floor).
    """
    return (rep + 1) * 1e-7 * scale + _SALT


def _stall_timeouts(args):
    """(warmup, steady-state) watchdog timeouts from --stall-timeout."""
    from icpx.distributed.fault import default_stall_timeout

    if args.stall_timeout >= 0:
        return args.stall_timeout, args.stall_timeout
    return default_stall_timeout(warmup=True), default_stall_timeout()


def guarded_call(fn, timeout_s):
    from icpx.distributed.fault import guarded_call as _gc

    return _gc(fn, timeout_s)


def main():
    ap = argparse.ArgumentParser()
    # Flagship config: 1M-point pair (the scale this framework exists
    # for; smaller clouds are dominated by fixed index-build/dispatch
    # overheads — use --n 65536 for the round-1 comparison point).
    ap.add_argument("--n", type=int, default=1048576,
                    help="points per cloud")
    ap.add_argument("--iters", type=int, default=10, help="ICP iterations")
    ap.add_argument("--reps", type=int, default=5, help="timed repetitions")
    ap.add_argument("--objective", default="symmetric")
    ap.add_argument("--k-normals", type=int, default=10)
    ap.add_argument("--cat", action="store_true",
                    help="reference-parity run on the cat fixture pair")
    ap.add_argument("--batch", type=int, default=0,
                    help="register B independent --n-point pairs in one "
                    "vmapped block-NN executable (the small-pair "
                    "aggregate operating point; default --n 65536)")
    ap.add_argument("--odometry", action="store_true",
                    help="scan-to-scan odometry throughput (synthetic LiDAR)")
    ap.add_argument("--odo-batch", action="store_true",
                    help="with --odometry: register all F-1 consecutive "
                    "pairs as ONE vmapped batch (identity init, no "
                    "keyframe gating — the offline-mapping throughput "
                    "operating point; odometry/parallel.py on one chip)")
    ap.add_argument("--odo-seed", default="identity",
                    choices=["identity", "global"],
                    help="with --odo-batch: per-pair init. 'global' = "
                    "sector-profile yaw seed "
                    "(odometry/parallel.batched_pair_seed); 'identity' "
                    "= the round-4 measured default (chip A/B decides)")
    ap.add_argument("--odo-anneal-iters", type=int, default=-1,
                    help="with --odo-batch: extra phase-1 iterations for "
                    "robust-scale annealing (-1 = auto: 10 for identity "
                    "init, 2 for the global seed)")
    ap.add_argument("--odo-q-tile", type=int, default=0,
                    help="with --odometry: source query-tile size for "
                    "the compiled loop (0 = auto: 256 from 65k-pt "
                    "scans, 128 from 8k — the round-5 measured ladder)")
    ap.add_argument("--odo-freeze", default="auto",
                    choices=["auto", "on", "off"],
                    help="with --odometry: freeze per-frame candidate "
                    "tiles at the warm init (auto: on from 16k-pt "
                    "scans)")
    ap.add_argument("--odo-refine-stride", type=int, default=0,
                    help="with --odometry: within-tile row stride for "
                    "the bulk refine iterations of each per-frame "
                    "registration (multi-resolution refine; 0/1 = off, "
                    "the measured default)")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--scan-points", type=int, default=8192,
                    help="points per scan for --odometry")
    ap.add_argument("--profile", default=None,
                    help="jax.profiler trace directory")
    ap.add_argument("--score-precision", default="auto",
                    choices=["auto", "highest", "high", "bf16"],
                    help="block-NN score einsum precision (see ICPConfig)")
    ap.add_argument("--nn-method", default="auto",
                    choices=["auto", "brute", "block"],
                    help="NN kernel (auto: block above "
                    "block_auto_threshold target points)")
    ap.add_argument("--stall-timeout", type=float, default=-1.0,
                    help="seconds before a hung device fence raises "
                    "CollectiveStallError (-1 = auto: off on CPU, 600s "
                    "steady-state / 1200s warmup on accelerators; 0 = off)")
    args = ap.parse_args()

    from icpx.cli import _enable_compile_cache

    _enable_compile_cache()
    if args.cat:
        return bench_cat(args)
    if args.odometry:
        return bench_odometry(args)
    if args.batch:
        return bench_batch(args)

    import jax
    import jax.numpy as jnp

    from icpx.cloud import PointCloud
    from icpx.geometry.se3 import SE3
    from icpx.geometry.transforms import make_rigid_perturbation
    from icpx.io.loaders import synthetic_surface
    from icpx.kernels.normals import estimate_normals
    from icpx.registration.icp import ICPConfig, _register_jit

    n = args.n
    xyz = synthetic_surface(n, seed=0)
    src = PointCloud.create(xyz, capacity=n if n % 128 == 0 else None)
    gt = make_rigid_perturbation(angle=0.2, translation=(0.12, -0.06, 0.03))
    rng = np.random.default_rng(1)
    tgt_np = np.asarray(gt.apply(src.xyz))[: src.capacity]
    perm = rng.permutation(src.capacity)
    tgt = PointCloud.create(tgt_np[perm], capacity=src.capacity)
    tgt = tgt.replace(mask=src.mask[perm])

    # Converged-stopping: the while_loop exits when RMSE stops improving
    # (what a real registration costs); --iters caps it. The quality gate
    # below still requires GT recovery, so early exit can't cheat.
    cfg = ICPConfig(
        objective=args.objective,
        max_iters=args.iters,
        diff_threshold=0.0,
        rmse_change_tol=1e-6,
        k_normals=args.k_normals,
        score_precision=args.score_precision,
        nn_method=args.nn_method,
        tile_q=2048,
        tile_r=8192,
    )

    # Normal estimation happens once per cloud in a real pipeline; include
    # it in the timed path (it is part of registering a fresh pair). In
    # block mode it runs in-jit off the shared KD indexes (one build per
    # cloud); the brute path estimates up front.
    # `eps` perturbs the input per repetition: some execution relays
    # memoize identical (executable, args) calls, which would report
    # cache-hit latency instead of compute (see .claude/skills/verify).
    block = cfg.resolve_nn(src.capacity) == "block"

    def run(src_xyz, src_mask, tgt_xyz, tgt_mask, eps):
        s = PointCloud(xyz=src_xyz + eps, mask=src_mask)
        t = PointCloud(xyz=tgt_xyz, mask=tgt_mask)
        if block:
            res = _register_jit(
                s, t, SE3.identity(), cfg, normals_for=("src", "tgt")
            )
        else:
            s = estimate_normals(s, k=cfg.k_normals)
            t = estimate_normals(t, k=cfg.k_normals)
            res = _register_jit(s, t, SE3.identity(), cfg)
        return res.transform.R, res.transform.t, res.final_rmse

    import jax.numpy as jnp

    run_j = jax.jit(run)
    args_in = (src.xyz, src.mask, tgt.xyz, tgt.mask)
    warm_t, step_t = _stall_timeouts(args)
    out = run_j(*args_in, jnp.float32(0.0))
    # completion fence under the stall watchdog (HeartbeatMonitor): a
    # tunnel/collective stall raises CollectiveStallError instead of
    # hanging the bench silently. block_until_ready can return early over
    # relayed backends (NOTES.md), so the warmup fence fetches a scalar;
    # timed reps then measure a clean 1-deep pipeline whose median equals
    # the true device wall.
    guarded_call(lambda: float(out[2]), warm_t)
    profile_cm = None
    if args.profile:
        from icpx.utils.profiling import trace_context

        profile_cm = trace_context(args.profile)
        profile_cm.__enter__()
    times = []
    for rep in range(args.reps):
        eps = jnp.float32(rep_eps(rep))
        t0 = time.perf_counter()
        out = run_j(*args_in, eps)
        guarded_call(lambda o=out: jax.block_until_ready(o), step_t)
        times.append(time.perf_counter() - t0)
    if profile_cm is not None:
        profile_cm.__exit__(None, None, None)
    wall = statistics.median(times)
    rmse = float(out[2])

    est = SE3(R=out[0], t=out[1])
    rot_err, t_err = est.distance_to(gt)
    quality_ok = bool(float(rot_err) < 5e-3 and float(t_err) < 5e-3)

    # ENFORCED quality gate: a run that fails to recover the ground truth
    # reports zero throughput — early exits cannot inflate the metric.
    pts_per_sec = n / wall if quality_ok else 0.0
    print(
        json.dumps(
            {
                "metric": "registered_points_per_sec_per_chip",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / NORTH_STAR_PER_CHIP, 4),
            }
        )
    )
    # diagnostics on stderr only
    import sys

    print(
        f"# n={n} iters={args.iters} wall={wall * 1e3:.1f}ms rmse={rmse:.2e} "
        f"rot_err={float(rot_err):.2e} t_err={float(t_err):.2e} "
        f"quality_ok={quality_ok} times_ms={[round(t * 1e3, 1) for t in times]}",
        file=sys.stderr,
    )


def bench_batch(args):
    """Aggregate batched small-pair config (round-3 VERDICT missing #2):
    B independent n-point pairs in ONE vmapped block-NN executable —
    the operating point for fleets of small registrations (the
    reference's actual regime is a 3400-pt pair). Quality gate: EVERY
    pair must recover its ground truth or throughput reports zero."""
    import sys

    import jax
    import jax.numpy as jnp

    from icpx.geometry.se3 import SE3
    from icpx.geometry.transforms import make_rigid_perturbation
    from icpx.io.loaders import synthetic_surface
    from icpx.registration.icp import ICPConfig, register_batch_block

    b = args.batch
    n = 65536 if args.n == 1048576 else args.n  # batch default: 65k pairs
    rng = np.random.default_rng(1)
    sxs, txs, gts = [], [], []
    for i in range(b):
        xyz = synthetic_surface(n, seed=i)
        gt = make_rigid_perturbation(
            angle=0.15 + 0.01 * (i % 7),
            translation=(0.12, -0.06 + 0.01 * (i % 5), 0.03),
        )
        txs.append(np.asarray(gt.apply(jnp.asarray(xyz)))[rng.permutation(n)])
        sxs.append(xyz)
        gts.append(gt)
    sx = jnp.stack([jnp.asarray(s) for s in sxs])
    tx = jnp.stack([jnp.asarray(t) for t in txs])
    sm = jnp.ones((b, n), bool)
    tm = jnp.ones((b, n), bool)
    cfg = ICPConfig(
        objective=args.objective,
        max_iters=args.iters,
        diff_threshold=0.0,
        rmse_change_tol=1e-6,
        k_normals=args.k_normals,
        nn_method="block" if args.nn_method == "auto" else args.nn_method,
        score_precision=args.score_precision,
    )

    def run(sxx, eps):
        res = register_batch_block(sxx + eps, sm, tx, tm, cfg)
        return res.transform.R, res.transform.t, res.final_rmse

    run_j = jax.jit(run)
    warm_t, step_t = _stall_timeouts(args)
    out = run_j(sx, jnp.float32(0.0))
    guarded_call(lambda: float(out[2][0]), warm_t)
    times = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        out = run_j(sx, jnp.float32(rep_eps(rep)))
        guarded_call(lambda o=out: jax.block_until_ready(o), step_t)
        times.append(time.perf_counter() - t0)
    wall = statistics.median(times)

    Rb, tb, rmseb = jax.device_get(out)
    worst_rot, worst_t = 0.0, 0.0
    for i in range(b):
        est = SE3(R=jnp.asarray(Rb[i]), t=jnp.asarray(tb[i]))
        rot_err, t_err = est.distance_to(gts[i])
        worst_rot = max(worst_rot, float(rot_err))
        worst_t = max(worst_t, float(t_err))
    quality_ok = bool(worst_rot < 5e-3 and worst_t < 5e-3)
    pts_per_sec = b * n / wall if quality_ok else 0.0
    print(
        json.dumps(
            {
                "metric": "batched_registered_points_per_sec_per_chip",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / NORTH_STAR_PER_CHIP, 4),
            }
        )
    )
    print(
        f"# batch={b} n={n} wall={wall * 1e3:.1f}ms "
        f"({wall * 1e3 / b:.1f}ms/pair) worst rot_err={worst_rot:.2e} "
        f"t_err={worst_t:.2e} quality_ok={quality_ok} "
        f"times_ms={[round(t * 1e3, 1) for t in times]}",
        file=sys.stderr,
    )


def bench_cat(args):
    """Reference-parity config: the shuffled cat pair must converge to the
    fixture's noise floor (rmse ~1e-5) while the reference can't even run
    it (its correspondence step needs index alignment)."""
    import jax
    import numpy as np

    from icpx.cloud import PointCloud
    from icpx.geometry.transforms import make_rigid_perturbation
    from icpx.io.loaders import load_cat_pair
    from icpx.registration.icp import ICPConfig, register

    src, tgt = load_cat_pair()
    rng = np.random.default_rng(0)
    tgt_np = tgt.to_numpy()
    tgt = PointCloud.create(tgt_np[rng.permutation(len(tgt_np))])
    cfg = ICPConfig(
        objective="symmetric",
        max_iters=20,
        diff_threshold=1.0,  # reference threshold, myicp.cpp:6
        max_corr_dist=50.0,
        robust="huber",
    )
    import jax.numpy as jnp

    warm_t, step_t = _stall_timeouts(args)
    res = register(src, tgt, cfg)
    guarded_call(lambda: float(res.final_rmse), warm_t)
    times = []
    for rep in range(args.reps):
        # perturb per rep: defeats relay execution memoization
        src_r = src.replace(xyz=src.xyz + jnp.float32(rep_eps(rep, scale=10.0)))
        t0 = time.perf_counter()
        res = register(src_r, tgt, cfg)
        guarded_call(lambda r=res: jax.block_until_ready(r), step_t)
        times.append(time.perf_counter() - t0)
    wall = statistics.median(times)
    rot_err, t_err = res.transform.distance_to(make_rigid_perturbation())
    n = int(jax.device_get(src.num_valid()))
    print(
        json.dumps(
            {
                "metric": "cat_pair_registered_points_per_sec",
                "value": round(n / wall, 1),
                "unit": "points/s",
                "vs_baseline": round(
                    (n / wall) / NORTH_STAR_PER_CHIP, 4
                ),
            }
        )
    )
    import sys

    print(
        f"# cat: wall={wall * 1e3:.1f}ms iters={int(res.iters)} "
        f"rmse={float(res.final_rmse):.2e} rot_err={float(rot_err):.2e} "
        f"t_err={float(t_err):.2e} converged={bool(res.converged)}",
        file=sys.stderr,
    )


def bench_odometry(args):
    """Scan-to-scan odometry throughput (BASELINE config 4): the whole
    sequence runs as ONE compiled XLA program (odometry/compiled.py) —
    the host-driven loop pays a dispatch round trip per frame, which
    dominates over a remote tunnel. Registered points/s counts each
    frame's points once."""
    import sys

    import jax
    import jax.numpy as jnp
    import numpy as np_

    from icpx.kernels.normals import estimate_normals
    from icpx.odometry.compiled import (
        resolve_odo_freeze,
        resolve_odo_q_tile,
        resolve_odo_refine_stride,
        run_odometry_compiled,
    )
    from icpx.odometry.evaluate import ate_rmse
    from icpx.odometry.kitti import make_trajectory, make_world, simulate_scans
    from icpx.registration.icp import ICPConfig

    n_pts = args.scan_points
    # gentle trajectory + structured world: this config measures
    # throughput at a fixed good ATE; robustness to aggressive motion and
    # degenerate scenes is exercised in tests/ (see NOTES.md)
    world = make_world(
        n_points=300000, extent=50.0, seed=0, n_posts=300, ground_frac=0.5
    )
    gt = make_trajectory(args.frames, speed=0.6, turn=0.02)
    frames = simulate_scans(
        world, gt, max_range=25.0, points_per_scan=n_pts, noise=0.01, seed=1
    )
    if args.odo_batch:
        return bench_odometry_batch(args, frames, gt)
    frames = [estimate_normals(f, k=args.k_normals) for f in frames]
    fx = jnp.stack([f.xyz for f in frames])
    fm = jnp.stack([f.mask for f in frames])
    fn = jnp.stack([f.normals for f in frames])
    cfg = ICPConfig(
        objective=args.objective,
        max_iters=args.iters,
        diff_threshold=0.0,
        rmse_change_tol=1e-6,
        robust="huber",
        max_corr_dist=2.0,
        nn_method=args.nn_method,
    )
    # velocity EMA on: this world's smooth ground has the slide mode the
    # knob exists for (NOTES.md measurements)
    kwargs = dict(
        velocity_damping=0.7,
        freeze_candidates=(
            None if args.odo_freeze == "auto" else args.odo_freeze == "on"
        ),
        q_tile=args.odo_q_tile,
        refine_stride=args.odo_refine_stride,
    )
    warm_t, step_t = _stall_timeouts(args)
    out = run_odometry_compiled(fx, fm, fn, cfg, **kwargs)
    # compile + warm; scalar fetch = true completion fence (see
    # bench_register), under the stall watchdog
    guarded_call(lambda: float(out.rmse[0]), warm_t)
    times = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        out = run_odometry_compiled(
            fx + jnp.float32(rep_eps(rep, scale=10.0)), fm, fn, cfg, **kwargs
        )
        guarded_call(lambda o=out: jax.block_until_ready(o), step_t)
        times.append(time.perf_counter() - t0)
    wall = statistics.median(times)
    poses = out.poses
    gt_rel = [gt[0].inverse() @ g for g in gt]
    plist = [
        jax.tree_util.tree_map(lambda x: x[i], poses)
        for i in range(len(frames))
    ]
    ate = ate_rmse(plist, gt_rel, align=False)
    # ENFORCED quality gate (mirrors the flagship config): a diverged run
    # reports zero throughput rather than full speed with a bad trajectory.
    ATE_BOUND_M = 0.5
    quality_ok = bool(ate < ATE_BOUND_M)
    pts_per_sec = len(frames) * n_pts / wall if quality_ok else 0.0
    print(
        json.dumps(
            {
                "metric": "odometry_registered_points_per_sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / NORTH_STAR_PER_CHIP, 4),
            }
        )
    )
    print(
        f"# odometry frames={len(frames)} pts/scan={n_pts} "
        f"nn={cfg.resolve_nn(n_pts)} "
        f"q_tile={resolve_odo_q_tile(cfg, n_pts, args.odo_q_tile)} "
        f"freeze={resolve_odo_freeze(n_pts, kwargs['freeze_candidates'])} "
        f"stride={resolve_odo_refine_stride(cfg, n_pts, args.odo_refine_stride)} "
        f"wall={wall * 1e3:.0f}ms fps={len(frames) / wall:.1f} "
        f"ATE={ate:.4f}m keyframes={int(np_.asarray(out.is_keyframe).sum())}",
        file=sys.stderr,
    )


def bench_odometry_batch(args, frames, gt):
    """Odometry THROUGHPUT operating point: all F-1 consecutive scan
    pairs register simultaneously in one vmapped executable
    (`register_batch` / `register_batch_block`, the single-chip analogue
    of odometry/parallel.py), then relative poses compose host-side.

    This is the honest odometry counterpart of `--batch`: the sequential
    compiled loop (`--odometry` without this flag) is LATENCY-bound —
    frame k's motion-model init needs frame k-1's pose, so per-frame
    fixed costs (solve, small matmuls, scan-step overhead) cannot
    amortize and points/s is the wrong lens for it (fps is; see
    BASELINE.md). When frames are already captured (offline mapping /
    bag processing), the dependency disappears and throughput is the
    north-star-comparable number. Identity init per pair, no keyframe
    gating; the same ATE quality gate as the sequential config."""
    import sys

    import jax
    import jax.numpy as jnp
    import numpy as np_

    from icpx.geometry.se3 import SE3
    from icpx.kernels.normals import estimate_normals
    from icpx.odometry.evaluate import ate_rmse
    from icpx.registration.icp import (
        ICPConfig,
        register_batch,
        register_batch_block,
    )

    n_pts = args.scan_points
    f = len(frames)
    cfg = ICPConfig(
        objective=args.objective,
        max_iters=args.iters,
        diff_threshold=0.0,
        rmse_change_tol=1e-6,
        robust="huber",
        max_corr_dist=2.0,
        score_precision=args.score_precision,
        nn_method=args.nn_method,
    )
    block = cfg.resolve_nn(n_pts) == "block"
    srcs, tgts = frames[1:], frames[:-1]
    sx = jnp.stack([fr.xyz for fr in srcs])
    sm = jnp.stack([fr.mask for fr in srcs])
    tx = jnp.stack([fr.xyz for fr in tgts])
    tm = jnp.stack([fr.mask for fr in tgts])
    # Identity init needs an ANNEALED schedule (measured, NOTES r4):
    # one 10-iteration pass leaves every pair ~0.1 m short (the huber
    # scale anneals slowly from a 0.6 m start on cross-sampled scans;
    # odob ATE 0.76-1.32 m, gate fail), while sequential's
    # constant-velocity init starts ~0.01 m out and converges in 2-3.
    # Phase 1 burns the annealing iterations on a 4x row-subsampled
    # source (pose noise ~ 1/sqrt(N): statistics to spare at scan
    # sizes); phase 2 polishes full-res from the warm init with a
    # tightened gate. --odo-seed global (VERDICT r4 weak #7) replaces
    # the identity start with a sector-profile yaw + centroid-delta
    # seed, cutting the annealing budget (auto: 10 -> 2 extra iters).
    import dataclasses

    from icpx.odometry.parallel import batched_pair_seed

    seeded = args.odo_seed == "global"
    extra = args.odo_anneal_iters
    if extra < 0:
        extra = 2 if seeded else 10
    sub = 4
    cfg_c = dataclasses.replace(cfg, max_iters=args.iters + extra)
    cfg_f = dataclasses.replace(
        cfg, max_iters=5, max_corr_dist=cfg.max_corr_dist / 4.0
    )

    def seed_of(sxx):
        return batched_pair_seed(sxx, sm, tx, tm) if seeded else None

    if block:
        # block path estimates normals in-jit off the per-pair KD indexes
        def run(sxx, eps):
            s0 = seed_of(sxx + eps)
            r1 = register_batch_block(
                (sxx + eps)[:, ::sub], sm[:, ::sub], tx, tm, cfg_c,
                init=s0,
            )
            res = register_batch_block(
                sxx + eps, sm, tx, tm, cfg_f, init=r1.transform
            )
            return res.transform.R, res.transform.t, res.final_rmse

    else:
        srcs = [estimate_normals(fr, k=args.k_normals) for fr in srcs]
        tgts = [estimate_normals(fr, k=args.k_normals) for fr in tgts]
        sn = jnp.stack([fr.normals for fr in srcs])
        tn = jnp.stack([fr.normals for fr in tgts])

        def run(sxx, eps):
            s0 = seed_of(sxx + eps)
            r1 = register_batch(
                (sxx + eps)[:, ::sub], sm[:, ::sub], sn[:, ::sub],
                tx, tm, tn, cfg_c, init=s0,
            )
            res = register_batch(
                sxx + eps, sm, sn, tx, tm, tn, cfg_f, init=r1.transform
            )
            return res.transform.R, res.transform.t, res.final_rmse

    run_j = jax.jit(run)
    warm_t, step_t = _stall_timeouts(args)
    out = run_j(sx, jnp.float32(0.0))
    guarded_call(lambda: float(out[2][0]), warm_t)
    times = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        out = run_j(sx, jnp.float32(rep_eps(rep)))
        guarded_call(lambda o=out: jax.block_until_ready(o), step_t)
        times.append(time.perf_counter() - t0)
    wall = statistics.median(times)

    Rb, tb, rmseb = jax.device_get(out)
    poses = [SE3.identity()]
    for k in range(f - 1):
        rel = SE3(R=jnp.asarray(Rb[k]), t=jnp.asarray(tb[k]))
        poses.append(poses[-1] @ rel)
    gt_rel = [gt[0].inverse() @ g for g in gt]
    ate = ate_rmse(poses, gt_rel, align=False)
    ATE_BOUND_M = 0.5
    quality_ok = bool(ate < ATE_BOUND_M)
    pts_per_sec = f * n_pts / wall if quality_ok else 0.0
    print(
        json.dumps(
            {
                "metric": "odometry_batched_points_per_sec_per_chip",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / NORTH_STAR_PER_CHIP, 4),
            }
        )
    )
    print(
        f"# odometry-batch frames={f} pts/scan={n_pts} nn="
        f"{'block' if block else 'brute'} seed={args.odo_seed} "
        f"extra_iters={extra} wall={wall * 1e3:.0f}ms "
        f"ATE={ate:.4f}m worst_rmse={float(np_.max(rmseb)):.2e} "
        f"times_ms={[round(t * 1e3, 1) for t in times]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
