"""Auditable multi-host scaling model (VERDICT r4 next-round #7).

Replaces BASELINE.md's prose estimate of multi-chip scaling with a
reproducible artifact: for each parallel mode (TP/SP psum, ring block
NN, EP all-to-all) and each device count, compile the ACTUAL program on
a virtual CPU mesh with `max_iters=1` (so loop-body collectives appear
exactly once per modeled iteration), extract every collective's
per-device operand bytes from the compiled HLO
(`icpx.utils.hlo.collective_traffic`), and model per-iteration step
time and strong-scaling efficiency from explicit bandwidth/latency
inputs:

    t_comm  = sum over collectives of wire_factor(op, n) * bytes / BW
              + n_collectives * latency
    t_comp  = C_iter / n            (compute splits over the mesh)
    eff(n)  = C_iter / (n * t_step)

`t_exposed` = t_comm for the psum modes (the all-reduce closes each
iteration's solve — it cannot overlap the fold), but the ring
rotation's share is max(0, t_permute - t_comp): its schedule-
independence from the fold is structurally pinned by
tests/test_hlo_overlap.py (the precondition for the TPU
LatencyHidingScheduler's async collective-permute brackets).

Wire factors (ring algorithms): all-reduce 2(n-1)/n, all-gather /
reduce-scatter / all-to-all (n-1)/n, collective-permute 1.

Defaults: C_iter = 45 ms (the measured 1M-point per-iteration compute,
NOTES round-4 stage table, also the number BASELINE.md's prose used),
ICI 4.5e10 B/s + 1 us/collective (v5e ICI link), DCN 2.5e9 B/s +
30 us/collective. All overridable; the model is the formula above,
nothing hidden.

Usage:
  python scripts/scaling_model.py                   # table, ICI + DCN
  python scripts/scaling_model.py --devices 4 8 16 32 --compute-ms 45
  python scripts/scaling_model.py --json out.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _force_cpu_mesh(n_devices: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")


def compile_mode(mode: str, n: int) -> str:
    """Compile one per-iteration program of the given mode on an
    n-device virtual mesh; returns compiled HLO text."""
    import jax
    import numpy as np

    from icpx.cloud import PointCloud
    from icpx.distributed.mesh import make_mesh
    from icpx.io.loaders import synthetic_surface
    from icpx.kernels.normals import estimate_normals
    from icpx.registration.icp import ICPConfig

    devs = jax.devices()[:n]
    xyz = synthetic_surface(4096, seed=0)
    src = estimate_normals(PointCloud.create(xyz, capacity=4096), k=8)
    tgt = estimate_normals(
        PointCloud.create(np.asarray(xyz)[::-1].copy(), capacity=4096), k=8
    )
    # max_iters=1: every loop-body collective appears once per iteration
    cfg = ICPConfig(
        objective="symmetric", max_iters=1, diff_threshold=0.0,
        nn_method="block", block_tile=32, block_q_tile=16, block_k=4,
        tile_q=256, tile_r=512,
    )

    if mode in ("tp", "ring"):
        from icpx.distributed.sharded_icp import sharded_register

        mesh = make_mesh(axis_names=("points",), devices=devs)

        def run(s, t):
            r = sharded_register(s, t, cfg, mesh, ring=(mode == "ring"))
            return r.transform.R, r.transform.t

        return jax.jit(run).lower(src, tgt).compile().as_text()

    if mode == "ep":
        from icpx.distributed.map_ep import (
            partition_map,
            sharded_map_register,
        )

        mesh = make_mesh(axis_names=("blocks",), devices=devs)
        mb = partition_map(tgt.xyz, tgt.normals, tgt.mask, n_blocks=n)
        cfg_ep = ICPConfig(
            objective="p2plane", max_iters=1, diff_threshold=0.0,
            max_corr_dist=0.3, tile_q=256, tile_r=512,
        )

        def run(s, blocks):
            r = sharded_map_register(s, blocks, cfg_ep, mesh)
            return r.transform.R, r.transform.t

        return jax.jit(run).lower(src, mb).compile().as_text()

    raise ValueError(mode)


def wire_factor(opcode: str, n: int) -> float:
    if opcode == "all-reduce":
        return 2.0 * (n - 1) / n
    if opcode in ("all-gather", "reduce-scatter", "all-to-all"):
        return (n - 1) / n
    return 1.0  # collective-permute: one neighbor hop


def model_row(mode: str, n: int, by_opcode: dict, n_coll: int,
              compute_s: float, bw: float, lat: float) -> dict:
    t_comm = sum(
        wire_factor(op, n) * b / bw for op, b in by_opcode.items()
    ) + n_coll * lat
    t_comp = compute_s / n
    if mode == "ring":
        permute_s = (
            wire_factor("collective-permute", n)
            * by_opcode.get("collective-permute", 0) / bw
        )
        t_exposed = (t_comm - permute_s) + max(0.0, permute_s - t_comp)
    else:
        t_exposed = t_comm
    t_step = t_comp + t_exposed
    return {
        "mode": mode,
        "devices": n,
        "n_collectives": n_coll,
        "collective_bytes_per_device": sum(by_opcode.values()),
        "by_opcode": by_opcode,
        "t_compute_ms": t_comp * 1e3,
        "t_comm_ms": t_comm * 1e3,
        "t_exposed_ms": t_exposed * 1e3,
        "t_step_ms": t_step * 1e3,
        "efficiency": compute_s / (n * t_step),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+",
                    default=[4, 8, 16, 32])
    ap.add_argument("--modes", nargs="+", default=["tp", "ring", "ep"])
    ap.add_argument("--compute-ms", type=float, default=45.0,
                    help="single-chip per-iteration compute at the "
                    "modeled operating point (NOTES: ~45 ms/iter at 1M)")
    ap.add_argument("--ici-bw", type=float, default=4.5e10,
                    help="ICI bytes/s per device")
    ap.add_argument("--ici-lat", type=float, default=1e-6,
                    help="ICI per-collective latency (s)")
    ap.add_argument("--dcn-bw", type=float, default=2.5e9,
                    help="DCN bytes/s per device")
    ap.add_argument("--dcn-lat", type=float, default=30e-6,
                    help="DCN per-collective latency (s)")
    ap.add_argument("--json", default=None, help="write rows as JSON")
    args = ap.parse_args()

    _force_cpu_mesh(max(max(args.devices), 8))
    from icpx.utils.hlo import collective_traffic

    out = []
    for mode in args.modes:
        for n in args.devices:
            rows = collective_traffic(compile_mode(mode, n))
            by_op = {
                op: sum(r.bytes for r in rows if r.opcode == op)
                for op in sorted({r.opcode for r in rows})
            }
            for fabric, bw, lat in (
                ("ici", args.ici_bw, args.ici_lat),
                ("dcn", args.dcn_bw, args.dcn_lat),
            ):
                row = model_row(
                    mode, n, by_op, len(rows),
                    args.compute_ms * 1e-3, bw, lat,
                )
                row["fabric"] = fabric
                out.append(row)
                print(
                    f"{mode:5s} n={n:3d} {fabric}: "
                    f"{row['n_collectives']:3d} collectives, "
                    f"{row['collective_bytes_per_device']:>9d} B/dev/iter, "
                    f"comm {row['t_comm_ms']:.4f} ms, "
                    f"exposed {row['t_exposed_ms']:.4f} ms, "
                    f"step {row['t_step_ms']:.3f} ms, "
                    f"eff {row['efficiency']:.1%}"
                )
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
        print("->", args.json, file=sys.stderr)


if __name__ == "__main__":
    main()
