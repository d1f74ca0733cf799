"""Whole-sequence odometry as ONE compiled XLA program.

The host-driven frontend (`frontend.run_odometry`) dispatches one
registration per frame — flexible, but every frame pays a host round
trip (catastrophic over a remote TPU tunnel, still non-trivial locally).
This version runs the ENTIRE sequence inside a single `lax.scan`:

  * frames arrive stacked (F, N, 3) with normals precomputed in one
    vmapped pass;
  * the carried state holds the current keyframe cloud, its pose, and
    the constant-velocity model; each scan step runs the full ICP
    while_loop against the carried keyframe;
  * keyframe spawning, the motion sanity gate, and dead-reckoning are
    `jnp.where` selects on the carry — no host involvement until the
    final trajectory comes back.

Trade-offs vs the host loop: fixed per-frame iteration budget, brute NN
against the keyframe (static shapes), no map mode / loop closures (run
those host-side on the returned keyframes).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from icpx.geometry.se3 import SE3
from icpx.kernels.knn import _nearest_neighbor_jnp
from icpx.kernels.knn_pallas import nn_pallas
from icpx.registration.icp import ICPConfig, _icp_scan


@partial(jax.jit, static_argnames=("config", "keyframe_trans", "keyframe_rot",
                                   "max_correction_trans",
                                   "max_correction_rot", "velocity_damping"))
def run_odometry_compiled(
    frames_xyz: jax.Array,  # (F, N, 3) sensor-frame scans
    frames_mask: jax.Array,  # (F, N)
    frames_normals: jax.Array,  # (F, N, 3)
    config: ICPConfig = ICPConfig(
        objective="symmetric",
        max_iters=12,
        diff_threshold=0.0,
        rmse_change_tol=1e-6,
        robust="huber",
        max_corr_dist=2.0,
    ),
    *,
    keyframe_trans: float = 1.0,
    keyframe_rot: float = 0.2,
    max_correction_trans: float = 1.0,
    max_correction_rot: float = 0.5,
    velocity_damping: float = 1.0,
) -> Tuple[SE3, jax.Array, jax.Array]:
    """Returns (poses SE3 (F,), is_keyframe (F,) bool, rmse (F,)).

    poses[0] = identity (world = first sensor frame).
    """
    f = frames_xyz.shape[0]

    def nn_factory(t_xyz, t_mask, t_n):
        def nn_fn(p):
            d2, idx = nn_pallas(
                p, t_xyz, ref_mask=t_mask
            ) if jax.default_backend() == "tpu" else _nearest_neighbor_jnp(
                p, t_xyz, ref_mask=t_mask,
                tile_q=config.tile_q, tile_r=config.tile_r,
            )
            return t_xyz[idx], t_n[idx], jnp.sqrt(d2)

        return nn_fn

    def step(carry, frame):
        (kf_xyz, kf_mask, kf_n, kf_R, kf_t, prev_rel, velocity,
         model_warm, rejects) = carry
        fx, fm, fn = frame
        kf_pose = SE3(R=kf_R, t=kf_t)

        init = prev_rel @ velocity
        res = _icp_scan(
            config,
            fx,
            fm,
            fn,
            init,
            nn_factory(kf_xyz, kf_mask, kf_n),
        )
        rel = res.transform

        # motion sanity gate (see frontend.py: warm-up + 2-strike valve)
        corr = init.inverse() @ rel
        corr_t = jnp.linalg.norm(corr.t)
        corr_r = corr.rotation_angle()
        finite = jnp.isfinite(corr_t) & jnp.all(jnp.isfinite(rel.t))
        gate_on = (
            (max_correction_trans > 0) & model_warm & (rejects < 2)
        )
        rejected = (~finite) | (
            gate_on
            & (
                (corr_t > max_correction_trans)
                | (corr_r > max_correction_rot)
            )
        )
        rel = jax.tree_util.tree_map(
            lambda a, b: jnp.where(rejected, a, b), init, rel
        )
        pose = kf_pose @ rel
        rmse = jnp.where(rejected, jnp.float32(jnp.inf), res.final_rmse)
        vel_raw = prev_rel.inverse() @ rel
        velocity = (
            # EMA in twist space (see frontend.py)
            SE3.exp(
                (1.0 - velocity_damping) * velocity.log()
                + velocity_damping * vel_raw.log()
            )
            if velocity_damping < 1.0
            else vel_raw
        )
        model_warm = model_warm | ~rejected
        rejects = jnp.where(rejected, rejects + 1, 0)

        # keyframe decision
        spawn = (~rejected) & (
            (jnp.linalg.norm(rel.t) > keyframe_trans)
            | (rel.rotation_angle() > keyframe_rot)
        )
        kf_xyz = jnp.where(spawn, fx, kf_xyz)
        kf_mask = jnp.where(spawn, fm, kf_mask)
        kf_n = jnp.where(spawn, fn, kf_n)
        kf_R = jnp.where(spawn, pose.R, kf_R)
        kf_t = jnp.where(spawn, pose.t, kf_t)
        prev_rel = jax.tree_util.tree_map(
            lambda eye, r: jnp.where(spawn, eye, r), SE3.identity(), rel
        )

        out = (pose.R, pose.t, spawn, rmse)
        return (
            (kf_xyz, kf_mask, kf_n, kf_R, kf_t, prev_rel, velocity,
             model_warm, rejects),
            out,
        )

    eye = SE3.identity()
    carry0 = (
        frames_xyz[0],
        frames_mask[0],
        frames_normals[0],
        eye.R,
        eye.t,
        eye,
        eye,
        jnp.array(False),
        jnp.int32(0),
    )
    _, (Rs, ts, spawns, rmses) = jax.lax.scan(
        step,
        carry0,
        (frames_xyz[1:], frames_mask[1:], frames_normals[1:]),
    )
    poses = SE3(
        R=jnp.concatenate([eye.R[None], Rs]),
        t=jnp.concatenate([eye.t[None], ts]),
    )
    is_kf = jnp.concatenate([jnp.ones((1,), bool), spawns])
    rmse = jnp.concatenate([jnp.zeros((1,), jnp.float32), rmses])
    return poses, is_kf, rmse
