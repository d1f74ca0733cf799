"""Coarse-to-fine multi-resolution ICP (SURVEY §2.3 P6, §5.7).

The reference runs a single resolution and only converges because its demo
correspondences are index-aligned. Real NN correspondence has a limited
convergence basin (~the NN-search neighborhood), so large initial offsets
need coarse levels: heavily subsampled clouds + wide correspondence gates
first, full resolution last, each level seeded with the previous level's
transform.

Subsampling is stride-slicing over the Morton order — a spatially
stratified sample with static shapes (no voxel-centroid dynamic shapes),
computed once per cloud.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from icpx.cloud import PAD_COORD, PointCloud
from icpx.geometry.se3 import SE3
from icpx.kernels.blocknn import build_tile_index
from icpx.registration.icp import ICPConfig, ICPResult, register


@dataclasses.dataclass(frozen=True)
class PyramidConfig:
    """Per-level schedule. Level 0 is the coarsest."""

    levels: int = 3
    subsample: int = 4  # stride factor between levels
    iters_per_level: Tuple[int, ...] = ()  # empty -> base.max_iters each
    base: ICPConfig = ICPConfig()
    # Correspondence gate per level, as a multiple of the level's cloud
    # extent; overrides base.max_corr_dist except at the finest level when
    # base.max_corr_dist is finite.
    coarse_gate_frac: float = 0.25
    # Redescending kernels (tukey/welsch) hard-reject the far majority
    # while misaligned and stall coarse levels; use a monotone kernel
    # there and the base kernel only at the finest level.
    coarse_robust: str = "huber"


def morton_stratified_subsample(
    cloud: PointCloud, stride: int
) -> PointCloud:
    """Every stride-th point of the Morton order — spatially uniform."""
    if stride <= 1:
        return cloud
    idx = build_tile_index(cloud.xyz, cloud.mask, tile_size=64)
    order = idx.order[::stride]
    valid = order >= 0
    safe = jnp.maximum(order, 0)
    xyz = jnp.where(valid[:, None], cloud.xyz[safe], PAD_COORD)
    normals = None
    if cloud.normals is not None:
        normals = jnp.where(valid[:, None], cloud.normals[safe], 0.0)
    covs = None
    if cloud.covs is not None:
        covs = jnp.where(
            valid[:, None, None], cloud.covs[safe],
            jnp.eye(3, dtype=jnp.float32),
        )
    feats = None
    if cloud.feats is not None:
        feats = jnp.where(valid[:, None], cloud.feats[safe], 0.0)
    return PointCloud(
        xyz=xyz,
        mask=valid & cloud.mask[safe],
        normals=normals,
        covs=covs,
        feats=feats,
        feat_names=cloud.feat_names,
    )


def register_pyramid(
    src: PointCloud,
    tgt: PointCloud,
    config: PyramidConfig = PyramidConfig(),
    init: Optional[SE3] = None,
) -> Tuple[ICPResult, List[ICPResult]]:
    """Coarse-to-fine registration.

    Returns (finest-level result with the FULL accumulated transform,
    per-level results).
    """
    if init is None:
        init = SE3.identity()
    levels = config.levels
    iters = config.iters_per_level or tuple(
        config.base.max_iters for _ in range(levels)
    )
    if len(iters) != levels:
        raise ValueError("iters_per_level length must equal levels")

    extent = float(jax.device_get(tgt.extent()))
    results: List[ICPResult] = []
    transform = init
    for lvl in range(levels):
        stride = config.subsample ** (levels - 1 - lvl)
        src_l = morton_stratified_subsample(src, stride)
        tgt_l = morton_stratified_subsample(tgt, stride)
        if lvl == levels - 1 and jnp.isfinite(config.base.max_corr_dist):
            gate = config.base.max_corr_dist
        else:
            # wide at the coarsest, narrowing by 2x per level
            gate = config.coarse_gate_frac * extent / (2**lvl)
        robust = (
            config.base.robust
            if lvl == levels - 1 or config.base.robust in ("none", "huber", "cauchy")
            else config.coarse_robust
        )
        cfg_l = dataclasses.replace(
            config.base,
            max_iters=iters[lvl],
            max_corr_dist=float(gate),
            robust=robust,
        )
        res = register(src_l, tgt_l, cfg_l, init=transform)
        transform = res.transform
        results.append(res)
    return results[-1], results
