"""Coarse-to-fine pyramid: converges from perturbations far outside the
single-level basin."""

import jax.numpy as jnp
import numpy as np

from icpx.cloud import PointCloud
from icpx.geometry.se3 import SE3
from icpx.io.loaders import synthetic_surface
from icpx.registration.icp import ICPConfig, register
from icpx.registration.pyramid import (
    PyramidConfig,
    morton_stratified_subsample,
    register_pyramid,
)


def _pair(n, angle, trans, seed=0):
    xyz = synthetic_surface(n, seed=seed)
    src = PointCloud.create(xyz)
    axis = np.array([0.2, -0.1, 0.97])
    axis /= np.linalg.norm(axis)
    gt = SE3.from_axis_angle(
        jnp.asarray(axis, jnp.float32), angle, jnp.asarray(trans, jnp.float32)
    )
    rng = np.random.default_rng(seed + 1)
    tgt = PointCloud.create(np.asarray(gt.apply(src.xyz))[:n][rng.permutation(n)])
    return src, tgt, gt


def test_subsample_stride():
    src = PointCloud.create(synthetic_surface(1000, seed=0))
    sub = morton_stratified_subsample(src, 4)
    assert int(sub.num_valid()) == 250
    # subsample points are a subset of the original
    orig = {tuple(p) for p in src.to_numpy().round(5).tolist()}
    assert all(tuple(p) in orig for p in sub.to_numpy().round(5).tolist())


def test_pyramid_converges_large_perturbation():
    # 0.9 rad + large translation: far outside the single-level basin
    src, tgt, gt = _pair(4000, 0.9, (0.8, -0.5, 0.3))
    cfg = PyramidConfig(
        levels=3,
        subsample=4,
        base=ICPConfig(
            objective="symmetric",
            max_iters=15,
            diff_threshold=1e-5,
            robust="tukey",
        ),
    )
    res, per_level = register_pyramid(src, tgt, cfg)
    rot_err, t_err = res.transform.distance_to(gt)
    assert float(rot_err) < 5e-3, f"rot {float(rot_err)}"
    assert float(t_err) < 5e-3, f"t {float(t_err)}"
    assert len(per_level) == 3


def test_single_level_fails_same_case():
    """Documents why the pyramid exists: one level can't solve this."""
    src, tgt, gt = _pair(4000, 0.9, (0.8, -0.5, 0.3))
    res = register(
        src, tgt, ICPConfig(max_iters=45, diff_threshold=1e-5, robust="tukey")
    )
    rot_err, _ = res.transform.distance_to(gt)
    assert float(rot_err) > 0.05  # stuck in a wrong basin


def test_pyramid_with_init():
    src, tgt, gt = _pair(2000, 1.5, (1.0, 0.5, -0.7), seed=3)
    rough = gt @ SE3.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), 0.15)
    cfg = PyramidConfig(levels=2, base=ICPConfig(max_iters=10, diff_threshold=1e-5))
    res, _ = register_pyramid(src, tgt, cfg, init=rough)
    rot_err, t_err = res.transform.distance_to(gt)
    assert float(rot_err) < 1e-2 and float(t_err) < 1e-2

def test_pyramid_carries_payload_features():
    """morton_stratified_subsample keeps feats/covs, so pyramid levels
    can run feature-augmented matching (review regression)."""
    import numpy as np

    from icpx.cloud import PointCloud
    from icpx.registration.pyramid import morton_stratified_subsample

    n = 1024
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    feats = rng.uniform(size=(n, 1)).astype(np.float32)
    cloud = PointCloud.create(xyz, feats=feats, feat_names=("intensity",))
    sub = morton_stratified_subsample(cloud, 4)
    assert sub.feat_names == ("intensity",)
    assert sub.feats.shape[0] == sub.xyz.shape[0]
    valid = np.asarray(sub.mask)
    # subsampled feature values come from the original column
    assert set(np.asarray(sub.feats)[valid, 0]).issubset(
        set(feats[:, 0].tolist())
    )
