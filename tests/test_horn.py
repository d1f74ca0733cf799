"""Closed-form Horn/Kabsch vs random SO(3)+t — oracle per SURVEY §3.2,
rebuilding `registrateNPoint` (`regist.h:8-72`) with src->dst convention."""

import jax
import numpy as np

from icpx.geometry.se3 import SE3
from icpx.registration.horn import horn_align, umeyama_align


def test_exact_recovery(key):
    k1, k2 = jax.random.split(key)
    gt = SE3.random(k1, max_angle=3.0, max_trans=5.0)
    src = jax.random.normal(k2, (200, 3))
    dst = gt.apply(src)
    est = horn_align(src, dst)
    rot_err, t_err = est.distance_to(gt)
    assert float(rot_err) < 1e-4
    assert float(t_err) < 1e-4


def test_noisy_recovery(key):
    k1, k2, k3 = jax.random.split(key, 3)
    gt = SE3.random(k1, max_angle=2.0, max_trans=2.0)
    src = jax.random.normal(k2, (2000, 3))
    dst = gt.apply(src) + 0.01 * jax.random.normal(k3, (2000, 3))
    est = horn_align(src, dst)
    rot_err, t_err = est.distance_to(gt)
    assert float(rot_err) < 2e-3
    assert float(t_err) < 2e-3


def test_weights_reject_outliers(key):
    k1, k2 = jax.random.split(key)
    gt = SE3.random(k1, max_angle=1.0, max_trans=1.0)
    src = jax.random.normal(k2, (100, 3))
    dst = gt.apply(src)
    dst = dst.at[:10].add(50.0)  # corrupt 10 pairs
    w = np.ones(100, np.float32)
    w[:10] = 0.0
    est = horn_align(src, dst, weights=w)
    rot_err, t_err = est.distance_to(gt)
    assert float(rot_err) < 1e-4 and float(t_err) < 1e-4


def test_batched(key):
    k1, k2 = jax.random.split(key)
    gt = SE3.random(k1, batch_shape=(4,), max_angle=2.0)
    src = jax.random.normal(k2, (4, 64, 3))
    dst = gt.apply(src)
    est = horn_align(src, dst)
    rot_err, t_err = est.distance_to(gt)
    assert np.all(np.asarray(rot_err) < 1e-3)


def test_degenerate_planar_no_reflection(key):
    """Coplanar points must still yield a proper rotation (det=+1),
    matching the reference's det fix (`regist.h:57-63`)."""
    k1, k2 = jax.random.split(key)
    src2d = jax.random.normal(k2, (50, 3)) * np.array([1.0, 1.0, 0.0])
    gt = SE3.random(k1, max_angle=1.5)
    dst = gt.apply(src2d)
    est = horn_align(src2d, dst)
    assert abs(float(np.linalg.det(np.asarray(est.R))) - 1.0) < 1e-4
    assert np.allclose(np.asarray(est.apply(src2d)), np.asarray(dst), atol=1e-4)


def test_umeyama_scale(key):
    k1, k2 = jax.random.split(key)
    gt = SE3.random(k1, max_angle=2.0, max_trans=3.0)
    src = jax.random.normal(k2, (300, 3))
    dst = 2.5 * gt.rotate(src) + gt.t
    est, s = umeyama_align(src, dst)
    assert abs(float(s) - 2.5) < 1e-3
    pred = float(s) * est.rotate(src) + est.t
    assert np.allclose(np.asarray(pred), np.asarray(dst), atol=1e-3)
