"""Place-recognition descriptor: rotation invariance, discrimination,
relative-yaw recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from icpx.geometry.se3 import SE3
from icpx.odometry.placerec import (
    descriptor_distance,
    place_descriptor,
    relative_yaw,
)


def _scene(rng, n=4096, kind="posts"):
    ang = rng.uniform(-np.pi, np.pi, n)
    rad = rng.uniform(1, 20, n)
    if kind == "posts":
        # azimuth-asymmetric skyline (no rotational symmetry)
        h = 1.5 + np.sin(ang) + 0.6 * np.sin(2 * ang + 0.7) + 0.3 * np.cos(
            5 * ang + 1.3
        )
        z = rng.uniform(0, 1, n) * h
    else:
        z = 0.2 * rng.uniform(0, 1, n)
    return np.stack(
        [rad * np.cos(ang), rad * np.sin(ang), z], 1
    ).astype(np.float32)


def test_ring_descriptor_rotation_invariant(rng):
    pts = _scene(rng)
    mask = jnp.ones((len(pts),), bool)
    da, _ = place_descriptor(jnp.asarray(pts), mask)
    Rz = SE3.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), 1.1, jnp.zeros(3))
    db, _ = place_descriptor(Rz.apply(jnp.asarray(pts)), mask)
    assert float(descriptor_distance(da, db)) < 0.02


def test_descriptor_discriminates_places(rng):
    a = _scene(rng, kind="posts")
    b = _scene(rng, kind="flat")
    mask = jnp.ones((len(a),), bool)
    da, _ = place_descriptor(jnp.asarray(a), mask)
    db, _ = place_descriptor(jnp.asarray(b), mask)
    assert float(descriptor_distance(da, db)) > 0.3


def test_relative_yaw_recovers_rotation(rng):
    pts = _scene(rng)
    mask = jnp.ones((len(pts),), bool)
    _, pa = place_descriptor(jnp.asarray(pts), mask)
    for phi in (0.5, -1.2, 2.8):
        Rz = SE3.from_axis_angle(
            jnp.asarray([0.0, 0.0, 1.0]), phi, jnp.zeros(3)
        )
        _, pb = place_descriptor(Rz.apply(jnp.asarray(pts)), mask)
        est = float(relative_yaw(pa, pb))
        err = abs(
            (est - phi + np.pi) % (2 * np.pi) - np.pi
        )
        # sector resolution = 2pi/48 ~ 0.13 rad
        assert err < 0.15, f"phi={phi} est={est}"


def test_descriptor_masked_padding_ignored(rng):
    pts = _scene(rng, n=2048)
    mask = np.ones((4096,), bool)
    mask[2048:] = False
    padded = np.concatenate(
        [pts, np.full((2048, 3), 1e8, np.float32)]
    )
    da, pa = place_descriptor(jnp.asarray(pts), jnp.ones((2048,), bool))
    dp, pp = place_descriptor(jnp.asarray(padded), jnp.asarray(mask))
    assert float(descriptor_distance(da, dp)) < 1e-5
    assert np.allclose(np.asarray(pa), np.asarray(pp), atol=1e-5)
