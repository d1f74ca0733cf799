"""SE(3) pytree ops: compose/inverse/apply/exp/log/matrix."""

import jax
import jax.numpy as jnp
import numpy as np

from icpx.geometry.se3 import SE3, rotation_from_axis_angle, rotation_log, skew


def test_identity_apply(rng):
    pts = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    eye = SE3.identity()
    assert np.allclose(eye.apply(pts), pts)


def test_compose_matches_sequential(key):
    k1, k2, k3 = jax.random.split(key, 3)
    a = SE3.random(k1)
    b = SE3.random(k2)
    pts = jax.random.normal(k3, (20, 3))
    ab = a @ b
    assert np.allclose(ab.apply(pts), a.apply(b.apply(pts)), atol=1e-5)


def test_inverse(key):
    a = SE3.random(key)
    pts = jax.random.normal(key, (20, 3))
    assert np.allclose(a.inverse().apply(a.apply(pts)), pts, atol=1e-5)
    eye = a @ a.inverse()
    assert np.allclose(eye.R, np.eye(3), atol=1e-6)
    assert np.allclose(eye.t, 0, atol=1e-6)


def test_matrix_roundtrip(key):
    a = SE3.random(key)
    b = SE3.from_matrix(a.matrix())
    assert np.allclose(a.R, b.R) and np.allclose(a.t, b.t)


def test_rotation_is_orthonormal(key):
    a = SE3.random(key, batch_shape=(16,))
    RtR = jnp.einsum("bij,bik->bjk", a.R, a.R)
    assert np.allclose(RtR, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    assert np.allclose(np.linalg.det(np.asarray(a.R)), 1.0, atol=1e-5)


def test_exp_log_roundtrip(key):
    twists = 0.8 * jax.random.normal(key, (32, 6))
    T = SE3.exp(twists)
    back = T.log()
    assert np.allclose(back, twists, atol=1e-4)


def test_log_exp_roundtrip_random_transforms(key):
    T = SE3.random(key, batch_shape=(32,), max_angle=3.0)
    T2 = SE3.exp(T.log())
    assert np.allclose(T2.R, T.R, atol=1e-4)
    assert np.allclose(T2.t, T.t, atol=1e-4)


def test_rotation_log_small_and_near_pi():
    for angle in (1e-7, 1e-4, 0.5, 3.0, np.pi - 1e-4):
        axis = np.array([1.0, 2.0, -0.5])
        axis = axis / np.linalg.norm(axis)
        R = rotation_from_axis_angle(jnp.asarray(axis, jnp.float32), angle)
        w = np.asarray(rotation_log(R))
        R2 = np.asarray(
            rotation_from_axis_angle(
                jnp.asarray(w / max(np.linalg.norm(w), 1e-20)),
                float(np.linalg.norm(w)),
            )
        )
        assert np.allclose(R2, np.asarray(R), atol=2e-3), f"angle={angle}"


def test_skew():
    v = jnp.asarray([1.0, 2.0, 3.0])
    u = jnp.asarray([0.5, -1.0, 2.0])
    assert np.allclose(skew(v) @ u, jnp.cross(v, u), atol=1e-6)


def test_rotate_vs_apply_normal_semantics(key):
    """Normals must be rotated only — regression vs reference bug
    (`myicp.cpp:137` translates normals)."""
    T = SE3.random(key, max_trans=10.0)
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    rotated = T.rotate(n)
    assert np.allclose(np.linalg.norm(np.asarray(rotated)), 1.0, atol=1e-5)
    applied = T.apply(n)
    assert not np.allclose(np.asarray(rotated), np.asarray(applied), atol=1e-3)


def test_distance_to(key):
    a = SE3.random(key)
    rot, trans = a.distance_to(a)
    assert float(rot) < 1e-5 and float(trans) < 1e-6
