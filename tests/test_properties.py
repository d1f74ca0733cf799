"""Property-based tests (hypothesis): algebraic laws that must hold for
ANY input, not just the fixtures."""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from icpx.geometry.se3 import SE3, rotation_from_axis_angle
from icpx.kernels.eigh3 import eigh3x3
from icpx.registration.horn import horn_align

_SETTINGS = settings(max_examples=25, deadline=None)


def _twist(draw_floats):
    return np.asarray(draw_floats, np.float32)


@_SETTINGS
@given(
    st.lists(st.floats(-1.5, 1.5), min_size=18, max_size=18),
)
def test_se3_associativity(vals):
    v = np.asarray(vals, np.float32).reshape(3, 6)
    a, b, c = (SE3.exp(jnp.asarray(v[i])) for i in range(3))
    left = (a @ b) @ c
    right = a @ (b @ c)
    assert np.allclose(np.asarray(left.R), np.asarray(right.R), atol=1e-5)
    assert np.allclose(np.asarray(left.t), np.asarray(right.t), atol=1e-5)


@_SETTINGS
@given(st.lists(st.floats(-2.0, 2.0), min_size=6, max_size=6))
def test_se3_exp_log_inverse(vals):
    u = np.asarray(vals, np.float32)
    T = SE3.exp(jnp.asarray(u))
    # inverse undoes
    eye = T @ T.inverse()
    assert np.allclose(np.asarray(eye.R), np.eye(3), atol=1e-5)
    assert np.allclose(np.asarray(eye.t), 0.0, atol=1e-5)
    # log/exp roundtrip (angle < pi by construction of the bound)
    back = np.asarray(T.log())
    T2 = SE3.exp(jnp.asarray(back))
    assert np.allclose(np.asarray(T2.R), np.asarray(T.R), atol=2e-4)
    assert np.allclose(np.asarray(T2.t), np.asarray(T.t), atol=2e-4)


@_SETTINGS
@given(st.integers(0, 2**32 - 1), st.floats(0.01, 3.0), st.floats(0.0, 5.0))
def test_horn_recovers_any_rigid_transform(seed, angle, trans):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=3)
    axis /= max(np.linalg.norm(axis), 1e-9)
    gt = SE3.from_axis_angle(
        jnp.asarray(axis, jnp.float32), np.float32(angle),
        jnp.asarray(rng.normal(size=3) * trans, jnp.float32),
    )
    src = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    est = horn_align(src, gt.apply(src))
    rot_err, t_err = est.distance_to(gt)
    # fp32 arccos in distance_to floors at ~5e-4 rad; 2e-3 is still tight
    assert float(rot_err) < 2e-3
    assert float(t_err) < 2e-3


@_SETTINGS
@given(st.integers(0, 2**32 - 1))
def test_eigh3_residual_any_symmetric(seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(8, 3, 3)).astype(np.float32)
    A = (A + A.transpose(0, 2, 1)) / 2
    w, V = eigh3x3(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    scale = np.abs(A).max() + 1.0
    for i in range(3):
        Av = np.einsum("nij,nj->ni", A, V[:, :, i])
        assert np.allclose(Av, w[:, i : i + 1] * V[:, :, i], atol=1e-2 * scale)
    assert (np.diff(w, axis=1) >= -1e-4 * scale).all()  # sorted


@_SETTINGS
@given(st.integers(0, 2**32 - 1), st.floats(0.1, 10.0))
def test_rotation_preserves_norms(seed, scale):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=3)
    axis /= max(np.linalg.norm(axis), 1e-9)
    R = rotation_from_axis_angle(
        jnp.asarray(axis, jnp.float32), np.float32(rng.uniform(0, np.pi))
    )
    v = jnp.asarray(rng.normal(size=(16, 3)) * scale, jnp.float32)
    rv = np.asarray(v @ np.asarray(R).T)
    assert np.allclose(
        np.linalg.norm(rv, axis=1), np.linalg.norm(np.asarray(v), axis=1),
        rtol=1e-5,
    )