"""Unit tests for batched Lie-group ops (SO3/SE3/Sim3 exp/log round trips)."""

import numpy as np
import pytest

import jax.numpy as jnp

from structure_plp_slam_tpu.ops import lie
from tests.helpers import random_rotation


def test_so3_exp_identity():
    R = lie.so3_exp(jnp.zeros((5, 3)))
    np.testing.assert_allclose(np.asarray(R), np.tile(np.eye(3), (5, 1, 1)), atol=1e-6)


def test_so3_exp_log_roundtrip(rng):
    phi = rng.normal(size=(64, 3)).astype(np.float32)
    # Keep |phi| < pi to stay in the principal branch.
    norms = np.linalg.norm(phi, axis=-1, keepdims=True)
    phi = phi / norms * (rng.uniform(1e-6, 3.0, size=(64, 1)))
    R = lie.so3_exp(jnp.asarray(phi))
    phi2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(phi2, phi, atol=2e-4)


def test_so3_log_small_angle(rng):
    phi = rng.normal(size=(16, 3)).astype(np.float32) * 1e-6
    R = lie.so3_exp(jnp.asarray(phi))
    phi2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(phi2, phi, atol=1e-8)


def test_so3_log_near_pi(rng):
    for _ in range(10):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        theta = np.pi - 1e-5
        phi = (axis * theta).astype(np.float32)
        R = lie.so3_exp(jnp.asarray(phi[None]))
        phi2 = np.asarray(lie.so3_log(R))[0]
        # Log may return the antipodal representative; compare rotations.
        R2 = np.asarray(lie.so3_exp(jnp.asarray(phi2[None])))[0]
        np.testing.assert_allclose(R2, np.asarray(R)[0], atol=1e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 6)).astype(np.float32)
    xi[:, 3:] *= 0.8
    R, t = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=2e-4)


def test_se3_compose_inverse(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    Ri, ti = lie.se3_inverse(R, t)
    Rc, tc = lie.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 7)).astype(np.float32)
    xi[:, 3:6] *= 0.8
    xi[:, 6] *= 0.3
    R, t, s = lie.sim3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.sim3_log(R, t, s))
    np.testing.assert_allclose(xi2, xi, atol=5e-4)


def test_sim3_compose_inverse(rng):
    xi = rng.normal(size=(8, 7)).astype(np.float32) * 0.5
    R, t, s = lie.sim3_exp(jnp.asarray(xi))
    Ri, ti, si = lie.sim3_inverse(R, t, s)
    Rc, tc, sc = lie.sim3_compose(R, t, s, Ri, ti, si)
    np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sc), 1, atol=1e-5)


def test_sim3_apply_matches_formula(rng):
    xi = rng.normal(size=(7,)).astype(np.float32) * 0.5
    R, t, s = lie.sim3_exp(jnp.asarray(xi[None]))
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    out = np.asarray(lie.sim3_apply(R, t, s, jnp.asarray(pts[None])))[0]
    expected = float(np.asarray(s)[0]) * pts @ np.asarray(R)[0].T + np.asarray(t)[0]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_quat_roundtrip(rng):
    Rs = np.stack([random_rotation(rng) for _ in range(32)]).astype(np.float32)
    q = lie.quat_from_rotmat(jnp.asarray(Rs))
    R2 = np.asarray(lie.rotmat_from_quat(q))
    np.testing.assert_allclose(R2, Rs, atol=1e-5)


def test_quat_canonical_sign(rng):
    Rs = np.stack([random_rotation(rng) for _ in range(16)]).astype(np.float32)
    q = np.asarray(lie.quat_from_rotmat(jnp.asarray(Rs)))
    assert (q[:, 0] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


def test_se3_update_is_left_multiplication(rng):
    xi0 = rng.normal(size=(6,)).astype(np.float32)
    dxi = (rng.normal(size=(6,)) * 0.1).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi0[None]))
    Ru, tu = lie.se3_update(R, t, jnp.asarray(dxi[None]))
    dR, dt = lie.se3_exp(jnp.asarray(dxi[None]))
    Re, te = lie.se3_compose(dR, dt, R, t)
    np.testing.assert_allclose(np.asarray(Ru), np.asarray(Re), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tu), np.asarray(te), atol=1e-6)
