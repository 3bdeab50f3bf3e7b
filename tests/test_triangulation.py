"""Tests for batched two-view triangulation."""

import numpy as np

import jax.numpy as jnp

from structure_plp_slam_tpu.ops import triangulation
from tests.helpers import create_random_landmarks, random_rotation


def _normalize(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_triangulate_dlt_exact(rng):
    pts_c1 = create_random_landmarks(rng, 100)  # in camera-1 frame
    R_21 = random_rotation(rng)
    # Keep baseline modest so points stay in front of cam 2.
    t_21 = np.array([0.5, 0.05, 0.0])
    R_21 = np.eye(3) + 0.0 * R_21  # use small rotation for visibility
    phi = rng.normal(size=3) * 0.1
    from structure_plp_slam_tpu.ops import lie

    R_21 = np.asarray(lie.so3_exp(jnp.asarray(phi[None], jnp.float32)))[0]
    pts_c2 = pts_c1 @ R_21.T + t_21
    b1 = _normalize(pts_c1).astype(np.float32)
    b2 = _normalize(pts_c2).astype(np.float32)
    out = np.asarray(
        triangulation.triangulate_dlt(
            jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(R_21, jnp.float32),
            jnp.asarray(t_21, jnp.float32),
        )
    )
    np.testing.assert_allclose(out, pts_c1, rtol=2e-3, atol=2e-3)


def test_triangulate_two_view_world(rng):
    pts_w = create_random_landmarks(rng, 50)
    from structure_plp_slam_tpu.ops import lie

    phi1 = rng.normal(size=3) * 0.05
    R1 = np.asarray(lie.so3_exp(jnp.asarray(phi1[None], jnp.float32)))[0]
    t1 = np.array([0.0, 0.0, 0.0])
    phi2 = rng.normal(size=3) * 0.05
    R2 = np.asarray(lie.so3_exp(jnp.asarray(phi2[None], jnp.float32)))[0]
    t2 = np.array([-0.8, 0.0, 0.0])
    b1 = _normalize(pts_w @ R1.T + t1).astype(np.float32)
    b2 = _normalize(pts_w @ R2.T + t2).astype(np.float32)
    out = np.asarray(
        triangulation.triangulate_two_view(
            jnp.asarray(b1), jnp.asarray(b2),
            jnp.asarray(R1, jnp.float32), jnp.asarray(t1, jnp.float32),
            jnp.asarray(R2, jnp.float32), jnp.asarray(t2, jnp.float32),
        )
    )
    np.testing.assert_allclose(out, pts_w, rtol=3e-3, atol=3e-3)


def test_check_triangulation_rejects_behind_camera(rng):
    # A point behind camera 2.
    pts_c1 = np.array([[0.0, 0.0, 5.0]], np.float32)
    R_21 = np.eye(3, dtype=np.float32)
    t_21 = np.array([0.0, 0.0, -10.0], np.float32)  # cam2 10 ahead -> point behind
    b1 = _normalize(pts_c1)
    pts_c2 = pts_c1 + t_21
    b2 = _normalize(pts_c2)
    ok = np.asarray(
        triangulation.check_triangulation(
            jnp.asarray(pts_c1), jnp.asarray(b1), jnp.asarray(b2),
            jnp.asarray(R_21), jnp.asarray(t_21),
        )
    )
    assert not ok[0]


def test_check_triangulation_rejects_low_parallax(rng):
    pts_c1 = create_random_landmarks(rng, 20).astype(np.float32)
    R_21 = np.eye(3, dtype=np.float32)
    t_21 = np.array([1e-5, 0.0, 0.0], np.float32)  # tiny baseline
    pts_c2 = pts_c1 + t_21
    b1 = _normalize(pts_c1)
    b2 = _normalize(pts_c2)
    ok = np.asarray(
        triangulation.check_triangulation(
            jnp.asarray(pts_c1), jnp.asarray(b1), jnp.asarray(b2),
            jnp.asarray(R_21), jnp.asarray(t_21),
        )
    )
    assert not ok.any()
