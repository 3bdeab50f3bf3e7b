"""Tests for batched RANSAC solvers (essential / homography / cheirality)."""

import numpy as np

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import lie, ransac
from tests.helpers import K_of, create_random_landmarks, make_camera


def _two_view(rng, n=200, planar=False, outlier_frac=0.0, noise_px=0.0):
    cam = make_camera()
    K = K_of(cam)
    if planar:
        pts = create_random_landmarks(rng, n, space=8.0, z_range=(6.0, 6.0))
    else:
        pts = create_random_landmarks(rng, n, space=8.0, z_range=(4.0, 12.0))
    phi = rng.normal(size=3) * 0.08
    R = np.asarray(lie.so3_exp(jnp.asarray(phi[None], jnp.float32)))[0].astype(
        np.float64
    )
    t = np.array([0.6, -0.1, 0.05])
    pc1 = pts
    pc2 = pts @ R.T + t

    def project(pc):
        uv = pc @ K.T
        return (uv[:, :2] / uv[:, 2:3]).astype(np.float64)

    uv1, uv2 = project(pc1), project(pc2)
    if noise_px:
        uv1 += rng.normal(scale=noise_px, size=uv1.shape)
        uv2 += rng.normal(scale=noise_px, size=uv2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv2[idx] = rng.uniform([0, 0], [cam.cols, cam.rows], size=(n_out, 2))

    def bearings(uv):
        v = np.concatenate(
            [(uv - [cam.cx, cam.cy]) / [cam.fx, cam.fy], np.ones((n, 1))], axis=1
        )
        return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)

    return cam, K, R, t, uv1, uv2, bearings(uv1), bearings(uv2)


def test_essential_ransac_recovers_pose(rng):
    cam, K, R_gt, t_gt, uv1, uv2, b1, b2 = _two_view(rng, outlier_frac=0.2)
    key = jax.random.PRNGKey(0)
    E, inliers, score = ransac.essential_ransac(
        jnp.asarray(b1), jnp.asarray(b2), jnp.ones(len(b1), bool), key
    )
    assert int(np.asarray(inliers).sum()) > 0.7 * 0.8 * len(b1)
    Rs, ts = ransac.decompose_essential(E)
    R, t, pts, good, count = ransac.select_pose_by_cheirality(
        Rs, ts, jnp.asarray(b1), jnp.asarray(b2), inliers
    )
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=5e-3)
    t_est = np.asarray(t)
    t_dir = t_gt / np.linalg.norm(t_gt)
    assert np.abs(np.dot(t_est, t_dir)) > 0.999


def test_homography_ransac_planar(rng):
    cam, K, R_gt, t_gt, uv1, uv2, b1, b2 = _two_view(rng, planar=True, noise_px=0.3)
    key = jax.random.PRNGKey(1)
    H, inliers, score = ransac.homography_ransac(
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.ones(len(uv1), bool), key,
    )
    assert int(np.asarray(inliers).sum()) > 0.9 * len(uv1)
    Rs, ts = ransac.decompose_homography(H, jnp.asarray(K, jnp.float32))
    R, t, pts, good, count = ransac.select_pose_by_cheirality(
        Rs, ts, jnp.asarray(b1), jnp.asarray(b2), inliers
    )
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=2e-2)
    t_est = np.asarray(t)
    t_dir = t_gt / np.linalg.norm(t_gt)
    assert np.abs(np.dot(t_est, t_dir)) > 0.99


def test_homography_exact_4pt():
    p1 = jnp.asarray(
        np.array([[[0.0, 0.0], [100.0, 0.0], [0.0, 100.0], [100.0, 100.0]]], np.float32)
    )
    # Pure translation homography.
    p2 = p1 + 10.0
    H = np.asarray(ransac.homography_4pt(p1, p2))[0]
    expected = np.array([[1, 0, 10], [0, 1, 10], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(H, expected, atol=1e-3)


def test_essential_scores_planar_lower_than_h(rng):
    """On a planar scene the H score should dominate (model selection)."""
    cam, K, R_gt, t_gt, uv1, uv2, b1, b2 = _two_view(rng, planar=True, noise_px=0.2)
    key = jax.random.PRNGKey(2)
    _, in_h, s_h = ransac.homography_ransac(
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.ones(len(uv1), bool), key,
    )
    # H should explain nearly all correspondences on a plane.
    assert float(np.asarray(in_h).mean()) > 0.9
