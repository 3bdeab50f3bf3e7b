"""Tests for motion-only pose optimization on synthetic geometry.

Fixture pattern mirrors the reference solver tests
(test/PLPSLAM/solve/*.cc): generate GT landmarks + pose, project, perturb,
solve, compare to GT.
"""

import numpy as np

import jax.numpy as jnp

from structure_plp_slam_tpu.models import pose_opt
from structure_plp_slam_tpu.ops import lie
from tests.helpers import create_random_landmarks, make_camera, random_rotation


def _setup(rng, n=200, noise=0.0, outlier_frac=0.0, stereo=False):
    cam = make_camera(focal_x_baseline=40.0 if stereo else 0.0)
    pts = create_random_landmarks(rng, n)
    # Small GT pose near identity (camera looking at the cloud).
    phi = rng.normal(size=3) * 0.1
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(phi[None], jnp.float32)))[0]
    t_gt = rng.normal(size=3) * 0.2
    pc = pts @ R_gt.T + t_gt
    uv = np.stack(
        [
            cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
            cam.fy * pc[:, 1] / pc[:, 2] + cam.cy,
        ],
        axis=1,
    )
    if noise > 0:
        uv += rng.normal(scale=noise, size=uv.shape)
    if stereo:
        xr = uv[:, 0] - cam.focal_x_baseline / pc[:, 2]
    else:
        xr = np.full(n, -1.0)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv[idx] += rng.uniform(20, 80, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return cam, pts, R_gt, t_gt, uv, xr


def _solve(cam, pts, R_init, t_init, uv, xr):
    n = len(pts)
    return pose_opt.optimize_pose(
        cam,
        jnp.asarray(R_init, jnp.float32),
        jnp.asarray(t_init, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(uv, jnp.float32),
        jnp.asarray(xr, jnp.float32),
        jnp.ones((n,), jnp.float32),
        jnp.ones((n,), bool),
    )


def test_pose_opt_recovers_exact(rng):
    cam, pts, R_gt, t_gt, uv, xr = _setup(rng)
    # Perturb the initial pose.
    dphi = rng.normal(size=3) * 0.05
    dR = np.asarray(lie.so3_exp(jnp.asarray(dphi[None], jnp.float32)))[0]
    res = _solve(cam, pts, dR @ R_gt, t_gt + rng.normal(size=3) * 0.1, uv, xr)
    np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=1e-2)
    assert int(res.num_inliers) == len(pts)


def test_pose_opt_with_noise_and_outliers(rng):
    cam, pts, R_gt, t_gt, uv, xr = _setup(rng, n=300, noise=0.5, outlier_frac=0.2)
    dphi = rng.normal(size=3) * 0.03
    dR = np.asarray(lie.so3_exp(jnp.asarray(dphi[None], jnp.float32)))[0]
    res = _solve(cam, pts, dR @ R_gt, t_gt + rng.normal(size=3) * 0.05, uv, xr)
    # Rotation within ~0.3 deg, translation within 5 cm.
    err_R = np.linalg.norm(
        np.asarray(lie.so3_log(jnp.asarray((np.asarray(res.R) @ R_gt.T)[None])))
    )
    assert err_R < 6e-3
    assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.05
    # Outliers rejected.
    assert 0.7 * 300 < int(res.num_inliers) <= 0.85 * 300


def test_pose_opt_stereo(rng):
    cam, pts, R_gt, t_gt, uv, xr = _setup(rng, stereo=True, noise=0.3)
    dphi = rng.normal(size=3) * 0.05
    dR = np.asarray(lie.so3_exp(jnp.asarray(dphi[None], jnp.float32)))[0]
    res = _solve(cam, pts, dR @ R_gt, t_gt + rng.normal(size=3) * 0.1, uv, xr)
    np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=2e-2)


def test_pose_opt_respects_valid_mask(rng):
    cam, pts, R_gt, t_gt, uv, xr = _setup(rng, n=100)
    # Corrupt half the observations but mask them out.
    uv2 = uv.copy()
    uv2[:50] += 500.0
    valid = np.zeros(100, bool)
    valid[50:] = True
    res = pose_opt.optimize_pose(
        cam,
        jnp.asarray(R_gt, jnp.float32),
        jnp.asarray(t_gt + 0.05, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        jnp.asarray(xr, jnp.float32),
        jnp.ones((100,), jnp.float32),
        jnp.asarray(valid),
    )
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=1e-2)
    assert int(res.num_inliers) == 50
