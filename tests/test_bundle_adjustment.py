"""Schur-complement BA tests on synthetic multi-view geometry."""

import numpy as np

import jax.numpy as jnp

from structure_plp_slam_tpu.models import bundle_adjustment as ba
from structure_plp_slam_tpu.ops import lie
from tests.helpers import create_random_landmarks, make_camera


def _make_problem(rng, C=6, M=120, noise=0.0, perturb=0.02, outlier_frac=0.0,
                  stereo=False):
    cam = make_camera(focal_x_baseline=40.0 if stereo else 0.0)
    pts = create_random_landmarks(rng, M, space=8.0, z_range=(5.0, 10.0))

    # Cameras on a small arc looking at the cloud.
    poses = []
    for c in range(C):
        phi = rng.normal(size=3) * 0.03
        R = np.asarray(lie.so3_exp(jnp.asarray(phi[None], jnp.float32)))[0]
        t = np.array([0.3 * (c - C / 2), 0.02 * c, 0.0]) + rng.normal(size=3) * 0.01
        poses.append((R, t))

    obs_cam, obs_lm, obs_uv, obs_xr = [], [], [], []
    for c, (R, t) in enumerate(poses):
        pc = pts @ R.T + t
        uv = np.stack(
            [
                cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                cam.fy * pc[:, 1] / pc[:, 2] + cam.cy,
            ],
            axis=1,
        )
        if noise > 0:
            uv = uv + rng.normal(scale=noise, size=uv.shape)
        for m in range(M):
            obs_cam.append(c)
            obs_lm.append(m)
            obs_uv.append(uv[m])
            obs_xr.append(uv[m, 0] - cam.focal_x_baseline / pc[m, 2] if stereo else -1.0)

    obs_uv = np.array(obs_uv, np.float32)
    n_out = int(outlier_frac * len(obs_uv))
    if n_out:
        idx = rng.choice(len(obs_uv), n_out, replace=False)
        obs_uv[idx] += rng.uniform(25, 60, size=(n_out, 2)) * rng.choice(
            [-1, 1], (n_out, 2)
        )

    # Perturb everything except camera 0 (gauge).
    pose_arr = []
    for c, (R, t) in enumerate(poses):
        if c == 0:
            pose_arr.append(np.concatenate([R, t[:, None]], 1))
        else:
            dphi = rng.normal(size=3) * perturb
            dR = np.asarray(lie.so3_exp(jnp.asarray(dphi[None], jnp.float32)))[0]
            pose_arr.append(
                np.concatenate([dR @ R, (t + rng.normal(size=3) * perturb)[:, None]], 1)
            )
    lm_init = pts + rng.normal(size=pts.shape) * perturb * 2

    prob = ba.BAProblem(
        cam_pose=jnp.asarray(np.stack(pose_arr), jnp.float32),
        cam_fixed=jnp.asarray(np.arange(C) == 0),
        cam_valid=jnp.ones((C,), bool),
        lm_pos=jnp.asarray(lm_init, jnp.float32),
        lm_valid=jnp.ones((M,), bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_lm=jnp.asarray(obs_lm, jnp.int32),
        obs_uv=jnp.asarray(obs_uv),
        obs_xr=jnp.asarray(obs_xr, jnp.float32),
        obs_inv_sigma_sq=jnp.ones((len(obs_cam),), jnp.float32),
        obs_valid=jnp.ones((len(obs_cam),), bool),
    )
    return cam, prob, poses, pts


def _pose_errors(result, poses_gt):
    errs_R, errs_t = [], []
    est = np.asarray(result.cam_pose)
    for c, (R, t) in enumerate(poses_gt):
        dR = est[c, :, :3] @ R.T
        errs_R.append(
            np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR[None], jnp.float32))))
        )
        errs_t.append(np.linalg.norm(est[c, :, 3] - t))
    return np.array(errs_R), np.array(errs_t)


def test_ba_converges_exact(rng):
    cam, prob, poses, pts = _make_problem(rng)
    res = ba.ba_solve(cam, prob, num_iters=10, cull_at_iters=())
    # Perfect observations -> reprojection error must vanish.
    assert float(res.chi2) < 1e-4
    errs_R, errs_t = _pose_errors(res, poses)
    assert errs_R.max() < 1e-3
    # Mono BA with a single fixed camera has a free global scale (7th gauge
    # DoF); compare translations after scale alignment on camera centers.
    est = np.asarray(res.cam_pose)
    C_est = np.stack([-e[:, :3].T @ e[:, 3] for e in est])
    C_gt = np.stack([-R.T @ t for R, t in poses])
    num = np.linalg.norm(C_gt[1:] - C_gt[0], axis=1)
    den = np.linalg.norm(C_est[1:] - C_est[0], axis=1)
    s = np.median(num / np.maximum(den, 1e-12))
    C_aligned = C_est[0] + s * (C_est - C_est[0])
    assert np.linalg.norm(C_aligned - C_gt, axis=1).max() < 5e-3
    lm_aligned = C_est[0] + s * (np.asarray(res.lm_pos) - C_est[0])
    lm_err = np.linalg.norm(lm_aligned - pts, axis=1)
    assert np.median(lm_err) < 1e-2


def test_ba_reduces_chi2_with_noise(rng):
    cam, prob, poses, pts = _make_problem(rng, noise=0.5, perturb=0.03)
    res = ba.ba_solve(cam, prob)
    errs_R, errs_t = _pose_errors(res, poses)
    assert errs_R.max() < 5e-3
    assert errs_t.max() < 3e-2


def test_ba_rejects_outliers(rng):
    cam, prob, poses, pts = _make_problem(rng, noise=0.4, outlier_frac=0.15)
    res = ba.ba_solve(cam, prob)
    inlier_frac = float(np.asarray(res.obs_inlier).mean())
    assert 0.75 < inlier_frac < 0.93
    errs_R, errs_t = _pose_errors(res, poses)
    assert errs_t.max() < 4e-2


def test_ba_stereo(rng):
    cam, prob, poses, pts = _make_problem(rng, stereo=True, noise=0.3)
    res = ba.ba_solve(cam, prob)
    errs_R, errs_t = _pose_errors(res, poses)
    assert errs_R.max() < 5e-3
    assert errs_t.max() < 3e-2


def test_ba_fixed_cameras_stay_fixed(rng):
    cam, prob, poses, pts = _make_problem(rng)
    res = ba.ba_solve(cam, prob, num_iters=5)
    np.testing.assert_array_equal(
        np.asarray(res.cam_pose)[0], np.asarray(prob.cam_pose)[0]
    )
