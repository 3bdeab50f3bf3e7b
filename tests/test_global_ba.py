"""Global (pair-based sparse Schur) BA vs the dense-window solver."""

import numpy as np
import pytest

import jax.numpy as jnp

from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.models import bundle_adjustment as ba
from structure_plp_slam_tpu.models import global_ba
from structure_plp_slam_tpu.ops import lie
from tests.helpers import create_random_landmarks, make_camera


def _make_state(rng, K=6, M=150, noise=0.3, perturb=0.02):
    """A MapState with K keyframes all observing M landmarks."""
    cam = make_camera()
    pts = create_random_landmarks(rng, M, space=8.0, z_range=(5.0, 10.0))
    N = 256  # kp slots
    state = ms.create(max_keyframes=8, max_kps=N, max_landmarks=256)
    poses_gt = []
    for c in range(K):
        phi = rng.normal(size=3) * 0.03
        R = np.asarray(lie.so3_exp(jnp.asarray(phi[None], jnp.float32)))[0]
        t = np.array([0.3 * (c - K / 2), 0.02 * c, 0.0]) + rng.normal(size=3) * 0.01
        poses_gt.append((R, t))
        pc = pts @ R.T + t
        uv = np.stack(
            [
                cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                cam.fy * pc[:, 1] / pc[:, 2] + cam.cy,
            ],
            axis=1,
        ) + rng.normal(scale=noise, size=(M, 2))
        feats = {
            "xy": jnp.asarray(np.pad(uv, ((0, N - M), (0, 0))), jnp.float32),
            "xr": jnp.full((N,), -1.0, jnp.float32),
            "depth": jnp.zeros((N,), jnp.float32),
            "level": jnp.zeros((N,), jnp.int32),
            "angle": jnp.zeros((N,), jnp.float32),
            "desc": jnp.zeros((N, 8), jnp.uint32),
            "bearing": jnp.zeros((N, 3), jnp.float32),
            "valid": jnp.asarray(np.arange(N) < M),
        }
        # Perturb all but the anchor keyframe.
        if c == 0:
            P = np.concatenate([R, t[:, None]], 1)
        else:
            dphi = rng.normal(size=3) * perturb
            dR = np.asarray(lie.so3_exp(jnp.asarray(dphi[None], jnp.float32)))[0]
            P = np.concatenate([dR @ R, (t + rng.normal(size=3) * perturb)[:, None]], 1)
        lm_idx = jnp.asarray(
            np.where(np.arange(N) < M, np.arange(N), -1), jnp.int32
        )
        state = ms.add_keyframe(
            state, c, jnp.asarray(P, jnp.float32), float(c), feats, lm_idx
        )
    lm_init = pts + rng.normal(size=pts.shape) * perturb * 2
    state = state._replace(
        lm_pos=state.lm_pos.at[:M].set(jnp.asarray(lm_init, jnp.float32)),
        lm_valid=state.lm_valid.at[:M].set(True),
    )
    return cam, state, poses_gt, pts


def test_global_ba_converges(rng):
    cam, state, poses_gt, pts = _make_state(rng)
    table = np.ones(8, np.float32)
    state2 = global_ba.run_global_ba(cam, state, table, anchor_kf=0)
    est = np.asarray(state2.kf_pose)
    for c, (R, t) in enumerate(poses_gt):
        dR = est[c, :, :3] @ R.T
        ang = np.linalg.norm(
            np.asarray(lie.so3_log(jnp.asarray(dR[None], jnp.float32)))
        )
        assert ang < 5e-3, f"kf {c} rot err {ang}"
        # Scale-gauge freedom: compare direction of camera centers about the
        # anchor; absolute comparison with loose tolerance is fine with the
        # small perturbation used here.
        assert np.linalg.norm(est[c, :, 3] - t) < 0.05


def test_global_ba_matches_windowed_solver(rng):
    """On a problem small enough for both, the two solvers must agree."""
    cam, state, poses_gt, pts = _make_state(rng, K=5, M=100)
    table = np.ones(8, np.float32)

    # Pair-based global solver.
    state_g = global_ba.run_global_ba(cam, state, table, anchor_kf=0,
                                      num_iters=8)

    # Dense-window solver over the same problem.
    data = global_ba.prepare(state, table)
    K = 8
    prob = ba.BAProblem(
        cam_pose=state.kf_pose,
        cam_fixed=jnp.asarray(np.arange(K) == 0),
        cam_valid=state.kf_valid,
        lm_pos=state.lm_pos,
        lm_valid=state.lm_valid,
        obs_cam=data.obs_cam,
        obs_lm=data.obs_lm,
        obs_uv=data.obs_uv,
        obs_xr=data.obs_xr,
        obs_inv_sigma_sq=data.obs_info,
        obs_valid=jnp.arange(data.obs_cam.shape[0]) < data.num_obs,
    )
    res_w = ba.ba_solve(cam, prob, num_iters=8, cull_at_iters=())

    kf_valid = np.asarray(state.kf_valid)
    np.testing.assert_allclose(
        np.asarray(state_g.kf_pose)[kf_valid],
        np.asarray(res_w.cam_pose)[kf_valid],
        atol=5e-3,
    )


def test_global_ba_pcg_matches_dense(rng):
    """The matrix-free PCG Schur path (the large-K solver) must reach the
    same solution as the explicit pair-based dense-Schur solve."""
    cam, state, poses_gt, pts = _make_state(rng, K=6, M=120)
    table = np.ones(8, np.float32)
    data = global_ba.prepare(state, table)
    K = 8
    cam_fixed = jnp.asarray(np.arange(K) == 0)

    pose_d, lm_d = global_ba.solve(
        cam, state.kf_pose, state.kf_valid, cam_fixed,
        state.lm_pos, state.lm_valid, data, num_iters=8,
    )
    c1, c2, raw_of_comp = global_ba.prepare_chain_pairs(
        data, np.asarray(state.kf_valid)
    )
    pose_p, lm_p = global_ba.solve_pcg(
        cam, state.kf_pose, state.kf_valid, cam_fixed,
        state.lm_pos, state.lm_valid, data,
        jnp.asarray(c1, jnp.int32), jnp.asarray(c2, jnp.int32),
        jnp.asarray(raw_of_comp, jnp.int32), num_iters=8,
    )
    kf_valid = np.asarray(state.kf_valid)
    np.testing.assert_allclose(
        np.asarray(pose_p)[kf_valid], np.asarray(pose_d)[kf_valid],
        atol=5e-3,
    )
    M = len(pts)
    assert np.abs(np.asarray(lm_p)[:M] - np.asarray(lm_d)[:M]).max() < 2e-2


def test_global_ba_sharded_matches_single_device(rng):
    """run_global_ba with a device mesh (landmark-sharded distributed
    solve, one psum per iteration) must converge to the same solution as
    the single-device pair-based solve."""
    import jax
    from jax.sharding import Mesh

    cam, state, poses_gt, pts = _make_state(rng)
    table = np.ones(8, np.float32)
    single = global_ba.run_global_ba(cam, state, table, anchor_kf=0)
    mesh = Mesh(np.array(jax.devices()), ("lm",))
    assert int(np.prod(mesh.devices.shape)) == 8
    sharded = global_ba.run_global_ba(cam, state, table, anchor_kf=0,
                                      mesh=mesh)
    est_s = np.asarray(sharded.kf_pose)
    est_1 = np.asarray(single.kf_pose)
    K_valid = int(np.asarray(state.kf_valid).sum())
    for c, (R, t) in enumerate(poses_gt):
        dR = est_s[c, :, :3] @ R.T
        ang = np.linalg.norm(
            np.asarray(lie.so3_log(jnp.asarray(dR[None], jnp.float32)))
        )
        assert ang < 5e-3, f"kf {c} rot err {ang}"
        assert np.linalg.norm(est_s[c, :, 3] - t) < 0.05
    # Both optimizers land on (numerically) the same poses.
    assert np.abs(est_s[:K_valid] - est_1[:K_valid]).max() < 5e-3
    lm_s = np.asarray(sharded.lm_pos)
    lm_1 = np.asarray(single.lm_pos)
    M = len(pts)
    assert np.abs(lm_s[:M] - lm_1[:M]).max() < 2e-2
