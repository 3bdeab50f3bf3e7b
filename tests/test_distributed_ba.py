"""Distributed Schur BA on a virtual 8-device CPU mesh.

Checks that the sharded solver matches the single-device solver's result
(same problem, same damping) and that the psum-reduced camera system is
exact, substituting for multi-host testing (SURVEY.md §4 note).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from structure_plp_slam_tpu.models import bundle_adjustment as ba
from structure_plp_slam_tpu.parallel import distributed_ba as dba
from tests.test_bundle_adjustment import _make_problem, _pose_errors


@pytest.fixture
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    return Mesh(np.array(devs[:8]), ("lm",))


def test_sharded_matches_single_device(rng, mesh8):
    cam, prob, poses, pts = _make_problem(rng, C=5, M=96, noise=0.3)
    ref = ba.ba_solve(cam, prob, num_iters=8, cull_at_iters=())

    sp = dba.shard_problem(prob, 8)
    run = dba.make_distributed_ba(mesh8, cam, num_iters=8)
    cam_pose, lm_pos_sharded = run(sp)

    # Poses must match the single-device solve closely. Tolerance reflects
    # f32 reduction-order differences (psum partial sums) amplified over 8
    # damped-GN iterations on a noisy problem.
    np.testing.assert_allclose(
        np.asarray(cam_pose), np.asarray(ref.cam_pose), atol=5e-3
    )

    # Landmarks: un-shard (block-cyclic layout) and compare where valid.
    M = prob.lm_pos.shape[0]
    n = 8
    M_shard = -(-M // n)
    lm = np.asarray(lm_pos_sharded).reshape(n, M_shard, 3)
    owner = np.arange(M) % n
    local = np.arange(M) // n
    lm_unshard = lm[owner, local]
    np.testing.assert_allclose(
        lm_unshard, np.asarray(ref.lm_pos), atol=2e-2
    )


@pytest.mark.parametrize("model", ["fisheye", "equirectangular"])
def test_sharded_camera_model_dispatch(rng, mesh8, model):
    """Non-perspective maps on a mesh must solve with their TRUE camera
    model — the round-2 review found the shard body hardcoded the pinhole
    projection, silently mis-optimizing fisheye/equirectangular maps
    (distributed_ba now dispatches through camera.base like the
    single-device solver)."""
    from structure_plp_slam_tpu.camera import CameraModel
    from structure_plp_slam_tpu.camera import base as cam_base
    from structure_plp_slam_tpu.ops import lie as _lie
    from tests.helpers import create_random_landmarks, make_camera

    if model == "fisheye":
        cam = make_camera(model=CameraModel.FISHEYE, k1=0.05, k2=-0.01)
        z_range = (5.0, 10.0)
    else:
        cam = make_camera(
            model=CameraModel.EQUIRECTANGULAR, cols=1024, rows=512,
            fx=0.0, fy=0.0, cx=0.0, cy=0.0,
        )
        z_range = (4.0, 9.0)
    C, M = 5, 96
    pts = create_random_landmarks(rng, M, space=6.0, z_range=z_range)
    poses = []
    for c in range(C):
        phi = rng.normal(size=3) * 0.02
        R = np.asarray(_lie.so3_exp(jnp.asarray(phi[None], jnp.float32)))[0]
        t = np.array([0.25 * (c - C / 2), 0.02 * c, 0.0]) + \
            rng.normal(size=3) * 0.01
        poses.append((R, t))

    obs_cam, obs_lm, obs_uv = [], [], []
    for c, (R, t) in enumerate(poses):
        pc = pts @ R.T + t
        uv = np.asarray(cam_base.project(cam, jnp.asarray(pc, jnp.float32))[0])
        for m in range(M):
            obs_cam.append(c)
            obs_lm.append(m)
            obs_uv.append(uv[m])

    # Perturb all but the anchor.
    pose_arr = []
    for c, (R, t) in enumerate(poses):
        if c == 0:
            pose_arr.append(np.concatenate([R, t[:, None]], 1))
        else:
            dphi = rng.normal(size=3) * 0.015
            dR = np.asarray(_lie.so3_exp(jnp.asarray(dphi[None], jnp.float32)))[0]
            pose_arr.append(np.concatenate(
                [dR @ R, (t + rng.normal(size=3) * 0.015)[:, None]], 1
            ))
    lm_init = pts + rng.normal(size=pts.shape) * 0.03

    prob = ba.BAProblem(
        cam_pose=jnp.asarray(np.stack(pose_arr), jnp.float32),
        cam_fixed=jnp.asarray(np.arange(C) == 0),
        cam_valid=jnp.ones((C,), bool),
        lm_pos=jnp.asarray(lm_init, jnp.float32),
        lm_valid=jnp.ones((M,), bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_lm=jnp.asarray(obs_lm, jnp.int32),
        obs_uv=jnp.asarray(np.stack(obs_uv), jnp.float32),
        obs_xr=jnp.full((len(obs_cam),), -1.0, jnp.float32),
        obs_inv_sigma_sq=jnp.ones((len(obs_cam),), jnp.float32),
        obs_valid=jnp.ones((len(obs_cam),), bool),
    )
    ref = ba.ba_solve(cam, prob, num_iters=8, cull_at_iters=())
    sp = dba.shard_problem(prob, 8)
    run = dba.make_distributed_ba(mesh8, cam, num_iters=8)
    cam_pose, lm_pos_sharded = run(sp)
    # The mesh solve must agree with the single-device solve AND recover
    # the ground-truth poses (it would not with pinhole math).
    np.testing.assert_allclose(
        np.asarray(cam_pose), np.asarray(ref.cam_pose), atol=5e-3
    )
    for c, (R, t) in enumerate(poses):
        est = np.asarray(cam_pose)[c]
        dR = est[:, :3] @ R.T
        ang = np.linalg.norm(
            np.asarray(_lie.so3_log(jnp.asarray(dR[None], jnp.float32)))
        )
        assert ang < 2e-3, f"{model} kf {c} rot err {ang}"


def test_sharded_converges(rng, mesh8):
    cam, prob, poses, pts = _make_problem(rng, C=5, M=96, noise=0.0, perturb=0.02)
    sp = dba.shard_problem(prob, 8)
    run = dba.make_distributed_ba(mesh8, cam, num_iters=10)
    cam_pose, _ = run(sp)

    class R:
        pass

    r = R()
    r.cam_pose = cam_pose
    errs_R, errs_t = _pose_errors(r, poses)
    assert errs_R.max() < 1e-3


@pytest.mark.slow
def test_sharded_pcg_matches_single_device_large_k(rng, mesh8):
    """Past K = 512 the mesh path must route through the MATRIX-FREE
    distributed PCG (round-3 verdict missing #6: the dense per-device
    [C,C,6,6] assembly re-erected the scale ceiling). Equality-check the
    sharded PCG against the single-device PCG on a K=1024 chain map."""
    import jax.numpy as jnp

    from structure_plp_slam_tpu.models import global_ba
    from tests.test_large_map_loop import _build_large_map

    # Small per-keyframe density: 8 emulated devices time-share 2 host
    # cores, and XLA:CPU's collective rendezvous aborts if thread skew
    # between psums exceeds 40 s — the K-scale (1024 > 512, the PCG
    # route) is what's under test, not observation volume.
    cam, state, _C_gt = _build_large_map(rng, K=1024, lm_per_kf=8, N=32)
    table = np.ones(8, np.float32)

    ref = global_ba.run_global_ba(cam, state, table, anchor_kf=0,
                                  num_iters=2)
    out = global_ba.run_global_ba(cam, state, table, anchor_kf=0,
                                  num_iters=2, mesh=mesh8)

    kf_valid = np.asarray(state.kf_valid)
    np.testing.assert_allclose(
        np.asarray(out.kf_pose)[kf_valid],
        np.asarray(ref.kf_pose)[kf_valid],
        atol=5e-3,
    )
    lm_valid = np.asarray(state.lm_valid)
    np.testing.assert_allclose(
        np.asarray(out.lm_pos)[lm_valid],
        np.asarray(ref.lm_pos)[lm_valid],
        atol=2e-2,
    )
