"""End-to-end equirectangular (360°) monocular SLAM on a synthetic cube
room: bearings-on-sphere init (essential only), wrap-aware projection
matching, equirectangular reprojection Jacobians in pose opt + BA.

Mirrors the reference's equirectangular support (initialize/
bearing_vector.cc, camera/equirectangular.cc, the equirectangular g2o
edges) as a camera-model dispatch through the same batched pipeline.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from structure_plp_slam_tpu.camera import base as cam_base
from structure_plp_slam_tpu.camera import equirectangular as eq
from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.io import trajectory as traj_io
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene
from tests.test_system_e2e import _gt_list, _orb


def _equirect_cam(cols=512, rows=256):
    return Camera(
        name="equirect",
        setup=CameraSetup.MONOCULAR,
        model=CameraModel.EQUIRECTANGULAR,
        cols=cols,
        rows=rows,
        fps=30.0,
    )


def test_project_bearing_roundtrip():
    cam = _equirect_cam()
    rng = np.random.default_rng(3)
    pc = rng.normal(size=(256, 3)).astype(np.float32) * 4.0
    uv, rng_norm = eq.project(cam, jnp.asarray(pc))
    b = eq.bearings(cam, uv)
    np.testing.assert_allclose(
        np.asarray(b) * np.asarray(rng_norm)[:, None], pc, atol=2e-3
    )


def test_project_jacobian_matches_finite_difference():
    cam = _equirect_cam()
    rng = np.random.default_rng(4)
    pc = rng.normal(size=(64, 3)).astype(np.float64) * 3.0
    pc = pc[np.abs(pc[:, 0] ** 2 + pc[:, 2] ** 2) > 0.5]  # away from poles
    J = np.asarray(eq.project_jacobian(cam, jnp.asarray(pc, jnp.float32)))
    eps = 1e-3
    for k in range(3):
        dp = np.zeros(3)
        dp[k] = eps
        up, _ = eq.project(cam, jnp.asarray(pc + dp, jnp.float32))
        um, _ = eq.project(cam, jnp.asarray(pc - dp, jnp.float32))
        fd = np.asarray(
            cam_base.uv_residual(cam, up, um)
        ) / (2 * eps)
        np.testing.assert_allclose(J[:, :, k], fd, atol=0.1)


def test_uv_residual_wraps_horizontally():
    cam = _equirect_cam()
    pred = jnp.asarray([[2.0, 50.0]], jnp.float32)
    obs = jnp.asarray([[510.0, 50.0]], jnp.float32)
    r = np.asarray(cam_base.uv_residual(cam, pred, obs))
    assert abs(r[0, 0] - 4.0) < 1e-4  # 2 - 510 wraps to +4, not -508
    assert abs(r[0, 1]) < 1e-6


@pytest.mark.slow
def test_equirect_mono_sequence_ate(rng):
    cam = _equirect_cam()
    cfg = Config(camera=cam, orb=_orb(), raw={})
    tex = synthetic_scene.make_texture(rng)
    poses = synthetic_scene.trajectory(14, step=0.09)
    slam = System(cfg, max_keyframes=32, max_landmarks=8192, max_kf_interval=3)
    slam.startup()
    for i, (R, t) in enumerate(poses):
        img, _ = synthetic_scene.render_equirect(cam, tex, R, t)
        slam.feed_monocular_frame(img, float(i) / 30.0)
    slam.shutdown()
    assert slam.tracking_state is TrackerState.TRACKING
    est = slam.frame_trajectory()
    assert len(est) >= 9
    ate = traj_io.ate_rmse(est, _gt_list(poses), align_scale=True)
    # Mono: Sim3-aligned ATE (scale free). Trajectory is ~1.2 m inside a
    # 12 m room.
    assert ate < 0.10, f"ATE {ate}"
