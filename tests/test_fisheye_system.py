"""System-level fisheye (Kannala-Brandt) RGB-D test: the frontend must
undistort keypoints through the fisheye model before all downstream
pinhole-on-undistorted-coords math."""

import numpy as np
import pytest

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from structure_plp_slam_tpu.io import trajectory as traj_io
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene
from tests.test_system_e2e import _gt_list, _orb


def _fisheye_cam():
    return Camera(
        name="fisheye",
        setup=CameraSetup.RGBD,
        model=CameraModel.FISHEYE,
        cols=320,
        rows=240,
        fx=240.0,
        fy=240.0,
        cx=159.5,
        cy=119.5,
        fps=30.0,
        k1=-0.05,
        k2=0.01,
        k3=-0.003,
        k4=0.001,
        focal_x_baseline=24.0,
        depth_threshold=400.0,
    )


@pytest.mark.slow
def test_fisheye_rgbd_sequence_ate(rng):
    cam = _fisheye_cam()
    cfg = Config(camera=cam, orb=_orb(), raw={})
    tex = synthetic_scene.make_texture(rng)
    poses = synthetic_scene.trajectory(10, step=0.05)
    slam = System(cfg, max_keyframes=32, max_landmarks=8192, max_kf_interval=2)
    slam.startup()
    for i, (R, t) in enumerate(poses):
        img, depth = synthetic_scene.render_fisheye(cam, tex, R, t)
        slam.feed_RGBD_frame(img, depth, float(i) / 30.0)
    slam.shutdown()
    assert slam.tracking_state is TrackerState.TRACKING
    est = slam.frame_trajectory()
    assert len(est) >= 8
    ate = traj_io.ate_rmse(est, _gt_list(poses), align_scale=False)
    assert ate < 0.06, f"ATE {ate}"
