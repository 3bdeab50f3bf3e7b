"""System-level stereo SLAM test on rendered left/right pairs."""

import numpy as np
import pytest

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from structure_plp_slam_tpu.io import trajectory as traj_io
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene
from tests.test_system_e2e import _gt_list, _orb


def _stereo_cam(baseline=0.1):
    fx = 260.0
    return Camera(
        name="stereo",
        setup=CameraSetup.STEREO,
        model=CameraModel.PERSPECTIVE,
        cols=320,
        rows=240,
        fx=fx,
        fy=260.0,
        cx=159.5,
        cy=119.5,
        fps=30.0,
        focal_x_baseline=fx * baseline,
        depth_threshold=400.0,
    )


@pytest.mark.slow
def test_stereo_sequence_ate(rng):
    cam = _stereo_cam()
    cfg = Config(camera=cam, orb=_orb(), raw={})
    tex = synthetic_scene.make_texture(rng)
    poses = synthetic_scene.trajectory(12, step=0.06)
    slam = System(cfg, max_keyframes=32, max_landmarks=8192, max_kf_interval=2)
    slam.startup()
    for i, (R, t) in enumerate(poses):
        imgL, _ = synthetic_scene.render(cam, tex, R, t)
        # Right camera center sits at C_l + R^T [b, 0, 0]; in world->cam
        # form that is t_r = t_l - [b, 0, 0].
        imgR, _ = synthetic_scene.render(
            cam, tex, R, t - np.array([cam.baseline, 0.0, 0.0])
        )
        slam.feed_stereo_frame(imgL, imgR, float(i) / 30.0)
    slam.shutdown()
    assert slam.tracking_state is TrackerState.TRACKING
    est = slam.frame_trajectory()
    ate = traj_io.ate_rmse(est, _gt_list(poses), align_scale=False)
    # Stereo is metric; allow a few cm on the ~0.7 m trajectory.
    assert ate < 0.06, f"ATE {ate}"
    assert slam.num_landmarks > 200
