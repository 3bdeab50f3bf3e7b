"""System-level stereo point+line SLAM test (reference: the stereo line
drivers, example/run_kitti_slam_with_line.cc:191-233 and
run_euroc_slam_with_line.cc:198-262 — stereo frame constructors with the
line extractor enabled, data/frame.h:87-164)."""

import numpy as np
import pytest

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import CameraSetup
from structure_plp_slam_tpu.io import trajectory as traj_io
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene
from tests.test_system_e2e import _gt_list, _orb
from tests.test_stereo_system import _stereo_cam


@pytest.mark.slow
def test_stereo_point_line_slam(rng):
    """Stereo + lines must run end-to-end (round-2 gap: the stereo frontend
    had no line path and with_lines=True crashed on missing feats['seg'])."""
    cam = _stereo_cam()
    cfg = Config(camera=cam, orb=_orb(), raw={})
    tex = synthetic_scene.make_texture(rng, grid=True)
    poses = synthetic_scene.trajectory(12, step=0.06)
    slam = System(cfg, max_keyframes=32, max_landmarks=8192,
                  max_kf_interval=2, with_lines=True)
    slam.startup()
    for i, (R, t) in enumerate(poses):
        imgL, _ = synthetic_scene.render(cam, tex, R, t)
        imgR, _ = synthetic_scene.render(
            cam, tex, R, t - np.array([cam.baseline, 0.0, 0.0])
        )
        slam.feed_stereo_frame(imgL, imgR, float(i) / 30.0)
    slam.shutdown()
    assert slam.tracking_state is TrackerState.TRACKING

    # 3D lines must exist (disparity-seeded + two-view) and lie near the
    # scene planes (z=6 background / z=3.5 foreground).
    assert int(np.asarray(slam.next_line)) >= 4, (
        f"only {slam.next_line} lines created"
    )
    ln_valid = np.asarray(slam.state.ln_valid)
    assert ln_valid.sum() >= 4, f"only {ln_valid.sum()} lines alive"
    eps = np.asarray(slam.state.ln_endpoints)[ln_valid]
    z = np.concatenate([eps[:, 2], eps[:, 5]])
    near_plane = (np.abs(z - 6.0) < 0.5) | (np.abs(z - 3.5) < 0.5)
    assert near_plane.mean() > 0.6, f"line endpoints off-plane: {z}"

    est = slam.frame_trajectory()
    ate = traj_io.ate_rmse(est, _gt_list(poses), align_scale=False)
    assert ate < 0.06, f"ATE {ate}"
    assert slam.num_landmarks > 200
