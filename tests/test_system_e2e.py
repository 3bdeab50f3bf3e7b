"""End-to-end system tests on a rendered synthetic sequence.

The reference has no system-level tests (SURVEY.md §4); these fill that gap
with ATE regression against exact ground truth, replacing the manual
evo_ape protocol.
"""

import numpy as np
import pytest

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from structure_plp_slam_tpu.io import trajectory as traj_io
from structure_plp_slam_tpu.ops.orb import OrbParams
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene


def _camera(setup):
    return Camera(
        name="synt",
        setup=setup,
        model=CameraModel.PERSPECTIVE,
        cols=320,
        rows=240,
        fx=260.0,
        fy=260.0,
        cx=159.5,
        cy=119.5,
        fps=30.0,
        focal_x_baseline=26.0 if setup is CameraSetup.RGBD else 0.0,
        depth_threshold=400.0,
        depthmap_factor=1.0,
    )


def _orb():
    return OrbParams(max_num_keypts=600, num_levels=4)


def _gt_list(poses):
    return [
        (float(i) / 30.0, np.concatenate([R, t[:, None]], 1).astype(np.float64))
        for i, (R, t) in enumerate(poses)
    ]


@pytest.mark.slow
def test_rgbd_sequence_ate(rng):
    cam = _camera(CameraSetup.RGBD)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    frames, poses = synthetic_scene.make_sequence(rng, cam, num_frames=16)
    slam = System(cfg, max_keyframes=32, max_landmarks=8192)
    slam.startup()
    tracked = 0
    for img, depth, ts in frames:
        out = slam.feed_RGBD_frame(img, depth, ts)
        if out is not None:
            tracked += 1
    slam.shutdown()
    assert slam.tracking_state is TrackerState.TRACKING
    assert tracked >= len(frames) - 1
    est = slam.frame_trajectory()
    ate = traj_io.ate_rmse(est, _gt_list(poses), align_scale=False)
    # RGB-D has metric scale; a few cm on a ~1 m trajectory.
    assert ate < 0.05, f"ATE {ate}"
    assert slam.num_keyframes >= 2
    assert slam.num_landmarks > 200


@pytest.mark.slow
def test_mono_sequence_ate(rng):
    cam = _camera(CameraSetup.MONOCULAR)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    frames, poses = synthetic_scene.make_sequence(rng, cam, num_frames=16, step=0.08)
    slam = System(cfg, max_keyframes=32, max_landmarks=8192, max_kf_interval=3)
    slam.startup()
    for img, depth, ts in frames:
        slam.feed_monocular_frame(img, ts)
    slam.shutdown()
    assert slam.tracking_state is TrackerState.TRACKING
    est = slam.frame_trajectory()
    assert len(est) >= 10
    ate = traj_io.ate_rmse(est, _gt_list(poses), align_scale=True)
    # Mono: Sim3-aligned ATE (scale free).
    assert ate < 0.08, f"ATE {ate}"


def test_trajectory_io_roundtrip(tmp_path, rng):
    poses = synthetic_scene.trajectory(10)
    est = _gt_list(poses)
    p = str(tmp_path / "traj.txt")
    traj_io.save_tum(p, est)
    loaded = traj_io.load_tum(p)
    assert len(loaded) == 10
    for (t0, P0), (t1, P1) in zip(est, loaded):
        assert abs(t0 - t1) < 1e-6
        np.testing.assert_allclose(P0, P1, atol=1e-6)
    # Self-ATE must vanish.
    assert traj_io.ate_rmse(loaded, est, align_scale=False) < 1e-6
