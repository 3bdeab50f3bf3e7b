"""System-level point+line SLAM test on a grid-textured scene."""

import numpy as np
import pytest

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import CameraSetup
from structure_plp_slam_tpu.io import trajectory as traj_io
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene
from tests.test_system_e2e import _camera, _orb, _gt_list


def _grid_sequence(rng, cam, num_frames=12, step=0.06):
    tex = synthetic_scene.make_texture(rng, grid=True)
    poses = synthetic_scene.trajectory(num_frames, step=step)
    frames = []
    for i, (R, t) in enumerate(poses):
        img, depth = synthetic_scene.render(cam, tex, R, t)
        frames.append((img, depth, float(i) / 30.0))
    return frames, poses


@pytest.mark.slow
def test_rgbd_point_line_slam(rng):
    cam = _camera(CameraSetup.RGBD)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    frames, poses = _grid_sequence(rng, cam)
    slam = System(cfg, max_keyframes=32, max_landmarks=8192,
                  max_kf_interval=2, with_lines=True)
    slam.startup()
    for img, depth, ts in frames:
        slam.feed_RGBD_frame(img, depth, ts)
    slam.shutdown()
    assert slam.tracking_state is TrackerState.TRACKING

    # 3D lines must exist and lie near the scene planes (z=6 bg / z=3.5 fg).
    assert slam.next_line >= 4, f"only {slam.next_line} lines triangulated"
    ln_valid = np.asarray(slam.state.ln_valid)
    eps = np.asarray(slam.state.ln_endpoints)[ln_valid]
    z = np.concatenate([eps[:, 2], eps[:, 5]])
    near_plane = (np.abs(z - 6.0) < 0.4) | (np.abs(z - 3.5) < 0.4)
    assert near_plane.mean() > 0.6, f"line endpoints off-plane: {z}"

    est = slam.frame_trajectory()
    ate = traj_io.ate_rmse(est, _gt_list(poses), align_scale=False)
    assert ate < 0.06, f"ATE {ate}"


@pytest.mark.slow
def test_mono_point_line_slam(rng):
    """Monocular point+line SLAM: lines must come from two-view
    triangulation (plane-intersection path, two_view_triangulator_line.cc)
    — there is no depth to seed them."""
    cam = _camera(CameraSetup.MONOCULAR)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    frames, poses = _grid_sequence(rng, cam, num_frames=16, step=0.08)
    slam = System(cfg, max_keyframes=32, max_landmarks=8192,
                  max_kf_interval=3, with_lines=True)
    slam.startup()
    for img, _, ts in frames:
        slam.feed_monocular_frame(img, ts)
    slam.shutdown()
    assert slam.tracking_state is TrackerState.TRACKING

    est = slam.frame_trajectory()
    ate = traj_io.ate_rmse(est, _gt_list(poses), align_scale=True)
    assert ate < 0.08, f"ATE {ate}"

    # Monocular 3D lines (point-anchored creation) must exist and lie near
    # the scene planes after Sim3-aligning the map to ground truth.
    assert slam.next_line >= 3, f"only {slam.next_line} lines created"
    gt = _gt_list(poses)
    gt_C = np.stack([-p[:, :3].T @ p[:, 3] for _, p in gt])
    est_C = np.stack([-p[:, :3].T @ p[:, 3] for _, p in est])
    n = min(len(gt_C), len(est_C))
    A, B = est_C[:n], gt_C[:n]
    mA, mB = A.mean(0), B.mean(0)
    U, D, Vt = np.linalg.svd((B - mB).T @ (A - mA) / n)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R_al = U @ S @ Vt
    s_al = np.trace(np.diag(D) @ S) / ((A - mA) ** 2).mean(0).sum()
    t_al = mB - s_al * R_al @ mA
    ln_valid = np.asarray(slam.state.ln_valid)
    eps = np.asarray(slam.state.ln_endpoints)[ln_valid]
    pts = np.concatenate([eps[:, :3], eps[:, 3:]])
    z = (s_al * (R_al @ pts.T)).T[:, 2] + t_al[2]
    near_plane = (np.abs(z - 6.0) < 0.5) | (np.abs(z - 3.5) < 0.5)
    assert near_plane.mean() > 0.6, f"line endpoints off-plane: {z}"
