"""Initial line and plane landmarks created AT initialization (reference:
initializer.cc:299-302 triangulate_line_with_two_keyframes and
initializer.cc:322-333 initialize_map_with_plane on both init keyframes —
round-2 gap: _initialize dropped seg masks and created no lines)."""

import numpy as np
import pytest

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import CameraSetup
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene
from tests.test_system_e2e import _camera, _orb


def _seg_from_depth(depth):
    return np.where(depth < 4.5, 1, 2).astype(np.int32)


@pytest.mark.slow
def test_rgbd_init_creates_planes_and_lines(rng):
    cam = _camera(CameraSetup.RGBD)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    tex = synthetic_scene.make_texture(rng, grid=True)
    poses = synthetic_scene.trajectory(2, step=0.06)
    R, t = poses[0]
    img, depth = synthetic_scene.render(cam, tex, R, t)
    slam = System(cfg, max_keyframes=16, max_landmarks=8192, with_lines=True)
    slam.startup()
    slam.feed_RGBD_frame(img, depth, 0.0, seg_mask=_seg_from_depth(depth))
    # One frame = depth-instant init: planes from the seg mask and lines
    # from the depth map must exist IMMEDIATELY.
    assert slam.tracking_state is TrackerState.TRACKING
    m = slam.metrics()
    assert m["planes"] >= 1, f"no init planes: {m}"
    assert m["lines"] >= 1, f"no init lines: {m}"
    slam.shutdown()


@pytest.mark.slow
def test_mono_init_creates_planes_and_lines(rng):
    cam = _camera(CameraSetup.MONOCULAR)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    tex = synthetic_scene.make_texture(rng, grid=True)
    poses = synthetic_scene.trajectory(8, step=0.08)
    slam = System(cfg, max_keyframes=16, max_landmarks=8192, with_lines=True)
    slam.startup()
    for i, (R, t) in enumerate(poses):
        img, depth = synthetic_scene.render(cam, tex, R, t)
        slam.feed_monocular_frame(
            img, float(i) / 30.0, seg_mask=_seg_from_depth(depth)
        )
        if slam.tracking_state is TrackerState.TRACKING:
            break
    assert slam.tracking_state is TrackerState.TRACKING, "init failed"
    # Planes fitted on the init keyframes' seg masks and point-anchored
    # lines must exist right after initialization succeeds (no keyframe
    # insertion has run yet for the init pair beyond the init itself).
    m = slam.metrics()
    assert m["planes"] >= 1, f"no init planes: {m}"
    assert m["lines"] >= 1, f"no init lines: {m}"
    slam.shutdown()
