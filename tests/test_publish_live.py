"""Live viewer server + tracker pause/terminate protocol.

The reference streams live maps to a browser through the socket publisher
(src/socket_publisher/, viewer/app.js) and exposes a pause/terminate
protocol on the system facade (system.h:112-192). These tests cover the
TPU-native counterparts: LiveViewerServer and System.pause_tracker/
request_terminate.
"""

import json
import urllib.request

import numpy as np
import pytest

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from structure_plp_slam_tpu.ops.orb import OrbParams
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene


def _camera():
    return Camera(
        name="synt",
        setup=CameraSetup.RGBD,
        model=CameraModel.PERSPECTIVE,
        cols=320,
        rows=240,
        fx=260.0,
        fy=260.0,
        cx=159.5,
        cy=119.5,
        fps=30.0,
        focal_x_baseline=26.0,
        depth_threshold=400.0,
        depthmap_factor=1.0,
    )


@pytest.mark.slow
def test_live_viewer_and_pause_protocol(rng):
    cam = _camera()
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=600, num_levels=4), raw={})
    frames, _ = synthetic_scene.make_sequence(rng, cam, num_frames=6)
    slam = System(cfg, max_keyframes=32, max_landmarks=8192)
    slam.startup()
    for img, depth, ts in frames[:4]:
        slam.feed_RGBD_frame(img, depth, ts)
    assert slam.tracking_state is TrackerState.TRACKING

    # Pause: frames fed while paused are discarded (system.cc pause
    # protocol), then tracking resumes seamlessly.
    n_before = slam.num_frames
    slam.pause_tracker()
    assert slam.tracker_is_paused()
    assert slam.feed_RGBD_frame(frames[4][0], frames[4][1], frames[4][2]) is None
    assert slam.num_frames == n_before
    slam.resume_tracker()
    out = slam.feed_RGBD_frame(frames[4][0], frames[4][1], frames[4][2])
    assert out is not None

    # Live viewer: the page and the JSON endpoint both serve.
    port = slam.start_live_viewer()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ).read().decode()
        assert "map.json" in page and "canvas" in page
        data = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/map.json", timeout=10
            ).read()
        )
        assert len(data["points"]) > 100
        assert len(data["frusta"]) == slam.num_keyframes
        assert "keyframes" in data["stats"]
        assert np.isfinite(np.asarray(data["center"], dtype=np.float64)).all()
    finally:
        slam.stop_live_viewer()

    # Terminate request: facade reports it and stops consuming frames.
    slam.request_terminate()
    assert slam.terminate_is_requested()
    assert slam.feed_RGBD_frame(frames[5][0], frames[5][1], frames[5][2]) is None
    slam.shutdown()


@pytest.mark.slow
def test_dense_rgbd_cloud(rng):
    """store_dense_cloud=True keeps strided per-keyframe RGB-D images and
    backprojects them under current poses (reference: the pangolin
    viewer's dense RGB-D cloud display, viewer.h:132-133)."""
    from tests.test_system_e2e import _camera, _orb
    from structure_plp_slam_tpu.camera import CameraSetup
    from structure_plp_slam_tpu.config import Config
    from structure_plp_slam_tpu.system import System
    from tests import synthetic_scene

    cam = _camera(CameraSetup.RGBD)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    frames, _ = synthetic_scene.make_sequence(rng, cam, num_frames=8)
    slam = System(cfg, max_keyframes=16, max_landmarks=4096,
                  max_kf_interval=2, store_dense_cloud=True)
    slam.startup()
    for img, depth, ts in frames:
        slam.feed_RGBD_frame(img, depth, ts)
    slam.shutdown()
    pts, gray = slam.get_map_publisher().get_dense_cloud()
    assert len(pts) > 1000, f"dense cloud too small: {len(pts)}"
    assert len(pts) == len(gray)
    # The scene is the two z-planes; backprojected points must lie there.
    z = pts[:, 2]
    on_planes = (np.abs(z - 6.0) < 0.35) | (np.abs(z - 3.5) < 0.35)
    assert on_planes.mean() > 0.9, f"dense cloud off-scene: {z.min()}..{z.max()}"
    # And the HTML payload merges it.
    from structure_plp_slam_tpu.publish import html_viewer

    data = html_viewer.map_data(slam.get_map_publisher())
    assert len(data["points"]) > 1000
