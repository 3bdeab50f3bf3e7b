"""The keyframe chain maintains the [K, L] observation indicator
INCREMENTALLY (data/map_state.indicator_update_rows) — row patches +
validity-mask multiplies instead of four full scatter rebuilds per
keyframe. The cached indicator seeds the next frame's tracking, so any
divergence from the ground-truth rebuild silently corrupts matching:
this test drives full systems (RGB-D with planes, and with lines) and
asserts the cache equals observation_indicator(state) after every
keyframe burst."""

import numpy as np

from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.ops.orb import OrbParams


def make_camera_cfg():
    cam = Camera(
        name="synt", setup=CameraSetup.RGBD, model=CameraModel.PERSPECTIVE,
        cols=320, rows=240, fx=260.0, fy=260.0, cx=159.5, cy=119.5,
        fps=30.0, focal_x_baseline=26.0, depth_threshold=400.0,
        depthmap_factor=1.0,
    )
    return Config(camera=cam, orb=OrbParams(max_num_keypts=600, num_levels=4),
                  raw={})


def _check(slam):
    if slam._ind_cache is None:
        return
    full = np.asarray(ms.observation_indicator(slam.state))
    inc = np.asarray(slam._ind_cache)
    mism = np.argwhere(full != inc)
    assert mism.size == 0, (
        f"incremental indicator diverged at {mism[:10]} "
        f"(full={full[tuple(mism[0])]}, inc={inc[tuple(mism[0])]})"
    )


def test_incremental_indicator_matches_rebuild_planes(rng):
    from structure_plp_slam_tpu.system import System
    from tests import synthetic_scene as sc

    cfg = make_camera_cfg()
    slam = System(cfg, max_keyframes=32, max_landmarks=4096)
    slam.startup()
    tex = sc.make_texture(rng)
    poses = sc.trajectory(30, step=0.06)
    cam = cfg.camera
    for i, (R, t) in enumerate(poses):
        img, depth = sc.render(cam, tex, R, t)
        seg = np.where(depth < 4.5, 1, 2).astype(np.int32)
        slam.feed_RGBD_frame(
            np.clip(img, 0, 255).astype(np.float32),
            depth.astype(np.float32) * cam.depthmap_factor,
            i / 30.0, seg_mask=seg,
        )
        if i % 5 == 4:
            slam._drain_pending()
            _check(slam)
    slam._drain_pending()
    _check(slam)
    slam.shutdown()


def test_incremental_indicator_matches_rebuild_lines(rng):
    from structure_plp_slam_tpu.system import System
    from tests import synthetic_scene as sc

    cfg = make_camera_cfg()
    slam = System(cfg, max_keyframes=32, max_landmarks=4096,
                  with_lines=True)
    slam.startup()
    tex = sc.make_texture(rng, grid=True)
    poses = sc.trajectory(24, step=0.06)
    cam = cfg.camera
    for i, (R, t) in enumerate(poses):
        img, depth = sc.render(cam, tex, R, t)
        slam.feed_RGBD_frame(
            np.clip(img, 0, 255).astype(np.float32),
            depth.astype(np.float32) * cam.depthmap_factor,
            i / 30.0,
        )
        if i % 6 == 5:
            slam._drain_pending()
            _check(slam)
    slam._drain_pending()
    _check(slam)
    slam.shutdown()
