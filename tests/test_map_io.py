"""Map snapshot save/load + localization-mode tests."""

import numpy as np
import pytest

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import CameraSetup
from structure_plp_slam_tpu.io import map_io
from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene
from tests.test_system_e2e import _camera, _orb


def test_snapshot_roundtrip(tmp_path):
    state = ms.create(8, 64, 256)
    state = state._replace(
        lm_valid=state.lm_valid.at[:5].set(True),
        kf_valid=state.kf_valid.at[:2].set(True),
        ln_valid=state.ln_valid.at[:3].set(True),
        pl_valid=state.pl_valid.at[:1].set(True),
    )
    p = str(tmp_path / "map.msg")
    map_io.save_map(p, state, next_kf=2, next_lm=5, next_line=3, next_plane=1,
                    camera_name="cam")
    state2, nkf, nlm = map_io.load_map(p)
    assert nkf == 2 and nlm == 5
    counters = map_io.load_counters(p)
    assert counters == {"next_kf": 2, "next_lm": 5, "next_line": 3,
                        "next_plane": 1}
    for name in state._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(state, name)), np.asarray(getattr(state2, name)),
            err_msg=name,
        )


def test_snapshot_counter_fallback(tmp_path):
    # Snapshots written without line/plane counters (or by callers that
    # don't track them) fall back to highest-valid-slot + 1 on load.
    state = ms.create(8, 64, 256)
    state = state._replace(
        ln_valid=state.ln_valid.at[4].set(True),
        pl_valid=state.pl_valid.at[2].set(True),
    )
    p = str(tmp_path / "map.msg")
    map_io.save_map(p, state, next_kf=0, next_lm=0)
    import msgpack

    with open(p, "rb") as f:
        doc = msgpack.unpackb(f.read(), raw=False)
    del doc["line_next_id"], doc["plane_next_id"]
    with open(p, "wb") as f:
        f.write(msgpack.packb(doc, use_bin_type=True))
    counters = map_io.load_counters(p)
    assert counters["next_line"] == 5 and counters["next_plane"] == 3


@pytest.mark.slow
def test_localization_from_saved_map(tmp_path, rng):
    cam = _camera(CameraSetup.RGBD)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    frames, poses = synthetic_scene.make_sequence(rng, cam, num_frames=10)

    # Build + save a map.
    slam = System(cfg, max_keyframes=32, max_landmarks=8192, max_kf_interval=2)
    slam.startup()
    for img, depth, ts in frames:
        slam.feed_RGBD_frame(img, depth, ts)
    slam.shutdown()
    p = str(tmp_path / "map.msg")
    slam.save_map_database(p)

    # Fresh system: load, localization mode, feed a mid-sequence frame.
    slam2 = System(cfg, max_keyframes=32, max_landmarks=8192)
    slam2.load_map_database(p)
    slam2.disable_mapping_module()
    slam2.startup(need_initialize=False)
    assert slam2.tracking_state is TrackerState.LOST
    img, depth, _ = frames[5]
    out = slam2.feed_RGBD_frame(img, depth, 99.0)
    assert out is not None
    assert slam2.tracking_state is TrackerState.TRACKING
    R_gt, t_gt = poses[5]
    C_est = -out[:, :3].T @ out[:, 3]
    C_gt = -R_gt.T @ t_gt
    assert np.linalg.norm(C_est - C_gt) < 0.08
    # Mapping disabled: no new keyframes were created.
    assert slam2.num_keyframes == slam.num_keyframes