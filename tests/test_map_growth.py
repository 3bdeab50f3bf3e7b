"""Map capacity growth (data/map_database.grow + System auto_grow).

The reference's map grows unboundedly (map_database.h:59-270); here
capacities double just before an insertion would hit a cap. The system
test starts with deliberately tiny capacities so a short sequence forces
multiple growth events — a long run never hits an insertion wall."""

import numpy as np
import pytest

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import CameraSetup
from structure_plp_slam_tpu.data import map_database, map_state as ms
from structure_plp_slam_tpu.io import trajectory as traj_io
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene
from tests.test_system_e2e import _camera, _orb, _gt_list


def test_grow_preserves_contents():
    import jax.numpy as jnp

    st = ms.create(max_keyframes=4, max_kps=16, max_landmarks=32,
                   max_lines_per_kf=4, max_line_landmarks=8, max_planes=2)
    st = st._replace(
        kf_valid=st.kf_valid.at[1].set(True),
        kf_pose=st.kf_pose.at[1, 0, 3].set(7.0),
        lm_valid=st.lm_valid.at[5].set(True),
        lm_pos=st.lm_pos.at[5].set(jnp.array([1.0, 2.0, 3.0])),
        ln_valid=st.ln_valid.at[2].set(True),
        pl_valid=st.pl_valid.at[0].set(True),
    )
    g = map_database.grow(st, grow_kf=True, grow_lm=True, grow_ln=True,
                          grow_pl=True)
    assert g.kf_pose.shape[0] == 8 and g.lm_pos.shape[0] == 64
    assert g.ln_pluck.shape[0] == 16 and g.pl_coef.shape[0] == 4
    assert bool(g.kf_valid[1]) and float(g.kf_pose[1, 0, 3]) == 7.0
    assert np.allclose(np.asarray(g.lm_pos[5]), [1.0, 2.0, 3.0])
    assert bool(g.ln_valid[2]) and bool(g.pl_valid[0])
    # New slots are empty/invalid.
    assert not np.asarray(g.kf_valid[4:]).any()
    assert not np.asarray(g.lm_valid[32:]).any()
    assert (np.asarray(g.kf_lm_idx[4:]) == -1).all()


@pytest.mark.slow
def test_system_grows_past_tiny_capacities(rng):
    """KITTI-like forward motion with capacities far too small for the
    sequence: auto-growth must double keyframes AND landmarks mid-run, the
    insertion wall must never hit, and accuracy must be unaffected."""
    cam = _camera(CameraSetup.RGBD)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    tex = synthetic_scene.make_texture(rng, size=1536)
    frames, poses = [], []
    for i in range(30):
        C = np.array([0.35 * i, 0.0, 0.0])
        R = np.eye(3)
        t = -R @ C
        img, depth = synthetic_scene.render(cam, tex, R, t, plane_half=14.0)
        frames.append((img, depth, i / 30.0))
        poses.append((R, t))

    slam = System(cfg, max_keyframes=8, max_landmarks=4096,
                  max_kf_interval=2, enable_loop_closing=False)
    slam.startup()
    for img, depth, ts in frames:
        slam.feed_RGBD_frame(img, depth, ts)
    slam.shutdown()
    assert slam.tracking_state is TrackerState.TRACKING
    # Growth happened: the final capacities exceed the construction caps
    # and more keyframes exist than the initial cap could hold.
    assert slam.max_keyframes > 8
    assert slam.next_kf > 8, f"insertion wall hit at {slam.next_kf}"
    assert slam.max_landmarks > 4096
    est = slam.frame_trajectory()
    ate = traj_io.ate_rmse(est, _gt_list(poses), align_scale=False)
    assert ate < 0.12, f"ATE {ate}"
