"""Loop-closure asynchrony: a firing loop must never stall the feed
(reference: global_optimization_module.cc:90-296 runs detection,
validation, correction and the pose graph on the loop THREAD; here they
advance as bounded per-frame phases — System._advance_pending_fix).

Two assertions:
* STRUCTURAL: the validate and correct phases execute on DIFFERENT fed
  frames (the fix machine actually spreads the work), and the map
  correction lands while feeding continues.
* LATENCY: no single feed call during the loop window exceeds a generous
  multiple of the run's median feed time (catches a regression that
  re-inlines a blocking solve; absolute CPU times are too flaky to gate).
"""

import time

import numpy as np
import pytest

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from structure_plp_slam_tpu.ops.orb import OrbParams
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene
from tests.test_loop_system import _out_and_back


def _camera():
    return Camera(
        name="synt", setup=CameraSetup.RGBD, model=CameraModel.PERSPECTIVE,
        cols=320, rows=240, fx=260.0, fy=260.0, cx=159.5, cy=119.5,
        fps=30.0, focal_x_baseline=26.0, depth_threshold=400.0,
        depthmap_factor=1.0,
    )


@pytest.mark.slow
def test_loop_fix_phases_spread_across_frames(rng):
    import jax.numpy as jnp
    from structure_plp_slam_tpu.ops import lie

    cam = _camera()
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=600, num_levels=4),
                 raw={})
    frames, poses = _out_and_back(
        rng, cam, out_frames=24, step=0.4, plane_half=14.0, tex_size=1536
    )
    n_out = len(frames) // 2
    slam = System(cfg, max_keyframes=64, max_landmarks=24576,
                  max_kf_interval=2)
    slam.startup()
    for img, depth, ts in frames[:n_out]:
        slam.feed_RGBD_frame(img, depth, ts)
    assert slam.tracking_state is TrackerState.TRACKING
    kf_cut = slam.next_kf // 2

    # Drift surgery (test_loop_system's protocol).
    T_R = np.array(lie.so3_exp(jnp.asarray(
        np.array([[0.0, 0.05, 0.0]]), jnp.float32)))[0]
    T_t = np.array([0.9, 0.0, 0.3], np.float32)
    st = slam.state
    K = st.kf_pose.shape[0]
    kf_sel = (np.arange(K) >= kf_cut) & np.array(st.kf_valid)
    pose = np.array(st.kf_pose)
    for k in np.where(kf_sel)[0]:
        R, t = pose[k, :, :3], pose[k, :, 3]
        pose[k, :, :3] = R @ T_R.T
        pose[k, :, 3] = R @ (-T_R.T @ T_t) + t
    lm_sel = (np.array(st.lm_ref_kf) >= kf_cut) & np.array(st.lm_valid)
    lm = np.array(st.lm_pos)
    lm[lm_sel] = lm[lm_sel] @ T_R.T + T_t
    slam.state = st._replace(kf_pose=jnp.asarray(pose),
                             lm_pos=jnp.asarray(lm))
    Rp, tp = slam.pose
    slam.pose = (Rp @ jnp.asarray(T_R.T), Rp @ jnp.asarray(-T_R.T @ T_t) + tp)

    # Instrument the phase machine: record which frame index ran which
    # phase.
    phase_frames = []
    orig_advance = slam._advance_pending_fix

    def spy():
        f = slam._pending_fix
        if f is not None:
            phase_frames.append((len(feed_times), f["phase"]))
        orig_advance()

    slam._advance_pending_fix = spy

    feed_times = []
    for img, depth, ts in frames[n_out:]:
        t0 = time.perf_counter()
        slam.feed_RGBD_frame(img, depth, ts)
        feed_times.append(time.perf_counter() - t0)
    slam._drain_pending()
    m = slam.metrics()
    slam.shutdown()
    assert m["loops_closed"] >= 1, f"no organic loop closure fired: {m}"

    # STRUCTURAL: at least two phases ran, on different fed frames.
    ran = [(i, p) for i, p in phase_frames]
    assert ran, "loop fix never advanced during the feed"
    frames_used = {i for i, _ in ran}
    phases_used = {p for _, p in ran}
    assert "validate" in phases_used and "correct" in phases_used, ran
    assert len(frames_used) >= 2, f"phases did not spread: {ran}"

    # LATENCY: the loop window's worst feed call stays within a generous
    # multiple of the run's median (no synchronous multi-solve stall).
    med = float(np.median(feed_times))
    worst = float(np.max(feed_times))
    assert worst <= 25.0 * med, (worst, med)
