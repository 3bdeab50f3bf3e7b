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


@pytest.mark.slow
def test_line_map_healed_by_loop_closure(rng):
    """Lines survive loop correction (round-1 VERDICT missing item 2 /
    next-step 2): inject a rigid drift into the later sub-map INCLUDING
    its line landmarks, feed the return leg with loop closing enabled, and
    require (a) an organic loop closure and (b) the previously drifted
    line endpoints back near the true scene planes — exercising
    pose_graph.correct_lines through LoopCloser.correct/_optimize_graph
    (reference: global_optimization_module.cc:233-255 moves landmarks AND
    lines; graph_optimizer.cc transforms lines via corrected Sim3s)."""
    import jax.numpy as jnp

    from structure_plp_slam_tpu.ops import lie
    from structure_plp_slam_tpu.ops import line_geometry as lg

    cam = _camera(CameraSetup.RGBD)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    tex = synthetic_scene.make_texture(rng, size=1536, grid=True)
    out_frames, step, half = 24, 0.4, 14.0
    Cs = [np.array([step * i, 0.0, 0.0]) for i in range(out_frames)]
    Cs += [np.array([step * (out_frames - 1 - i), 0.0, 0.0])
           for i in range(out_frames)]
    frames, poses = [], []
    for i, C in enumerate(Cs):
        R = np.eye(3)
        t = -R @ C
        img, depth = synthetic_scene.render(cam, tex, R, t, plane_half=half)
        frames.append((img, depth, i / 30.0))
        poses.append((R, t))

    n_out = len(frames) // 2
    slam = System(cfg, max_keyframes=64, max_landmarks=24576,
                  max_kf_interval=2, with_lines=True)
    slam.startup()
    for img, depth, ts in frames[:n_out]:
        slam.feed_RGBD_frame(img, depth, ts)
    assert slam.tracking_state is TrackerState.TRACKING
    kf_cut = slam.next_kf // 2

    # Rigid drift T into the later sub-map: poses, points AND lines.
    T_R = np.array(lie.so3_exp(
        jnp.asarray(np.array([[0.0, 0.05, 0.0]]), jnp.float32)))[0]
    T_t = np.array([0.9, 0.0, 0.3], np.float32)
    st = slam.state
    K = st.kf_pose.shape[0]
    kf_sel = (np.arange(K) >= kf_cut) & np.array(st.kf_valid)
    pose = np.array(st.kf_pose)
    T_R_inv, T_t_inv = T_R.T, -T_R.T @ T_t
    for k in np.where(kf_sel)[0]:
        R, t = pose[k, :, :3], pose[k, :, 3]
        pose[k, :, :3] = R @ T_R_inv
        pose[k, :, 3] = R @ T_t_inv + t
    lm_sel = (np.array(st.lm_ref_kf) >= kf_cut) & np.array(st.lm_valid)
    lm = np.array(st.lm_pos)
    lm[lm_sel] = lm[lm_sel] @ T_R.T + T_t
    ln_sel = (np.array(st.ln_ref_kf) >= kf_cut) & np.array(st.ln_valid)
    eps = np.array(st.ln_endpoints)
    eps[ln_sel, :3] = eps[ln_sel, :3] @ T_R.T + T_t
    eps[ln_sel, 3:] = eps[ln_sel, 3:] @ T_R.T + T_t
    pluck = np.array(lg.plucker_from_endpoints(
        jnp.asarray(eps[:, :3]), jnp.asarray(eps[:, 3:])))
    pluck = np.where(np.array(st.ln_valid)[:, None], pluck,
                     np.array(st.ln_pluck))
    slam.state = st._replace(
        kf_pose=jnp.asarray(pose), lm_pos=jnp.asarray(lm),
        ln_endpoints=jnp.asarray(eps), ln_pluck=jnp.asarray(pluck),
    )
    Rp, tp = slam.pose
    slam.pose = (Rp @ jnp.asarray(T_R_inv), Rp @ jnp.asarray(T_t_inv) + tp)

    n_drifted = int(ln_sel.sum())
    for img, depth, ts in frames[n_out:]:
        slam.feed_RGBD_frame(img, depth, ts)
    slam.shutdown()
    m = slam.metrics()
    assert m["loops_closed"] >= 1, f"no organic loop closure fired: {m}"

    # All valid line endpoints — including the ones that were drifted —
    # must be near the true scene planes again.
    ln_valid = np.asarray(slam.state.ln_valid)
    eps2 = np.asarray(slam.state.ln_endpoints)[ln_valid]
    z = np.concatenate([eps2[:, 2], eps2[:, 5]])
    near_plane = (np.abs(z - 6.0) < 0.5) | (np.abs(z - 3.5) < 0.5)
    assert n_drifted >= 2, f"setup failed: only {n_drifted} drifted lines"
    assert near_plane.mean() > 0.7, (
        f"line endpoints off-plane after loop correction: {np.sort(z)}"
    )
