"""Full-length dataset-shaped regression (round-3 verdict missing #7 /
next-step #10): the closest-to-real-data evidence this offline
environment allows.

A 1000-frame TUM-format RGB-D dataset (rgb/ + depth/ + rgb.txt +
depth.txt + groundtruth.txt, 16-bit depth at 5000/m) is fabricated on
disk and driven two ways:

* through ``run.py tum_rgbd`` — the reference's
  example/run_tum_rgbd_slam.cc protocol — gating ATE, keyframe count,
  AUTO-GROW activation (capacities start at 32 keyframes) and total
  wall time;
* through the library with TWO injected mid-map drifts (drift-free
  synthetic maps silently re-attach; the organic-loop protocol) on the
  two revisit legs, gating >= 2 organic loop closures and post-loop ATE.
"""

import json
import os
import time

import numpy as np
import pytest

from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.io import trajectory as traj_io
from structure_plp_slam_tpu.ops.orb import OrbParams
from tests import synthetic_scene

cv2 = pytest.importorskip("cv2")

_YAML = """%YAML:1.0
Camera.name: long
Camera.setup: RGBD
Camera.model: perspective
Camera.fx: 260.0
Camera.fy: 260.0
Camera.cx: 159.5
Camera.cy: 119.5
Camera.cols: 320
Camera.rows: 240
Camera.fps: 30.0
Camera.focal_x_baseline: 26.0
depth_threshold: 400.0
depthmap_factor: 5000.0
Feature.max_num_keypoints: 600
Feature.num_levels: 4
"""

N_FRAMES = 1000


def _camera():
    return Camera(
        name="long", setup=CameraSetup.RGBD, model=CameraModel.PERSPECTIVE,
        cols=320, rows=240, fx=260.0, fy=260.0, cx=159.5, cy=119.5,
        fps=30.0, focal_x_baseline=26.0, depth_threshold=400.0,
        depthmap_factor=5000.0,
    )


def _trajectory(n=N_FRAMES):
    """Two out-and-back excursions (x then y) with soft starts — two
    revisits of the origin region."""
    leg = n // 4
    xs = np.zeros((n, 3))
    ramp = np.minimum(1.0, (np.arange(leg) + 1) / 10.0) * 0.05
    out = np.cumsum(ramp)
    xs[:leg, 0] = out
    xs[leg:2 * leg, 0] = out[::-1]
    xs[2 * leg:3 * leg, 1] = out[:leg]
    xs[3 * leg:4 * leg, 1] = out[::-1][:n - 3 * leg]
    poses = []
    for C in xs:
        R = np.eye(3)
        poses.append((R, -R @ C))
    return poses


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    rng = np.random.default_rng(5)
    root = tmp_path_factory.mktemp("tum_long")
    cam = _camera()
    tex = synthetic_scene.make_texture(rng, size=1536)
    poses = _trajectory()
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    rgb_lines, depth_lines, gt_lines = [], [], []
    span = 0.05 * (N_FRAMES // 4)
    for i, (R, t) in enumerate(poses):
        img, depth = synthetic_scene.render(
            cam, tex, R, t, plane_half=span + 8.0
        )
        ts = i / 30.0
        cv2.imwrite(str(root / "rgb" / f"{i:06d}.png"),
                    img.astype(np.uint8))
        cv2.imwrite(str(root / "depth" / f"{i:06d}.png"),
                    (depth * 5000.0).astype(np.uint16))
        rgb_lines.append(f"{ts:.6f} rgb/{i:06d}.png")
        depth_lines.append(f"{ts:.6f} depth/{i:06d}.png")
        C = -R.T @ t
        gt_lines.append(f"{ts:.6f} {C[0]} {C[1]} {C[2]} 0 0 0 1")
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    (root / "config.yaml").write_text(_YAML)
    return root, poses


@pytest.mark.slow
def test_long_tum_cli_ate_growth_walltime(tum_dir, capsys, monkeypatch):
    from structure_plp_slam_tpu import run as run_mod

    root, poses = tum_dir
    t0 = time.perf_counter()
    monkeypatch.chdir(root)
    run_mod.main([
        "tum_rgbd", "-c", str(root / "config.yaml"), "-d", str(root),
        "--max-keyframes", "32", "--max-landmarks", "8192",
        "--eval-log",
    ])
    wall = time.perf_counter() - t0
    out = capsys.readouterr().out
    info = json.loads(out.strip().splitlines()[-1])
    # Auto-grow must have fired (starting capacity 32 keyframes cannot
    # hold a 1000-frame two-excursion run).
    assert info["keyframes"] > 32, info
    est = traj_io.load_tum(str(root / "frame_trajectory.txt"))
    gt = traj_io.load_tum(str(root / "groundtruth.txt"))
    ate = traj_io.ate_rmse(est, gt)
    assert ate < 0.08, f"ATE {ate:.3f} over {len(est)} frames"
    assert len(est) >= 0.95 * N_FRAMES, len(est)
    # Wall-time gate: CI-scale bound (CPU, uncached jit) — catches
    # pathological slowdowns, not a perf benchmark.
    assert wall < 3000.0, wall


@pytest.mark.slow
def test_long_sequence_two_organic_loops(tum_dir, rng):
    import jax.numpy as jnp

    from structure_plp_slam_tpu.io import datasets
    from structure_plp_slam_tpu.ops import lie
    from structure_plp_slam_tpu.system import System

    root, poses = tum_dir
    seq = datasets.load_tum_rgbd(str(root))
    cam = _camera()
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=600, num_levels=4),
                 raw={})
    slam = System(cfg, max_keyframes=256, max_landmarks=32768,
                  max_kf_interval=6)
    slam.startup()

    leg = N_FRAMES // 4

    def inject_drift():
        slam._drain_pending()
        kf_cut = slam.next_kf // 2
        T_R = np.array(lie.so3_exp(jnp.asarray(
            np.array([[0.0, 0.04, 0.0]]), jnp.float32)))[0]
        T_t = np.array([0.7, 0.0, 0.25], np.float32)
        st = slam.state
        K = st.kf_pose.shape[0]
        kf_sel = (np.arange(K) >= kf_cut) & np.array(st.kf_valid)
        pose = np.array(st.kf_pose)
        T_R_inv = T_R.T
        T_t_inv = -T_R.T @ T_t
        for k in np.where(kf_sel)[0]:
            R, t = pose[k, :, :3], pose[k, :, 3]
            pose[k, :, :3] = R @ T_R_inv
            pose[k, :, 3] = R @ T_t_inv + t
        lm_sel = (np.array(st.lm_ref_kf) >= kf_cut) & np.array(st.lm_valid)
        lm = np.array(st.lm_pos)
        lm[lm_sel] = lm[lm_sel] @ T_R.T + T_t
        slam.state = st._replace(kf_pose=jnp.asarray(pose),
                                 lm_pos=jnp.asarray(lm))
        Rp, tp = slam.pose
        slam.pose = (Rp @ jnp.asarray(T_R_inv),
                     Rp @ jnp.asarray(T_t_inv) + tp)

    for i, rec in enumerate(seq):
        if i == leg or i == 3 * leg:
            inject_drift()  # before each return leg
        img = cv2.imread(rec.img_path, cv2.IMREAD_GRAYSCALE)
        depth = cv2.imread(rec.depth_path, cv2.IMREAD_UNCHANGED)
        slam.feed_RGBD_frame(img, depth, rec.timestamp)
    slam._drain_pending()
    m = slam.metrics()
    slam.shutdown()
    assert m["loops_closed"] >= 2, m
    # Post-loop trajectory quality.
    est = slam.frame_trajectory()
    gt = traj_io.load_tum(str(root / "groundtruth.txt"))
    ate = traj_io.ate_rmse(est, gt)
    assert ate < 0.25, f"post-loop ATE {ate:.3f}"
