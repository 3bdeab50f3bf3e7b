"""CLI driver tests: the run-module subcommands exercised end-to-end on
fabricated datasets (reference: example/run_tum_rgbd_slam.cc,
run_video_slam.cc driver surfaces)."""

import json
import os

import numpy as np
import pytest

from structure_plp_slam_tpu import run as run_mod
from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from tests import synthetic_scene

cv2 = pytest.importorskip("cv2")

_YAML = """%YAML:1.0
Camera.name: synth
Camera.setup: {setup}
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


def _camera(setup):
    return Camera(
        name="synth", setup=setup, model=CameraModel.PERSPECTIVE,
        cols=320, rows=240, fx=260.0, fy=260.0, cx=159.5, cy=119.5, fps=30.0,
    )


def _write_tum(tmp_path, rng, n=10):
    cam = _camera(CameraSetup.RGBD)
    tex = synthetic_scene.make_texture(rng)
    poses = synthetic_scene.trajectory(n, step=0.06)
    os.makedirs(tmp_path / "rgb")
    os.makedirs(tmp_path / "depth")
    rgb_lines, depth_lines = [], []
    for i, (R, t) in enumerate(poses):
        img, depth = synthetic_scene.render(cam, tex, R, t)
        ts = i / 30.0
        cv2.imwrite(str(tmp_path / "rgb" / f"{i}.png"), img.astype(np.uint8))
        cv2.imwrite(
            str(tmp_path / "depth" / f"{i}.png"),
            (depth * 5000.0).astype(np.uint16),
        )
        rgb_lines.append(f"{ts:.6f} rgb/{i}.png")
        depth_lines.append(f"{ts:.6f} depth/{i}.png")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (tmp_path / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    return poses


@pytest.mark.slow
def test_tum_rgbd_driver(tmp_path, rng, capsys, monkeypatch):
    poses = _write_tum(tmp_path, rng)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(_YAML.format(setup="rgbd"))
    monkeypatch.chdir(tmp_path)
    run_mod.main([
        "tum_rgbd", "-c", str(cfg), "-d", str(tmp_path),
        "--max-keyframes", "32", "--max-landmarks", "8192", "--eval-log",
        "--map-db-out", str(tmp_path / "map.msg"),
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["frames"] == 10
    assert out["keyframes"] >= 2
    assert out["landmarks"] > 100
    assert (tmp_path / "frame_trajectory.txt").exists()
    assert (tmp_path / "keyframe_trajectory.txt").exists()
    assert (tmp_path / "track_times.txt").exists()
    assert (tmp_path / "map.msg").stat().st_size > 1000
    traj = (tmp_path / "frame_trajectory.txt").read_text().strip().splitlines()
    assert len(traj) >= 8 and len(traj[0].split()) == 8  # TUM format
    # ATE regression through the full CLI path (PNG depth round-trip +
    # PrefetchReader + depthmap_factor): guards against depth-scaling
    # bugs anywhere between disk and the frontend.
    from structure_plp_slam_tpu.io import trajectory as traj_io

    est = traj_io.load_tum(str(tmp_path / "frame_trajectory.txt"))
    gt = [(float(i) / 30.0, np.concatenate([R, t[:, None]], 1).astype(np.float64))
          for i, (R, t) in enumerate(poses)]
    ate = traj_io.ate_rmse(est, gt, align_scale=False)
    assert ate < 0.05, f"CLI ATE {ate}"


@pytest.mark.slow
def test_tum_rgbd_driver_with_masks(tmp_path, rng, capsys, monkeypatch):
    """--mask-dir drives the plane pipeline from the CLI (reference:
    run_slam_planeSeg.cc drivers)."""
    cam = _camera(CameraSetup.RGBD)
    tex = synthetic_scene.make_texture(rng)
    poses = synthetic_scene.trajectory(8, step=0.06)
    os.makedirs(tmp_path / "rgb")
    os.makedirs(tmp_path / "depth")
    os.makedirs(tmp_path / "mask")
    rgb_lines, depth_lines = [], []
    for i, (R, t) in enumerate(poses):
        img, depth = synthetic_scene.render(cam, tex, R, t)
        cv2.imwrite(str(tmp_path / "rgb" / f"{i}.png"), img.astype(np.uint8))
        cv2.imwrite(
            str(tmp_path / "depth" / f"{i}.png"),
            (depth * 5000.0).astype(np.uint16),
        )
        cv2.imwrite(
            str(tmp_path / "mask" / f"{i}.png"),
            np.where(depth < 4.5, 1, 2).astype(np.uint8),
        )
        ts = i / 30.0
        rgb_lines.append(f"{ts:.6f} rgb/{i}.png")
        depth_lines.append(f"{ts:.6f} depth/{i}.png")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (tmp_path / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(_YAML.format(setup="rgbd"))
    monkeypatch.chdir(tmp_path)
    run_mod.main([
        "tum_rgbd", "-c", str(cfg), "-d", str(tmp_path),
        "--mask-dir", str(tmp_path / "mask"),
        "--max-keyframes", "32", "--max-landmarks", "8192",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["planes"] >= 1


@pytest.mark.slow
def test_video_driver(tmp_path, rng, capsys, monkeypatch):
    cam = _camera(CameraSetup.MONOCULAR)
    tex = synthetic_scene.make_texture(rng)
    poses = synthetic_scene.trajectory(12, step=0.08)
    vid = str(tmp_path / "seq.avi")
    vw = cv2.VideoWriter(
        vid, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (320, 240), False
    )
    assert vw.isOpened()
    for R, t in poses:
        img, _ = synthetic_scene.render(cam, tex, R, t)
        vw.write(img.astype(np.uint8))
    vw.release()
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(_YAML.format(setup="monocular"))
    monkeypatch.chdir(tmp_path)
    run_mod.main([
        "video", "-c", str(cfg), "--video", vid,
        "--max-keyframes", "32", "--max-landmarks", "8192",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["frames"] == 12
    assert out["keyframes"] >= 2
    assert (tmp_path / "frame_trajectory.txt").exists()
