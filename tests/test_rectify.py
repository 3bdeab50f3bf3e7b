"""Stereo rectification (ops/rectify.py vs reference util/stereo_rectifier).

Two layers:
1. Geometric exactness of build_rectify_map against the ground-truth raw
   camera model (undistort + derotate must reproduce the rectified
   pinhole ray).
2. End-to-end: a converging (non-coplanar) stereo pair rendered with
   rotated cameras runs through StereoRectifier + System.feed_stereo_frame
   and produces metrically correct depths.
"""

import numpy as np
import pytest

from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from structure_plp_slam_tpu.config import Config, load_config
from structure_plp_slam_tpu.ops.orb import OrbParams
from structure_plp_slam_tpu.ops.rectify import StereoRectifier, build_rectify_map

import synthetic_scene


def _camera():
    return Camera(
        name="rect", setup=CameraSetup.STEREO, model=CameraModel.PERSPECTIVE,
        cols=320, rows=240, fx=260.0, fy=260.0, cx=159.5, cy=119.5,
        fps=30.0, focal_x_baseline=0.2 * 260.0, depth_threshold=40.0,
    )


def _undistort_iter(xd, yd, D, iters=8):
    """Ground-truth inversion of the radial-tangential model (fixed point)."""
    k1, k2, p1, p2, k3 = (list(D) + [0.0] * 5)[:5]
    x, y = xd.copy(), yd.copy()
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2**2 + k3 * r2**3
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return x, y


def test_rectify_map_identity():
    cam = _camera()
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    my, mx = build_rectify_map(cam.rows, cam.cols, K, K, [0.0] * 5, np.eye(3))
    vs, us = np.mgrid[0:cam.rows, 0:cam.cols]
    assert np.abs(mx - us).max() < 1e-3
    assert np.abs(my - vs).max() < 1e-3


def test_rectify_map_matches_ground_truth_model():
    """Pushing the map's raw sample location back through the true raw
    camera (unproject -> undistort -> derotate) must land on the rectified
    pixel's pinhole ray."""
    cam = _camera()
    K_rect = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    K_raw = np.array([[275.0, 0, 150.0], [0, 271.0, 125.0], [0, 0, 1.0]])
    D = [-0.28, 0.07, 1.9e-4, 1.76e-5, 0.0]
    th = 0.03
    R = np.array([
        [np.cos(th), 0, np.sin(th)],
        [0, 1, 0],
        [-np.sin(th), 0, np.cos(th)],
    ])  # rectifying rotation (original -> rectified)

    my, mx = build_rectify_map(cam.rows, cam.cols, K_rect, K_raw, D, R)
    vs, us = np.mgrid[20:cam.rows - 20:10, 20:cam.cols - 20:10]
    u_raw = mx[vs, us]
    v_raw = my[vs, us]
    # Raw pixel -> normalized distorted -> undistort -> ray in original cam
    xd = (u_raw - K_raw[0, 2]) / K_raw[0, 0]
    yd = (v_raw - K_raw[1, 2]) / K_raw[1, 1]
    xn, yn = _undistort_iter(xd, yd, D)
    rays = np.stack([xn, yn, np.ones_like(xn)], -1)
    rays_rect = rays @ R.T  # into the rectified frame
    u_back = K_rect[0, 0] * rays_rect[..., 0] / rays_rect[..., 2] + K_rect[0, 2]
    v_back = K_rect[1, 1] * rays_rect[..., 1] / rays_rect[..., 2] + K_rect[1, 2]
    assert np.abs(u_back - us).max() < 0.05
    assert np.abs(v_back - vs).max() < 0.05


@pytest.mark.slow
def test_unrectified_stereo_feed(rng):
    """Converging stereo pair (each camera toed in by ~1.4 deg) rendered
    raw, rectified through the YAML-style parameters, fed to the System:
    depths must come out metric (VERDICT round-1 item 5)."""
    import jax.numpy as jnp

    cam = _camera()
    baseline = 0.2
    th = 0.025
    # World frame == rectified left frame. Left camera toed in by +th,
    # right camera by -th around Y; centers at x=0 / x=baseline.
    def rot_y(a):
        return np.array([
            [np.cos(a), 0, np.sin(a)],
            [0, 1, 0],
            [-np.sin(a), 0, np.cos(a)],
        ])

    tex = synthetic_scene.make_texture(rng)
    R_l = rot_y(th)
    R_r = rot_y(-th)
    C_l = np.zeros(3)
    C_r = np.array([baseline, 0.0, 0.0])
    img_l, _ = synthetic_scene.render(cam, tex, R_l, -R_l @ C_l)
    img_r, _ = synthetic_scene.render(cam, tex, R_r, -R_r @ C_r)

    K = [cam.fx, 0.0, cam.cx, 0.0, cam.fy, cam.cy, 0.0, 0.0, 1.0]
    raw = {
        "StereoRectifier.K_left": K,
        "StereoRectifier.K_right": K,
        "StereoRectifier.D_left": [0.0] * 5,
        "StereoRectifier.D_right": [0.0] * 5,
        # R maps original camera -> rectified: the inverse of each toe-in.
        "StereoRectifier.R_left": rot_y(th).T.ravel().tolist(),
        "StereoRectifier.R_right": rot_y(-th).T.ravel().tolist(),
    }
    rect = StereoRectifier(cam, raw)
    rimg_l, rimg_r = rect(img_l, img_r)

    from structure_plp_slam_tpu.system import System

    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=600, num_levels=4),
                 raw=raw)
    slam = System(cfg, max_keyframes=8, max_landmarks=4096, track_lag=0)
    slam.startup()
    slam.feed_stereo_frame(np.asarray(rimg_l), np.asarray(rimg_r), 0.0)
    st = slam.state
    valid = np.asarray(st.lm_valid)
    assert valid.sum() > 100, "stereo init failed on rectified pair"
    z = np.asarray(st.lm_pos)[valid][:, 2]
    frac_bg = np.mean(np.abs(z - 6.0) < 0.4)
    frac_fg = np.mean(np.abs(z - 3.5) < 0.4)
    assert frac_bg + frac_fg > 0.8, (
        f"rectified stereo depths wrong: bg {frac_bg:.2f} fg {frac_fg:.2f}"
    )


def test_euroc_yaml_parses():
    """The reference's own EuRoC stereo YAML parses and exposes the
    rectifier node (reference: example/euroc/EuRoC_stereo.yaml)."""
    yaml_text = """%YAML:1.0
Camera.name: "EuRoC stereo"
Camera.setup: "stereo"
Camera.model: "perspective"
Camera.fx: 435.2046959714599
Camera.fy: 435.2046959714599
Camera.cx: 367.4517211914062
Camera.cy: 252.2008514404297
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.fps: 20.0
Camera.cols: 752
Camera.rows: 480
Camera.focal_x_baseline: 47.90639384423901
Camera.color_order: "Gray"
StereoRectifier.model: "perspective"
StereoRectifier.K_left: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
StereoRectifier.D_left: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0]
StereoRectifier.R_left: [0.999966347530033, -0.001422739138722922, 0.008079580483432283, 0.001365741834644127, 0.9999741760894847, 0.007055629199258132, -0.008089410156878961, -0.007044357138835809, 0.9999424675829176]
StereoRectifier.K_right: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1.0]
StereoRectifier.D_right: [-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05, 0.0]
StereoRectifier.R_right: [0.9999633526194376, -0.003625811871560086, 0.007755443660172947, 0.003680398547259526, 0.9999684752771629, -0.007035845251224894, -0.007729688520722713, 0.007064130529506649, 0.999945173484644]
Feature.max_num_keypoints: 1000
Feature.num_levels: 8
Feature.scale_factor: 1.2
"""
    cfg = load_config(yaml_text=yaml_text)
    assert cfg.camera.setup is CameraSetup.STEREO
    assert StereoRectifier.available(cfg.raw)
    rect = StereoRectifier(cfg.camera, cfg.raw)
    assert rect.mx_l.shape == (480, 752)
