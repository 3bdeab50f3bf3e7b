"""Stereo matching tests on rendered left/right pairs."""

import numpy as np
import pytest

import jax.numpy as jnp

from structure_plp_slam_tpu.models import frontend as frontend_mod
from structure_plp_slam_tpu.ops.orb import OrbParams
from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from tests import synthetic_scene


def _stereo_camera(baseline=0.1):
    fx = 260.0
    return Camera(
        name="stereo",
        setup=CameraSetup.STEREO,
        model=CameraModel.PERSPECTIVE,
        cols=320,
        rows=240,
        fx=fx,
        fy=260.0,
        cx=159.5,
        cy=119.5,
        focal_x_baseline=fx * baseline,
        depth_threshold=400.0,
    )


def test_stereo_depth_accuracy(rng):
    cam = _stereo_camera()
    tex = synthetic_scene.make_texture(rng)
    R = np.eye(3)
    tL = np.zeros(3)
    tR = tL - np.array([cam.baseline, 0.0, 0.0])  # right camera shifted +x
    imgL, depthL = synthetic_scene.render(cam, tex, R, tL)
    imgR, _ = synthetic_scene.render(cam, tex, R, tR)

    fe = frontend_mod.Frontend(cam, OrbParams(max_num_keypts=500, num_levels=4),
                               pad_to=1024)
    feats = fe.stereo(imgL, imgR)
    valid = np.asarray(feats["valid"])
    depth = np.asarray(feats["depth"])
    xy = np.asarray(feats["xy"])
    has_d = valid & (depth > 0)
    assert has_d.sum() > 100, f"only {has_d.sum()} stereo depths"

    # Compare against the rendered depth map.
    xs = np.clip(xy[has_d, 0].astype(int), 0, cam.cols - 1)
    ys = np.clip(xy[has_d, 1].astype(int), 0, cam.rows - 1)
    gt = depthL[ys, xs]
    rel = np.abs(depth[has_d] - gt) / gt
    assert np.median(rel) < 0.08, f"median rel depth err {np.median(rel)}"
    # Majority of depths within 10%.
    assert (rel < 0.1).mean() > 0.7


def test_stereo_xr_consistency(rng):
    cam = _stereo_camera()
    tex = synthetic_scene.make_texture(rng)
    R = np.eye(3)
    imgL, _ = synthetic_scene.render(cam, tex, R, np.zeros(3))
    imgR, _ = synthetic_scene.render(
        cam, tex, R, -np.array([cam.baseline, 0.0, 0.0])
    )
    fe = frontend_mod.Frontend(cam, OrbParams(max_num_keypts=300, num_levels=2),
                               pad_to=512)
    feats = fe.stereo(imgL, imgR)
    valid = np.asarray(feats["valid"])
    depth = np.asarray(feats["depth"])
    xr = np.asarray(feats["xr"])
    xy = np.asarray(feats["xy"])
    ok = valid & (depth > 0)
    # xr = x - fx*b/depth must hold exactly by construction.
    np.testing.assert_allclose(
        xr[ok], xy[ok, 0] - cam.focal_x_baseline / depth[ok], atol=1e-3
    )
