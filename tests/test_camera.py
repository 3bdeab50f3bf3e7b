"""Camera model tests: undistort/bearing/project consistency vs OpenCV."""

import numpy as np
import pytest

import jax.numpy as jnp

from structure_plp_slam_tpu.camera import base as cam_base
from structure_plp_slam_tpu.camera import perspective, equirectangular
from tests.helpers import make_camera


def test_perspective_project_bearing_roundtrip(rng):
    cam = make_camera()
    pts = np.stack(
        [
            rng.uniform(-3, 3, 200),
            rng.uniform(-2, 2, 200),
            rng.uniform(2, 10, 200),
        ],
        axis=1,
    ).astype(np.float32)
    uv, z = perspective.project(cam, jnp.asarray(pts))
    b = perspective.bearings(cam, uv)
    # bearing * range along z should reproduce the point.
    scale = pts[:, 2] / np.asarray(b)[:, 2]
    np.testing.assert_allclose(np.asarray(b) * scale[:, None], pts, rtol=1e-4, atol=1e-3)


def test_undistort_no_distortion_is_identity(rng):
    cam = make_camera()
    kp = rng.uniform(0, 640, size=(50, 2)).astype(np.float32)
    out = np.asarray(perspective.undistort_keypoints(cam, jnp.asarray(kp)))
    np.testing.assert_allclose(out, kp, atol=1e-5)


def test_undistort_matches_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    cam = make_camera(k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4, k3=0.0)
    kp = rng.uniform(40, 600, size=(100, 2)).astype(np.float32)
    kp[:, 1] = np.clip(kp[:, 1], 40, 440)
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    dist = np.array([cam.k1, cam.k2, cam.p1, cam.p2, cam.k3])
    expected = cv2.undistortPoints(kp.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
    got = np.asarray(perspective.undistort_keypoints(cam, jnp.asarray(kp)))
    np.testing.assert_allclose(got, expected, atol=0.05)


def test_distort_undistort_roundtrip(rng):
    cam = make_camera(k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4)
    # Generate undistorted normalized coords, distort, undistort back.
    xy = rng.uniform(-0.4, 0.4, size=(100, 2)).astype(np.float32)
    d = np.asarray(perspective._distort_normalized(cam, jnp.asarray(xy)))
    pix = d * np.array([cam.fx, cam.fy]) + np.array([cam.cx, cam.cy])
    und = np.asarray(perspective.undistort_keypoints(cam, jnp.asarray(pix)))
    und_norm = (und - np.array([cam.cx, cam.cy])) / np.array([cam.fx, cam.fy])
    np.testing.assert_allclose(und_norm, xy, atol=1e-4)


def test_equirectangular_bearing_project_roundtrip(rng):
    from structure_plp_slam_tpu.camera import CameraModel

    cam = make_camera(cols=1024, rows=512, model=CameraModel.EQUIRECTANGULAR)
    kp = np.stack(
        [rng.uniform(0, 1024, 300), rng.uniform(1, 511, 300)], axis=1
    ).astype(np.float32)
    b = equirectangular.bearings(cam, jnp.asarray(kp))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(b), axis=-1), 1.0, atol=1e-5
    )
    uv, rng_norm = equirectangular.project(cam, b)
    np.testing.assert_allclose(np.asarray(uv), kp, atol=1e-2)


def test_stereo_reproject(rng):
    cam = make_camera(focal_x_baseline=40.0)
    pts = np.array([[0.5, 0.2, 4.0]], dtype=np.float32)
    uv, xr, z = perspective.reproject_stereo(cam, jnp.asarray(pts))
    disparity = float(np.asarray(uv)[0, 0] - np.asarray(xr)[0])
    np.testing.assert_allclose(disparity, 40.0 / 4.0, rtol=1e-5)


def test_image_bounds_no_distortion():
    cam = make_camera()
    assert cam.image_bounds() == (0.0, 640.0, 0.0, 480.0)


def test_dispatch_undistort():
    cam = make_camera()
    kp = jnp.zeros((4, 2))
    out = cam_base.undistort_keypoints(cam, kp)
    assert out.shape == (4, 2)
