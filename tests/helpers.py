"""Synthetic-geometry fixtures, mirroring the reference's test helpers
(reference: test/helper/landmark.cc create_random_landmarks_in_space,
test/helper/bearing_vector.h create_bearing_vectors).

Everything is numpy on host; tests feed the results into jitted ops.
"""

from __future__ import annotations

import numpy as np


def random_rotation(rng: np.random.Generator) -> np.ndarray:
    """Uniform random rotation matrix via QR of a Gaussian."""
    A = rng.normal(size=(3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


def random_pose(rng: np.random.Generator, t_scale: float = 1.0):
    """Random world->camera pose (R, t)."""
    R = random_rotation(rng)
    t = rng.normal(size=3) * t_scale
    return R, t


def create_random_landmarks(
    rng: np.random.Generator, num: int, space: float = 10.0, z_range=(4.0, 12.0)
) -> np.ndarray:
    """Landmarks in front of a canonical camera looking down +z."""
    xy = rng.uniform(-space / 2, space / 2, size=(num, 2))
    z = rng.uniform(z_range[0], z_range[1], size=(num, 1))
    return np.concatenate([xy, z], axis=1)


def project_points(R, t, K, points_w, noise=0.0, rng=None):
    """Project world points through (R, t) with intrinsics K -> [N, 2] pixels."""
    pc = points_w @ R.T + t
    uv = pc @ K.T
    uv = uv[:, :2] / uv[:, 2:3]
    if noise > 0:
        uv = uv + rng.normal(scale=noise, size=uv.shape)
    return uv, pc[:, 2]


def make_camera(cols=640, rows=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5, **kw):
    from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup

    return Camera(
        name="test",
        setup=kw.pop("setup", CameraSetup.MONOCULAR),
        model=kw.pop("model", CameraModel.PERSPECTIVE),
        cols=cols,
        rows=rows,
        fx=fx,
        fy=fy,
        cx=cx,
        cy=cy,
        **kw,
    )


def K_of(camera) -> np.ndarray:
    return np.array(
        [[camera.fx, 0, camera.cx], [0, camera.fy, camera.cy], [0, 0, 1]],
        dtype=np.float64,
    )
