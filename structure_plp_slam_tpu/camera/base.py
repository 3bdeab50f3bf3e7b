"""Camera model registry and dataclass.

TPU-native re-design of the reference camera layer
(reference: src/PLPSLAM/camera/base.h:41-198 — abstract class with virtual
undistort/bearing/reproject). Here a camera is a small frozen dataclass of
static Python floats (so it is a jit-time constant — camera intrinsics never
change during a run) plus pure batched functions in ``perspective.py`` /
``fisheye.py`` / ``equirectangular.py`` dispatched statically by model enum.

All per-keypoint operations are batched over ``[N, 2]`` keypoint arrays /
``[N, 3]`` point arrays — the reference loops per keypoint.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple


class CameraSetup(enum.Enum):
    MONOCULAR = "monocular"
    STEREO = "stereo"
    RGBD = "rgbd"


class CameraModel(enum.Enum):
    PERSPECTIVE = "perspective"
    FISHEYE = "fisheye"
    EQUIRECTANGULAR = "equirectangular"


@dataclasses.dataclass(frozen=True)
class Camera:
    """Static camera description (jit-constant).

    Mirrors the union of the reference's perspective/fisheye/equirectangular
    fields (src/PLPSLAM/camera/perspective.h:49-127, fisheye.h,
    equirectangular.h).
    """

    name: str
    setup: CameraSetup
    model: CameraModel
    cols: int
    rows: int
    fps: float = 30.0
    # Pinhole intrinsics (perspective/fisheye).
    fx: float = 0.0
    fy: float = 0.0
    cx: float = 0.0
    cy: float = 0.0
    # Distortion: perspective = (k1, k2, p1, p2, k3); fisheye = (k1..k4, 0).
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0
    # Stereo.
    focal_x_baseline: float = 0.0  # fx * baseline
    # RGB-D.
    depth_threshold: float = 40.0  # in baseline units (reference: config.cc)
    depthmap_factor: float = 1.0

    @property
    def fx_inv(self) -> float:
        return 1.0 / self.fx if self.fx else 0.0

    @property
    def fy_inv(self) -> float:
        return 1.0 / self.fy if self.fy else 0.0

    @property
    def focal_like(self) -> float:
        """Pixels-per-radian scale for pixel-threshold conversions.

        fx for pinhole-style models; cols/(2*pi) for equirectangular (its
        horizontal pixel pitch in radians)."""
        if self.fx:
            return self.fx
        import math

        return self.cols / (2.0 * math.pi)

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3, self.k4))

    @property
    def baseline(self) -> float:
        return self.focal_x_baseline / self.fx if self.fx else 0.0

    # True depth threshold as used by keyframe_inserter (reference:
    # config.cc true_depth_thr_ = baseline * depth_threshold).
    @property
    def true_depth_threshold(self) -> float:
        return self.baseline * self.depth_threshold

    def image_bounds(self) -> Tuple[float, float, float, float]:
        """(min_x, max_x, min_y, max_y) of the *undistorted* image frame."""
        import numpy as np

        if self.model is CameraModel.EQUIRECTANGULAR or not self.has_distortion:
            return 0.0, float(self.cols), 0.0, float(self.rows)
        from structure_plp_slam_tpu.camera import perspective as _p
        from structure_plp_slam_tpu.camera import fisheye as _f

        corners = np.array(
            [
                [0.0, 0.0],
                [self.cols, 0.0],
                [0.0, self.rows],
                [self.cols, self.rows],
            ],
            dtype=np.float32,
        )
        mod = _p if self.model is CameraModel.PERSPECTIVE else _f
        und = np.asarray(mod.undistort_keypoints(self, corners))
        return (
            float(min(und[0, 0], und[2, 0])),
            float(max(und[1, 0], und[3, 0])),
            float(min(und[0, 1], und[1, 1])),
            float(max(und[2, 1], und[3, 1])),
        )


def dispatch(camera: Camera):
    """Return the function module for this camera's model (static dispatch)."""
    from structure_plp_slam_tpu.camera import (
        equirectangular,
        fisheye,
        perspective,
    )

    return {
        CameraModel.PERSPECTIVE: perspective,
        CameraModel.FISHEYE: fisheye,
        CameraModel.EQUIRECTANGULAR: equirectangular,
    }[camera.model]


def undistort_keypoints(camera: Camera, keypts):
    return dispatch(camera).undistort_keypoints(camera, keypts)


def bearings(camera: Camera, undist_keypts):
    return dispatch(camera).bearings(camera, undist_keypts)


def project(camera: Camera, points_cam):
    return dispatch(camera).project(camera, points_cam)


def project_jacobian(camera: Camera, points_cam):
    """d(uv)/d(pc) ``[..., 2, 3]`` for camera-space points (model dispatch)."""
    return dispatch(camera).project_jacobian(camera, points_cam)


def in_image(camera: Camera, uv, margin: float = 0.0):
    return dispatch(camera).in_image(camera, uv, margin)


def uv_residual(camera: Camera, uv_pred, uv_obs):
    """Reprojection residual ``uv_pred - uv_obs`` with horizontal
    wrap-around for equirectangular images (u and u + cols are the same
    pixel; the reference never needs this because its per-keypoint loops
    re-project into [0, cols) — batched residuals must wrap instead)."""
    import jax.numpy as jnp

    d = uv_pred - uv_obs
    if camera.model is CameraModel.EQUIRECTANGULAR:
        du = d[..., 0]
        du = du - jnp.round(du / camera.cols) * camera.cols
        d = jnp.stack([du, d[..., 1]], axis=-1)
    return d


def cheirality(camera: Camera, points_cam):
    """Observability gate: positive depth for pinhole-style models; any
    direction for the full-sphere equirectangular model."""
    import jax.numpy as jnp

    if camera.model is CameraModel.EQUIRECTANGULAR:
        return jnp.sum(points_cam * points_cam, axis=-1) > 1e-12
    return points_cam[..., 2] > 1e-6
