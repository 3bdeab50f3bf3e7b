"""Perspective (pinhole + radial-tangential) camera functions.

Reference behavior: src/PLPSLAM/camera/perspective.{h,cc} — undistortion via
cv::undistortPoints, bearing = normalized undistorted ray, reprojection with
distortion-free intrinsics on undistorted coordinates.

Here: batched over ``[N, 2]`` keypoints / ``[N, 3]`` camera-space points.
Undistortion uses the classic fixed-point iteration (8 iterations, same
scheme as OpenCV's undistortPoints) expressed as a ``lax.fori_loop`` so XLA
unrolls/pipelines it — no data-dependent iteration counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _distort_normalized(camera, xy):
    """Apply radial-tangential distortion to normalized coords ``[N, 2]``."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = 1.0 + camera.k1 * r2 + camera.k2 * r4 + camera.k3 * r6
    dx = 2.0 * camera.p1 * x * y + camera.p2 * (r2 + 2.0 * x * x)
    dy = camera.p1 * (r2 + 2.0 * y * y) + 2.0 * camera.p2 * x * y
    return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)


def undistort_keypoints(camera, keypts):
    """``[N, 2]`` pixel keypoints -> undistorted pixel keypoints ``[N, 2]``."""
    keypts = jnp.asarray(keypts, jnp.float32)
    if not camera.has_distortion:
        return keypts
    # To normalized coordinates.
    xy_dist = jnp.stack(
        [
            (keypts[..., 0] - camera.cx) * camera.fx_inv,
            (keypts[..., 1] - camera.cy) * camera.fy_inv,
        ],
        axis=-1,
    )

    def body(_, xy):
        # Fixed-point: xy <- xy_dist "minus the distortion residual".
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        icdist = 1.0 / (1.0 + camera.k1 * r2 + camera.k2 * r4 + camera.k3 * r6)
        dx = 2.0 * camera.p1 * x * y + camera.p2 * (r2 + 2.0 * x * x)
        dy = camera.p1 * (r2 + 2.0 * y * y) + 2.0 * camera.p2 * x * y
        return jnp.stack(
            [(xy_dist[..., 0] - dx) * icdist, (xy_dist[..., 1] - dy) * icdist],
            axis=-1,
        )

    xy = jax.lax.fori_loop(0, 8, body, xy_dist)
    return jnp.stack(
        [
            xy[..., 0] * camera.fx + camera.cx,
            xy[..., 1] * camera.fy + camera.cy,
        ],
        axis=-1,
    )


def bearings(camera, undist_keypts):
    """Undistorted pixel keypoints ``[N, 2]`` -> unit bearings ``[N, 3]``."""
    x = (undist_keypts[..., 0] - camera.cx) * camera.fx_inv
    y = (undist_keypts[..., 1] - camera.cy) * camera.fy_inv
    z = jnp.ones_like(x)
    v = jnp.stack([x, y, z], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def project(camera, points_cam):
    """Camera-space points ``[N, 3]`` -> (uv ``[N, 2]``, depth ``[N]``).

    Projects with distortion-free intrinsics (matches the reference's use of
    undistorted keypoint coordinates for all reprojection residuals,
    src/PLPSLAM/optimize/g2o/se3/perspective_reproj_edge.h cam_project).
    """
    z = points_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = camera.fx * points_cam[..., 0] / safe_z + camera.cx
    v = camera.fy * points_cam[..., 1] / safe_z + camera.cy
    return jnp.stack([u, v], axis=-1), z


def project_jacobian(camera, points_cam):
    """d(uv)/d(pc) for the distortion-free pinhole projection ``[..., 2, 3]``.

    Reference: the analytic linearization inside the g2o reprojection edges
    (src/PLPSLAM/optimize/g2o/se3/perspective_reproj_edge.h
    linearizeOplus) — here batched over all observations at once.
    """
    x, y, z = points_cam[..., 0], points_cam[..., 1], points_cam[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(z)
    row_u = jnp.stack([camera.fx * iz, zero, -camera.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, camera.fy * iz, -camera.fy * y * iz2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def reproject_stereo(camera, points_cam):
    """Also return the right-image x coordinate (stereo residual term).

    Reference: perspective::reproject_to_image with disparity,
    src/PLPSLAM/camera/perspective.cc (x_right = x - fx*baseline/z).
    """
    uv, z = project(camera, points_cam)
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    x_right = uv[..., 0] - camera.focal_x_baseline / safe_z
    return uv, x_right, z


def in_image(camera, uv, margin: float = 0.0):
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < camera.cols - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < camera.rows - margin)
    )
