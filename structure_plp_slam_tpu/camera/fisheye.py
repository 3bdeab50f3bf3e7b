"""Fisheye (equidistant, Kannala-Brandt k1..k4) camera functions.

Reference behavior: src/PLPSLAM/camera/fisheye.{h,cc} (cv::fisheye model).
Batched over ``[N, ...]`` arrays; undistortion is a fixed 10-iteration Newton
solve for theta from theta_d, as in cv::fisheye::undistortPoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _theta_d(camera, theta):
    t2 = theta * theta
    return theta * (
        1.0 + camera.k1 * t2 + camera.k2 * t2**2 + camera.k3 * t2**3 + camera.k4 * t2**4
    )


def undistort_keypoints(camera, keypts):
    keypts = jnp.asarray(keypts, jnp.float32)
    x_d = (keypts[..., 0] - camera.cx) * camera.fx_inv
    y_d = (keypts[..., 1] - camera.cy) * camera.fy_inv
    theta_d = jnp.sqrt(x_d * x_d + y_d * y_d)
    theta_d_c = jnp.clip(theta_d, -jnp.pi, jnp.pi)

    def body(_, theta):
        t2 = theta * theta
        k = (
            1.0
            + camera.k1 * t2
            + camera.k2 * t2**2
            + camera.k3 * t2**3
            + camera.k4 * t2**4
        )
        dk = (
            1.0
            + 3.0 * camera.k1 * t2
            + 5.0 * camera.k2 * t2**2
            + 7.0 * camera.k3 * t2**3
            + 9.0 * camera.k4 * t2**4
        )
        return theta - (theta * k - theta_d_c) / jnp.where(jnp.abs(dk) < 1e-9, 1e-9, dk)

    theta = jax.lax.fori_loop(0, 10, body, theta_d_c)
    scale = jnp.where(theta_d > 1e-9, jnp.tan(theta) / jnp.where(theta_d > 1e-9, theta_d, 1.0), 1.0)
    return jnp.stack(
        [
            x_d * scale * camera.fx + camera.cx,
            y_d * scale * camera.fy + camera.cy,
        ],
        axis=-1,
    )


def bearings(camera, undist_keypts):
    x = (undist_keypts[..., 0] - camera.cx) * camera.fx_inv
    y = (undist_keypts[..., 1] - camera.cy) * camera.fy_inv
    z = jnp.ones_like(x)
    v = jnp.stack([x, y, z], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def project(camera, points_cam):
    """Distortion-free pinhole projection on undistorted coordinates."""
    z = points_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = camera.fx * points_cam[..., 0] / safe_z + camera.cx
    v = camera.fy * points_cam[..., 1] / safe_z + camera.cy
    return jnp.stack([u, v], axis=-1), z


def project_jacobian(camera, points_cam):
    """Pinhole Jacobian: all residuals live in undistorted pixel space."""
    from structure_plp_slam_tpu.camera import perspective

    return perspective.project_jacobian(camera, points_cam)


def in_image(camera, uv, margin: float = 0.0):
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < camera.cols - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < camera.rows - margin)
    )
