"""Equirectangular (360°) camera functions.

Reference behavior: src/PLPSLAM/camera/equirectangular.{h,cc} — pixel
(u, v) maps to (longitude, latitude); bearings live on the unit sphere.
"""

from __future__ import annotations

import jax.numpy as jnp


def undistort_keypoints(camera, keypts):
    return jnp.asarray(keypts, jnp.float32)


def bearings(camera, undist_keypts):
    lon = (undist_keypts[..., 0] / camera.cols - 0.5) * 2.0 * jnp.pi
    lat = -(undist_keypts[..., 1] / camera.rows - 0.5) * jnp.pi
    return jnp.stack(
        [
            jnp.cos(lat) * jnp.sin(lon),
            -jnp.sin(lat),
            jnp.cos(lat) * jnp.cos(lon),
        ],
        axis=-1,
    )


def project(camera, points_cam):
    """Camera-space points -> (uv, range). Depth here is the ray norm."""
    norm = jnp.linalg.norm(points_cam, axis=-1)
    b = points_cam / jnp.where(norm[..., None] < 1e-12, 1e-12, norm[..., None])
    lat = -jnp.arcsin(jnp.clip(b[..., 1], -1.0, 1.0))
    lon = jnp.arctan2(b[..., 0], b[..., 2])
    u = camera.cols * (0.5 + lon / (2.0 * jnp.pi))
    v = camera.rows * (0.5 - lat / jnp.pi)
    return jnp.stack([u, v], axis=-1), norm


def project_jacobian(camera, points_cam):
    """d(uv)/d(pc) of the lat/long projection ``[..., 2, 3]``.

    Reference: the analytic linearization of the equirectangular
    reprojection edge (src/PLPSLAM/optimize/g2o/se3/
    equirectangular_reproj_edge.h linearizeOplus). With
    u = cols*(0.5 + atan2(x, z)/2pi), v = rows*(0.5 + asin(y/d)/pi),
    d = |pc|:
      du/dpc = cols/(2pi) * [z, 0, -x] / (x^2 + z^2)
      dv/dpc = rows/pi    * (e_y - (y/d^2) pc) / sqrt(x^2 + z^2)
    Degenerate at the poles (x = z = 0) — clamped; such observations carry
    ~zero weight anyway because the projection saturates there.
    """
    x, y, z = points_cam[..., 0], points_cam[..., 1], points_cam[..., 2]
    r2 = jnp.maximum(x * x + z * z, 1e-12)
    d2 = jnp.maximum(x * x + y * y + z * z, 1e-12)
    ku = camera.cols / (2.0 * jnp.pi)
    zero = jnp.zeros_like(z)
    row_u = jnp.stack([ku * z / r2, zero, -ku * x / r2], axis=-1)
    kv = camera.rows / jnp.pi / jnp.sqrt(r2)
    row_v = jnp.stack(
        [-kv * x * y / d2, kv * (1.0 - y * y / d2), -kv * z * y / d2], axis=-1
    )
    return jnp.stack([row_u, row_v], axis=-2)


def in_image(camera, uv, margin: float = 0.0):
    return (uv[..., 1] >= margin) & (uv[..., 1] < camera.rows - margin)
