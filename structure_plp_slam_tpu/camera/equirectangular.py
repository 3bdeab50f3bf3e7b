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


def in_image(camera, uv, margin: float = 0.0):
    return (uv[..., 1] >= margin) & (uv[..., 1] < camera.rows - margin)
