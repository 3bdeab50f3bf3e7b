"""Stereo rectification: precomputed remap grids applied before the frontend.

TPU-native re-expression of the reference's util/stereo_rectifier.{h,cc}:
the YAML ``StereoRectifier`` node carries each side's pre-rectification
intrinsics K, distortion D, and rectifying rotation R; the reference calls
cv::initUndistortRectifyMap (perspective or fisheye variant, selected by
``StereoRectifier.model``) once and cv::remap per frame
(stereo_rectifier.cc:36-103). Here the inverse maps are built once in
numpy with the same math and the per-frame resampling is ONE jitted
bilinear gather for both images.

Map construction (per destination pixel, matching OpenCV semantics): the
rectified pixel is lifted through the rectified camera matrix K_rect (the
main ``Camera.*`` intrinsics — the reference passes the camera's own
cv_cam_matrix_ as the post-rectification matrix), rotated back through
R^-1 into the original camera frame, distorted with that side's model, and
projected through that side's K — giving the source-image sampling
location.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _distort_perspective(x, y, D):
    k1, k2, p1, p2, k3 = (list(D) + [0.0] * 5)[:5]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    x_d = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    y_d = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return x_d, y_d


def _distort_fisheye(x, y, D):
    k1, k2, k3, k4 = (list(D) + [0.0] * 4)[:4]
    r = np.sqrt(x * x + y * y)
    theta = np.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = np.where(r > 1e-8, theta_d / np.maximum(r, 1e-8), 1.0)
    return x * scale, y * scale


def build_rectify_map(rows, cols, K_rect, K_side, D_side, R_side,
                      fisheye=False):
    """Inverse sampling map ``(map_y, map_x)`` each [H, W] f32 — where in
    the ORIGINAL image each RECTIFIED pixel reads from (the semantics of
    cv::initUndistortRectifyMap / cv::fisheye::initUndistortRectifyMap)."""
    vs, us = np.mgrid[0:rows, 0:cols].astype(np.float64)
    x = (us - K_rect[0, 2]) / K_rect[0, 0]
    y = (vs - K_rect[1, 2]) / K_rect[1, 1]
    ray = np.stack([x, y, np.ones_like(x)], axis=-1)  # rectified frame
    Rinv = np.asarray(R_side, np.float64).reshape(3, 3).T
    ray = ray @ Rinv.T  # original camera frame
    xn = ray[..., 0] / ray[..., 2]
    yn = ray[..., 1] / ray[..., 2]
    if fisheye:
        xd, yd = _distort_fisheye(xn, yn, D_side)
    else:
        xd, yd = _distort_perspective(xn, yn, D_side)
    K = np.asarray(K_side, np.float64).reshape(3, 3)
    map_x = (K[0, 0] * xd + K[0, 2]).astype(np.float32)
    map_y = (K[1, 1] * yd + K[1, 2]).astype(np.float32)
    return map_y, map_x


@jax.jit
def _remap_pair(img_l, img_r, my_l, mx_l, my_r, mx_r):
    """Bilinear remap of both stereo images in one dispatch. Out-of-bounds
    samples read 0 (cv::remap BORDER_CONSTANT default)."""
    from jax.scipy.ndimage import map_coordinates

    def remap(img, my, mx):
        return map_coordinates(
            img.astype(jnp.float32), [my, mx], order=1, mode="constant",
            cval=0.0,
        )

    return remap(img_l, my_l, mx_l), remap(img_r, my_r, mx_r)


class StereoRectifier:
    """Built from the config's raw YAML dict (reference:
    stereo_rectifier.cc:46-60 reads StereoRectifier.{K,D,R}_{left,right};
    the post-rectification matrix is the camera's own K). Call with the
    raw stereo pair; returns the rectified pair (device arrays)."""

    YAML_KEYS = (
        "StereoRectifier.K_left", "StereoRectifier.D_left",
        "StereoRectifier.R_left", "StereoRectifier.K_right",
        "StereoRectifier.D_right", "StereoRectifier.R_right",
    )

    @staticmethod
    def available(raw: dict) -> bool:
        return all(k in raw for k in StereoRectifier.YAML_KEYS)

    def __init__(self, camera, raw: dict):
        if not self.available(raw):
            missing = [k for k in self.YAML_KEYS if k not in raw]
            raise KeyError(f"StereoRectifier YAML keys missing: {missing}")
        fisheye = str(raw.get("StereoRectifier.model", "perspective")).lower() == "fisheye"
        K_rect = np.array(
            [[camera.fx, 0.0, camera.cx],
             [0.0, camera.fy, camera.cy],
             [0.0, 0.0, 1.0]]
        )
        maps = []
        for side in ("left", "right"):
            my, mx = build_rectify_map(
                camera.rows, camera.cols, K_rect,
                raw[f"StereoRectifier.K_{side}"],
                np.asarray(raw[f"StereoRectifier.D_{side}"], np.float64).ravel(),
                raw[f"StereoRectifier.R_{side}"],
                fisheye=fisheye,
            )
            maps.append((jnp.asarray(my), jnp.asarray(mx)))
        (self.my_l, self.mx_l), (self.my_r, self.mx_r) = maps

    def __call__(self, img_left, img_right):
        return _remap_pair(
            jnp.asarray(img_left), jnp.asarray(img_right),
            self.my_l, self.mx_l, self.my_r, self.mx_r,
        )
