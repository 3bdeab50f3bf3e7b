"""Stereo keypoint matching: left/right correspondence -> disparity/depth.

TPU-native replacement for match::stereo (src/PLPSLAM/match/stereo.cc:45- :
row-bucketed Hamming matching + SAD sub-pixel refinement, optionally
OpenMP-parallel). Here the row bucketing is a mask on the dense distance
matrix and the sub-pixel step is a batched 3-point parabola fit on SAD
samples — no loops, no buckets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import matching
from structure_plp_slam_tpu.utils.types import HAMMING_MASKED


@functools.partial(jax.jit, static_argnames=("focal_x_baseline", "patch", "window"))
def match_stereo(
    img_left,
    img_right,
    kp_l_xy,
    kp_l_level,
    kp_l_bits,
    kp_l_valid,
    kp_r_xy,
    kp_r_level,
    kp_r_bits,
    kp_r_valid,
    scale_factors,
    *,
    focal_x_baseline: float,
    min_disparity: float = 0.0,
    max_hamming: int = 80,
    patch: int = 5,
    window: int = 5,
):
    """Returns (x_right [N], depth [N], valid [N]) for left keypoints.

    Pipeline (mirrors stereo.cc behavior):
      1. candidate gating: same row within 2*sigma(level), disparity in
         (min_disparity, max_disparity]; descriptor distance <= max_hamming;
      2. best candidate per left keypoint (masked argmin);
      3. SAD sub-pixel refinement: quadratic fit over SAD at integer
         disparity offsets {-w..w} around the match (template patch from
         the left image).
    """
    N = kp_l_xy.shape[0]
    H, W = img_left.shape
    max_disparity = focal_x_baseline  # depth >= baseline (reference bound)

    sig_l = scale_factors[jnp.clip(kp_l_level, 0, scale_factors.shape[0] - 1)]
    d = matching.distance_matrix_mxu(kp_l_bits, kp_r_bits, kp_l_valid, kp_r_valid)
    row_ok = (
        jnp.abs(kp_l_xy[:, 1:2] - kp_r_xy[None, :, 1]) <= 2.0 * sig_l[:, None]
    )
    disp = kp_l_xy[:, 0:1] - kp_r_xy[None, :, 0]
    disp_ok = (disp > min_disparity) & (disp <= max_disparity)
    level_ok = (
        jnp.abs(kp_l_level[:, None] - kp_r_level[None, :]) <= 1
    )
    d = jnp.where(row_ok & disp_ok & level_ok, d, HAMMING_MASKED)
    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    matched = best_d <= max_hamming

    # --- SAD sub-pixel refinement on the full-res image ----------------
    xl = kp_l_xy[:, 0].astype(jnp.int32)
    yl = kp_l_xy[:, 1].astype(jnp.int32)
    xr0 = kp_r_xy[best, 0].astype(jnp.int32)

    dy, dx = jnp.mgrid[-patch : patch + 1, -patch : patch + 1]
    dy = dy.reshape(-1)
    dx = dx.reshape(-1)

    def gather(img, xs, ys):
        yy = jnp.clip(ys[:, None] + dy[None, :], 0, H - 1)
        xx = jnp.clip(xs[:, None] + dx[None, :], 0, W - 1)
        return img[yy, xx]

    tmpl = gather(img_left, xl, yl)  # [N, P]
    sads = []
    for off in range(-window, window + 1):
        cand = gather(img_right, xr0 + off, yl)
        sads.append(jnp.sum(jnp.abs(tmpl - cand), axis=1))
    sad = jnp.stack(sads, axis=1)  # [N, 2w+1]
    k = jnp.argmin(sad, axis=1)
    k_clamped = jnp.clip(k, 1, 2 * window - 1)
    s_m = jnp.take_along_axis(sad, (k_clamped - 1)[:, None], axis=1)[:, 0]
    s_0 = jnp.take_along_axis(sad, k_clamped[:, None], axis=1)[:, 0]
    s_p = jnp.take_along_axis(sad, (k_clamped + 1)[:, None], axis=1)[:, 0]
    denom = jnp.maximum(s_m - 2.0 * s_0 + s_p, 1e-6)
    delta = 0.5 * (s_m - s_p) / denom
    delta = jnp.clip(delta, -1.0, 1.0)
    x_right = (xr0 + k_clamped - window).astype(jnp.float32) + delta

    disparity = kp_l_xy[:, 0] - x_right
    ok = matched & (disparity > min_disparity) & (disparity <= max_disparity)
    safe_disp = jnp.where(ok, jnp.maximum(disparity, 1e-6), 1.0)
    depth = jnp.where(ok, focal_x_baseline / safe_disp, 0.0)
    x_right = jnp.where(ok, x_right, -1.0)
    return x_right, depth, ok


@functools.partial(
    jax.jit, static_argnames=("focal_x_baseline", "max_disp", "patch")
)
def depth_at_points(
    img_left,
    img_right,
    pts_xy,
    *,
    focal_x_baseline: float,
    max_disp: int = 96,
    patch: int = 3,
):
    """Depth at arbitrary left-image points by exhaustive row SAD search on
    the rectified pair (integer disparities 1..max_disp, 3-point parabola
    sub-pixel refinement).

    Serves the stereo LINE front-end: line endpoint depths come from the
    stereo pair the way the RGB-D path samples its depth map
    (models/frontend.py _lines). The reference runs stereo point+line SLAM
    (example/run_kitti_slam_with_line.cc:191-233) with multi-view line
    triangulation; direct endpoint depth additionally enables the
    depth-seeded line instantiation path for stereo rigs.

    ``pts_xy``: f32 [P, 2] left-image (x, y). Returns (depth [P], ok [P]).
    """
    H, W = img_left.shape
    P = pts_xy.shape[0]
    xs = pts_xy[:, 0].astype(jnp.int32)
    ys = pts_xy[:, 1].astype(jnp.int32)
    dy, dx = jnp.mgrid[-patch: patch + 1, -patch: patch + 1]
    dy = dy.reshape(-1)
    dx = dx.reshape(-1)

    yy = jnp.clip(ys[:, None] + dy[None, :], 0, H - 1)          # [P, K]
    xxl = jnp.clip(xs[:, None] + dx[None, :], 0, W - 1)
    tmpl = img_left[yy, xxl]                                     # [P, K]

    disps = jnp.arange(1, max_disp + 1, dtype=jnp.int32)         # [D]
    xxr = jnp.clip(
        xs[:, None, None] - disps[None, :, None] + dx[None, None, :], 0, W - 1
    )                                                            # [P, D, K]
    cand = img_right[yy[:, None, :], xxr]                        # [P, D, K]
    sad = jnp.sum(jnp.abs(cand - tmpl[:, None, :]), axis=-1)     # [P, D]

    k = jnp.argmin(sad, axis=1)
    k_c = jnp.clip(k, 1, max_disp - 2)
    s_m = jnp.take_along_axis(sad, (k_c - 1)[:, None], axis=1)[:, 0]
    s_0 = jnp.take_along_axis(sad, k_c[:, None], axis=1)[:, 0]
    s_p = jnp.take_along_axis(sad, (k_c + 1)[:, None], axis=1)[:, 0]
    denom = jnp.maximum(s_m - 2.0 * s_0 + s_p, 1e-6)
    delta = jnp.clip(0.5 * (s_m - s_p) / denom, -1.0, 1.0)
    disparity = (k_c + 1).astype(jnp.float32) + delta

    # Gates: disparity in range, match not clipped at the image border,
    # SAD minimum distinct from the row average (texture present).
    mean_sad = jnp.mean(sad, axis=1)
    ok = (
        (disparity > 0.5)
        & (disparity < float(max_disp))
        & (xs - disps[k_c] >= patch)
        & (s_0 < 0.8 * jnp.maximum(mean_sad, 1e-6))
    )
    depth = jnp.where(ok, focal_x_baseline / jnp.maximum(disparity, 1e-6), 0.0)
    return depth, ok
