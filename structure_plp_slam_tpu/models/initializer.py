"""Map initialization: monocular two-view SfM and depth-seeded bootstrap.

TPU-native replacement for src/PLPSLAM/module/initializer.cc (state machine
NotReady -> Initializing -> Succeeded) + initialize/perspective.cc (parallel
H and F hypotheses, model selection by score ratio, reconstruction, global
BA, median-depth scaling). The reference races H and F solvers on two
threads; here both RANSACs are batched hypothesis sweeps inside one jitted
function — "parallel" is the natural state of the kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from structure_plp_slam_tpu.ops import matching, ransac, triangulation


class MonoInitResult(NamedTuple):
    success: jax.Array       # bool
    R_2w: jax.Array          # [3,3] pose of frame 2 (frame 1 = identity)
    t_2w: jax.Array          # [3]
    matches: jax.Array       # [N] i32: frame-2 keypoint per frame-1 keypoint
    points_w: jax.Array      # [N, 3] triangulated (frame-1 camera = world)
    point_ok: jax.Array      # [N] bool
    num_points: jax.Array    # i32
    used_homography: jax.Array  # bool
    num_matches: jax.Array   # i32 raw area matches (restart-decision input)


@functools.partial(
    jax.jit, static_argnames=("camera", "min_triangulated", "coherent")
)
def try_initialize_mono(
    camera,
    feats1,
    feats2,
    key,
    *,
    min_triangulated: int = 50,
    coherent: bool = False,
):
    """Attempt two-view initialization between two monocular frames.

    Mirrors initialize::perspective::initialize (perspective.cc:54-122):
    area matching, H and F model estimation, selection by
    ``rel_score_H > 0.40``, pose recovery by cheirality, triangulation.

    ``coherent``: run the spatially-coherent consensus for BOTH model
    races (the reference's GC-RANSAC at perspective.cc:70-85, selected
    by the same YAML key as the plane path's graph-cut mode) — MSAC
    seed + mean-field label smoothing over the match k-NN graph.
    """
    from structure_plp_slam_tpu.camera import CameraModel

    is_equirect = camera.model is CameraModel.EQUIRECTANGULAR
    bits1 = matching.unpack_desc_bits(feats1["desc"])
    bits2 = matching.unpack_desc_bits(feats2["desc"])
    m12 = matching.match_in_area(
        feats1["xy"], feats1["angle"], bits1, feats1["valid"],
        feats2["xy"], feats2["angle"], bits2, feats2["valid"],
        window=100.0, max_hamming=50, ratio=0.9,
        wrap_cols=float(camera.cols) if is_equirect else None,
    )
    has = m12 >= 0
    N = m12.shape[0]
    m_safe = jnp.clip(m12, 0, N - 1)
    uv1 = feats1["xy"]
    uv2 = feats2["xy"][m_safe]
    b1 = feats1["bearing"]
    b2 = feats2["bearing"][m_safe]

    import math

    k1, k2 = jax.random.split(key)
    # Angular inlier threshold scaled to ~2 px at this camera's pixel pitch
    # (equirectangular pixels subtend far larger angles than a ~500 px-focal
    # pinhole, so a fixed angular bound would reject every true match).
    ang_2px_sq = (2.0 / camera.focal_like) ** 2
    if coherent:
        E, in_e, s_e = ransac.essential_ransac_coherent(
            b1, b2, uv1, has, k2, inlier_thr=max(1e-6, ang_2px_sq)
        )
    else:
        E, in_e, s_e = ransac.essential_ransac(
            b1, b2, has, k2, inlier_thr=max(1e-6, ang_2px_sq)
        )
    if camera.model is CameraModel.EQUIRECTANGULAR:
        # Equirectangular init: essential matrix on sphere bearings only
        # (reference: initialize/bearing_vector.cc — no homography model
        # on the sphere).
        Rs_e, ts_e = ransac.decompose_essential(E)
        R, t, pts, good, count = ransac.select_pose_by_cheirality(
            Rs_e, ts_e, b1, b2, in_e & has, spherical=True,
            reproj_cos=math.cos(5.0 / camera.focal_like),
        )
        return MonoInitResult(
            success=count >= min_triangulated,
            R_2w=R,
            t_2w=t,
            matches=jnp.where(good, m12, -1),
            points_w=pts,
            point_ok=good,
            num_points=count,
            used_homography=jnp.asarray(False),
            num_matches=jnp.sum(has.astype(jnp.int32)),
        )
    if coherent:
        H, in_h, s_h = ransac.homography_ransac_coherent(uv1, uv2, has, k1)
    else:
        H, in_h, s_h = ransac.homography_ransac(uv1, uv2, has, k1)

    # Put the essential score in pixel units to compare with H
    # (angular err * f^2 ~ px^2; reference compares chi2 sums directly).
    err_ang = ransac.epipolar_error_angular(E, b1, b2)
    f2 = camera.fx * camera.fy
    err_px = err_ang * f2
    s_e_px = jnp.sum(jnp.where(has, jnp.maximum(11.98 - err_px, 0.0), 0.0))
    rel_h = s_h / jnp.maximum(s_h + s_e_px, 1e-9)
    use_h = rel_h > 0.40

    K = jnp.array(
        [
            [camera.fx, 0.0, camera.cx],
            [0.0, camera.fy, camera.cy],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    Rs_h, ts_h = ransac.decompose_homography(H, K)
    Rs_e, ts_e = ransac.decompose_essential(E)
    # Pad E candidates (4) to 8 rows so shapes match, then pick the set.
    Rs_e8 = jnp.concatenate([Rs_e, Rs_e], axis=0)
    ts_e8 = jnp.concatenate([ts_e, ts_e], axis=0)
    Rs = jnp.where(use_h, Rs_h, Rs_e8)
    ts = jnp.where(use_h, ts_h, ts_e8)
    inliers = jnp.where(use_h, in_h, in_e)

    R, t, pts, good, count = ransac.select_pose_by_cheirality(
        Rs, ts, b1, b2, inliers & has
    )
    success = count >= min_triangulated
    return MonoInitResult(
        success=success,
        R_2w=R,
        t_2w=t,
        matches=jnp.where(good, m12, -1),
        points_w=pts,
        point_ok=good,
        num_points=count,
        used_homography=use_h,
        num_matches=jnp.sum(has.astype(jnp.int32)),
    )


def scale_to_median_depth(points_w, point_ok, t_2w, target: float = 1.0,
                          use_dist: bool = False):
    """Normalize map scale so median point depth (in frame 1 = world) is
    ``target`` (reference: initializer.cc:310-320 scale_map). With
    ``use_dist`` the ray length replaces z-depth (the reference's
    compute_median_depth(abs=true) path used for equirectangular, where
    points surround the camera and z has no sign convention)."""
    depth = jnp.linalg.norm(points_w, axis=-1) if use_dist else points_w[:, 2]
    z = jnp.where(point_ok, depth, jnp.nan)
    med = jnp.nanmedian(z)
    s = target / jnp.maximum(med, 1e-9)
    return points_w * s, t_2w * s, s
