"""Frame-to-map tracking: association + motion-only optimization.

TPU-native replacement for the reference tracking pipeline
(src/PLPSLAM/tracking_module.cc:424-835 track()/track_current_frame()/
optimize_current_frame_with_local_map, module/frame_tracker.cc,
module/local_map_updater.cc). The reference's three fallback strategies
(motion -> BoW -> robust) exist because CPU matching windows must stay
small; here association is a dense masked matmul, so the "fallback" is
simply a wider window in the same kernel — the jitted step always runs a
narrow pass and a wide pass and keeps the better result.

Landmark association produces a per-keypoint landmark index ``kp_lm [N]``
(-1 = none) — the same structure stored per keyframe in the MapState
(kf_lm_idx), so tracking output feeds keyframe insertion directly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.models import pose_opt
from structure_plp_slam_tpu.ops import matching
from structure_plp_slam_tpu.utils.types import HAMMING_MASKED


class TrackResult(NamedTuple):
    R: jax.Array            # [3, 3]
    t: jax.Array            # [3]
    kp_lm: jax.Array        # [N] i32 landmark per keypoint (-1 none)
    num_tracked: jax.Array  # i32 inlier landmark matches after local-map opt
    ref_kf: jax.Array       # i32 keyframe sharing most landmarks
    lm_vis: jax.Array       # [L] bool landmarks predicted visible (stats)
    lm_fnd: jax.Array       # [L] bool landmarks actually matched (stats)


def _project_landmarks(camera, R, t, lm_pos):
    pc = lm_pos @ R.T + t
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    u = camera.fx * pc[:, 0] / z + camera.cx
    v = camera.fy * pc[:, 1] / z + camera.cy
    return jnp.stack([u, v], axis=-1), pc


def _visibility(camera, uv, pc, lm_normal, lm_dist_min, lm_dist_max, margin=5.0):
    """can_observe gating (reference: frame.cc:797): in image, positive
    depth, distance within ORB scale bounds, viewing angle < 60 deg."""
    in_img = (
        (uv[:, 0] >= margin)
        & (uv[:, 0] < camera.cols - margin)
        & (uv[:, 1] >= margin)
        & (uv[:, 1] < camera.rows - margin)
    )
    dist = jnp.linalg.norm(pc, axis=-1)
    in_scale = (dist >= 0.8 * lm_dist_min) & (dist <= 1.3 * lm_dist_max)
    view = pc / jnp.maximum(dist[:, None], 1e-9)
    # lm_normal is the mean world-frame viewing direction (cam->point); the
    # current viewing direction in world frame is R^T @ view.
    cos = jnp.sum(view * lm_normal, axis=-1)  # normals stored in cam-agnostic form
    return in_img & (pc[:, 2] > 0.0) & in_scale, dist


def _assoc_to_kp_lm(lm_idx_global, kp_best, dist, num_kps):
    """Per-landmark best keypoint -> per-keypoint landmark (conflict: min
    distance wins via scatter-min)."""
    L = lm_idx_global.shape[0]
    safe_kp = jnp.where(kp_best >= 0, kp_best, num_kps)
    best_per_kp = (
        jnp.full((num_kps + 1,), HAMMING_MASKED, jnp.int32).at[safe_kp].min(dist)
    )
    wins = (kp_best >= 0) & (dist <= best_per_kp[safe_kp])
    kp_lm = jnp.full((num_kps + 1,), -1, jnp.int32)
    kp_lm = kp_lm.at[jnp.where(wins, safe_kp, num_kps)].set(
        jnp.where(wins, lm_idx_global, -1), mode="drop"
    )
    return kp_lm[:num_kps]


@functools.partial(
    jax.jit, static_argnames=("camera", "num_levels", "scale_factor", "local_cap")
)
def track_frame(
    camera,
    state: ms.MapState,
    feats,
    R_pred,
    t_pred,
    last_kp_lm,
    prev_ref_kf,
    inv_sigma_sq_table,
    *,
    num_levels: int = 8,
    scale_factor: float = 1.2,
    local_cap: int = 4096,
):
    """One full tracking step (motion association + local-map refinement).

    Args:
      state: MapState.
      feats: current frame feature SoA (from Frontend).
      R_pred, t_pred: motion-model pose prediction.
      last_kp_lm: ``[N]`` landmark ids matched in the previous frame.
      inv_sigma_sq_table: ``[num_levels]`` f32.

    Returns :class:`TrackResult`.
    """
    N = feats["xy"].shape[0]
    L = state.lm_pos.shape[0]
    kp_bits = matching.unpack_desc_bits(feats["desc"])
    kp_valid = feats["valid"]
    obs_info = inv_sigma_sq_table[jnp.clip(feats["level"], 0, num_levels - 1)]

    radius_table_narrow = jnp.asarray(
        [15.0 * scale_factor**lv for lv in range(num_levels)], jnp.float32
    )
    radius_table_wide = radius_table_narrow * 2.0

    # ---------------- stage 1: last-frame landmarks, narrow+wide ----------
    last_lm_mask = jnp.zeros((L,), bool).at[jnp.clip(last_kp_lm, 0, L - 1)].set(
        last_kp_lm >= 0
    )
    last_lm_mask = last_lm_mask & state.lm_valid

    def assoc_and_opt(R, t, lm_mask, radius_table, max_h, ratio, lm_bits_cache=None):
        uv, pc = _project_landmarks(camera, R, t, state.lm_pos)
        vis, dist = _visibility(
            camera, uv, pc, state.lm_normal, state.lm_dist_min, state.lm_dist_max
        )
        cand = lm_mask & vis
        pred_level = matching.predict_scale_level(
            dist, state.lm_dist_max, scale_factor, num_levels
        )
        lm_bits = (
            matching.unpack_desc_bits(state.lm_desc)
            if lm_bits_cache is None
            else lm_bits_cache
        )
        kp_best, d_best = matching.match_by_projection(
            uv,
            pred_level,
            lm_bits,
            cand,
            feats["xy"],
            feats["level"],
            kp_bits,
            kp_valid,
            radius_by_level=radius_table,
            max_hamming=max_h,
            ratio=ratio,
        )
        kp_lm = _assoc_to_kp_lm(
            jnp.arange(L, dtype=jnp.int32), kp_best, d_best, N
        )
        # Build pose-opt observations from associations.
        has = kp_lm >= 0
        pts = state.lm_pos[jnp.clip(kp_lm, 0, L - 1)]
        res = pose_opt.optimize_pose(
            camera,
            R,
            t,
            pts,
            feats["xy"],
            feats["xr"],
            obs_info,
            has & kp_valid,
        )
        kp_lm = jnp.where(res.inliers, kp_lm, -1)
        return res, kp_lm, cand, lm_bits

    lm_bits = matching.unpack_desc_bits(state.lm_desc)
    res_n, kp_lm_n, _, _ = assoc_and_opt(
        R_pred, t_pred, last_lm_mask, radius_table_narrow, 50, None, lm_bits
    )
    res_w, kp_lm_w, _, _ = assoc_and_opt(
        R_pred, t_pred, last_lm_mask, radius_table_wide, 50, None, lm_bits
    )

    # Fallback strategy: descriptor-only matching against the reference
    # keyframe's landmarks, no spatial windows (the reference's
    # bow_match_based_track, frame_tracker.cc:127 — robust when the motion
    # prediction is badly wrong, e.g. at sharp direction changes).
    ref_has = (state.kf_lm_idx[prev_ref_kf] >= 0) & state.kf_kp_valid[prev_ref_kf]
    ref_bits = matching.unpack_desc_bits(state.kf_desc[prev_ref_kf])
    d_ref = matching.distance_matrix_mxu(kp_bits, ref_bits, kp_valid, ref_has)
    best_r = jnp.argmin(d_ref, axis=1)
    best_rd = jnp.min(d_ref, axis=1)
    rev_r = jnp.argmin(d_ref, axis=0)
    ok_r = (best_rd <= 50) & (rev_r[best_r] == jnp.arange(N))
    kp_lm_f0 = jnp.where(ok_r, state.kf_lm_idx[prev_ref_kf][best_r], -1)
    res_f = pose_opt.optimize_pose(
        camera,
        R_pred,
        t_pred,
        state.lm_pos[jnp.clip(kp_lm_f0, 0, L - 1)],
        feats["xy"],
        feats["xr"],
        obs_info,
        (kp_lm_f0 >= 0) & kp_valid,
    )
    kp_lm_f = jnp.where(res_f.inliers, kp_lm_f0, -1)

    # Pick the strategy with the most inliers, preferring narrow when it
    # has enough (matches the reference's fallback ladder).
    use_narrow = res_n.num_inliers >= 20
    use_wide = ~use_narrow & (res_w.num_inliers >= jnp.maximum(res_f.num_inliers, 20))
    R1 = jnp.where(use_narrow, res_n.R, jnp.where(use_wide, res_w.R, res_f.R))
    t1 = jnp.where(use_narrow, res_n.t, jnp.where(use_wide, res_w.t, res_f.t))
    kp_lm_1 = jnp.where(use_narrow, kp_lm_n, jnp.where(use_wide, kp_lm_w, kp_lm_f))

    # ---------------- stage 2: local map -----------------------------------
    # Reference keyframe = keyframe sharing most current landmarks
    # (local_map_updater.cc). Covisibility from the observation indicator.
    ind = ms.observation_indicator(state)  # [K, L]
    cur_lm = jnp.zeros((L,), jnp.float32).at[jnp.clip(kp_lm_1, 0, L - 1)].add(
        (kp_lm_1 >= 0).astype(jnp.float32)
    )
    share = ind @ cur_lm  # [K]
    share = jnp.where(state.kf_valid, share, -1.0)
    ref_kf = jnp.argmax(share).astype(jnp.int32)

    # Local keyframes: covisibles of ref_kf (weight >= 15) + ref itself,
    # capped implicitly by the mask (reference caps at 60).
    W_ref = ind @ ind[ref_kf]  # [K] shared counts with ref
    kf_local = state.kf_valid & ((W_ref >= 15.0) | (jnp.arange(ind.shape[0]) == ref_kf))
    lm_local = ms.local_landmark_mask(state, kf_local)

    # Associate local-map landmarks (excluding ones already matched), then
    # optimize over the UNION of stage-1 and stage-2 associations
    # (reference: optimize_current_frame_with_local_map uses all matches,
    # tracking_module.cc:732-759).
    uv2, pc2 = _project_landmarks(camera, R1, t1, state.lm_pos)
    vis_mask, dist2 = _visibility(
        camera, uv2, pc2, state.lm_normal, state.lm_dist_min, state.lm_dist_max
    )
    already = jnp.zeros((L,), bool).at[jnp.clip(kp_lm_1, 0, L - 1)].set(
        kp_lm_1 >= 0
    )
    cand2 = lm_local & vis_mask & ~already
    pred_level2 = matching.predict_scale_level(
        dist2, state.lm_dist_max, scale_factor, num_levels
    )
    kp_free = kp_valid & (kp_lm_1 < 0)
    kp_best2, d_best2 = matching.match_by_projection(
        uv2, pred_level2, lm_bits, cand2,
        feats["xy"], feats["level"], kp_bits, kp_free,
        radius_by_level=radius_table_narrow, max_hamming=50, ratio=0.85,
    )
    kp_lm_2 = _assoc_to_kp_lm(jnp.arange(L, dtype=jnp.int32), kp_best2, d_best2, N)
    kp_lm_union = jnp.where(kp_lm_1 >= 0, kp_lm_1, kp_lm_2)

    has_u = (kp_lm_union >= 0) & kp_valid
    pts_u = state.lm_pos[jnp.clip(kp_lm_union, 0, L - 1)]
    res2 = pose_opt.optimize_pose(
        camera, R1, t1, pts_u, feats["xy"], feats["xr"], obs_info, has_u
    )
    kp_lm_final = jnp.where(res2.inliers, kp_lm_union, -1)

    # Observation statistics (landmark::increase_num_observable/observed).
    lm_fnd = jnp.zeros((L,), bool).at[jnp.clip(kp_lm_final, 0, L - 1)].set(
        kp_lm_final >= 0
    )

    return TrackResult(
        R=res2.R,
        t=res2.t,
        kp_lm=kp_lm_final,
        num_tracked=jnp.sum((kp_lm_final >= 0) & kp_valid),
        ref_kf=ref_kf,
        lm_vis=vis_mask,
        lm_fnd=lm_fnd,
    )


@functools.partial(jax.jit, static_argnames=("camera",))
def count_trackable_in_ref(camera, state: ms.MapState, ref_kf, min_obs):
    """Number of landmarks the reference keyframe tracks with >= ``min_obs``
    observations (keyframe_inserter decision input,
    keyframe_inserter.cc:54-114; min_obs drops while the map is young,
    mirroring the reference's nMinObs relaxation for <= 2 keyframes)."""
    counts = ms.landmark_observation_counts(state)
    lm = state.kf_lm_idx[ref_kf]
    ok = (lm >= 0) & state.kf_kp_valid[ref_kf]
    c = counts[jnp.clip(lm, 0, None)]
    return jnp.sum(ok & (c >= min_obs))
