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

from structure_plp_slam_tpu.camera import CameraModel
from structure_plp_slam_tpu.camera import base as cam_base
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
    # Keyframe-decision inputs (keyframe_inserter.cc:54-114), computed on
    # device so the host fetches ONE tuple per frame instead of issuing a
    # second dispatch+sync:
    ref_tracked: jax.Array      # i32 reliable landmarks in ref_kf (>= min_obs)
    n_close_tracked: jax.Array  # i32 close-depth keypoints with a landmark
    n_close_untracked: jax.Array  # i32 close-depth keypoints without one


def _project_landmarks(camera, R, t, lm_pos):
    pc = lm_pos @ R.T + t
    uv, _ = cam_base.project(camera, pc)
    return uv, pc


def _visibility(camera, R, uv, pc, lm_normal, lm_dist_min, lm_dist_max,
                margin=5.0):
    """can_observe gating (reference: frame.cc:797 / landmark.h:105-110):
    in image, positive depth (any direction for equirectangular), distance
    within ORB scale bounds, viewing angle < 60 deg to the landmark's mean
    viewing direction."""
    in_img = cam_base.in_image(camera, uv, margin)
    dist = jnp.linalg.norm(pc, axis=-1)
    in_scale = (dist >= 0.8 * lm_dist_min) & (dist <= 1.3 * lm_dist_max)
    view_c = pc / jnp.maximum(dist[:, None], 1e-9)
    # lm_normal is the mean WORLD-frame viewing direction (cam -> point);
    # the current world-frame viewing direction is R^T @ view_c, so
    # cos = (R^T view_c) . n = view_c . (R n).
    cos = jnp.sum(view_c * (lm_normal @ R.T), axis=-1)
    angle_ok = cos >= 0.5  # < 60 deg (frame.cc:797 ratio 0.5 gate)
    return (
        in_img & cam_base.cheirality(camera, pc) & in_scale & angle_ok,
        dist,
    )


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
    obs_indicator,
    min_obs=jnp.int32(3),
    *,
    num_levels: int = 8,
    scale_factor: float = 1.2,
    local_cap: int = 8192,
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

    from structure_plp_slam_tpu.ops import pallas_matching as pm

    # Association backend: on TPU the fused Pallas kernel
    # (ops/pallas_matching.py) computes matmul + window mask + top-2 in
    # one pass; otherwise a masked distance matmul per candidate set.
    # Equirectangular windows wrap horizontally — the fused kernel's plain
    # |du| gate does not, so that model takes the masked-matmul path.
    #
    # Both paths run over COMPACT candidate sets, not all L slots: the
    # reference matches against the previous frame's landmarks
    # (frame_tracker.cc motion match) and then the local map
    # (search_local_landmarks) — never the whole database. Stage 1's
    # candidates are exactly the <= N landmarks of ``last_kp_lm``;
    # stage 2 gathers the local-map mask into a ``local_cap`` budget.
    # At L = 65536 the full-slot matmuls cost ~17 ms/frame; compacted,
    # the match cost is independent of map capacity.
    use_pallas = (
        jax.default_backend() == "tpu"
        and camera.model is not CameraModel.EQUIRECTANGULAR
    )
    wrap_cols = (
        float(camera.cols)
        if camera.model is CameraModel.EQUIRECTANGULAR
        else None
    )
    if use_pallas:
        Np = ((N + pm.TILE_N - 1) // pm.TILE_N) * pm.TILE_N
        kp_lvl_f = jnp.where(
            kp_valid, feats["level"].astype(jnp.float32), 1e9
        )
        kp_meta = pm.pack_meta_kp(feats["xy"], kp_lvl_f)
        kp_bits_p = kp_bits
        if Np != N:
            kp_meta = jnp.pad(kp_meta, ((0, Np - N), (0, 0)))
            kp_meta = kp_meta.at[N:, 2].set(1e9)
            kp_bits_p = jnp.pad(kp_bits, ((0, Np - N), (0, 0)))

    def assoc(R, t, ids, ids_valid, bits_c, d_pre, radius_table, max_h,
              ratio):
        """Windowed projection matching over a compact candidate set.

        ``ids [Lc]`` are global landmark slot ids (Lc a multiple of the
        kernel tile), ``ids_valid`` gates padding/invalid rows,
        ``bits_c`` their unpacked descriptors, ``d_pre`` the
        precomputed [Lc, N] distance matrix for the non-Pallas path.
        """
        pos_c = state.lm_pos[ids]
        uv, pc = _project_landmarks(camera, R, t, pos_c)
        dmax_c = state.lm_dist_max[ids]
        vis, dist = _visibility(
            camera, R, uv, pc, state.lm_normal[ids],
            state.lm_dist_min[ids], dmax_c,
        )
        cand = ids_valid & vis
        pred_level = matching.predict_scale_level(
            dist, dmax_c, scale_factor, num_levels
        )
        if use_pallas:
            radius = radius_table[jnp.clip(pred_level, 0, num_levels - 1)]
            lm_meta = pm.pack_meta_lm(
                uv, jnp.where(cand, radius, -1.0), pred_level.astype(jnp.float32)
            )
            best_d, second_d, kp_best0 = pm.fused_match(
                bits_c, lm_meta, kp_bits_p, kp_meta
            )
            ok = best_d <= max_h
            if ratio is not None:
                ok = ok & (best_d <= ratio * second_d)
            kp_best = jnp.where(ok & (kp_best0 < N), kp_best0, -1)
            d_best = best_d.astype(jnp.int32)
        else:
            kp_best, d_best = matching.match_by_projection_precomputed(
                d_pre,
                uv,
                pred_level,
                cand,
                feats["xy"],
                feats["level"],
                radius_by_level=radius_table,
                max_hamming=max_h,
                ratio=ratio,
                wrap_cols=wrap_cols,
            )
        return _assoc_to_kp_lm(ids, kp_best, d_best, N), vis

    # ---------------- stage 1: last-frame landmarks, narrow+wide ----------
    # Compact candidate set = the previous frame's matched landmark per
    # keypoint (ids are unique among valid entries by _assoc_to_kp_lm's
    # conflict resolution), padded to a tile multiple.
    Lc1 = ((N + pm.TILE_L - 1) // pm.TILE_L) * pm.TILE_L
    ids1 = jnp.clip(last_kp_lm, 0, L - 1)
    valid1 = (last_kp_lm >= 0) & state.lm_valid[ids1]
    if Lc1 != N:
        ids1 = jnp.pad(ids1, (0, Lc1 - N))
        valid1 = jnp.pad(valid1, (0, Lc1 - N))
    bits1 = matching.unpack_desc_bits(state.lm_desc[ids1])
    d1 = (
        None
        if use_pallas
        else matching.distance_matrix_mxu(bits1, kp_bits, valid1, kp_valid)
    )

    # Projection-window matching uses the reference's loose Hamming bound
    # (match::base HAMMING_DIST_THR_HIGH = 100, used by
    # match_current_and_last_frames / match_frame_and_local_landmarks) —
    # the spatial window is the primary gate; chi2 in the LM solve culls
    # descriptor-level mistakes.
    kp_lm_n0, _ = assoc(R_pred, t_pred, ids1, valid1, bits1, d1,
                        radius_table_narrow, 100, None)
    kp_lm_w0, _ = assoc(R_pred, t_pred, ids1, valid1, bits1, d1,
                        radius_table_wide, 100, None)

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

    # Solve all three strategies as ONE vmapped LM (triples the per-step
    # batch — which TPUs love — instead of tripling the sequential kernel
    # chain). Shorter 2x8 schedule here; the local-map stage below runs the
    # full-depth solve.
    kp_lm_s = jnp.stack([kp_lm_n0, kp_lm_w0, kp_lm_f0])  # [3, N]
    pts_s = state.lm_pos[jnp.clip(kp_lm_s, 0, L - 1)]
    valid_s = (kp_lm_s >= 0) & kp_valid[None]
    res_s = jax.vmap(
        lambda pts, val: pose_opt.optimize_pose(
            camera, R_pred, t_pred, pts, feats["xy"], feats["xr"],
            obs_info, val, num_trials=2, num_iters=8,
        )
    )(pts_s, valid_s)
    kp_lm_post = jnp.where(res_s.inliers, kp_lm_s, -1)

    # Pick the strategy with the most inliers, preferring narrow when it
    # has enough (matches the reference's fallback ladder).
    n_inl = res_s.num_inliers
    use_narrow = n_inl[0] >= 20
    use_wide = ~use_narrow & (n_inl[1] >= jnp.maximum(n_inl[2], 20))
    sel = jnp.where(use_narrow, 0, jnp.where(use_wide, 1, 2))
    R1 = res_s.R[sel]
    t1 = res_s.t[sel]
    kp_lm_1 = kp_lm_post[sel]

    # ---------------- stage 2: local map -----------------------------------
    # Reference keyframe = keyframe sharing most current landmarks
    # (local_map_updater.cc). The observation indicator [K, L] only changes
    # when the MAP changes (keyframe insertion / culling / loop), so the
    # host caches it between keyframes instead of re-scattering per frame.
    ind = obs_indicator
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
    lm_local = (
        jnp.einsum("k,kl->l", kf_local.astype(jnp.float32), ind) > 0
    ) & state.lm_valid

    # Associate local-map landmarks (excluding ones already matched), then
    # optimize over the UNION of stage-1 and stage-2 associations
    # (reference: optimize_current_frame_with_local_map uses all matches,
    # tracking_module.cc:732-759). The local map is gathered into a
    # fixed ``local_cap`` candidate budget (reference caps local
    # keyframes at 60; a 4096+-landmark budget covers the window's
    # landmarks at production densities — overflow drops the
    # highest-numbered slots).
    Lc2 = min(
        ((local_cap + pm.TILE_L - 1) // pm.TILE_L) * pm.TILE_L,
        ((L + pm.TILE_L - 1) // pm.TILE_L) * pm.TILE_L,
    )
    # Compact from the HIGH end of the slot range: landmark slots are
    # allocated in insertion order, so on overflow (> local_cap local
    # landmarks) this keeps the NEWEST landmarks — the ones most likely
    # visible in the current frame — instead of silently dropping them
    # (round-4 advisor, low).
    ids2 = (L - 1) - jnp.nonzero(lm_local[::-1], size=Lc2, fill_value=L - 1)[0]
    valid2 = jnp.arange(Lc2) < jnp.sum(lm_local)
    already = jnp.zeros((L,), bool).at[jnp.clip(kp_lm_1, 0, L - 1)].set(
        kp_lm_1 >= 0
    )
    bits2 = matching.unpack_desc_bits(state.lm_desc[ids2])
    pos2 = state.lm_pos[ids2]
    dmax2 = state.lm_dist_max[ids2]
    uv2, pc2 = _project_landmarks(camera, R1, t1, pos2)
    vis2, dist2 = _visibility(
        camera, R1, uv2, pc2, state.lm_normal[ids2],
        state.lm_dist_min[ids2], dmax2,
    )
    cand2 = valid2 & vis2 & ~already[ids2]
    pred_level2 = matching.predict_scale_level(
        dist2, dmax2, scale_factor, num_levels
    )
    kp_free = kp_valid & (kp_lm_1 < 0)
    if use_pallas:
        radius2 = radius_table_narrow[jnp.clip(pred_level2, 0, num_levels - 1)]
        lm_meta2 = pm.pack_meta_lm(
            uv2, jnp.where(cand2, radius2, -1.0), pred_level2.astype(jnp.float32)
        )
        kp_meta2 = kp_meta.at[:N, 2].set(
            jnp.where(kp_free, feats["level"].astype(jnp.float32), 1e9)
        )
        bd2, sd2, kb2 = pm.fused_match(bits2, lm_meta2, kp_bits_p, kp_meta2)
        ok2 = (bd2 <= 100) & (bd2 <= 0.85 * sd2)
        kp_best2 = jnp.where(ok2 & (kb2 < N), kb2, -1)
        d_best2 = bd2.astype(jnp.int32)
    else:
        d2 = matching.distance_matrix_mxu(bits2, kp_bits, valid2, kp_valid)
        d_free = jnp.where(kp_free[None, :], d2, HAMMING_MASKED)
        kp_best2, d_best2 = matching.match_by_projection_precomputed(
            d_free, uv2, pred_level2, cand2,
            feats["xy"], feats["level"],
            radius_by_level=radius_table_narrow, max_hamming=100, ratio=0.85,
            wrap_cols=wrap_cols,
        )
    kp_lm_2 = _assoc_to_kp_lm(ids2, kp_best2, d_best2, N)
    # INVARIANT: valid entries of the union are unique landmark ids.
    # Stage 1 (kp_lm_1) is unique by _assoc_to_kp_lm's scatter-min
    # conflict resolution (and the BoW fallback's mutual-NN check);
    # stage 2 matches only ~already landmarks onto kp_free keypoints, so
    # it cannot duplicate a stage-1 id, and is itself deduplicated the
    # same way. Downstream consumers (last_kp_lm -> next frame's ids1,
    # the lm_fnd scatter) rely on this — a new strategy that can emit
    # duplicate ids must dedup before the union.
    kp_lm_union = jnp.where(kp_lm_1 >= 0, kp_lm_1, kp_lm_2)
    # Visible-landmark statistics (landmark::increase_num_observable):
    # local-map candidates inside the frustum, plus everything stage 1
    # already matched (the reference counts both).
    vis_mask = jnp.zeros((L,), bool).at[ids2].max(vis2 & valid2)
    vis_mask = vis_mask.at[jnp.clip(kp_lm_1, 0, L - 1)].max(kp_lm_1 >= 0)

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

    # ---------------- keyframe-decision inputs ----------------------------
    # Reliable landmarks of the reference keyframe: observed by >= min_obs
    # keyframes (keyframe_inserter.cc:66-69 get_num_tracked_landmarks).
    counts = jnp.sum(ind, axis=0).astype(jnp.int32)
    ref_lm = state.kf_lm_idx[ref_kf]
    ref_has = (ref_lm >= 0) & state.kf_kp_valid[ref_kf]
    ref_tracked = jnp.sum(
        ref_has & (counts[jnp.clip(ref_lm, 0, None)] >= min_obs)
    )
    # Close-point counts for the stereo/RGB-D insertion condition
    # (ORB-SLAM2 bNeedToInsertClose; depth < true depth threshold).
    close = (
        kp_valid
        & (feats["depth"] > 1e-6)
        & (feats["depth"] < camera.true_depth_threshold)
    )
    n_close_tracked = jnp.sum(close & (kp_lm_final >= 0))
    n_close_untracked = jnp.sum(close & (kp_lm_final < 0))

    return TrackResult(
        R=res2.R,
        t=res2.t,
        kp_lm=kp_lm_final,
        num_tracked=jnp.sum((kp_lm_final >= 0) & kp_valid),
        ref_kf=ref_kf,
        lm_vis=vis_mask,
        lm_fnd=lm_fnd,
        ref_tracked=ref_tracked,
        n_close_tracked=n_close_tracked,
        n_close_untracked=n_close_untracked,
    )


@functools.partial(jax.jit, static_argnames=("camera",))
def count_trackable_in_ref(camera, state: ms.MapState, ref_kf, min_obs,
                           obs_indicator):
    """Number of landmarks the reference keyframe tracks with >= ``min_obs``
    observations (keyframe_inserter decision input,
    keyframe_inserter.cc:54-114; min_obs drops while the map is young,
    mirroring the reference's nMinObs relaxation for <= 2 keyframes)."""
    counts = jnp.sum(obs_indicator, axis=0).astype(jnp.int32)
    lm = state.kf_lm_idx[ref_kf]
    ok = (lm >= 0) & state.kf_kp_valid[ref_kf]
    c = counts[jnp.clip(lm, 0, None)]
    return jnp.sum(ok & (c >= min_obs))
