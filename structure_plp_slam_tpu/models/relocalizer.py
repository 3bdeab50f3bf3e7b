"""Relocalization from tracking loss.

TPU-native replacement for module/relocalizer (src/PLPSLAM/module/
relocalizer.cc: BoW candidates -> bow-matching >= 20 -> EPnP RANSAC ->
pose optimization -> projection-match top-up -> accept at >= 50 inliers).
Candidates come from the same retrieval index as loop closing; per
candidate one jitted match+PnP runs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.data.bow import BowIndex
from structure_plp_slam_tpu.ops import matching, pnp


@functools.partial(jax.jit, static_argnames=("camera",))
def _match_frame_to_keyframe(camera, state: ms.MapState, kf, feats):
    """Match frame keypoints against a keyframe's landmark observations.

    Returns (lm_idx per frame keypoint [N] i32, valid count).
    """
    N = feats["xy"].shape[0]
    L = state.lm_pos.shape[0]
    has_kf = (state.kf_lm_idx[kf] >= 0) & state.kf_kp_valid[kf]
    bits_f = matching.unpack_desc_bits(feats["desc"])
    bits_k = matching.unpack_desc_bits(state.kf_desc[kf])
    d = matching.distance_matrix_mxu(bits_f, bits_k, feats["valid"], has_kf)
    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    rev = jnp.argmin(d, axis=0)
    ok = (best_d <= 50) & (rev[best] == jnp.arange(N))
    lm = jnp.where(ok, state.kf_lm_idx[kf][best], -1)
    return lm, jnp.sum(lm >= 0)


class Relocalizer:
    def __init__(self, camera, bow: BowIndex, *, min_candidates_matches: int = 20,
                 min_pnp_inliers: int = 15, min_inliers: int = 50):
        """Thresholds follow the reference ladder (relocalizer.{h,cc}):
        >= 20 descriptor matches to attempt a candidate, >= 15 P3P/EPnP
        inliers to attempt the top-up, >= 50 inliers after the
        projection-match top-up + pose optimization to accept."""
        self.camera = camera
        self.bow = bow
        self.min_matches = min_candidates_matches
        self.min_pnp_inliers = min_pnp_inliers
        self.min_inliers = min_inliers

    def relocalize(self, state: ms.MapState, feats, inv_sigma_sq_table, key,
                   max_candidates: int = 3, *, obs_indicator=None,
                   num_levels: int = 8, scale_factor: float = 1.2):
        """Try to recover the camera pose. Returns (R, t, kp_lm, ref_kf)
        or None.

        Stages per candidate (reference relocalizer.cc:55-):
        BoW candidates -> descriptor matching (>= 20) -> EPnP RANSAC
        (>= 15 inliers) -> projection-match TOP-UP against the candidate's
        local map + pose optimization (one tracker pass) -> accept at
        >= 50 inliers."""
        sims = np.array(self.bow.scores(state, feats["desc"], feats["valid"]))
        kf_valid = np.array(state.kf_valid)
        sims = np.where(kf_valid, sims, -1.0)
        order = np.argsort(-sims)[:max_candidates]
        L = state.lm_pos.shape[0]
        for kf in order:
            if sims[kf] <= 0.05:
                break
            lm, n = _match_frame_to_keyframe(self.camera, state, int(kf), feats)
            if int(n) < self.min_matches:
                continue
            pts = state.lm_pos[jnp.clip(lm, 0, L - 1)]
            info = inv_sigma_sq_table[
                jnp.clip(feats["level"], 0, inv_sigma_sq_table.shape[0] - 1)
            ]
            key, sub = jax.random.split(key)
            R, t, inl, cnt = pnp.pnp_ransac(
                self.camera, pts, feats["xy"], info,
                (lm >= 0) & feats["valid"], sub,
            )
            if int(cnt) < self.min_pnp_inliers:
                continue
            kp_lm0 = jnp.where(inl, lm, -1)
            if obs_indicator is None:
                obs_indicator = ms.observation_indicator(state)
            # Top-up: one tracker pass from the PnP pose — projection
            # matching against the candidate's local map, full LM pose
            # optimization (the reference's match_frame_and_local_landmarks
            # + pose_optimizer rerun).
            from structure_plp_slam_tpu.models import tracker

            res = tracker.track_frame(
                self.camera, state, feats, R, t, kp_lm0, jnp.int32(int(kf)),
                inv_sigma_sq_table, obs_indicator, jnp.int32(3),
                num_levels=num_levels, scale_factor=scale_factor,
            )
            if int(res.num_tracked) >= self.min_inliers:
                return res.R, res.t, res.kp_lm, int(kf)
        return None
