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


@functools.partial(
    jax.jit,
    static_argnames=("camera", "num_levels", "scale_factor",
                     "max_candidates", "bow_max_hamming", "bow_chunk"),
)
def _relocalize_batch(camera, state: ms.MapState, feats, inv_sigma_sq_table,
                      key, obs_indicator, min_matches, min_pnp, min_inliers,
                      *, num_levels, scale_factor, max_candidates,
                      bow_max_hamming, bow_chunk):
    """The WHOLE relocalization ladder for the top ``max_candidates``
    retrieval candidates as ONE dispatch returning ONE packed vector
    (reference relocalizer.cc:55- iterates candidates on the CPU; the
    previous port of that loop synced the device 2-3 times PER candidate
    — ~6 tunnel round trips per lost frame).

    All candidates run the full match -> EPnP RANSAC -> track top-up
    ladder vmapped; the first (best-scored) candidate passing every gate
    is selected in-graph. Packed layout:
    [ok, kf, num_tracked, R(9), t(3), kp_lm(N)] (f32; kp_lm indices are
    exact in f32 up to 2^24)."""
    from structure_plp_slam_tpu.data import bow as bow_mod
    from structure_plp_slam_tpu.models import tracker

    L = state.lm_pos.shape[0]
    sims = bow_mod._scores_impl(
        state.kf_desc, state.kf_kp_valid, state.kf_valid,
        feats["desc"], feats["valid"],
        max_hamming=bow_max_hamming, chunk=bow_chunk,
    )
    sims = jnp.where(state.kf_valid, sims, -1.0)
    top_sims, cands = jax.lax.top_k(sims, max_candidates)
    keys = jax.random.split(key, max_candidates)
    info = inv_sigma_sq_table[
        jnp.clip(feats["level"], 0, inv_sigma_sq_table.shape[0] - 1)
    ]

    def per_cand(kf, sim, sub):
        lm, n = _match_frame_to_keyframe(camera, state, kf, feats)
        pts = state.lm_pos[jnp.clip(lm, 0, L - 1)]
        R, t, inl, cnt = pnp.pnp_ransac(
            camera, pts, feats["xy"], info, (lm >= 0) & feats["valid"], sub
        )
        kp_lm0 = jnp.where(inl, lm, -1)
        res = tracker.track_frame(
            camera, state, feats, R, t, kp_lm0, kf, inv_sigma_sq_table,
            obs_indicator, jnp.int32(3),
            num_levels=num_levels, scale_factor=scale_factor,
        )
        ok = (
            (sim > 0.05)
            & (n >= min_matches)
            & (cnt >= min_pnp)
            & (res.num_tracked >= min_inliers)
        )
        return ok, res.num_tracked, res.R, res.t, res.kp_lm

    ok, ntr, Rs, ts_, kplms = jax.vmap(per_cand)(cands, top_sims, keys)
    prio = jnp.where(ok, jnp.arange(max_candidates), max_candidates)
    sel = jnp.argmin(prio)
    return jnp.concatenate([
        jnp.stack([
            jnp.any(ok).astype(jnp.float32),
            cands[sel].astype(jnp.float32),
            ntr[sel].astype(jnp.float32),
        ]),
        Rs[sel].reshape(-1),
        ts_[sel].reshape(-1),
        kplms[sel].astype(jnp.float32),
    ])


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
        >= 50 inliers. All candidates run in ONE vmapped dispatch and the
        result comes back as ONE packed fetch (_relocalize_batch) — one
        host round trip per lost frame instead of ~6."""
        if obs_indicator is None:
            obs_indicator = ms.observation_indicator(state)
        packed = _relocalize_batch(
            self.camera, state, feats, inv_sigma_sq_table, key,
            obs_indicator,
            jnp.int32(self.min_matches), jnp.int32(self.min_pnp_inliers),
            jnp.int32(self.min_inliers),
            num_levels=num_levels, scale_factor=scale_factor,
            max_candidates=max_candidates,
            bow_max_hamming=self.bow.max_hamming,
            bow_chunk=self.bow.chunk,
        )
        vals = np.asarray(packed)
        if vals[0] < 0.5:
            return None
        kf = int(vals[1])
        R = jnp.asarray(vals[3:12].reshape(3, 3))
        t = jnp.asarray(vals[12:15])
        kp_lm = jnp.asarray(vals[15:].astype(np.int32))
        return R, t, kp_lm, kf
