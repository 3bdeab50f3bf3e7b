"""Loop detection, validation, and correction.

TPU-native replacement for the reference's loop-closing thread
(src/PLPSLAM/global_optimization_module.cc, module/loop_detector.cc,
module/loop_bundle_adjuster.cc). The thread becomes host orchestration
around four jitted stages:

1. detect    — BoW-style similarity against ALL keyframes in one matmul,
               min-score gating from the covisibility neighborhood and a
               continuity >= 3 requirement (loop_detector.cc:102-127);
2. validate  — dense descriptor matching between the two keyframes'
               landmark sets, batched Sim3 RANSAC + reweighted refinement
               (loop_detector.cc:334 select_loop_candidate_via_Sim3);
3. correct   — Sim3 propagation over the current keyframe's covisibles,
               landmark transformation, duplicate fusion
               (global_optimization_module.cc:233-260);
4. optimize  — dense Sim3 pose-graph GN over the whole keyframe set
               (models/pose_graph.py) followed by a wide local BA
               (the reference's loop BA thread, loop_bundle_adjuster.cc).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.data.bow import BowIndex
from structure_plp_slam_tpu.models import mapper, pose_graph as pg
from structure_plp_slam_tpu.ops import lie, matching, sim3_solver
from structure_plp_slam_tpu.utils.logging import get_logger

_log = get_logger("loop_closer")


@functools.partial(jax.jit, static_argnames=("camera",))
def _match_landmark_pairs(camera, state: ms.MapState, kf1, kf2):
    """Match keypoints-with-landmarks of kf1 against those of kf2.

    Returns per-kf1-slot: (lm1 [N], lm2 [N], pts1_c1 [N,3], pts2_c2 [N,3],
    uv1 [N,2], uv2 [N,2], sig1 [N], sig2 [N], valid [N]).
    Point coordinates are in each keyframe's own camera frame (the Sim3
    solver convention, sim3_solver.cc).
    """
    N = state.kf_xy.shape[1]
    L = state.lm_pos.shape[0]
    has1 = (state.kf_lm_idx[kf1] >= 0) & state.kf_kp_valid[kf1]
    has2 = (state.kf_lm_idx[kf2] >= 0) & state.kf_kp_valid[kf2]
    bits1 = matching.unpack_desc_bits(state.kf_desc[kf1])
    bits2 = matching.unpack_desc_bits(state.kf_desc[kf2])
    d = matching.distance_matrix_mxu(bits1, bits2, has1, has2)
    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    rev = jnp.argmin(d, axis=0)
    ok = (best_d <= 50) & (rev[best] == jnp.arange(N)) & has1

    lm1 = state.kf_lm_idx[kf1]
    lm2 = state.kf_lm_idx[kf2][best]
    X1 = state.lm_pos[jnp.clip(lm1, 0, L - 1)]
    X2 = state.lm_pos[jnp.clip(lm2, 0, L - 1)]
    R1, t1 = state.kf_pose[kf1, :, :3], state.kf_pose[kf1, :, 3]
    R2, t2 = state.kf_pose[kf2, :, :3], state.kf_pose[kf2, :, 3]
    pts1 = X1 @ R1.T + t1
    pts2 = X2 @ R2.T + t2
    uv1 = state.kf_xy[kf1]
    uv2 = state.kf_xy[kf2][best]
    sig1 = jnp.power(1.2, state.kf_level[kf1].astype(jnp.float32)) ** 2
    sig2 = jnp.power(1.2, state.kf_level[kf2][best].astype(jnp.float32)) ** 2
    ok = ok & (lm2 >= 0) & (pts1[:, 2] > 0) & (pts2[:, 2] > 0)
    return lm1, lm2, pts1, pts2, uv1, uv2, sig1, sig2, ok


@functools.partial(jax.jit, static_argnames=("camera",))
def _validate_packed(camera, state: ms.MapState, kf_cur, kf_cand, key):
    """Fused Sim3 validation: match + RANSAC + refine in one dispatch.
    Packed layout: [n_matches, ransac_inliers, refined_inliers, s,
    R(9), t(3)]."""
    (lm1, lm2, pts1, pts2, uv1, uv2, sig1, sig2, ok) = _match_landmark_pairs(
        camera, state, kf_cur, kf_cand
    )
    n_matches = jnp.sum(ok)
    R, t, s, inl, cnt = sim3_solver.sim3_ransac(
        camera, pts1, pts2, uv1, uv2, sig1, sig2, ok, key
    )
    R2, t2, s2, inl2, cnt2 = sim3_solver.refine_sim3(
        camera, R, t, s, pts1, pts2, uv1, uv2, inl
    )
    return jnp.concatenate([
        jnp.stack([
            n_matches.astype(jnp.float32), cnt.astype(jnp.float32),
            cnt2.astype(jnp.float32), s2.astype(jnp.float32),
        ]),
        R2.reshape(-1), t2.reshape(-1),
    ])


@functools.partial(jax.jit, static_argnames=("cap",))
def _strong_pair_list(state: ms.MapState, cap: int):
    """Compact [cap, 2] list of strong covisibility pairs (weight >= 100,
    j >= i + 2 — the pose graph's extra edges) extracted ON DEVICE so the
    host fetches a few KB instead of the full [K, K] covisibility matrix
    (67 MB at K = 4096; round-3 review weak #4). -1 rows are padding."""
    W = ms.covisibility_matrix(state)
    K = W.shape[0]
    valid = state.kf_valid
    iu = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    ju = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    ok = (W >= 100) & valid[:, None] & valid[None, :] & (ju >= iu + 2)
    idx = jnp.nonzero(ok.reshape(-1), size=cap, fill_value=-1)[0]
    pair_i = jnp.where(idx >= 0, idx // K, -1)
    pair_j = jnp.where(idx >= 0, idx % K, -1)
    return jnp.stack([pair_i, pair_j], axis=1).astype(jnp.int32)


@jax.jit
def _pack_detect_arrays(cov, kf, scores, kf_valid):
    """Current keyframe's covisibility row + scores + validity in ONE
    [K, 3] array so the device->host fetch is a single small RPC (each
    pytree leaf is a separate ~20 ms round trip on a tunnel-attached TPU;
    the full [K, K] matrix would be a 67 MB copy at K = 4096 — only the
    candidate rows are ever needed, and those are gathered on demand in
    :meth:`LoopCloser.detect_consume`)."""
    return jnp.stack([
        cov[kf].astype(jnp.float32),
        scores,
        kf_valid.astype(jnp.float32),
    ], axis=1)


def _detect_packed(state: ms.MapState, kf, bow, ind=None):
    cov = ms.covisibility_matrix(state, ind)
    return (
        _pack_detect_arrays(cov, kf, bow.scores_for_slot(state, kf),
                            state.kf_valid),
        cov,
    )


class LoopCloser:
    def __init__(self, camera, max_keyframes: int = 0, *,
                 min_continuity: int = 3, min_inliers: int = 20,
                 min_gap: int = 10):
        # max_keyframes is accepted for back-compat; the retrieval index is
        # stateless over the MapState and needs no capacity.
        self.camera = camera
        self.bow = BowIndex()
        self.min_continuity = min_continuity
        self.min_inliers = min_inliers
        self.min_gap = min_gap
        self._continuity: list = []
        # Optional jax.sharding.Mesh: with >1 device the post-loop global
        # BA runs landmark-sharded (parallel/distributed_ba via
        # global_ba.run_global_ba's mesh path).
        self.mesh = None
        self.last_loop_kf = -999
        self.loop_edges: List[Tuple[int, int, np.ndarray, np.ndarray, float]] = []
        self.num_loops_closed = 0

    # ------------------------------------------------------------------
    def detect_dispatch(self, state: ms.MapState, kf: int, ind=None):
        """Dispatch the loop-detection compute for keyframe ``kf`` and
        start its device->host copy in the background. Returns the packed
        device array (consume with :meth:`detect_consume`), or None when
        inside the post-loop cool-down gap.

        The reference's loop detector runs on its own thread
        (global_optimization_module.cc), so detection for a keyframe never
        blocks the feed; here the same latency tolerance lets the fetch
        ride the async copy and be consumed at the NEXT keyframe."""
        if kf - self.last_loop_kf < self.min_gap:
            return None
        packed, cov = _detect_packed(state, kf, self.bow, ind)
        try:
            packed.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        return packed, cov

    def detect_consume(self, packed, kf: int) -> Optional[int]:
        """Host half of detection: min-score + continuity gating over the
        packed [K, 3] array fetched from :meth:`detect_dispatch`.

        Continuity follows the reference (loop_detector.cc:102-127): a
        candidate continues a previous round's "candidate cluster" when its
        covisibility SET intersects that cluster's set; a loop fires only
        after min_continuity consecutive continuations. One [K, 3] fetch
        per call; the few candidates' covisibility rows (needed for their
        cluster sets) are gathered from the device matrix on demand — the
        full [K, K] matrix never crosses the wire."""
        packed, cov = packed
        packed = np.asarray(packed)
        K = packed.shape[0]
        W = packed[:, 0]
        sims = packed[:, 1]
        kf_valid = packed[:, 2] > 0.5
        covis = (W >= 15) & kf_valid
        covis[kf] = True
        if covis.sum() > 1:
            min_score = float(sims[covis & (np.arange(len(sims)) != kf)].min())
        else:
            min_score = 0.2
        cand_mask = kf_valid & ~covis & (sims >= max(min_score, 0.1))
        cand_mask[max(0, kf - self.min_gap):] = False
        cands = np.where(cand_mask)[0].tolist()

        # self._continuity: list of (covisibility-cluster frozenset, count).
        prev_clusters = self._continuity if isinstance(self._continuity, list) else []
        new_clusters = []
        matured = []
        if cands:
            # One small gather RPC: only the candidates' rows.
            W_rows = np.asarray(cov[np.asarray(cands, np.int32)])  # [n, K]
        for row, c in enumerate(cands):
            cluster = frozenset(
                np.where((W_rows[row] >= 15) & kf_valid)[0].tolist()
            ) | {int(c)}
            prev = max(
                (n for cl, n in prev_clusters if cl & cluster), default=0
            )
            new_clusters.append((cluster, prev + 1))
            if prev + 1 >= self.min_continuity:
                matured.append(int(c))
        self._continuity = new_clusters
        if not matured:
            return None
        # Best-scoring matured candidate.
        return int(max(matured, key=lambda c: sims[c]))

    def detect(self, state: ms.MapState, kf: int) -> Optional[int]:
        """Synchronous detection (dispatch + consume in one call)."""
        packed = self.detect_dispatch(state, kf)
        if packed is None:
            return None
        return self.detect_consume(packed, kf)

    # ------------------------------------------------------------------
    def validate_dispatch(self, state: ms.MapState, kf_cur: int,
                          kf_cand: int, key):
        """Dispatch the WHOLE Sim3 validation ladder (dense landmark
        matching, Sim3 RANSAC, reweighted refinement) as one jit and
        start its packed result's async device->host copy. Consume with
        :meth:`validate_consume` — the fetch then costs a ready-read, not
        a blocking round trip (the previous inline ladder synced 3x per
        candidate on the feed path; global_optimization_module.cc:90-296
        runs all of this on the loop thread)."""
        packed = _validate_packed(self.camera, state, kf_cur, kf_cand, key)
        try:
            packed.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        return packed

    def validate_consume(self, packed):
        """Gate the packed validation result; returns (R_21, t_21, s_21)
        or None (thresholds: reference relocalizer/loop ladder)."""
        v = np.asarray(packed)
        if min(v[0], v[1], v[2]) < self.min_inliers:
            return None
        return (
            v[4:13].reshape(3, 3).astype(np.float32),
            v[13:16].astype(np.float32),
            float(v[3]),
        )

    def validate(self, state: ms.MapState, kf_cur: int, kf_cand: int, key):
        """Sim3 validation. Returns (R_21, t_21, s_21) mapping points in
        kf_cur's camera frame to kf_cand's camera frame, or None."""
        return self.validate_consume(
            self.validate_dispatch(state, kf_cur, kf_cand, key)
        )

    # ------------------------------------------------------------------
    # Async correction pieces (System's deferred loop-fix phase machine):
    # all host math runs on PREFETCHED arrays, so no phase ever blocks on
    # a device fetch — the role of the reference's loop THREAD
    # (global_optimization_module.cc:90-296 never stalls tracking).
    # ------------------------------------------------------------------
    def correct_host_poses(self, old_pose_h, kf_valid_h, covis_rows_h,
                           kf_cur: int, kf_cand: int, R21, t21, s21,
                           neigh_extend=()):
        """Pure-numpy neighborhood Sim3 correction on prefetched host
        arrays (the math of :meth:`correct`'s first stage). Returns
        (R_new [K,3,3], t_new [K,3], s_new [K], neigh [K] bool).
        ``neigh_extend``: extra keyframe ids forced into the corrected
        neighborhood (keyframes inserted while the fix was in flight —
        they are tracker-local to kf_cur by construction)."""
        K = old_pose_h.shape[0]

        def s_inv(R, t, s):
            Rt = np.swapaxes(R, -1, -2)
            return Rt, -(1.0 / s)[..., None] * np.einsum(
                "...ij,...j->...i", Rt, t), 1.0 / s

        def s_mul(Ra, ta, sa, Rb, tb, sb):
            return (
                Ra @ Rb,
                sa[..., None] * np.einsum("...ij,...j->...i", Ra, tb) + ta,
                sa * sb,
            )

        R21 = np.asarray(R21, np.float32)
        t21 = np.asarray(t21, np.float32)
        s21 = np.float32(s21)
        Ri, ti, si = s_inv(R21, t21, s21)
        Rc = old_pose_h[kf_cand, :, :3]
        tc = old_pose_h[kf_cand, :, 3]
        # S_cur_corr = S_21^-1 o S_cand (scalar si).
        R_cur_c = Ri @ Rc
        t_cur_c = si * (Ri @ tc) + ti
        s_cur_c = np.float32(si)

        neigh = (covis_rows_h[0] >= 15) & kf_valid_h
        neigh &= ~((covis_rows_h[1] >= 15) | (np.arange(K) == kf_cand))
        neigh[kf_cur] = True
        for e in neigh_extend:
            if 0 <= e < K:
                neigh[e] = True

        R_old = old_pose_h[:, :, :3]
        t_old = old_pose_h[:, :, 3]
        s_old = np.ones((K,), np.float32)
        Rcu = old_pose_h[kf_cur, :, :3]
        tcu = old_pose_h[kf_cur, :, 3]
        Rcui, tcui, scui = s_inv(Rcu, tcu, np.float32(1.0))
        R_rel, t_rel, s_rel = s_mul(
            R_old, t_old, s_old,
            np.broadcast_to(Rcui, (K, 3, 3)), np.broadcast_to(tcui, (K, 3)),
            np.broadcast_to(scui, (K,)),
        )
        R_corr, t_corr, s_corr = s_mul(
            R_rel, t_rel, s_rel,
            np.broadcast_to(R_cur_c, (K, 3, 3)),
            np.broadcast_to(t_cur_c, (K, 3)),
            np.broadcast_to(np.asarray(s_cur_c, np.float32), (K,)),
        )
        R_new = np.where(neigh[:, None, None], R_corr, R_old)
        t_new = np.where(neigh[:, None], t_corr, t_old)
        s_new = np.where(neigh, s_corr, s_old).astype(np.float32)
        return (R_new.astype(np.float32), t_new.astype(np.float32),
                s_new, neigh)

    def build_graph_problem(self, pose_h, kf_valid_h, pairs_h,
                            anchor_kf: int):
        """Pose-graph problem from HOST arrays: sequential chain +
        device-extracted strong covisibility pairs + accumulated loop
        edges (the edge math of :meth:`_optimize_graph`, with the [K, K]
        covisibility fetch replaced by the compact ``pairs_h`` list)."""
        K = pose_h.shape[0]
        valid_ids = np.where(kf_valid_h)[0]
        if len(valid_ids) < 3:
            return None, valid_ids
        pose = pose_h
        live_pairs = pairs_h[pairs_h[:, 0] >= 0]
        if len(pairs_h) and pairs_h[-1, 0] >= 0:
            _log.warning(
                "strong-pair list full (%d) — some covisibility edges "
                "dropped from the pose graph", len(pairs_h)
            )
        ei = np.concatenate([valid_ids[:-1], live_pairs[:, 0]]).astype(
            np.int64)
        ej = np.concatenate([valid_ids[1:], live_pairs[:, 1]]).astype(
            np.int64)
        Ri_, ti_ = pose[ei, :, :3], pose[ei, :, 3]
        Rj_, tj_ = pose[ej, :, :3], pose[ej, :, 3]
        R_m = np.einsum("eab,ecb->eac", Rj_, Ri_)
        t_m = tj_ - np.einsum("eab,eb->ea", R_m, ti_)
        s_m = np.ones(len(ei), np.float32)
        w_m = np.ones(len(ei), np.float32)
        live = [
            (i, j, R_, t_, s_) for (i, j, R_, t_, s_) in self.loop_edges
            if kf_valid_h[i] and kf_valid_h[j]
        ]
        if live:
            ei = np.concatenate([ei, [e[0] for e in live]])
            ej = np.concatenate([ej, [e[1] for e in live]])
            R_m = np.concatenate([R_m, np.stack([e[2] for e in live])])
            t_m = np.concatenate([t_m, np.stack([e[3] for e in live])])
            s_m = np.concatenate([s_m, [e[4] for e in live]])
            w_m = np.concatenate([w_m, np.full(len(live), 10.0, np.float32)])
        E = len(ei)
        E_pad = 1 << max(8, (E - 1).bit_length())
        pad = E_pad - E
        ei = np.concatenate([ei, np.zeros(pad, np.int64)])
        ej = np.concatenate([ej, np.zeros(pad, np.int64)])
        R_m = np.concatenate([R_m, np.tile(np.eye(3, dtype=np.float32),
                                           (pad, 1, 1))])
        t_m = np.concatenate([t_m, np.zeros((pad, 3), np.float32)])
        s_m = np.concatenate([s_m, np.ones(pad, np.float32)])
        w_m = np.concatenate([w_m, np.zeros(pad, np.float32)])
        prob = pg.PoseGraphProblem(
            R=jnp.asarray(pose[:, :, :3]),
            t=jnp.asarray(pose[:, :, 3]),
            s=jnp.ones((K,), jnp.float32),
            fixed=jnp.asarray(np.arange(K) == anchor_kf),
            valid=jnp.asarray(kf_valid_h),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_R=jnp.asarray(R_m, jnp.float32),
            edge_t=jnp.asarray(t_m, jnp.float32),
            edge_s=jnp.asarray(s_m, jnp.float32),
            edge_valid=jnp.asarray(np.arange(E_pad) < E),
            edge_weight=jnp.asarray(w_m, jnp.float32),
        )
        return prob, valid_ids

    def solve_graph(self, prob, valid_ids, K: int):
        """Dispatch the pose-graph solve (dense <= 512, matrix-free PCG
        beyond). Returns device (R_opt, t_opt, s_opt)."""
        if K > 512:
            E_pad = prob.edge_i.shape[0]
            raw_of_comp = np.full(K, -1, np.int64)
            raw_of_comp[:len(valid_ids)] = valid_ids
            n_chain = len(valid_ids) - 1
            edge_chain_pos = np.full(E_pad, -1, np.int64)
            edge_chain_pos[:n_chain] = np.arange(n_chain)
            R_opt, t_opt, s_opt, _ = pg.optimize_pose_graph_pcg(
                prob, jnp.asarray(raw_of_comp, jnp.int32),
                jnp.asarray(edge_chain_pos, jnp.int32),
            )
        else:
            R_opt, t_opt, s_opt, _ = pg.optimize_pose_graph(prob)
        return R_opt, t_opt, s_opt

    # ------------------------------------------------------------------
    def correct(self, state: ms.MapState, kf_cur: int, kf_cand: int,
                R21, t21, s21, inv_sigma_sq_table, *,
                run_global_ba: bool = True):
        """Propagate the loop constraint and optimize the pose graph.

        ``run_global_ba=False`` stops after the pose graph: the caller
        (System's deferred loop-BA machinery) runs the full-map BA in
        chunks across subsequent frames instead — the role of the
        reference's 4th thread (loop_bundle_adjuster.cc:68-145 runs
        global BA WITHOUT blocking tracking, then merges).

        Returns the corrected MapState.
        """
        K = state.kf_pose.shape[0]
        kf_valid = np.array(state.kf_valid)
        old_pose = np.array(state.kf_pose)

        # Corrected Sim3 pose of the current keyframe:
        # S_cur_corr = S_21^-1 ∘ S_cand  (world -> cur with scale).
        R21j = jnp.asarray(R21, jnp.float32)
        t21j = jnp.asarray(t21, jnp.float32)
        s21j = jnp.asarray(s21, jnp.float32)
        Ri, ti, si = lie.sim3_inverse(R21j, t21j, s21j)
        Rc = jnp.asarray(old_pose[kf_cand, :, :3])
        tc = jnp.asarray(old_pose[kf_cand, :, 3])
        R_cur_c, t_cur_c, s_cur_c = lie.sim3_compose(
            Ri, ti, si, Rc, tc, jnp.float32(1.0)
        )

        # Covisible neighborhood of cur gets the rigid-relative correction:
        # S_i_corr = (S_i_old ∘ S_cur_old^-1) ∘ S_cur_corr. The CANDIDATE
        # and its covisibles are explicitly excluded: they are the loop's
        # fixed side (the pose graph anchors there), and if cur<->cand
        # observations already exist (fuse/re-association) the candidate
        # would otherwise ride the correction and move the anchor itself.
        Wm = np.array(ms.covisibility_matrix(state)[
            np.array([kf_cur, kf_cand])
        ])
        neigh = (Wm[0] >= 15) & kf_valid
        neigh &= ~((Wm[1] >= 15) | (np.arange(K) == kf_cand))
        neigh[kf_cur] = True  # cur always corrects (even if cand-covisible)

        R_old = jnp.asarray(old_pose[:, :, :3])
        t_old = jnp.asarray(old_pose[:, :, 3])
        s_old = jnp.ones((K,), jnp.float32)

        Rcu = jnp.asarray(old_pose[kf_cur, :, :3])
        tcu = jnp.asarray(old_pose[kf_cur, :, 3])
        Rcui, tcui, scui = lie.sim3_inverse(Rcu, tcu, jnp.float32(1.0))
        # Per-keyframe relative (batched over K).
        R_rel, t_rel, s_rel = lie.sim3_compose(
            R_old, t_old, s_old,
            jnp.broadcast_to(Rcui, (K, 3, 3)), jnp.broadcast_to(tcui, (K, 3)),
            jnp.broadcast_to(scui, (K,)),
        )
        R_corr, t_corr, s_corr = lie.sim3_compose(
            R_rel, t_rel, s_rel,
            jnp.broadcast_to(R_cur_c, (K, 3, 3)),
            jnp.broadcast_to(t_cur_c, (K, 3)),
            jnp.broadcast_to(s_cur_c, (K,)),
        )
        neigh_j = jnp.asarray(neigh)
        R_new = jnp.where(neigh_j[:, None, None], R_corr, R_old)
        t_new = jnp.where(neigh_j[:, None], t_corr, t_old)
        s_new = jnp.where(neigh_j, s_corr, s_old)

        # Move landmarks, LINES and PLANES of the corrected neighborhood
        # through their reference keyframes' Sim3 deltas (reference:
        # global_optimization_module.cc:233-255 moves landmarks and lines).
        lm_in_neigh = neigh_j[jnp.clip(state.lm_ref_kf, 0, K - 1)] & state.lm_valid
        ln_in_neigh = neigh_j[jnp.clip(state.ln_ref_kf, 0, K - 1)] & state.ln_valid
        pl_in_neigh = neigh_j[jnp.clip(state.pl_ref_kf, 0, K - 1)] & state.pl_valid
        state = pg.correct_map_structures(
            state, R_old, t_old, s_old, R_new, t_new, s_new,
            lm_mask=lm_in_neigh, ln_mask=ln_in_neigh, pl_mask=pl_in_neigh,
        )

        # Fold scale into SE3: t /= s (reference: convert Sim3->SE3).
        pose_se3 = jnp.concatenate(
            [R_new, (t_new / jnp.maximum(s_new, 1e-12)[:, None])[:, :, None]], axis=2
        )
        state = state._replace(kf_pose=pose_se3)

        # Fuse duplicated landmarks around the current keyframe
        # (global_optimization_module.cc:257-260).
        cand_mask = jnp.zeros((K,), bool).at[kf_cand].set(True)
        cand_lms = ms.local_landmark_mask(state, cand_mask)
        state, _ = mapper.fuse_into_keyframe(self.camera, state, kf_cur, cand_lms)

        # ---------------- pose-graph optimization ----------------------
        self.loop_edges.append((kf_cur, kf_cand, np.array(R21), np.array(t21),
                                float(s21)))
        state = self._optimize_graph(state, kf_cand)

        self.last_loop_kf = kf_cur
        self._continuity.clear()
        self.num_loops_closed += 1

        if run_global_ba:
            # Full-map global BA after the pose graph (reference: the loop
            # BA thread runs global_bundle_adjuster over the whole map,
            # loop_bundle_adjuster.cc:81-82). Pair-based sparse Schur
            # scales to the full keyframe/landmark set.
            from structure_plp_slam_tpu.models import global_ba

            pose_before = state.kf_pose
            state = global_ba.run_global_ba(
                self.camera, state, np.asarray(inv_sigma_sq_table),
                anchor_kf=kf_cand, mesh=self.mesh,
            )
            # Global BA moves poses and points directly; lines and planes
            # ride their reference keyframe's pose delta (the reference's
            # loop-BA propagation corrects lines too,
            # loop_bundle_adjuster.cc:110-145).
            ones = jnp.ones((K,), jnp.float32)
            state = pg.correct_map_structures(
                state,
                pose_before[:, :, :3], pose_before[:, :, 3], ones,
                state.kf_pose[:, :, :3], state.kf_pose[:, :, 3], ones,
                lm_mask=jnp.zeros_like(state.lm_valid),  # points: BA moved
            )
        return state

    # ------------------------------------------------------------------
    def _optimize_graph(self, state: ms.MapState, anchor_kf: int):
        """Sim3 pose graph: sequential chain + strong covisibility edges +
        accumulated loop edges. Edge enumeration is fully vectorized numpy
        (a Python O(K^2) loop costs seconds at K = 2048), and the edge
        count is padded to a power-of-two bucket so the jitted solve's
        executable is reused across loop closures."""
        K = state.kf_pose.shape[0]
        kf_valid = np.array(state.kf_valid)
        pose = np.array(state.kf_pose)
        valid_ids = np.where(kf_valid)[0]
        if len(valid_ids) < 3:
            return state

        W = np.array(ms.covisibility_matrix(state))

        # Sequential chain (spanning-tree equivalent for a video
        # trajectory) + strong covisibility edges (weight >= 100,
        # reference threshold; skipping immediate successors, which the
        # chain already covers).
        ei = [valid_ids[:-1]]
        ej = [valid_ids[1:]]
        covis_ok = (W >= 100) & kf_valid[:, None] & kf_valid[None, :]
        ci, cj = np.nonzero(np.triu(covis_ok, k=2))
        ei.append(ci)
        ej.append(cj)
        ei = np.concatenate(ei).astype(np.int64)
        ej = np.concatenate(ej).astype(np.int64)
        # Measured S_ji: pose of i in j's frame from current estimates
        # (batched over all chain/covis edges at once).
        Ri, ti = pose[ei, :, :3], pose[ei, :, 3]
        Rj, tj = pose[ej, :, :3], pose[ej, :, 3]
        R_m = np.einsum("eab,ecb->eac", Rj, Ri)
        t_m = tj - np.einsum("eab,eb->ea", R_m, ti)
        s_m = np.ones(len(ei), np.float32)
        w_m = np.ones(len(ei), np.float32)
        # Loop edges keep their measured Sim3 (stored as S_21: cur(i) ->
        # cand(j) mapping of camera-frame points; as a pose edge S_ji
        # with scale).
        live = [
            (i, j, R_, t_, s_) for (i, j, R_, t_, s_) in self.loop_edges
            if kf_valid[i] and kf_valid[j]
        ]
        if live:
            ei = np.concatenate([ei, [e[0] for e in live]])
            ej = np.concatenate([ej, [e[1] for e in live]])
            R_m = np.concatenate([R_m, np.stack([e[2] for e in live])])
            t_m = np.concatenate([t_m, np.stack([e[3] for e in live])])
            s_m = np.concatenate([s_m, [e[4] for e in live]])
            w_m = np.concatenate([w_m, np.full(len(live), 10.0, np.float32)])

        # Pad to a power-of-two bucket: the solve is jitted over static
        # edge counts, so bucketing keeps one executable per bucket.
        E = len(ei)
        E_pad = 1 << max(8, (E - 1).bit_length())
        pad = E_pad - E
        ei = np.concatenate([ei, np.zeros(pad, np.int64)])
        ej = np.concatenate([ej, np.zeros(pad, np.int64)])
        R_m = np.concatenate([R_m, np.tile(np.eye(3, dtype=np.float32),
                                           (pad, 1, 1))])
        t_m = np.concatenate([t_m, np.zeros((pad, 3), np.float32)])
        s_m = np.concatenate([s_m, np.ones(pad, np.float32)])
        w_m = np.concatenate([w_m, np.zeros(pad, np.float32)])
        edge_valid = np.arange(E_pad) < E

        prob = pg.PoseGraphProblem(
            R=jnp.asarray(pose[:, :, :3]),
            t=jnp.asarray(pose[:, :, 3]),
            s=jnp.ones((K,), jnp.float32),
            fixed=jnp.asarray(np.arange(K) == anchor_kf),
            valid=jnp.asarray(kf_valid),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_R=jnp.asarray(R_m, jnp.float32),
            edge_t=jnp.asarray(t_m, jnp.float32),
            edge_s=jnp.asarray(s_m, jnp.float32),
            edge_valid=jnp.asarray(edge_valid),
            edge_weight=jnp.asarray(w_m, jnp.float32),
        )
        R_old = prob.R
        t_old = prob.t
        s_old = prob.s
        # Past K = 512 the dense [7K, 7K] normal system is the structural
        # ceiling (round-2 review, missing #3): switch to matrix-free PCG
        # with the chain-tridiagonal preconditioner (the BCR factor pads
        # non-pow2 K internally, so loaded snapshots / custom capacities
        # take this path too — round-3 review weak #9).
        if K > 512:
            raw_of_comp = np.full(K, -1, np.int64)
            raw_of_comp[:len(valid_ids)] = valid_ids
            n_chain = len(valid_ids) - 1
            edge_chain_pos = np.full(E_pad, -1, np.int64)
            edge_chain_pos[:n_chain] = np.arange(n_chain)
            R_opt, t_opt, s_opt, _ = pg.optimize_pose_graph_pcg(
                prob, jnp.asarray(raw_of_comp, jnp.int32),
                jnp.asarray(edge_chain_pos, jnp.int32),
            )
        else:
            R_opt, t_opt, s_opt, _ = pg.optimize_pose_graph(prob)

        # Landmarks, lines AND planes follow their reference keyframes'
        # corrections (reference: graph_optimizer.cc "afterwards transforms
        # landmarks and lines via corrected Sim3s").
        state = pg.correct_map_structures(
            state, R_old, t_old, s_old, R_opt, t_opt, s_opt
        )
        pose_se3 = jnp.concatenate(
            [R_opt, (t_opt / jnp.maximum(s_opt, 1e-12)[:, None])[:, :, None]],
            axis=2,
        )
        return state._replace(kf_pose=pose_se3)
