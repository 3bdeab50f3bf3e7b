"""System facade: the public API of the framework.

TPU-native replacement for PLPSLAM::system (src/PLPSLAM/system.{h,cc} —
construction wires modules, spawns mapping/loop threads, exposes
feed_*_frame, trajectory save, pause/resume/reset). Differences by design:

* The reference runs tracking on the caller's thread and mapping/loop
  closing on two background threads sharing the map under a global mutex.
  Here the map is immutable-functional device state: every module step is a
  jitted transformation ``MapState -> MapState`` issued by this facade.
  JAX's async dispatch overlaps device work with host bookkeeping — the
  role the threads played — without any locking.
* Frame feeding returns the tracked pose as a DEVICE array (convert with
  np.asarray only when needed — on a tunnel-attached TPU every conversion
  is an RPC round trip). Host-side control decisions (lost/keyframe) are
  deferred by ``track_lag`` frames and overlap later frames' dispatch;
  public reads drain them first.
* Keyframe/landmark capacities are static; the facade owns slot counters.

Usage:
    sys = System(config)
    sys.startup()
    for img, ts in frames:
        pose = sys.feed_monocular_frame(img, ts)
    sys.save_frame_trajectory("traj.txt", fmt="tum")
    sys.shutdown()
"""

from __future__ import annotations

import collections
import contextlib
import dataclasses
import enum
import functools
import time
from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.io import trajectory as traj_io
from structure_plp_slam_tpu.models import (
    frontend as frontend_mod,
    initializer,
    loop_closer as loop_mod,
    mapper,
    relocalizer as reloc_mod,
    tracker,
)
from structure_plp_slam_tpu.camera import CameraModel, CameraSetup
from structure_plp_slam_tpu.utils.logging import get_logger
from structure_plp_slam_tpu.utils.types import round_up

_log = get_logger("system")


class StageTimer:
    """Per-stage timing (reference: tracking_module.cc:607-645 verbose
    stage timings). Wall-clock of the host-side section; with
    ``synced=True`` each section additionally blocks on the device so the
    numbers include device compute (debugging mode — it serializes the
    pipeline, like the reference's verbose logging does)."""

    def __init__(self, synced: bool = False):
        self.synced = synced
        self.times: dict = collections.defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.synced and sync_on is not None:
                jax.block_until_ready(sync_on() if callable(sync_on) else sync_on)
            self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        out = {}
        for name, ts in self.times.items():
            a = np.asarray(ts)
            out[name] = {
                "count": int(len(a)),
                "mean_ms": round(float(a.mean()) * 1e3, 3),
                "median_ms": round(float(np.median(a)) * 1e3, 3),
                "max_ms": round(float(a.max()) * 1e3, 3),
            }
        return out


class TrackerState(enum.Enum):
    NOT_INITIALIZED = "NotInitialized"
    TRACKING = "Tracking"
    LOST = "Lost"


# Layout of the per-frame packed decision vector (one device->host transfer
# carries EVERYTHING the host control flow needs for a frame; on a
# tunnel-attached TPU every fetched pytree LEAF is a separate ~20 ms RPC
# round trip, so the whole decision state travels as a single leaf).
_PK_NUM_TRACKED = 0
_PK_REF_TRACKED = 1
_PK_CLOSE_TRK = 2
_PK_CLOSE_UNTRK = 3
_PK_REF_KF = 4
_PK_NEXT_LM = 5
_PK_POSE = slice(6, 18)      # row-major [3,4] camera-from-world
_PK_REL = slice(18, 30)      # row-major [3,4] pose relative to ref keyframe
_PK_SIZE = 30


def _pack_decision(state, res, next_lm):
    """Fuse every per-frame host-needed value into one f32 vector."""
    kfp = state.kf_pose[res.ref_kf]
    R_ref, t_ref = kfp[:, :3], kfp[:, 3]
    R_rel = res.R @ R_ref.T
    t_rel = res.t - R_rel @ t_ref
    P = jnp.concatenate([res.R, res.t[:, None]], 1)
    rel = jnp.concatenate([R_rel, t_rel[:, None]], 1)
    head = jnp.stack([
        res.num_tracked, res.ref_tracked, res.n_close_tracked,
        res.n_close_untracked, res.ref_kf, next_lm,
    ]).astype(jnp.float32)
    return jnp.concatenate([head, P.reshape(-1), rel.reshape(-1)])


class _TrackCarry(NamedTuple):
    """The tracker's recurrent device state, threaded through the fused
    per-frame step so no component ever round-trips to the host."""

    R: jax.Array            # [3, 3] camera-from-world rotation
    t: jax.Array            # [3]
    Rv: jax.Array           # [3, 3] velocity (frame-to-frame motion model)
    tv: jax.Array           # [3]
    last_kp_lm: jax.Array   # [N] i32 previous frame's keypoint->landmark
    ref_kf: jax.Array       # i32 reference keyframe


@functools.partial(
    jax.jit,
    static_argnames=("camera", "num_levels", "scale_factor", "with_lines"),
)
def _track_step(camera, state, feats, carry: _TrackCarry, inv_sigma_sq,
                obs_ind, min_obs, next_lm, *, num_levels, scale_factor,
                with_lines):
    """The WHOLE per-frame device pipeline as one dispatch: motion-model
    prediction, tracking, landmark statistics, line tracking, motion-model
    update, decision-vector packing, viewer annotations. One jit call per
    frame instead of ~25 eager ops + separate jits — on a tunnel-attached
    TPU each Python->device interaction has RPC cost, so the fusion is the
    difference between ~40 ms and ~5 ms of host time per frame."""
    R_pred = carry.Rv @ carry.R
    t_pred = carry.Rv @ carry.t + carry.tv
    res = tracker.track_frame(
        camera, state, feats, R_pred, t_pred, carry.last_kp_lm,
        carry.ref_kf, inv_sigma_sq, obs_ind, min_obs,
        num_levels=num_levels, scale_factor=scale_factor,
    )
    # Landmark observed/visible statistics.
    state = state._replace(
        lm_n_vis=state.lm_n_vis + res.lm_vis.astype(jnp.int32),
        lm_n_fnd=state.lm_n_fnd + res.lm_fnd.astype(jnp.int32),
    )
    L = state.lm_pos.shape[0]
    if with_lines:
        from structure_plp_slam_tpu.models import line_mapper

        # Line tracking: associate map lines and refine the pose jointly,
        # gated in-graph on >= 3 line matches (reference:
        # pose_optimizer_extended_line path).
        pts = state.lm_pos[jnp.clip(res.kp_lm, 0, L - 1)]
        info = inv_sigma_sq[
            jnp.clip(feats["level"], 0, inv_sigma_sq.shape[0] - 1)
        ]
        state, R_res, t_res, seg_lines = line_mapper.track_lines(
            camera, state,
            feats["seg"], feats["seg_desc"], feats["seg_valid"],
            pts, feats["xy"], info,
            (res.kp_lm >= 0) & feats["valid"],
            res.R, res.t,
        )
        res = res._replace(R=R_res, t=t_res)
    else:
        seg_lines = jnp.zeros((0,), jnp.int32)
    # Motion model update (optimistic; a Lost frame's pose is overwritten
    # by relocalization at consume time).
    Rv2 = res.R @ carry.R.T
    tv2 = res.t - Rv2 @ carry.t
    carry2 = _TrackCarry(
        R=res.R, t=res.t, Rv=Rv2, tv=tv2,
        last_kp_lm=res.kp_lm, ref_kf=res.ref_kf,
    )
    packed = _pack_decision(state, res, next_lm)
    # Viewer annotation: plane id per keypoint (publisher snapshot data).
    kp_plane = jnp.where(
        res.kp_lm >= 0, state.lm_plane[jnp.clip(res.kp_lm, 0, L - 1)], -1
    )
    return state, res, carry2, packed, seg_lines, kp_plane


@jax.jit
def _rebase_pose(R, t, P_old, P_new):
    """Transport a camera pose through a reference keyframe's correction:
    the relative pose to the keyframe is preserved while the keyframe
    moves from ``P_old`` to ``P_new`` (loop correction / global BA). All
    inputs are world->cam."""
    Ro, to = P_old[:, :3], P_old[:, 3]
    Rn, tn = P_new[:, :3], P_new[:, 3]
    R_rel = R @ Ro.T
    t_rel = t - R_rel @ to
    return R_rel @ Rn, R_rel @ tn + t_rel


@jax.jit
def _clear_failed_init(state):
    """Undo a failed depth-init keyframe insertion in place: clear the
    validity masks and the keyframe's association row. Everything else the
    insert wrote is masked out by these bits, so no reallocation is needed
    (reference simply discards the frame; the old path here rebuilt the
    whole MapState — pathological at grown capacities)."""
    return state._replace(
        kf_valid=state.kf_valid.at[0].set(False),
        kf_kp_valid=state.kf_kp_valid.at[0].set(False),
        kf_lm_idx=state.kf_lm_idx.at[0].set(-1),
        lm_valid=jnp.zeros_like(state.lm_valid),
        lm_plane=jnp.full_like(state.lm_plane, -1),
    )


@jax.jit
def _gba_adopt_step(state, solved_pose, solved_lm, snap_kf_valid,
                    snap_lm_valid, snap_next_kf):
    """Merge a deferred global-BA result into the CURRENT map state
    (reference: loop_bundle_adjuster.cc:100-145 — after the 4th-thread BA
    finishes, keyframes added during the solve are corrected through
    their spanning-tree parents, landmarks through their reference
    keyframes).

    Keyframes that existed at the solve snapshot take the solved poses;
    keyframes inserted DURING the solve ride the delta of the last
    snapshot keyframe (their spanning-tree ancestor on a video
    trajectory): P_child_new = P_child_cur o P_last_cur^-1 o P_last_new.
    Snapshot-era landmarks take solved positions; landmarks created
    during the solve (and all lines/planes) ride their reference
    keyframe's delta. Returns the merged state.
    """
    from structure_plp_slam_tpu.models import pose_graph as pg

    K = state.kf_pose.shape[0]
    old_pose = state.kf_pose
    existed = (jnp.arange(K) < snap_next_kf) & snap_kf_valid

    last = jnp.clip(snap_next_kf - 1, 0, K - 1)
    Rc, tc = old_pose[last, :, :3], old_pose[last, :, 3]
    Rn, tn = solved_pose[last, :, :3], solved_pose[last, :, 3]
    # M = P_last_cur^-1 o P_last_new  (world'->world of the BA shift).
    Rm = Rc.T @ Rn
    tm = Rc.T @ (tn - tc)
    R_child = jnp.einsum("kij,jl->kil", old_pose[:, :, :3], Rm)
    t_child = jnp.einsum("kij,j->ki", old_pose[:, :, :3], tm) + old_pose[:, :, 3]
    child_pose = jnp.concatenate([R_child, t_child[:, :, None]], axis=2)
    adopted = jnp.where(existed[:, None, None], solved_pose, child_pose)

    keep_lm = snap_lm_valid & state.lm_valid
    lm_pos = jnp.where(keep_lm[:, None], solved_lm, state.lm_pos)
    state = state._replace(kf_pose=adopted, lm_pos=lm_pos)

    # Lines, planes and solve-era-new landmarks ride their reference
    # keyframe's delta (old -> adopted).
    ones = jnp.ones((K,), jnp.float32)
    state = pg.correct_map_structures(
        state,
        old_pose[:, :, :3], old_pose[:, :, 3], ones,
        adopted[:, :, :3], adopted[:, :, 3], ones,
        lm_mask=state.lm_valid & ~snap_lm_valid,
    )
    return state


@jax.jit
def _loopfix_adopt(state, R_opt, t_opt, s_opt, snap_next_kf):
    """Apply a loop correction + pose-graph result to the CURRENT map.

    ``R_opt/t_opt/s_opt`` are the graph-optimized Sim3 poses of every
    keyframe that existed at the fix's prefetch snapshot
    (``slot < snap_next_kf``); keyframes inserted while the fix was in
    flight ride the newest snapshot keyframe's SE3 delta (the
    _gba_adopt_step propagation; reference: loop_bundle_adjuster.cc
    :110-145 corrects mid-solve keyframes through their spanning-tree
    parents). Landmarks, lines and planes ride their reference
    keyframes' Sim3 deltas from the CURRENT poses (keeping each
    structure's keyframe-relative geometry bit-exact through the jump).
    """
    from structure_plp_slam_tpu.models import pose_graph as pg

    K = state.kf_pose.shape[0]
    old = state.kf_pose
    existed = jnp.arange(K) < snap_next_kf
    s_safe = jnp.maximum(s_opt, 1e-12)
    new_se3 = jnp.concatenate(
        [R_opt, (t_opt / s_safe[:, None])[:, :, None]], axis=2
    )
    last = jnp.clip(snap_next_kf - 1, 0, K - 1)
    Rc, tc = old[last, :, :3], old[last, :, 3]
    Rn, tn = new_se3[last, :, :3], new_se3[last, :, 3]
    Rm = Rc.T @ Rn
    tm = Rc.T @ (tn - tc)
    R_child = jnp.einsum("kij,jl->kil", old[:, :, :3], Rm)
    t_child = jnp.einsum("kij,j->ki", old[:, :, :3], tm) + old[:, :, 3]
    child = jnp.concatenate([R_child, t_child[:, :, None]], axis=2)
    adopted = jnp.where(existed[:, None, None], new_se3, child)
    # Structures ride ref-keyframe Sim3 deltas: old (current, scale 1)
    # -> adopted with the graph's per-keyframe scale for snapshot-era
    # keyframes (children's deltas are SE3).
    s_full = jnp.where(existed, s_opt, 1.0)
    adopted_sim3_t = jnp.where(
        existed[:, None], t_opt, adopted[:, :, 3]
    )
    adopted_sim3_R = jnp.where(
        existed[:, None, None], R_opt, adopted[:, :, :3]
    )
    ones = jnp.ones((K,), jnp.float32)
    state = pg.correct_map_structures(
        state, old[:, :, :3], old[:, :, 3], ones,
        adopted_sim3_R, adopted_sim3_t, s_full,
    )
    return state._replace(kf_pose=adopted)


@functools.partial(
    jax.jit,
    static_argnames=(
        "camera", "with_lines", "has_seg", "has_seg_lines", "do_ba",
        "do_cull_kf", "stats_full", "do_detect", "two_view_lines",
        "num_tri_neighbors", "planar", "use_graph_cut", "scale_factor",
        "num_levels", "bow_max_hamming", "bow_chunk", "part",
    ),
)
def _kf_chain(camera, st, slot, pose, ts, feats, kp_lm, next_lm, seg_mask,
              seg_line_idx, key, next_plane, next_line, inv_sigma_sq, ind0,
              *, with_lines, has_seg, has_seg_lines, do_ba, do_cull_kf,
              stats_full, do_detect, two_view_lines, num_tri_neighbors,
              planar, use_graph_cut, scale_factor, num_levels,
              bow_max_hamming, bow_chunk, part="all"):
    """The ENTIRE keyframe processing chain as ONE jitted dispatch
    (reference mapping thread, mapping_module.cc:193-285, plus the
    loop-detection compute of global_optimization_module.cc).

    Rationale: the chain was previously ~12 separate jitted dispatches
    with eager glue; on a tunnel-attached TPU each dispatch carries RPC
    overhead that inflates 5-10x whenever the tunnel degrades (measured:
    per-dispatch cost swinging 0.1 ms -> ~30 ms). One dispatch makes the
    keyframe cost tunnel-invariant and lets XLA fuse across stage
    boundaries. Stage set matches System._insert_keyframe's previous
    eager sequence exactly; per-stage timings live in
    tools/prof_device.py which calls the stage functions directly.
    """
    from structure_plp_slam_tpu.data import bow as bow_mod
    from structure_plp_slam_tpu.models import planar_mapper

    K = st.kf_pose.shape[0]
    if part == "b":
        # Resume from part "a"'s outputs (st / counters / ind0
        # already advanced) — the CPU backend compiles the chain as
        # two halves (XLA:CPU's LLVM pipeline segfaults on the
        # largest single-executable variants); TPU stays fused.
        ind = ind0
    else:
        st, created = mapper.insert_keyframe(
            camera, st, slot, pose, ts, feats, kp_lm, next_lm
        )
        next_lm = next_lm + created
        # Incremental indicator maintenance: ``ind0`` (the caller's cached
        # post-previous-chain indicator) is patched per stage instead of
        # rebuilt (each full [K, L] rebuild is a ~5 ms TPU scatter; only
        # fuse's global duplicate remap still needs one).
        ind = ms.indicator_update_rows(ind0, st, jnp.stack([slot]))
        st, _ = mapper.cull_landmarks(st, slot, ind=ind)
        ind = ind * st.lm_valid[None, :].astype(jnp.float32)
        st, n_tri, tri_nbs = mapper.triangulate_with_neighbors(
            camera, st, slot, next_lm, ind, num_neighbors=num_tri_neighbors,
            return_neighbors=True,
        )
        next_lm = next_lm + n_tri

        if with_lines:
            from structure_plp_slam_tpu.models import line_mapper

            if has_seg_lines:
                st = st._replace(
                    kf_line_idx=st.kf_line_idx.at[slot].set(seg_line_idx)
                )
            st, n_depth = line_mapper.lines_from_depth(camera, st, slot,
                                                       next_line)
            next_line = next_line + n_depth
            st, n_pts = line_mapper.lines_from_points(camera, st, slot,
                                                      next_line)
            next_line = next_line + n_pts
            if two_view_lines:
                st, n_two = line_mapper.triangulate_lines_with_neighbors(
                    camera, st, slot, next_line
                )
                next_line = next_line + n_two
            st, _ = line_mapper.cull_lines(st, slot)

        # Refresh the rows triangulation rewired (slot + chosen neighbors) so
        # this keyframe's new landmarks participate in duplicate fusion
        # (previously fuse saw the pre-triangulation indicator and skipped
        # them).
        ind = ms.indicator_update_rows(
            ind, st, jnp.concatenate([jnp.stack([slot]), tri_nbs])
        )
        kf_mask = jnp.zeros((K,), bool).at[slot].set(True)
        lm_local = ms.local_landmark_mask(st, kf_mask, ind)
        st, _ = mapper.fuse_into_keyframe(camera, st, slot, lm_local, ind=ind)
        ind = ms.observation_indicator(st)

        if has_seg:
            labels = planar_mapper.label_keypoints(
                seg_mask.astype(jnp.int32), feats["xy"], feats["valid"],
                check_3x3=planar.check_3x3_window,
            )
            scale = mapper.map_scale(st, slot)
            st, n_pl = planar_mapper.detect_planes(
                st, slot, labels, next_plane, key, scale,
                max_instances=planar.max_instances, coherent=use_graph_cut,
                params=planar,
            )
            next_plane = next_plane + n_pl
            st, _ = planar_mapper.merge_planes(st, scale, params=planar)
            st = planar_mapper.refine_planes(st, scale, params=planar)
            st = planar_mapper.snap_points_to_planes(st, scale, params=planar)


    if part == "a":
        return (st, next_lm, next_plane, next_line, ind,
                jnp.zeros((0, 3), jnp.float32),
                jnp.zeros((0, 0), jnp.float32))

    ba_cams = None
    if do_ba:
        if with_lines:
            from structure_plp_slam_tpu.models import line_mapper

            st = line_mapper.refresh_lines(camera, st)
        st, _, ba_cams = mapper.local_ba(
            camera, st, slot, inv_sigma_sq, with_lines=with_lines, ind=ind,
            return_cams=True,
        )
        # BA's outlier detach rewrote the window cameras' rows;
        # statistics, loop detection and the returned tracking indicator
        # must see the post-mutation associations.
        ind = ms.indicator_update_rows(ind, st, ba_cams)
    if do_cull_kf:
        st, _ = mapper.cull_keyframes(st, slot, ind=ind)
        ind = ind * st.kf_valid[:, None].astype(jnp.float32)

    if stats_full:
        # Only the local-BA window's keyframe rows changed this chain —
        # restrict the (sort-dominated) stats refresh to them; outside
        # the window the stored stats are still current (reference
        # updates fire per observation mutation, landmark.h:99-110).
        st = mapper.refresh_landmark_stats(
            st, ind, scale_factor=scale_factor, num_levels=num_levels,
            window_kfs=ba_cams,
        )
    else:
        st = mapper.update_landmark_normals(st, ind)

    if do_detect:
        cov = ms.covisibility_matrix(st, ind)
        scores = bow_mod._scores_impl(
            st.kf_desc, st.kf_kp_valid, st.kf_valid,
            st.kf_desc[slot], st.kf_kp_valid[slot],
            max_hamming=bow_max_hamming, chunk=bow_chunk,
        )
        packed = loop_mod._pack_detect_arrays(cov, slot, scores,
                                              st.kf_valid)
    else:
        cov = jnp.zeros((0, 0), jnp.float32)
        packed = jnp.zeros((0, 3), jnp.float32)
    return st, next_lm, next_plane, next_line, ind, packed, cov


def _keep_image(img):
    """Retain a fed image for viewers/publishers. Host numpy inputs are
    COPIED: dataset readers commonly decode into a reused buffer, and a
    viewer polling later would render a torn/later frame through the
    alias. Device arrays are kept as-is — np.asarray here would sync +
    pull the image back over the wire every frame."""
    if isinstance(img, np.ndarray):
        return np.array(img, copy=True)
    return img


@dataclasses.dataclass
class _PendingFrame:
    """A fed frame whose host-side decisions (lost check, keyframe
    insertion, trajectory record) are deferred by ``track_lag`` frames so
    the packed decision vector's device->host RPC overlaps later frames'
    dispatch — the role the reference's mapping-thread queue plays
    (mapping_module.cc:150, keyframes are processed asynchronously)."""

    packed: jax.Array
    feats: dict
    ts: float
    res: Any                      # tracker.TrackResult (device arrays)
    seg_mask: Optional[np.ndarray]
    seg_line_idx: Optional[jax.Array]
    frames_since_kf: int
    kp_plane: Optional[jax.Array] = None
    dense: Optional[tuple] = None  # (gray_small u8, depth_small f32)


class System:
    def __init__(
        self,
        config: Config,
        *,
        max_keyframes: int = 256,
        max_landmarks: int = 32768,
        seed: int = 0,
        enable_mapping: bool = True,
        enable_loop_closing: bool = True,
        with_lines: bool = False,
        num_triangulation_neighbors: int = 2,
        max_kf_interval: Optional[int] = None,
        min_kf_interval: int = 0,
        track_lag: int = 2,
        auto_grow: bool = True,
        verbose_timing: bool = False,
        distributed_ba: bool = True,
        store_dense_cloud: bool = False,
        dense_cloud_stride: int = 8,
        async_loop_ba: bool = True,
    ):
        # Dense RGB-D cloud display (reference: pangolin_viewer/viewer.h
        # :132-133 draws the RGB-D point cloud): keep a strided copy of
        # each keyframe's gray+depth images; viewers backproject them
        # under the CURRENT keyframe poses (so the cloud follows BA/loop
        # corrections).
        self.store_dense_cloud = bool(store_dense_cloud)
        self.dense_cloud_stride = int(dense_cloud_stride)
        self._dense_frames: dict = {}
        # Per-stage timing collection (reference's verbose timing logs,
        # tracking_module.cc:607-645). verbose_timing=True syncs the
        # device after each stage so stage times include device compute.
        self.timer = StageTimer(synced=verbose_timing)
        # ``auto_grow``: double map capacities (keyframes / landmarks /
        # lines / planes) just before an insertion would hit a cap — the
        # reference's unbounded map_database growth (map_database.h:59-270)
        # re-expressed as O(log) reallocation + jit re-specialization
        # events (data/map_database.py).
        self.auto_grow = bool(auto_grow)
        # ``track_lag``: how many frames the host-side decisions (lost
        # check, keyframe insertion, trajectory record) may trail the
        # device dispatch. 0 = fully synchronous (reference per-frame
        # semantics); 2 (default) overlaps the per-frame decision fetch
        # with the next frames' dispatch, hiding the host<->device RPC
        # latency the way the reference hides mapping behind its thread
        # queue. Public reads (state/metrics/trajectories) drain pending
        # decisions first, so results are identical up to WHEN a keyframe
        # fires.
        self.track_lag = max(0, int(track_lag))
        self._pending: collections.deque = collections.deque()
        # Deferred loop detection: (kf, packed device array) dispatched at
        # a keyframe, consumed at the next one (or at drain points) once
        # its device->host copy has landed (readiness-gated; age-bounded).
        self._pending_loop = None
        self._pending_loop_age = 0
        # In-flight loop FIX (validate -> correct phases advanced one per
        # frame; see _advance_pending_fix).
        self._pending_fix: Optional[dict] = None
        # Deferred post-loop global BA (the reference's 4th-thread loop BA,
        # loop_bundle_adjuster.cc:68-145): the full-map solve is chunked
        # into per-frame dispatches so a loop closure never stalls the
        # feed for the whole solve; the result is merged at completion
        # with parent-delta propagation for keyframes inserted meanwhile.
        self.async_loop_ba = bool(async_loop_ba)
        self._pending_gba: Optional[dict] = None
        self.gba_iters_per_chunk = 2
        self.gba_num_chunks = 5
        # Conditions A1/A2 of the keyframe decision
        # (keyframe_inserter.cc:76-81): A1 forces a keyframe after
        # max_kf_interval frames (reference default: camera fps); A2 allows
        # one after min_kf_interval frames when the mapper is idle
        # (reference default 0 — and mapping runs inline here, so idle is
        # always true).
        self.max_kf_interval = (
            max_kf_interval if max_kf_interval is not None else int(config.camera.fps)
        )
        self.min_kf_interval = min_kf_interval
        self.config = config
        self.camera = config.camera
        cap = round_up(
            frontend_mod.orb_ops.OrbExtractor(
                config.camera.rows, config.camera.cols, config.orb
            ).capacity,
            8,
        )
        # Line tracking may also be switched on by the reference's YAML key
        # (Threshold.use_line_tracking, system.cc:550-556).
        self.with_lines = bool(
            with_lines or config.raw.get("Threshold.use_line_tracking", False)
        )
        # Planar-mapping thresholds from the reference's own
        # planar_mapping_parameters.yaml keys when present
        # (planar_mapping_module.cc:1158-1184); the spatial-coherence
        # mean-field consensus plays GC-RANSAC's role.
        from structure_plp_slam_tpu.models import planar_mapper as _pm

        self.planar = _pm.PlanarParams.from_raw(config.raw)
        self.use_graph_cut = self.planar.use_graph_cut
        # Spatially-coherent consensus for the mono-init H/E races
        # (reference: GC-RANSAC in initialize/perspective.cc:70-85).
        # Opt-in via its own YAML key: the mean-field re-expression
        # measurably shifts which matches seed the initial structure, and
        # on line-anchored monocular maps the plain-MSAC seeds currently
        # anchor 3D lines better (tests/test_line_system.py::
        # test_mono_point_line_slam gates this end to end).
        self.init_graph_cut = bool(
            config.raw.get("Initializer.use_graph_cut", False)
        )
        self.frontend = frontend_mod.Frontend(
            config.camera, config.orb, pad_to=cap, with_lines=self.with_lines
        )
        self._state = ms.create(max_keyframes, cap, max_landmarks)
        self.next_line = 0
        self.max_keyframes = max_keyframes
        self.max_landmarks = max_landmarks
        self.num_tri_neighbors = num_triangulation_neighbors
        self.enable_mapping = enable_mapping

        self._tracking_state = TrackerState.NOT_INITIALIZED
        self.key = jax.random.PRNGKey(seed)
        self.next_kf = 0
        self.next_lm = 0
        self.frames_since_kf = 0
        self.num_frames = 0

        # Tracker recurrent state.
        eye = np.eye(3, dtype=np.float32)
        self.pose = (jnp.asarray(eye), jnp.zeros((3,), jnp.float32))
        self.vel = (jnp.asarray(eye), jnp.zeros((3,), jnp.float32))
        self.last_kp_lm = jnp.full((cap,), -1, jnp.int32)
        self.ref_kf = 0
        self._ref_kf_dev = jnp.int32(0)
        self._min_obs_cache: dict = {}

        # Loop closing + relocalization (share the retrieval index).
        self.enable_loop_closing = enable_loop_closing
        self.loop_closer = loop_mod.LoopCloser(config.camera, max_keyframes)
        # With more than one accelerator, post-loop global BA runs
        # landmark-sharded over all devices (one psum per iteration —
        # parallel/distributed_ba; the reference has no distributed
        # backend, SURVEY.md §2.14).
        if distributed_ba and len(jax.devices()) > 1:
            from jax.sharding import Mesh

            self.loop_closer.mesh = Mesh(
                np.array(jax.devices()), ("lm",)
            )
        self.relocalizer = reloc_mod.Relocalizer(
            config.camera, self.loop_closer.bow
        )

        # Mono initialization buffer.
        self._init_feats = None
        self._init_ts = None
        self._init_seg_mask = None
        self._seg_line_idx = None
        self._cur_seg_mask = None
        self._last_image = None
        self.next_plane = 0
        self._ind_cache = None
        self._init_frame_count = 0
        self.num_relocalizations = 0

        # Publishers (reference: system.h:103-106 getter pair).
        from structure_plp_slam_tpu.publish.frame_publisher import FramePublisher
        from structure_plp_slam_tpu.publish.map_publisher import MapPublisher

        self.frame_publisher = FramePublisher()
        self.map_publisher = MapPublisher(self)

        # Frame trajectory: (ts, ref_kf, rel_pose_cw_to_ref [3,4], lost).
        self._frame_stats: List[Tuple[float, int, np.ndarray, bool]] = []
        self._running = False
        self._paused = False
        self._terminate_requested = False

    # ------------------------------------------------------------------
    # Deferred-decision plumbing.
    # ------------------------------------------------------------------
    @property
    def state(self) -> ms.MapState:
        """The current MapState. Reading drains any pending lagged frame
        decisions first, so callers always observe a fully-applied map."""
        self._drain_pending()
        return self._state

    @state.setter
    def state(self, value):
        self._drain_pending()
        self._state = value

    @property
    def tracking_state(self) -> TrackerState:
        self._drain_pending()
        return self._tracking_state

    @tracking_state.setter
    def tracking_state(self, value):
        self._tracking_state = value

    def _drain_pending(self):
        while self._pending:
            self._consume(self._pending.popleft())
        if getattr(self, "_pending_loop", None) is not None:
            self._consume_pending_loop(force=True)
        while getattr(self, "_pending_fix", None) is not None:
            self._advance_pending_fix()
        self._finish_deferred_gba()

    def _consume_pending_loop(self, res=None, force=False):
        """Consume a deferred loop detection (dispatched at the previous
        keyframe): gate on the fetched scores and, on a candidate,
        DISPATCH the Sim3 validation — the validation result, the map
        correction and the pose graph all run in later frames' phases
        (:meth:`_advance_pending_fix`), so a firing loop never stalls the
        feed (reference: global_optimization_module.cc:90-296 does all of
        this on the loop thread). Returns ``res`` unchanged (corrections
        now land between frames and rebase the tracker pose there).

        The fetch is READINESS-GATED: during keyframe bursts the device is
        still computing the dispatching chain when the next keyframe
        arrives, so a blocking ``np.asarray`` here would stall the feed for
        the chain's remaining device time (measured: 28 ms mean x every
        keyframe on the large-map bench). If the packed scores aren't on
        the host yet we keep the detection pending (no new one is issued
        while one is pending) and retry next keyframe, bounded by an age
        limit so a saturated device still gets detections consumed — the
        reference's loop thread polls its keyframe queue at its own pace
        the same way (global_optimization_module.cc:90-105)."""
        pend = self._pending_loop
        if pend is None:
            return res
        kf_cur, packed = pend
        if packed is None:
            self._pending_loop = None
            return res
        if not force and self._pending_loop_age < 3:
            try:
                if not packed[0].is_ready():
                    self._pending_loop_age += 1
                    return res
            except AttributeError:
                pass
        self._pending_loop = None
        self._pending_loop_age = 0
        with self.timer.stage("loop_detect"):
            cand = self.loop_closer.detect_consume(packed, kf_cur)
        if cand is None:
            return res
        if self._pending_fix is not None:
            return res  # a fix is already in flight; cooldown covers us
        lc = self.loop_closer
        prev_cooldown = lc.last_loop_kf
        # Start the cooldown NOW so detection pauses while the fix is in
        # flight; restored if validation rejects the candidate.
        lc.last_loop_kf = kf_cur
        self._pending_fix = {
            "phase": "validate",
            "kf_cur": int(kf_cur),
            "cand": int(cand),
            "prev_cooldown": prev_cooldown,
            "packed": lc.validate_dispatch(
                self._state, kf_cur, cand, self._split_key()
            ),
            "n0": self.next_kf,
            "K": self._state.kf_pose.shape[0],
        }
        return res

    def _advance_pending_fix(self):
        """Advance the in-flight loop correction by one bounded phase
        (called once per fed frame):

        validate -> (ready-read) gate the Sim3; dispatch async copies of
                    the arrays the host-side correction math needs
                    (kf_pose, kf_valid, two covisibility rows, the
                    device-compacted strong-pair list);
        correct  -> (ready-reads) numpy Sim3 neighborhood correction +
                    pose-graph edge build on the prefetched arrays, then
                    pure dispatch: graph solve, map-structure correction,
                    mid-flight-keyframe adoption, duplicate fuse, tracker
                    pose rebase, deferred global BA start.
        """
        f = self._pending_fix
        if f is None:
            return
        lc = self.loop_closer
        st = self._state
        if st.kf_pose.shape[0] != f["K"]:
            _log.info("pending loop fix dropped (map capacity grew)")
            lc.last_loop_kf = f["prev_cooldown"]
            self._pending_fix = None
            return
        if f["phase"] == "validate":
            with self.timer.stage("loopfix.validate"):
                val = lc.validate_consume(f["packed"])
                if val is None:
                    lc.last_loop_kf = f["prev_cooldown"]
                    self._pending_fix = None
                    return
                f["val"] = val
                kf_cur, cand = f["kf_cur"], f["cand"]
                _log.info("loop closure: keyframe %d -> %d (s=%.3f)",
                          kf_cur, cand, val[2])
                from structure_plp_slam_tpu.models import loop_closer as lcm

                cov = ms.covisibility_matrix(st, self._obs_indicator())
                rows = cov[jnp.asarray([kf_cur, cand])]
                pairs = lcm._strong_pair_list(st, cap=4096)
                fetch = {
                    "pose": st.kf_pose, "valid": st.kf_valid,
                    "rows": rows, "pairs": pairs,
                }
                for v in fetch.values():
                    try:
                        v.copy_to_host_async()
                    except (AttributeError, NotImplementedError):
                        pass
                f["fetch"] = fetch
                f["n1"] = self.next_kf
                f["phase"] = "correct"
            return
        # phase == "correct": everything below is host math on prefetched
        # arrays + device dispatch — no blocking fetch.
        with self.timer.stage("loopfix.correct"):
            kf_cur, cand = f["kf_cur"], f["cand"]
            R21, t21, s21 = f["val"]
            # A still-running deferred BA's snapshot predates this
            # correction: merge it first.
            self._finish_deferred_gba()
            pose_h = np.asarray(f["fetch"]["pose"])
            valid_h = np.asarray(f["fetch"]["valid"])
            rows_h = np.asarray(f["fetch"]["rows"])
            pairs_h = np.asarray(f["fetch"]["pairs"])
            R_new, t_new, s_new, neigh = lc.correct_host_poses(
                pose_h, valid_h, rows_h, kf_cur, cand, R21, t21, s21,
                neigh_extend=range(f["n0"], f["n1"]),
            )
            # Pose-graph initial estimate: scale folded into SE3.
            pose_graph_init = pose_h.copy()
            pose_graph_init[:, :, :3] = R_new
            pose_graph_init[:, :, 3] = t_new / np.maximum(
                s_new, 1e-12)[:, None]
            prob, valid_ids = lc.build_graph_problem(
                pose_graph_init, valid_h, pairs_h, cand
            )
            st = self._state
            P_old_cur = st.kf_pose[kf_cur]
            if prob is None:
                # Degenerate tiny map: apply the neighborhood correction
                # directly without a graph solve.
                R_opt = jnp.asarray(R_new)
                t_opt = jnp.asarray(t_new)
                s_opt = jnp.asarray(s_new)
            else:
                R_opt, t_opt, s_opt = lc.solve_graph(
                    prob, valid_ids, st.kf_pose.shape[0]
                )
            self._state = _loopfix_adopt(
                st, R_opt, t_opt, s_opt, jnp.int32(f["n1"])
            )
            # Duplicate fusion around the closed loop
            # (global_optimization_module.cc:257-260) — on the corrected
            # geometry.
            kf_mask = jnp.zeros(
                (self._state.kf_pose.shape[0],), bool
            ).at[cand].set(True)
            cand_lms = ms.local_landmark_mask(self._state, kf_mask)
            self._state, _ = mapper.fuse_into_keyframe(
                self.camera, self._state, kf_cur, cand_lms
            )
            # Tracker continues from the corrected geometry.
            P_new_cur = self._state.kf_pose[kf_cur]
            Rp, tp = self.pose
            self.pose = _rebase_pose(Rp, tp, P_old_cur, P_new_cur)
            self.vel = (
                jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), jnp.float32)
            )
            self._invalidate_map_cache()
            lc.loop_edges.append(
                (kf_cur, cand, np.asarray(R21), np.asarray(t21), float(s21))
            )
            lc.last_loop_kf = kf_cur
            lc._continuity.clear()
            lc.num_loops_closed += 1
            if self.async_loop_ba:
                self._start_deferred_gba(anchor_kf=cand)
            else:
                from structure_plp_slam_tpu.models import global_ba
                from structure_plp_slam_tpu.models import pose_graph as pg

                K = self._state.kf_pose.shape[0]
                pose_before = self._state.kf_pose
                self._state = global_ba.run_global_ba(
                    self.camera, self._state,
                    np.asarray(self.frontend.inv_sigma_sq),
                    anchor_kf=cand, mesh=lc.mesh,
                )
                ones = jnp.ones((K,), jnp.float32)
                self._state = pg.correct_map_structures(
                    self._state,
                    pose_before[:, :, :3], pose_before[:, :, 3], ones,
                    self._state.kf_pose[:, :, :3],
                    self._state.kf_pose[:, :, 3], ones,
                    lm_mask=jnp.zeros_like(self._state.lm_valid),
                )
                self._invalidate_map_cache()
        self._pending_fix = None

    # ------------------------------------------------------------------
    # Deferred post-loop global BA (reference: loop_bundle_adjuster.cc
    # runs on its own thread; here the solve is CHUNKED across subsequent
    # frames so per-frame latency stays bounded on one chip).
    # ------------------------------------------------------------------
    def _start_deferred_gba(self, anchor_kf: int):
        """Snapshot the (post-pose-graph) map and dispatch the async
        host copies the observation enumeration needs. The solve itself
        advances one chunk per fed frame (:meth:`_advance_deferred_gba`)."""
        st = self._state
        fetch = {
            "kf_valid": st.kf_valid, "kp_valid": st.kf_kp_valid,
            "lm_idx": st.kf_lm_idx, "lm_valid": st.lm_valid,
            "xy": st.kf_xy, "xr": st.kf_xr, "level": st.kf_level,
        }
        for v in fetch.values():
            try:
                v.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
        self._pending_gba = {
            "phase": "fetch", "anchor": int(anchor_kf), "fetch": fetch,
            "snap_pose": st.kf_pose, "snap_lm": st.lm_pos,
            "snap_kf_valid": st.kf_valid, "snap_lm_valid": st.lm_valid,
            "snap_next_kf": self.next_kf,
            "K": st.kf_pose.shape[0], "L": st.lm_pos.shape[0],
            "data": None, "carry": None, "chunks_left": 0, "aux": None,
        }

    def _advance_deferred_gba(self):
        """Advance the deferred global BA by one step (called once per
        fed frame). Each step is a bounded chunk of work: consume the
        prefetched arrays + enumerate, OR dispatch ``gba_iters_per_chunk``
        GN iterations, OR merge the result into the live map."""
        p = self._pending_gba
        if p is None:
            return
        from structure_plp_slam_tpu.models import global_ba

        st = self._state
        if (st.kf_pose.shape[0] != p["K"]
                or st.lm_pos.shape[0] != p["L"]):
            # Capacities grew mid-solve: snapshot shapes no longer match
            # the live map — drop (rare; the next loop closure redoes it).
            _log.info("deferred global BA dropped (map capacity grew)")
            self._pending_gba = None
            return
        if p["phase"] == "fetch":
            # Consume the async host copies only; the numpy observation
            # enumeration runs on the NEXT frame ("enumerate" phase) so
            # neither step alone stalls the feed path for the combined
            # transfer + enumeration cost (~400 ms measured at the
            # large-map steady state).
            with self.timer.stage("gba.prepare"):
                p["host"] = {k: np.asarray(v) for k, v in p["fetch"].items()}
                p["fetch"] = None
                p["phase"] = "enumerate"
            return
        if p["phase"] == "enumerate":
            with self.timer.stage("gba.prepare"):
                f = p.pop("host")
                data = global_ba.prepare_from_arrays(
                    f["kf_valid"], f["kp_valid"], f["lm_idx"],
                    f["lm_valid"], f["xy"], f["xr"], f["level"],
                    np.asarray(self.frontend.inv_sigma_sq),
                )
                if data.num_obs < 100:
                    self._pending_gba = None
                    return
                K = p["K"]
                p["data"] = data
                p["cam_fixed"] = jnp.asarray(np.arange(K) == p["anchor"])
                p["carry"] = (p["snap_pose"], p["snap_lm"])
                mesh = self.loop_closer.mesh
                if mesh is not None and int(np.prod(mesh.devices.shape)) > 1:
                    p["aux"] = "mesh"
                elif K > 512:
                    c1, c2, raw_of_comp = global_ba.prepare_chain_pairs(
                        data, f["kf_valid"]
                    )
                    c1, c2 = global_ba.pad_chain_pairs(c1, c2)
                    p["aux"] = (
                        jnp.asarray(c1, jnp.int32), jnp.asarray(c2, jnp.int32),
                        jnp.asarray(raw_of_comp, jnp.int32),
                    )
                else:
                    p["aux"] = None
                p["chunks_left"] = self.gba_num_chunks
                p["phase"] = "solve"
            return
        if p["phase"] == "solve":
            with self.timer.stage("gba.chunk"):
                cam_pose, lm_pos = p["carry"]
                if p["aux"] == "mesh":
                    shim = st._replace(
                        kf_pose=cam_pose, lm_pos=lm_pos,
                        kf_valid=p["snap_kf_valid"],
                        lm_valid=p["snap_lm_valid"],
                    )
                    out = global_ba._run_global_ba_sharded(
                        self.camera, shim, p["data"], p["cam_fixed"],
                        self.loop_closer.mesh,
                        self.gba_iters_per_chunk * self.gba_num_chunks,
                    )
                    p["carry"] = (out.kf_pose, out.lm_pos)
                    p["chunks_left"] = 0
                elif p["aux"] is not None:
                    c1, c2, raw_of_comp = p["aux"]
                    p["carry"] = global_ba.solve_pcg(
                        self.camera, cam_pose, p["snap_kf_valid"],
                        p["cam_fixed"], lm_pos, p["snap_lm_valid"],
                        p["data"], c1, c2, raw_of_comp,
                        num_iters=self.gba_iters_per_chunk,
                    )
                    p["chunks_left"] -= 1
                else:
                    p["carry"] = global_ba.solve(
                        self.camera, cam_pose, p["snap_kf_valid"],
                        p["cam_fixed"], lm_pos, p["snap_lm_valid"],
                        p["data"], num_iters=self.gba_iters_per_chunk,
                    )
                    p["chunks_left"] -= 1
                if p["chunks_left"] <= 0:
                    p["phase"] = "adopt"
            return
        if p["phase"] == "adopt":
            with self.timer.stage("gba.adopt"):
                solved_pose, solved_lm = p["carry"]
                ref = self.ref_kf
                P_old_ref = st.kf_pose[ref]
                self._state = _gba_adopt_step(
                    st, solved_pose, solved_lm, p["snap_kf_valid"],
                    p["snap_lm_valid"], jnp.int32(p["snap_next_kf"]),
                )
                if getattr(self, "with_lines", False):
                    # Full-map multi-view line polish against the merged
                    # poses (lines rode reference-keyframe deltas through
                    # the solve; the alternation refine re-fits them —
                    # loop_bundle_adjuster.cc:110-145 corrects lines after
                    # its BA the same way).
                    from structure_plp_slam_tpu.models import line_ba

                    self._state = line_ba.refine_lines(
                        self.camera, self._state, num_iters=12
                    )
                P_new_ref = self._state.kf_pose[ref]
                Rp, tp = self.pose
                self.pose = _rebase_pose(Rp, tp, P_old_ref, P_new_ref)
                self.vel = (
                    jnp.eye(3, dtype=jnp.float32),
                    jnp.zeros((3,), jnp.float32),
                )
                self._invalidate_map_cache()
                _log.info("deferred global BA merged (anchor=%d)",
                          p["anchor"])
            self._pending_gba = None

    def _finish_deferred_gba(self):
        """Run a pending deferred BA to completion synchronously (drain
        points: shutdown, public state reads, a new loop closure)."""
        while self._pending_gba is not None:
            self._advance_deferred_gba()

    def _grow(self, **kw):
        """Double selected map capacities in place (slot ids stable)."""
        from structure_plp_slam_tpu.data import map_database

        # An in-flight loop fix / deferred loop BA's snapshots would no
        # longer match: run them to completion before the shapes change.
        while self._pending_fix is not None:
            self._advance_pending_fix()
        self._finish_deferred_gba()
        _log.info("growing map capacities: %s", ", ".join(sorted(kw)))
        self._state = map_database.grow(self._state, **kw)
        self.max_keyframes = self._state.kf_pose.shape[0]
        self.max_landmarks = self._state.lm_pos.shape[0]
        self._invalidate_map_cache()

    # ------------------------------------------------------------------
    # Lifecycle (reference: system::startup/shutdown/reset).
    # ------------------------------------------------------------------
    def startup(self, need_initialize: bool = True):
        self._running = True
        if not need_initialize:
            self._tracking_state = TrackerState.LOST

    def shutdown(self):
        """Stop feeding and tear down background surfaces (reference:
        system::shutdown joins the mapping/loop threads; here the
        equivalents are the viewer/publisher/snapshot worker threads)."""
        self._drain_pending()
        self._running = False
        self.stop_live_viewer()
        pub = getattr(self, "_native_pub", None)
        if pub is not None:
            pub.close()
            self._native_pub = None
        writer = getattr(self, "_autosave", None)
        if writer is not None and hasattr(writer, "close"):
            writer.close()
            self._autosave = None

    def reset(self):
        # Pending decisions refer to the map being destroyed; drop them.
        self._pending.clear()
        self._pending_loop = None
        self._pending_loop_age = 0
        self._pending_fix = None
        self._pending_gba = None
        self._dense_frames.clear()
        self._state = ms.create(
            self.max_keyframes, self.frontend.pad_to, self.max_landmarks
        )
        self._tracking_state = TrackerState.NOT_INITIALIZED
        self.next_kf = 0
        self.next_lm = 0
        self._init_feats = None
        self._init_seg_mask = None
        self.last_kp_lm = jnp.full((self.frontend.pad_to,), -1, jnp.int32)
        self.ref_kf = 0
        self._ref_kf_dev = jnp.int32(0)
        self._frame_stats.clear()
        self.next_line = 0
        self.next_plane = 0
        self._init_frame_count = self.num_frames
        self._invalidate_map_cache()

    # ------------------------------------------------------------------
    # Frame feeding (reference: system::feed_*_frame).
    # ------------------------------------------------------------------
    def feed_monocular_frame(self, img, timestamp: float, mask=None,
                             seg_mask=None):
        """``mask``: optional [H, W] extraction mask, 0 = ignore region
        (reference: feed_*_frame's mask argument, system.h:140-162).
        ``seg_mask``: optional [H, W] instance-id image (PlaneRecNet
        output; reference: the *_with_SegMask overloads).
        """
        with self.timer.stage("frontend", sync_on=lambda: feats["desc"]):
            feats = self.frontend.mono(
                img, self._split_key() if self.with_lines else None, mask=mask
            )
        self._cur_seg_mask = seg_mask
        self._last_image = _keep_image(img)
        return self._track(feats, timestamp)

    def feed_RGBD_frame(self, img, depthmap, timestamp: float, mask=None,
                        seg_mask=None):
        with self.timer.stage("frontend", sync_on=lambda: feats["desc"]):
            feats = self.frontend.rgbd(
                img, depthmap, self._split_key() if self.with_lines else None,
                mask=mask,
            )
        self._cur_seg_mask = seg_mask
        if self.store_dense_cloud:
            s = self.dense_cloud_stride
            g = np.asarray(img)[s // 2::s, s // 2::s]
            d = np.asarray(depthmap)[s // 2::s, s // 2::s].astype(np.float32)
            self._cur_dense = (
                np.clip(g, 0, 255).astype(np.uint8),
                d * np.float32(1.0 / self.camera.depthmap_factor),
            )
        else:
            self._cur_dense = None
        self._last_image = _keep_image(img)
        return self._track(feats, timestamp)

    def feed_stereo_frame(self, img_left, img_right, timestamp: float,
                          mask=None, seg_mask=None):
        with self.timer.stage("frontend", sync_on=lambda: feats["desc"]):
            feats = self.frontend.stereo(
                img_left, img_right,
                self._split_key() if self.with_lines else None, mask=mask,
            )
        self._cur_seg_mask = seg_mask
        self._last_image = _keep_image(img_left)
        return self._track(feats, timestamp)

    # ------------------------------------------------------------------
    def _split_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _track(self, feats, ts: float) -> Optional[np.ndarray]:
        if self._paused or self._terminate_requested or not self._running:
            # Reference: a paused tracker discards fed frames until
            # resume_tracker() (system.cc:482-528 pause protocol).
            return None
        self.num_frames += 1
        if self._tracking_state is TrackerState.NOT_INITIALIZED:
            ok = self._initialize(feats, ts)
            if not ok:
                return None
            return self._record_frame(ts, lost=False)

        # min_obs for the reliable-landmark count relaxes while the map is
        # young (keyframe_inserter.cc:66-67 uses 3/2; here the young-map
        # value is 1: after a depth-seeded single-keyframe init every
        # landmark has exactly ONE observation, so min_obs=2 would make
        # ref_tracked 0 and block condition B — the reference escapes that
        # through its close-point condition on real depth ranges, which a
        # wide depth threshold defeats).
        min_obs = 3 if self.next_kf >= 3 else 1
        min_obs_dev = self._min_obs_cache.get(min_obs)
        if min_obs_dev is None:
            min_obs_dev = jnp.int32(min_obs)
            self._min_obs_cache[min_obs] = min_obs_dev

        # The whole per-frame device pipeline (prediction, tracking, line
        # tracking, statistics, motion model, decision packing) is ONE
        # dispatch; everything recurrent rides the device carry.
        Rv, tv = self.vel
        Rp, tp = self.pose
        carry = _TrackCarry(
            R=Rp, t=tp, Rv=Rv, tv=tv,
            last_kp_lm=self.last_kp_lm, ref_kf=self._ref_kf_dev,
        )
        with self.timer.stage("track", sync_on=lambda: packed):
            self._state, res, carry2, packed, seg_lines, kp_plane = _track_step(
                self.camera, self._state, feats, carry,
                self.frontend.inv_sigma_sq, self._obs_indicator(),
                min_obs_dev, self.next_lm,
                num_levels=self.frontend.extractor.params.num_levels,
                scale_factor=self.frontend.extractor.params.scale_factor,
                with_lines=self.with_lines,
            )
        self.pose = (carry2.R, carry2.t)
        self.vel = (carry2.Rv, carry2.tv)
        self.last_kp_lm = carry2.last_kp_lm
        self._ref_kf_dev = carry2.ref_kf
        self.frames_since_kf += 1
        self._seg_line_idx = seg_lines if self.with_lines else None

        # Defer every host-side decision: the packed vector's device->host
        # copy starts in the background and is consumed ``track_lag``
        # frames later — the RPC round trip then overlaps the next frames'
        # dispatch instead of stalling this one.
        try:
            packed.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass  # platform without async D2H: _consume just blocks
        entry = _PendingFrame(
            packed=packed, feats=feats, ts=ts, res=res,
            seg_mask=self._cur_seg_mask, seg_line_idx=self._seg_line_idx,
            frames_since_kf=self.frames_since_kf, kp_plane=kp_plane,
            dense=getattr(self, "_cur_dense", None),
        )
        self._pending.append(entry)
        # One bounded phase of any in-flight loop fix and one chunk of
        # any deferred post-loop global BA ride along with this frame
        # (the reference's loop thread + 4th-thread loop BA; bounding
        # the per-frame latency on one chip).
        self._advance_pending_fix()
        self._advance_deferred_gba()
        cur_ok = True
        while len(self._pending) > self.track_lag:
            oldest = self._pending.popleft()
            ok = self._consume(oldest)
            if oldest is entry:
                cur_ok = ok
        if not cur_ok:
            return None  # track_lag == 0 and THIS frame was lost
        return jnp.concatenate([res.R, res.t[:, None]], 1)

    # ------------------------------------------------------------------
    def _consume(self, entry: _PendingFrame) -> bool:
        """Apply the deferred host-side decisions of a fed frame: Lost
        check + relocalization, trajectory record, keyframe decision +
        insertion (reference: tracking_module.cc:651-657 lost handling,
        keyframe_inserter.cc:54-114 decision). Returns False if the frame
        was lost."""
        with self.timer.stage("decision_fetch"):
            vals = np.asarray(entry.packed)
        num_tracked = int(vals[_PK_NUM_TRACKED])
        ref_tracked = int(vals[_PK_REF_TRACKED])
        n_close_trk = int(vals[_PK_CLOSE_TRK])
        n_close_untrk = int(vals[_PK_CLOSE_UNTRK])
        ref_kf_host = int(vals[_PK_REF_KF])
        next_lm_host = int(vals[_PK_NEXT_LM])
        rel = vals[_PK_REL].reshape(3, 4).copy()
        ts = entry.ts

        # Reference acceptance: local-map tracking must keep >= 30 inliers
        # (frame_tracker/ORB-SLAM thresholds); below that the pose is
        # unreliable even if self-consistent, so declare Lost and try to
        # relocalize rather than inserting garbage keyframes.
        if num_tracked < 30:
            self._tracking_state = TrackerState.LOST
            _log.info("tracking lost at t=%.3f (%d inliers); relocalizing",
                      ts, num_tracked)
            with self.timer.stage("relocalize"):
                out = self.relocalizer.relocalize(
                    self._state, entry.feats, self.frontend.inv_sigma_sq,
                    self._split_key(),
                    obs_indicator=self._obs_indicator(),
                    num_levels=self.frontend.extractor.params.num_levels,
                    scale_factor=self.frontend.extractor.params.scale_factor,
                )
            if out is None:
                # Auto-reset when lost right after initialization — the
                # young map is junk (reference: tracking_module.cc:506-513,
                # reset if lost within ~5 s of init).
                if (
                    self.enable_mapping
                    and self.next_kf <= 3
                    and self.num_frames - self._init_frame_count
                    < 5.0 * self.camera.fps
                ):
                    _log.warning("lost on a young map; auto-reset")
                    self.reset()
                    return False
                self._frame_stats.append((ts, ref_kf_host, rel, True))
                return False
            R_r, t_r, kp_lm_r, ref = out
            self.num_relocalizations += 1
            _log.info("relocalized against keyframe %d", int(ref))
            self.pose = (R_r, t_r)
            self.vel = (
                jnp.eye(3, dtype=jnp.float32),
                jnp.zeros((3,), jnp.float32),
            )
            self.last_kp_lm = kp_lm_r
            self.ref_kf = ref
            self._ref_kf_dev = jnp.int32(ref)
            self._tracking_state = TrackerState.TRACKING
            # Frames dispatched after this one tracked from the doomed
            # pre-relocalization pose; drop their pending decisions.
            while self._pending:
                e = self._pending.popleft()
                self._frame_stats.append(
                    (e.ts, ref, np.eye(3, 4, dtype=np.float32), True)
                )
            self._record_frame(ts, lost=False)
            return True
        self._tracking_state = TrackerState.TRACKING
        self.ref_kf = ref_kf_host
        self._publish(entry.feats, entry.res.kp_lm, ts, num_tracked,
                      kp_plane=entry.kp_plane)

        # Capacity growth just before the walls (reference: unbounded
        # map_database growth; here doubling + jit re-specialization).
        if self.enable_mapping and self.auto_grow:
            if self.next_kf >= self.max_keyframes - 1:
                self._grow(grow_kf=True)
            if next_lm_host >= self.max_landmarks - 2 * self.frontend.pad_to:
                self._grow(grow_lm=True)
            if (
                (self.with_lines or entry.seg_mask is not None)
                and self.next_kf % 8 == 7
            ):
                n_ln, n_pl = (int(v) for v in jax.device_get(
                    (self.next_line, self.next_plane)))
                ML = self.frontend.max_lines if self.with_lines else 0
                if self.with_lines and n_ln >= (
                    self._state.ln_pluck.shape[0] - 2 * ML
                ):
                    self._grow(grow_ln=True)
                if n_pl >= self._state.pl_coef.shape[0] - 8:
                    self._grow(grow_pl=True)

        # Keyframe decision (reference: keyframe_inserter.cc:54-114).
        # Condition B (required): enough matches, and either the tracked
        # fraction of the reference's reliable landmarks dropped below 0.9
        # or (stereo/RGB-D) close points demand insertion (ORB-SLAM2's
        # bNeedToInsertClose). A-conditions: A1 max-interval, A2
        # min-interval + mapper idle (mapping is deferred dispatch here, so
        # idle is always true), A3 viewpoint moved hard (< 0.25 of
        # reliable). Deliberate deviation: A1 also forces a keyframe
        # WITHOUT cond B — the reference bounds drift through mapper
        # busy-ness we don't have; the fps-interval force is the analog.
        if self.enable_mapping and self.next_kf < self.max_keyframes:
            lm_headroom = (
                next_lm_host < self.max_landmarks - 2 * self.frontend.pad_to
            )
            close_needed = (
                self.camera.setup is not CameraSetup.MONOCULAR
                and n_close_trk < 100
                and n_close_untrk > 70
            )
            cond_b = num_tracked >= 15 and (
                num_tracked < 0.9 * max(ref_tracked, 1) or close_needed
            )
            cond_a1 = self.frames_since_kf >= self.max_kf_interval
            cond_a2 = self.frames_since_kf >= self.min_kf_interval
            cond_a3 = num_tracked < 0.25 * max(ref_tracked, 1)
            need = (
                (cond_b and (cond_a1 or cond_a2 or cond_a3))
                or (cond_a1 and num_tracked >= 15)
            ) and lm_headroom
            if need:
                _log.info(
                    "keyframe %d at t=%.3f (tracked=%d ref_tracked=%d)",
                    self.next_kf, ts, num_tracked, ref_tracked,
                )
                with self.timer.stage(
                    "keyframe", sync_on=lambda: self._state
                ):
                    self._insert_keyframe(entry)

        self._frame_stats.append((ts, ref_kf_host, rel, False))
        return True

    # ------------------------------------------------------------------
    def _initialize(self, feats, ts: float) -> bool:
        if self.camera.setup in (CameraSetup.RGBD, CameraSetup.STEREO):
            pose = jnp.concatenate(
                [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], 1
            )
            self._state, created = mapper.insert_keyframe(
                self.camera,
                self._state,
                0,
                pose,
                ts,
                feats,
                jnp.full((self.frontend.pad_to,), -1, jnp.int32),
                0,
            )
            n = int(created)
            if n < 30:
                # Clear only what the failed insert wrote (validity masks +
                # the keyframe's association row) instead of reallocating
                # the whole MapState — at grown capacities a rebuild moves
                # hundreds of MB per failed init frame.
                self._state = _clear_failed_init(self._state)
                return False
            self.next_kf = 1
            self.next_lm = n
            self.last_kp_lm = self._state.kf_lm_idx[0]
            self.ref_kf = 0
            self._ref_kf_dev = jnp.int32(0)
            self.pose = (jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), jnp.float32))
            self.vel = (jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), jnp.float32))
            self._tracking_state = TrackerState.TRACKING
            self.frames_since_kf = 0
            self._init_frame_count = self.num_frames
            # Initial lines and planes on the first keyframe (reference:
            # initializer.cc:322-333 initialize_map_with_plane; RGB-D line
            # creation is depth-driven).
            self._init_structures(0, self._cur_seg_mask, feats)
            self._invalidate_map_cache()
            return True

        # Monocular.
        if self._init_feats is None:
            if int(np.asarray(feats["valid"]).sum()) >= 100:
                self._init_feats = feats
                self._init_ts = ts
                self._init_seg_mask = self._cur_seg_mask
            return False

        res = initializer.try_initialize_mono(
            self.camera, self._init_feats, feats, self._split_key(),
            coherent=self.init_graph_cut,
        )
        if not bool(res.success):
            # Keep the reference frame while it still matches well — the
            # failure is then low parallax, which more baseline fixes
            # (reference: initializer.cc keeps init_frm_ and retries).
            # Restart from the current frame only when matches ran out.
            if int(np.asarray(res.num_matches)) < 50 and (
                int(np.asarray(feats["valid"]).sum()) >= 100
            ):
                self._init_feats = feats
                self._init_ts = ts
                self._init_seg_mask = self._cur_seg_mask
            return False

        pts, t2, s = initializer.scale_to_median_depth(
            res.points_w, res.point_ok, res.t_2w,
            use_dist=self.camera.model is CameraModel.EQUIRECTANGULAR,
        )

        f1 = self._init_feats
        N = self.frontend.pad_to
        good = np.asarray(res.point_ok)
        m12 = np.asarray(res.matches)
        count = int(good.sum())

        slots = jnp.cumsum(res.point_ok.astype(jnp.int32)) - 1  # compact ids
        lm1 = jnp.where(res.point_ok, slots, -1)
        # Frame-2 keypoint association.
        m_safe = jnp.clip(res.matches, 0, N - 1)
        lm2 = jnp.full((N,), -1, jnp.int32)
        lm2 = lm2.at[jnp.where(res.point_ok, m_safe, N)].set(
            jnp.where(res.point_ok, slots, -1), mode="drop"
        )

        pose1 = jnp.concatenate(
            [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], 1
        )
        pose2 = jnp.concatenate([res.R_2w, t2[:, None]], 1)

        self._state = ms.add_keyframe(self._state, 0, pose1, self._init_ts, f1, lm1)
        self._state = ms.add_keyframe(self._state, 1, pose2, ts, feats, lm2)

        dist = jnp.linalg.norm(pts, axis=-1)
        sf = self.frontend.extractor.params.scale_factor
        nlv = self.frontend.extractor.params.num_levels
        level_scale = jnp.power(sf, f1["level"].astype(jnp.float32))
        dist_max = dist * level_scale
        dist_min = dist_max / (sf ** (nlv - 1))
        view = pts / jnp.maximum(dist[:, None], 1e-9)
        self._state = ms.add_landmarks(
            self._state,
            slots,
            pts,
            f1["desc"],
            view,
            dist_min,
            dist_max,
            jnp.zeros((N,), jnp.int32),
            res.point_ok,
        )
        self.next_kf = 2
        self.next_lm = count

        # Initial global BA over the two views (reference: initializer.cc
        # :306-307 runs 20 iterations of global BA).
        self._state, _ = mapper.local_ba(
            self.camera,
            self._state,
            1,
            self.frontend.inv_sigma_sq,
            max_opt=4,
            max_fix=4,
            max_lms=4096,
        )

        self.pose = (res.R_2w, t2)
        self.vel = (jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), jnp.float32))
        self.last_kp_lm = self._state.kf_lm_idx[1]
        self.ref_kf = 1
        self._ref_kf_dev = jnp.int32(1)
        self._tracking_state = TrackerState.TRACKING
        self.frames_since_kf = 0
        # Initial lines (from the fresh point map) and planes (from both
        # init frames' seg masks) — reference: initializer.cc:299-302
        # triangulate_line_with_two_keyframes + :322-333
        # initialize_map_with_plane on BOTH init keyframes.
        self._init_structures(0, self._init_seg_mask, f1)
        self._init_structures(1, self._cur_seg_mask, feats)
        self._init_feats = None
        self._init_seg_mask = None
        self._init_frame_count = self.num_frames
        self._invalidate_map_cache()
        return True

    # ------------------------------------------------------------------
    def _init_structures(self, slot: int, seg_mask, feats):
        """Create initial line and plane landmarks on an init keyframe
        (reference: initializer.cc:299-302 line triangulation between the
        init keyframes; :322-333 plane initialization on both). Lines come
        from the depth map (metric setups) and the just-created point map
        (mono redesign, line_mapper.lines_from_points)."""
        st = self._state
        if self.with_lines and "seg" in feats:
            from structure_plp_slam_tpu.models import line_mapper

            next_line = self.next_line
            if self.camera.setup is not CameraSetup.MONOCULAR:
                st, n_d = line_mapper.lines_from_depth(
                    self.camera, st, slot, next_line
                )
                next_line = next_line + n_d
            st, n_p = line_mapper.lines_from_points(
                self.camera, st, slot, next_line
            )
            self.next_line = next_line + n_p
        if seg_mask is not None:
            from structure_plp_slam_tpu.models import planar_mapper

            labels = planar_mapper.label_keypoints(
                jnp.asarray(seg_mask, jnp.int32),
                feats["xy"],
                feats["valid"],
                check_3x3=self.planar.check_3x3_window,
            )
            scale = mapper.map_scale(st, slot)
            # Two-view monocular clouds carry triangulation depth noise of
            # several percent of the map scale (sigma_z/z ~ z*sigma_px/
            # (b*f)) — an order above depth-sensor noise — so the init
            # fit runs with relaxed gates and the created planes are
            # flagged for multi-view refresh (detect_planes docstring).
            mono = self.camera.setup is CameraSetup.MONOCULAR
            st, n_pl = planar_mapper.detect_planes(
                st, slot, labels, self.next_plane, self._split_key(), scale,
                max_instances=self.planar.max_instances,
                coherent=self.use_graph_cut,
                params=self.planar,
                thr_mult=5.0 if mono else 1.0,
                ratio_override=0.45 if mono else None,
            )
            self.next_plane = self.next_plane + n_pl
        self._state = st

    # ------------------------------------------------------------------
    def _insert_keyframe(self, entry: _PendingFrame):
        """Keyframe processing chain — the reference mapping thread's work
        (mapping_module.cc:193-285) as a sequence of jitted dispatches with
        ZERO host syncs in between: slot counters stay on device and flow
        from one stage to the next, so the host issues the entire chain and
        returns. The only host reads happen afterwards (loop detection and
        viewer publishing), once all device work is already queued. Local
        state is mutated only at the very end to keep the chain re-entrant.
        """
        feats, ts, res = entry.feats, entry.ts, entry.res
        # Consume the PREVIOUS keyframe's deferred loop detection first: a
        # firing correction moves the whole map, so this new keyframe's
        # tracked pose is rebased through its reference keyframe's delta
        # before insertion (the reference's loop thread corrects between
        # keyframe insertions the same way).
        if self.enable_loop_closing:
            res = self._consume_pending_loop(res)
        slot = self.next_kf
        pose = jnp.concatenate([res.R, res.t[:, None]], 1)
        has_seg = entry.seg_mask is not None
        has_seg_lines = self.with_lines and entry.seg_line_idx is not None
        lc = self.loop_closer
        # No new detection while one is still pending un-consumed (its
        # device->host copy hasn't landed yet — readiness gate above): the
        # reference's loop thread likewise only ever works on the LATEST
        # queued keyframe (global_optimization_module.cc:98-105).
        do_detect = (
            self.enable_loop_closing
            and self.next_kf + 1 >= 8
            and slot - lc.last_loop_kf >= lc.min_gap
            and self._pending_loop is None
        )
        seg_mask_arg = (
            jnp.asarray(entry.seg_mask) if has_seg
            else jnp.zeros((1, 1), jnp.uint8)
        )
        seg_line_arg = (
            entry.seg_line_idx if has_seg_lines
            else jnp.zeros((0,), jnp.int32)
        )
        # The whole chain (insert, cull, triangulate, lines, fuse, planes,
        # local BA, keyframe cull, statistics, loop-detect scoring) is ONE
        # jitted dispatch on TPU — see _kf_chain. XLA:CPU's LLVM pipeline
        # segfaults compiling the largest single-executable variants, so
        # the CPU backend (the test suite) compiles it as two halves.
        kw = dict(
            with_lines=self.with_lines, has_seg=has_seg,
            has_seg_lines=has_seg_lines,
            do_ba=self.next_kf + 1 >= 3,
            do_cull_kf=self.next_kf + 1 >= 5,
            stats_full=slot % 2 == 0, do_detect=do_detect,
            two_view_lines=(
                self.camera.setup is not CameraSetup.MONOCULAR
                and self.next_kf + 1 >= 2
            ),
            num_tri_neighbors=self.num_tri_neighbors,
            planar=self.planar, use_graph_cut=self.use_graph_cut,
            scale_factor=self.frontend.extractor.params.scale_factor,
            num_levels=self.frontend.extractor.params.num_levels,
            bow_max_hamming=lc.bow.max_hamming, bow_chunk=lc.bow.chunk,
        )
        key = self._split_key()
        with self.timer.stage("keyframe.chain", sync_on=lambda: st):
            if jax.default_backend() == "cpu":
                (st, next_lm, next_plane, next_line, ind, packed,
                 cov) = _kf_chain(
                    self.camera, self._state, slot, pose, ts, feats,
                    res.kp_lm, self.next_lm, seg_mask_arg, seg_line_arg,
                    key, self.next_plane, self.next_line,
                    self.frontend.inv_sigma_sq, self._obs_indicator(),
                    part="a", **kw,
                )
                (st, next_lm, next_plane, next_line, ind, packed,
                 cov) = _kf_chain(
                    self.camera, st, slot, pose, ts, feats,
                    res.kp_lm, next_lm, seg_mask_arg, seg_line_arg,
                    key, next_plane, next_line,
                    self.frontend.inv_sigma_sq, ind,
                    part="b", **kw,
                )
            else:
                (st, next_lm, next_plane, next_line, ind, packed,
                 cov) = _kf_chain(
                    self.camera, self._state, slot, pose, ts, feats,
                    res.kp_lm, self.next_lm, seg_mask_arg, seg_line_arg,
                    key, self.next_plane, self.next_line,
                    self.frontend.inv_sigma_sq, self._obs_indicator(),
                    **kw,
                )
        self.next_kf += 1
        self.frames_since_kf = 0
        if self.with_lines:
            self.next_line = next_line
        if has_seg:
            self.next_plane = next_plane

        if entry.dense is not None:
            self._dense_frames[slot] = entry.dense

        # Publish the new state. Everything above was pure dispatch.
        self._state = st
        self.next_lm = next_lm
        self.last_kp_lm = st.kf_lm_idx[slot]
        self.ref_kf = slot
        self._ref_kf_dev = jnp.int32(slot)
        # The chain returns the POST-chain observation indicator — seed
        # the tracking cache with it instead of rebuilding next frame.
        self._ind_cache = ind

        # Stream the updated map to attached viewers; maybe checkpoint.
        # (Separate stages so periodic checkpoint I/O spikes are not
        # attributed to map publishing in the timing summary.)
        with self.timer.stage("kf.publish"):
            self._publish_map_packet()
        with self.timer.stage("kf.autosave"):
            self._maybe_autosave()

        # Loop closing (reference: the keyframe flows to the
        # global-optimization THREAD's queue, mapping_module.cc:150, so
        # detection never blocks tracking). Same latency tolerance here:
        # the detection compute ran inside the chain dispatch; its
        # [K, 3] device->host copy starts now and is consumed at the NEXT
        # keyframe (_consume_pending_loop, called at the top of this
        # method), so the feed path never waits on the fetch RPC.
        if do_detect:
            try:
                packed.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
            self._pending_loop = (slot, (packed, cov))
            self._pending_loop_age = 0

    # ------------------------------------------------------------------
    def _obs_indicator(self):
        """Cached observation indicator [K, L]; invalidated whenever the
        map's associations change (keyframe insertion, loop correction,
        reset, load)."""
        if self._ind_cache is None:
            self._ind_cache = ms.observation_indicator(self._state)
        return self._ind_cache

    def _invalidate_map_cache(self):
        self._ind_cache = None

    # ------------------------------------------------------------------
    def _record_frame(self, ts: float, lost: bool) -> Optional[np.ndarray]:
        R, t = self.pose
        ref = self.ref_kf
        # Relative pose to the reference keyframe for later refinement
        # (reference: frame_statistics) — computed on device so the frame's
        # pose and its keyframe-relative form come back in ONE host fetch.
        kf_pose = self._state.kf_pose[ref]
        R_ref, t_ref = kf_pose[:, :3], kf_pose[:, 3]
        R_rel = R @ R_ref.T
        t_rel = t - R_rel @ t_ref
        P, rel = jax.device_get((
            jnp.concatenate([R, t[:, None]], 1),
            jnp.concatenate([R_rel, t_rel[:, None]], 1),
        ))
        self._frame_stats.append((ts, ref, np.asarray(rel), lost))
        return np.asarray(P)

    # ------------------------------------------------------------------
    # Output (reference: io/trajectory_io, publish/map_publisher).
    # ------------------------------------------------------------------
    def frame_trajectory(self):
        """Frame poses recomposed against current keyframe poses."""
        self._drain_pending()
        kf_poses = np.asarray(self._state.kf_pose)
        out = []
        for ts, ref, rel, lost in self._frame_stats:
            if lost:
                continue
            Pk = kf_poses[ref]
            R = rel[:, :3] @ Pk[:, :3]
            t = rel[:, :3] @ Pk[:, 3] + rel[:, 3]
            out.append((ts, np.concatenate([R, t[:, None]], 1)))
        return out

    def keyframe_trajectory(self):
        self._drain_pending()
        kf_poses = np.asarray(self._state.kf_pose)
        kf_valid = np.asarray(self._state.kf_valid)
        kf_ts = np.asarray(self._state.kf_timestamp)
        order = np.argsort(kf_ts)
        return [
            (float(kf_ts[k]), kf_poses[k]) for k in order if kf_valid[k]
        ]

    def save_frame_trajectory(self, path: str, fmt: str = "tum"):
        saver = traj_io.save_tum if fmt == "tum" else traj_io.save_kitti
        saver(path, self.frame_trajectory())

    def save_keyframe_trajectory(self, path: str, fmt: str = "tum"):
        saver = traj_io.save_tum if fmt == "tum" else traj_io.save_kitti
        saver(path, self.keyframe_trajectory())

    # ------------------------------------------------------------------
    # Map persistence + module toggles (reference: system.h:91-100,
    # 112-192 — save/load map database, enable/disable mapping).
    # ------------------------------------------------------------------
    def save_map_database(self, path: str):
        self._drain_pending()
        from structure_plp_slam_tpu.io import map_io

        map_io.save_map(
            path, self._state, next_kf=int(self.next_kf),
            next_lm=int(self.next_lm), next_line=int(self.next_line),
            next_plane=int(self.next_plane),
            camera_name=self.camera.name, camera=self.camera,
        )

    def load_map_database(self, path: str):
        """Load a snapshot; tracking starts Lost and relocalizes against
        the loaded map (reference: run_image_localization.cc:66-76)."""
        self._drain_pending()
        from structure_plp_slam_tpu.io import map_io

        self._state, counters = map_io.load_map_with_counters(path)
        self.next_kf = counters["next_kf"]
        self.next_lm = counters["next_lm"]
        self.next_line = counters["next_line"]
        self.next_plane = counters["next_plane"]
        self.max_keyframes = self._state.kf_pose.shape[0]
        self.max_landmarks = self._state.lm_pos.shape[0]
        # No retrieval-index rebuild needed: scoring reads the loaded
        # MapState's own descriptors directly.
        self._tracking_state = TrackerState.LOST
        self._invalidate_map_cache()

    # ------------------------------------------------------------------
    # Pause / terminate protocol (reference: system.h:112-192 —
    # pause_tracker/resume_tracker/request_terminate; the reference's
    # pause_other_threads has no analog because mapping/loop closing run
    # synchronously as jitted steps, not on background threads).
    # ------------------------------------------------------------------
    def pause_tracker(self):
        self._drain_pending()
        self._paused = True

    def resume_tracker(self):
        self._paused = False

    def tracker_is_paused(self) -> bool:
        return self._paused

    def request_terminate(self):
        self._drain_pending()
        self._terminate_requested = True

    def terminate_is_requested(self) -> bool:
        return self._terminate_requested

    def disable_mapping_module(self):
        self.enable_mapping = False

    def enable_mapping_module(self):
        self.enable_mapping = True

    def disable_loop_detector(self):
        self.enable_loop_closing = False

    def enable_loop_detector(self):
        self.enable_loop_closing = True

    def enable_autosave(self, path: str, every_n_keyframes: int = 10):
        """Periodic non-blocking map checkpoints through the native
        double-buffered writer (checkpoint/resume without pausing tracking
        — the reference must pause both threads to snapshot,
        system.cc:246-260)."""
        from structure_plp_slam_tpu import native

        self._autosave = native.AsyncSnapshotWriter(path)
        self._autosave_every = every_n_keyframes

    def _maybe_autosave(self):
        w = getattr(self, "_autosave", None)
        if w is None or self.next_kf % self._autosave_every != 0:
            return
        from structure_plp_slam_tpu.io import map_io

        map_io.save_map_async(
            w, self._state, next_kf=int(self.next_kf),
            next_lm=int(self.next_lm), next_line=int(self.next_line),
            next_plane=int(self.next_plane),
            camera_name=self.camera.name, camera=self.camera,
        )

    def start_native_publisher(self, port: int = 0) -> int:
        """Start the native TCP map publisher (reference: socket_publisher
        streaming to the web viewer). Returns the bound port."""
        from structure_plp_slam_tpu import native

        self._native_pub = native.NativePublisher(port)
        return self._native_pub.port

    def _publish_map_packet(self):
        pub = getattr(self, "_native_pub", None)
        if pub is None or pub.num_clients == 0:
            return
        import msgpack

        valid = np.asarray(self._state.lm_valid)
        pts = np.asarray(self._state.lm_pos)[valid].astype(np.float32)
        kf_valid = np.asarray(self._state.kf_valid)
        kfs = np.asarray(self._state.kf_pose)[kf_valid].astype(np.float32)
        R, t = self.pose
        pose = np.asarray(jnp.concatenate([R, t[:, None]], 1), np.float32)
        pub.publish(
            msgpack.packb(
                {
                    "landmarks": pts.tobytes(),
                    "num_landmarks": int(len(pts)),
                    "keyframes": kfs.tobytes(),
                    "num_keyframes": int(len(kfs)),
                    "current_pose": pose.tobytes(),
                },
                use_bin_type=True,
            )
        )

    def start_live_viewer(self, port: int = 0, max_points: int = 20000,
                          host: str = "127.0.0.1") -> int:
        """Start the live HTTP map viewer (reference: socket_publisher +
        node.js web viewer). Returns the bound port; open
        ``http://localhost:<port>`` in a browser. Serves loopback-only
        unless ``host`` says otherwise."""
        from structure_plp_slam_tpu.publish.live_server import LiveViewerServer

        # A second start replaces the first server; stop it so its daemon
        # thread and bound socket are released rather than leaked.
        self.stop_live_viewer()
        self._live_viewer = LiveViewerServer(
            self.map_publisher, port=port, max_points=max_points, host=host
        )
        return self._live_viewer.port

    def stop_live_viewer(self):
        srv = getattr(self, "_live_viewer", None)
        if srv is not None:
            srv.stop()
            self._live_viewer = None

    def get_frame_publisher(self):
        return self.frame_publisher

    def get_map_publisher(self):
        return self.map_publisher

    def _publish(self, feats, kp_lm, ts: float, num_tracked: int,
                 kp_plane=None):
        """Push the frame snapshot to the publishers. Pure reference
        hand-off: device arrays are NOT pulled here (this runs every
        frame); viewers materialize them when they poll."""
        if kp_plane is None:
            L = self._state.lm_pos.shape[0]
            kp_plane = jnp.where(
                kp_lm >= 0,
                self._state.lm_plane[jnp.clip(kp_lm, 0, L - 1)],
                -1,
            )
        self.frame_publisher.update(
            image=self._last_image if self._last_image is not None else
            np.zeros((self.camera.rows, self.camera.cols), np.uint8),
            kp_xy=feats["xy"],
            kp_valid=feats["valid"],
            kp_has_landmark=kp_lm >= 0,
            kp_plane=kp_plane,
            segments=feats.get("seg"),
            seg_valid=feats.get("seg_valid"),
            state=self._tracking_state.value,
            num_tracked=num_tracked,
            timestamp=ts,
        )
        R, t = self.pose
        self.map_publisher.set_current_cam_pose((R, t))

    def get_landmarks(self) -> np.ndarray:
        self._drain_pending()
        valid = np.asarray(self._state.lm_valid)
        return np.asarray(self._state.lm_pos)[valid]

    @property
    def num_keyframes(self) -> int:
        self._drain_pending()
        return int(np.asarray(self._state.kf_valid).sum())

    @property
    def num_landmarks(self) -> int:
        self._drain_pending()
        return int(np.asarray(self._state.lm_valid).sum())

    def metrics(self) -> dict:
        """Observability snapshot (reference: spdlog stats + per-frame
        timing dumps; SURVEY.md §5)."""
        self._drain_pending()
        return {
            "frames": self.num_frames,
            "keyframes": self.num_keyframes,
            "landmarks": self.num_landmarks,
            "lines": int(np.asarray(self._state.ln_valid).sum()),
            "planes": int(np.asarray(self._state.pl_valid).sum()),
            "loops_closed": self.loop_closer.num_loops_closed,
            "relocalizations": self.num_relocalizations,
            "tracking_state": self._tracking_state.value,
            "timing": self.timer.summary(),
        }
