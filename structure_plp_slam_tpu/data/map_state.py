"""Device-resident SoA map state.

TPU-native replacement for the reference's pointer-graph map database
(src/PLPSLAM/data/map_database.h:59-270 — heap keyframe/landmark objects,
id maps, ONE global mutex locked by tracking, loop correction and loop BA).
Here the entire map lives in fixed-capacity device arrays; "allocation" is
writing to a slot and setting its valid bit, "deletion" is clearing the bit
(the reference's erasure protocol, keyframe.h:262-277, becomes a mask
update); compaction is a gather. There are no locks: updates are functional
array donations sequenced by the host orchestrator.

Capacity policy: capacities are static (jit shapes). When a capacity
fills, the host grows the arrays by doubling (data/map_database.py
``grow``; System triggers it automatically before an insertion would hit
a cap) and jit re-specializes on the new shapes — in practice the
defaults hold a full TUM/EuRoC sequence without growing.

Observation model: each keyframe has ``max_kps`` keypoint slots;
``kf_lm_idx[k, i]`` is the landmark id observed by keypoint i (or -1).
This one index tensor IS the covisibility structure: shared-landmark counts
between keyframes are an indicator matmul away (see
:func:`covisibility_matrix`) — the reference maintains the same information
incrementally in graph_node.cc:92 update_connections.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MapState(NamedTuple):
    """All device arrays. Shapes: K = max keyframes, N = keypoint slots per
    keyframe, L = max landmarks."""

    # --- keyframes -------------------------------------------------------
    kf_pose: jax.Array       # [K, 3, 4] f32 world->cam (R|t)
    kf_valid: jax.Array      # [K] bool
    kf_timestamp: jax.Array  # [K] f32
    # per-keyframe keypoints (immutable measurements)
    kf_xy: jax.Array         # [K, N, 2] f32 undistorted level-0 coords
    kf_xr: jax.Array         # [K, N] f32 right-image x (< 0: mono)
    kf_depth: jax.Array      # [K, N] f32 measured depth (<= 0: none)
    kf_level: jax.Array      # [K, N] i32 pyramid level
    kf_angle: jax.Array      # [K, N] f32 keypoint orientation
    kf_desc: jax.Array       # [K, N, 8] u32 packed ORB
    kf_bearing: jax.Array    # [K, N, 3] f32 unit rays
    kf_kp_valid: jax.Array   # [K, N] bool
    kf_lm_idx: jax.Array     # [K, N] i32 landmark id per keypoint (-1 none)
    # --- landmarks (points) ---------------------------------------------
    lm_pos: jax.Array        # [L, 3] f32
    lm_valid: jax.Array      # [L] bool
    lm_desc: jax.Array       # [L, 8] u32 representative descriptor
    lm_normal: jax.Array     # [L, 3] f32 mean viewing direction
    lm_dist_min: jax.Array   # [L] f32 ORB scale-invariance bounds
    lm_dist_max: jax.Array   # [L] f32
    lm_ref_kf: jax.Array     # [L] i32 reference keyframe
    lm_n_vis: jax.Array      # [L] i32 num_observable (tracking visibility)
    lm_n_fnd: jax.Array      # [L] i32 num_observed (actually matched)
    lm_plane: jax.Array      # [L] i32 owning plane id (-1)
    # --- line landmarks (Plücker) + per-keyframe segment observations ----
    # (reference: data/landmark_line.{h,cc} + frame keyline storage)
    kf_seg: jax.Array        # [K, ML, 4] f32 segment endpoints (x1,y1,x2,y2)
    kf_seg_depth: jax.Array  # [K, ML, 2] f32 endpoint depths (<=0 unknown)
    kf_seg_desc: jax.Array   # [K, ML, LD] f32 band descriptors
    kf_seg_valid: jax.Array  # [K, ML] bool
    kf_line_idx: jax.Array   # [K, ML] i32 3D-line id per segment (-1)
    ln_pluck: jax.Array      # [L2, 6] f32 Plücker [m, d]
    ln_endpoints: jax.Array  # [L2, 6] f32 world endpoints (p1, p2)
    ln_desc: jax.Array       # [L2, LD] f32 representative descriptor
    ln_valid: jax.Array      # [L2] bool
    ln_ref_kf: jax.Array     # [L2] i32
    ln_n_vis: jax.Array      # [L2] i32 frames where predicted visible
    ln_n_fnd: jax.Array      # [L2] i32 frames where actually matched
    # --- plane landmarks (reference: data/landmark_plane.{h,cc}) ---------
    pl_coef: jax.Array       # [P, 4] f32 plane (n, d): n.x + d = 0, |n|=1
    pl_valid: jax.Array      # [P] bool
    pl_needs_refresh: jax.Array  # [P] bool (needs-refinement state)
    pl_ref_kf: jax.Array     # [P] i32

    @property
    def max_keyframes(self) -> int:
        return self.kf_pose.shape[0]

    @property
    def max_kps(self) -> int:
        return self.kf_xy.shape[1]

    @property
    def max_landmarks(self) -> int:
        return self.lm_pos.shape[0]


def create(max_keyframes: int = 256, max_kps: int = 1024, max_landmarks: int = 16384,
           max_lines_per_kf: int = 64, max_line_landmarks: int = 2048,
           line_desc_dim: int | None = None, max_planes: int = 64):
    if line_desc_dim is None:
        from structure_plp_slam_tpu.ops.lines import DESC_DIM as line_desc_dim
    K, N, L = max_keyframes, max_kps, max_landmarks
    ML, L2, LD = max_lines_per_kf, max_line_landmarks, line_desc_dim
    P = max_planes
    f32 = jnp.float32
    return MapState(
        kf_pose=jnp.tile(
            jnp.concatenate([jnp.eye(3, dtype=f32), jnp.zeros((3, 1), f32)], 1)[None],
            (K, 1, 1),
        ),
        kf_valid=jnp.zeros((K,), bool),
        kf_timestamp=jnp.zeros((K,), f32),
        kf_xy=jnp.zeros((K, N, 2), f32),
        kf_xr=jnp.full((K, N), -1.0, f32),
        kf_depth=jnp.zeros((K, N), f32),
        kf_level=jnp.zeros((K, N), jnp.int32),
        kf_angle=jnp.zeros((K, N), f32),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_bearing=jnp.zeros((K, N, 3), f32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_lm_idx=jnp.full((K, N), -1, jnp.int32),
        lm_pos=jnp.zeros((L, 3), f32),
        lm_valid=jnp.zeros((L,), bool),
        lm_desc=jnp.zeros((L, 8), jnp.uint32),
        lm_normal=jnp.zeros((L, 3), f32),
        lm_dist_min=jnp.zeros((L,), f32),
        lm_dist_max=jnp.zeros((L,), f32),
        lm_ref_kf=jnp.full((L,), -1, jnp.int32),
        lm_n_vis=jnp.zeros((L,), jnp.int32),
        lm_n_fnd=jnp.zeros((L,), jnp.int32),
        lm_plane=jnp.full((L,), -1, jnp.int32),
        kf_seg=jnp.zeros((K, ML, 4), f32),
        kf_seg_depth=jnp.zeros((K, ML, 2), f32),
        kf_seg_desc=jnp.zeros((K, ML, LD), f32),
        kf_seg_valid=jnp.zeros((K, ML), bool),
        kf_line_idx=jnp.full((K, ML), -1, jnp.int32),
        ln_pluck=jnp.zeros((L2, 6), f32),
        ln_endpoints=jnp.zeros((L2, 6), f32),
        ln_desc=jnp.zeros((L2, LD), f32),
        ln_valid=jnp.zeros((L2,), bool),
        ln_ref_kf=jnp.full((L2,), -1, jnp.int32),
        ln_n_vis=jnp.zeros((L2,), jnp.int32),
        ln_n_fnd=jnp.zeros((L2,), jnp.int32),
        pl_coef=jnp.zeros((P, 4), f32),
        pl_valid=jnp.zeros((P,), bool),
        pl_needs_refresh=jnp.zeros((P,), bool),
        pl_ref_kf=jnp.full((P,), -1, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Covisibility as matmul (replaces graph_node incremental bookkeeping).
# ---------------------------------------------------------------------------


@jax.jit
def observation_indicator(state: MapState):
    """``[K, L]`` f32 indicator: keyframe k observes landmark l.

    Built by scatter from ``kf_lm_idx``; the workhorse for covisibility,
    local-map assembly and landmark statistics.
    """
    K, N = state.kf_lm_idx.shape
    L = state.lm_pos.shape[0]
    lm = state.kf_lm_idx  # [K, N]
    obs_valid = (lm >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
    lm_safe = jnp.where(obs_valid, lm, L)  # scatter drops out-of-range
    ind = jnp.zeros((K, L + 1), jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, N), 0)
    ind = ind.at[rows, lm_safe].max(1.0)
    ind = ind[:, :L] * state.lm_valid[None, :].astype(jnp.float32)
    return ind


def indicator_update_rows(ind, state: MapState, rows):
    """Recompute only the given keyframe ROWS of an observation indicator
    and re-apply the global validity masks.

    The full ``observation_indicator`` build is a ~5 ms [K, L] scatter on
    TPU; each keyframe-chain stage only rewires a handful of rows
    (insert: the new slot; triangulation: slot + its neighbors; local BA
    outlier detach: the window cameras), while landmark/keyframe culls
    only SHRINK the validity masks — an elementwise multiply. O(R * N)
    scatter + one masked multiply instead of four full rebuilds per
    keyframe. Fuse still needs a full rebuild (its duplicate merge remaps
    landmark ids across ALL rows)."""
    K, N = state.kf_lm_idx.shape
    L = state.lm_pos.shape[0]
    rows = jnp.asarray(rows, jnp.int32).reshape(-1)
    rows_safe = jnp.clip(rows, 0, K - 1)
    lm = state.kf_lm_idx[rows_safe]                       # [R, N]
    ok = (
        (lm >= 0)
        & state.kf_kp_valid[rows_safe]
        & state.kf_valid[rows_safe][:, None]
    )
    lm_safe = jnp.where(ok, lm, L)
    R = rows.shape[0]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, N), 0)
    row_ind = jnp.zeros((R, L + 1), jnp.float32).at[r_iota, lm_safe].max(
        1.0
    )[:, :L]
    ind = ind.at[rows_safe].set(row_ind)
    return (
        ind
        * state.lm_valid[None, :].astype(jnp.float32)
        * state.kf_valid[:, None].astype(jnp.float32)
    )


@jax.jit
def covisibility_matrix(state: MapState, ind=None):
    """``[K, K]`` i32 shared-landmark counts (diag = own landmark count).

    One bf16 matmul over the observation indicator — the TPU-native
    equivalent of graph_node::update_connections
    (src/PLPSLAM/data/graph_node.cc:92). ``ind``: optionally a
    precomputed indicator — building it is a ~5 ms TPU scatter, so the
    keyframe chain computes it once and threads it through.
    """
    ind = (observation_indicator(state) if ind is None else ind).astype(
        jnp.bfloat16
    )
    W = jax.lax.dot_general(
        ind, ind, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return W.astype(jnp.int32)


@jax.jit
def landmark_observation_counts(state: MapState, ind=None):
    """``[L]`` i32 — number of keyframes observing each landmark."""
    if ind is None:
        ind = observation_indicator(state)
    return jnp.sum(ind, axis=0).astype(jnp.int32)


@jax.jit
def local_landmark_mask(state: MapState, kf_mask, ind=None):
    """Landmarks observed by any keyframe in ``kf_mask`` (``[K]`` bool)."""
    if ind is None:
        ind = observation_indicator(state)
    return (jnp.einsum("k,kl->l", kf_mask.astype(jnp.float32), ind) > 0) & state.lm_valid


# ---------------------------------------------------------------------------
# Functional writers (used by the host orchestrator).
# ---------------------------------------------------------------------------


def add_keyframe(state: MapState, slot, pose, timestamp, feats, lm_idx):
    """Write one keyframe into ``slot``. ``feats`` is the frame feature SoA
    (xy/xr/depth/level/angle/desc/bearing/valid padded to max_kps; optional
    line keys seg/seg_desc/seg_valid)."""
    if "seg" in feats:
        state = state._replace(
            kf_seg=state.kf_seg.at[slot].set(feats["seg"]),
            kf_seg_depth=state.kf_seg_depth.at[slot].set(
                feats.get(
                    "seg_depth", jnp.zeros_like(state.kf_seg_depth[slot])
                )
            ),
            kf_seg_desc=state.kf_seg_desc.at[slot].set(feats["seg_desc"]),
            kf_seg_valid=state.kf_seg_valid.at[slot].set(feats["seg_valid"]),
            kf_line_idx=state.kf_line_idx.at[slot].set(
                jnp.full_like(state.kf_line_idx[slot], -1)
            ),
        )
    return state._replace(
        kf_pose=state.kf_pose.at[slot].set(pose),
        kf_valid=state.kf_valid.at[slot].set(True),
        kf_timestamp=state.kf_timestamp.at[slot].set(timestamp),
        kf_xy=state.kf_xy.at[slot].set(feats["xy"]),
        kf_xr=state.kf_xr.at[slot].set(feats["xr"]),
        kf_depth=state.kf_depth.at[slot].set(feats["depth"]),
        kf_level=state.kf_level.at[slot].set(feats["level"]),
        kf_angle=state.kf_angle.at[slot].set(feats["angle"]),
        kf_desc=state.kf_desc.at[slot].set(feats["desc"]),
        kf_bearing=state.kf_bearing.at[slot].set(feats["bearing"]),
        kf_kp_valid=state.kf_kp_valid.at[slot].set(feats["valid"]),
        kf_lm_idx=state.kf_lm_idx.at[slot].set(lm_idx),
    )


def add_landmarks(state: MapState, slots, pos, desc, normal, dist_min, dist_max,
                  ref_kf, valid):
    """Write a batch of new landmarks into ``slots`` (``[M]`` i32).

    Rows with ``valid=False`` write nothing. The VALID slots must be
    CONTIGUOUS (``next_lm + running_index`` — how every creation site
    allocates); that invariant turns ten per-array scatters into one
    window slice/update per array. A TPU scatter costs ~5 ms EACH
    regardless of size (round-3 profiling: the old ten-scatter form made
    keyframe insertion a 38 ms stage); dynamic-slice + where + dynamic-
    update-slice is bandwidth-priced.
    """
    L = state.lm_pos.shape[0]
    M = slots.shape[0]
    if M >= L:  # tiny (test) maps: the window would exceed the capacity
        safe = jnp.where(valid, slots, L)

        def scat(arr, vals):
            return arr.at[safe].set(vals, mode="drop")

        return state._replace(
            lm_pos=scat(state.lm_pos, pos),
            lm_valid=state.lm_valid.at[safe].set(valid, mode="drop"),
            lm_desc=scat(state.lm_desc, desc),
            lm_normal=scat(state.lm_normal, normal),
            lm_dist_min=scat(state.lm_dist_min, dist_min),
            lm_dist_max=scat(state.lm_dist_max, dist_max),
            lm_ref_kf=scat(state.lm_ref_kf, ref_kf),
            lm_n_vis=scat(state.lm_n_vis, jnp.ones_like(slots)),
            lm_n_fnd=scat(state.lm_n_fnd, jnp.ones_like(slots)),
            lm_plane=scat(state.lm_plane, jnp.full_like(slots, -1)),
        )
    count = jnp.sum(valid)
    first = jnp.min(jnp.where(valid, slots, L))
    start = jnp.clip(jnp.where(count > 0, first, 0), 0, max(L - M, 0))
    off = jnp.where(count > 0, first - start, 0)
    # Order sources by target slot; row i of the window takes source
    # order[i - off] (valid slots are contiguous, so this aligns exactly).
    order = jnp.argsort(jnp.where(valid, slots, jnp.int32(2**30)))
    i = jnp.arange(M)
    src = order[jnp.clip(i - off, 0, M - 1)]
    taken = (i >= off) & (i < off + count)
    taken = taken & jnp.take(valid, src) & (jnp.take(slots, src) < L)

    def upd(arr, vals):
        win = jax.lax.dynamic_slice_in_dim(arr, start, M, 0)
        v = jnp.take(vals, src, axis=0)
        mask = taken.reshape((M,) + (1,) * (arr.ndim - 1))
        return jax.lax.dynamic_update_slice_in_dim(
            arr, jnp.where(mask, v, win), start, 0
        )

    ones = jnp.ones_like(slots)
    return state._replace(
        lm_pos=upd(state.lm_pos, pos),
        lm_valid=upd(state.lm_valid, valid),
        lm_desc=upd(state.lm_desc, desc),
        lm_normal=upd(state.lm_normal, normal),
        lm_dist_min=upd(state.lm_dist_min, dist_min),
        lm_dist_max=upd(state.lm_dist_max, dist_max),
        lm_ref_kf=upd(state.lm_ref_kf, ref_kf),
        lm_n_vis=upd(state.lm_n_vis, ones),
        lm_n_fnd=upd(state.lm_n_fnd, ones),
        lm_plane=upd(state.lm_plane, jnp.full_like(slots, -1)),
    )


def remove_landmarks(state: MapState, lm_mask):
    """Invalidate landmarks where ``lm_mask`` is True and detach their
    observations (reference: landmark::prepare_for_erasing)."""
    lm_idx = state.kf_lm_idx
    observed_gone = (lm_idx >= 0) & lm_mask[jnp.clip(lm_idx, 0, None)]
    return state._replace(
        lm_valid=state.lm_valid & ~lm_mask,
        kf_lm_idx=jnp.where(observed_gone, -1, lm_idx),
    )


def remove_keyframes(state: MapState, kf_mask):
    """Invalidate keyframes where ``kf_mask`` is True (observations detach
    implicitly via kf_valid in observation_indicator)."""
    return state._replace(
        kf_valid=state.kf_valid & ~kf_mask,
        kf_kp_valid=state.kf_kp_valid & ~kf_mask[:, None],
        kf_lm_idx=jnp.where(kf_mask[:, None], -1, state.kf_lm_idx),
    )
