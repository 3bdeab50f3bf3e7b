"""Capacity growth for the fixed-shape SoA MapState.

The reference's map database grows unboundedly on the heap
(src/PLPSLAM/data/map_database.h:59-270 — keyframes/landmarks are
new-allocated objects). Static XLA shapes cannot grow in place, so the
TPU-native growth policy is capacity DOUBLING: when a slot counter nears
its capacity, the host pads every affected array to twice the size (a
one-time device-side concat) and jitted modules re-specialize on the new
shapes (compilation is cached per shape, so each doubling compiles once).

Amortized cost is O(map) copies total — the classic dynamic-array
argument — plus one recompile per doubling. Padding fill values mirror
``map_state.create`` (invalid slots: valid=False, indices=-1).
"""

from __future__ import annotations

import jax.numpy as jnp

from structure_plp_slam_tpu.data.map_state import MapState


def _pad(arr, axis: int, extra: int, fill):
    pad_shape = list(arr.shape)
    pad_shape[axis] = extra
    return jnp.concatenate(
        [arr, jnp.full(pad_shape, fill, arr.dtype)], axis=axis
    )


def grow_keyframes(state: MapState, new_max: int) -> MapState:
    """Grow keyframe capacity K (axis 0 of all kf_* arrays)."""
    K = state.kf_pose.shape[0]
    if new_max <= K:
        return state
    e = new_max - K
    eye_pose = jnp.tile(
        jnp.concatenate(
            [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], 1
        )[None],
        (e, 1, 1),
    )
    return state._replace(
        kf_pose=jnp.concatenate([state.kf_pose, eye_pose], 0),
        kf_valid=_pad(state.kf_valid, 0, e, False),
        kf_timestamp=_pad(state.kf_timestamp, 0, e, 0.0),
        kf_xy=_pad(state.kf_xy, 0, e, 0.0),
        kf_xr=_pad(state.kf_xr, 0, e, -1.0),
        kf_depth=_pad(state.kf_depth, 0, e, 0.0),
        kf_level=_pad(state.kf_level, 0, e, 0),
        kf_angle=_pad(state.kf_angle, 0, e, 0.0),
        kf_desc=_pad(state.kf_desc, 0, e, 0),
        kf_bearing=_pad(state.kf_bearing, 0, e, 0.0),
        kf_kp_valid=_pad(state.kf_kp_valid, 0, e, False),
        kf_lm_idx=_pad(state.kf_lm_idx, 0, e, -1),
        kf_seg=_pad(state.kf_seg, 0, e, 0.0),
        kf_seg_depth=_pad(state.kf_seg_depth, 0, e, 0.0),
        kf_seg_desc=_pad(state.kf_seg_desc, 0, e, 0.0),
        kf_seg_valid=_pad(state.kf_seg_valid, 0, e, False),
        kf_line_idx=_pad(state.kf_line_idx, 0, e, -1),
    )


def grow_landmarks(state: MapState, new_max: int) -> MapState:
    """Grow point-landmark capacity L."""
    L = state.lm_pos.shape[0]
    if new_max <= L:
        return state
    e = new_max - L
    return state._replace(
        lm_pos=_pad(state.lm_pos, 0, e, 0.0),
        lm_valid=_pad(state.lm_valid, 0, e, False),
        lm_desc=_pad(state.lm_desc, 0, e, 0),
        lm_normal=_pad(state.lm_normal, 0, e, 0.0),
        lm_dist_min=_pad(state.lm_dist_min, 0, e, 0.0),
        lm_dist_max=_pad(state.lm_dist_max, 0, e, 0.0),
        lm_ref_kf=_pad(state.lm_ref_kf, 0, e, -1),
        lm_n_vis=_pad(state.lm_n_vis, 0, e, 0),
        lm_n_fnd=_pad(state.lm_n_fnd, 0, e, 0),
        lm_plane=_pad(state.lm_plane, 0, e, -1),
    )


def grow_lines(state: MapState, new_max: int) -> MapState:
    """Grow line-landmark capacity L2."""
    L2 = state.ln_pluck.shape[0]
    if new_max <= L2:
        return state
    e = new_max - L2
    return state._replace(
        ln_pluck=_pad(state.ln_pluck, 0, e, 0.0),
        ln_endpoints=_pad(state.ln_endpoints, 0, e, 0.0),
        ln_desc=_pad(state.ln_desc, 0, e, 0.0),
        ln_valid=_pad(state.ln_valid, 0, e, False),
        ln_ref_kf=_pad(state.ln_ref_kf, 0, e, -1),
        ln_n_vis=_pad(state.ln_n_vis, 0, e, 0),
        ln_n_fnd=_pad(state.ln_n_fnd, 0, e, 0),
    )


def grow_planes(state: MapState, new_max: int) -> MapState:
    """Grow plane capacity P."""
    P = state.pl_coef.shape[0]
    if new_max <= P:
        return state
    e = new_max - P
    return state._replace(
        pl_coef=_pad(state.pl_coef, 0, e, 0.0),
        pl_valid=_pad(state.pl_valid, 0, e, False),
        pl_needs_refresh=_pad(state.pl_needs_refresh, 0, e, False),
        pl_ref_kf=_pad(state.pl_ref_kf, 0, e, -1),
    )
