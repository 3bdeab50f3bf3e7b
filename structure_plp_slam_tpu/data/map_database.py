"""Capacity growth for the SoA map state.

The reference's map grows unboundedly (heap keyframe/landmark objects,
src/PLPSLAM/data/map_database.h:59-270). Here capacities are static jit
shapes, so growth is a reallocation: build a fresh MapState at the larger
capacity and copy the old arrays into its prefix. Every jitted module then
re-specializes on the new shapes — one recompilation per capacity step,
and capacities double, so a sequence of any length pays only O(log)
growth events.

``System`` triggers growth automatically (auto_grow=True) just before an
insertion would hit a cap; ids are stable (slot indices never move), so
no host bookkeeping — continuity sets, trajectory records, loop edges —
needs fixing up.
"""

from __future__ import annotations

from structure_plp_slam_tpu.data import map_state as ms


def grow(state: ms.MapState, *, grow_kf: bool = False, grow_lm: bool = False,
         grow_ln: bool = False, grow_pl: bool = False,
         factor: int = 2) -> ms.MapState:
    """Return a state with the selected capacities multiplied by
    ``factor``; existing slots keep their indices and contents."""
    K = state.kf_pose.shape[0]
    N = state.kf_xy.shape[1]
    L = state.lm_pos.shape[0]
    ML = state.kf_seg.shape[1]
    L2 = state.ln_pluck.shape[0]
    LD = state.ln_desc.shape[1]
    P = state.pl_coef.shape[0]
    new = ms.create(
        max_keyframes=K * factor if grow_kf else K,
        max_kps=N,
        max_landmarks=L * factor if grow_lm else L,
        max_lines_per_kf=ML,
        max_line_landmarks=L2 * factor if grow_ln else L2,
        line_desc_dim=LD,
        max_planes=P * factor if grow_pl else P,
    )
    out = {}
    for name in state._fields:
        old_arr = getattr(state, name)
        new_arr = getattr(new, name)
        if old_arr.shape == new_arr.shape:
            out[name] = old_arr
        else:
            idx = tuple(slice(0, s) for s in old_arr.shape)
            out[name] = new_arr.at[idx].set(old_arr)
    return ms.MapState(**out)
