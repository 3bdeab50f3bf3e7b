"""Local mapping: keyframe insertion, landmark creation, fuse, culling, BA.

TPU-native replacement for the reference mapping thread
(src/PLPSLAM/mapping_module.cc:87-285 and its helpers: store_new_keyframe,
create_new_landmarks with two_view_triangulator, update_new_keyframe/fuse,
local_map_cleaner, local BA dispatch). The reference's mapping runs on its
own thread with a keyframe queue; here each piece is a jitted function the
host orchestrator calls after keyframe insertion — async dispatch gives the
pipelining the thread used to.

Slot allocation: the host owns monotonically increasing counters; jitted
creators compact their valid outputs with a prefix sum and scatter into
``base_slot + cumsum`` positions, returning the number created.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.camera import CameraModel
from structure_plp_slam_tpu.camera import base as cam_base
from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.models import bundle_adjustment as ba
from structure_plp_slam_tpu.ops import lie, matching, triangulation
from structure_plp_slam_tpu.utils.types import HAMMING_MASKED


# ---------------------------------------------------------------------------
# Keyframe insertion + depth-seeded landmarks (stereo / RGB-D).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("camera",))
def insert_keyframe(
    camera,
    state: ms.MapState,
    slot,
    pose,
    timestamp,
    feats,
    kp_lm,
    base_lm_slot,
):
    """Insert a keyframe; for keypoints with measured depth and no landmark,
    instantiate landmarks directly (reference: keyframe_inserter.cc
    create_new_landmarks for stereo/RGB-D — nearest-depth seeding).

    Returns (state, num_created).
    """
    state = ms.add_keyframe(state, slot, pose, timestamp, feats, kp_lm)

    n_kp = feats["xy"].shape[0]
    L = state.lm_pos.shape[0]
    seedable = (feats["depth"] > 1e-6) & feats["valid"] & (kp_lm < 0)
    # Reference behavior (keyframe_inserter.cc:166-180): create from the
    # NEAREST depths — everything under the true-depth threshold, plus the
    # closest 100 even beyond it (far seeds stabilize rotation when close
    # structure is scarce).
    d_sort = jnp.where(seedable, feats["depth"], jnp.inf)
    rank = jnp.zeros((n_kp,), jnp.int32).at[jnp.argsort(d_sort)].set(
        jnp.arange(n_kp, dtype=jnp.int32)
    )
    depth_ok = seedable & (
        (feats["depth"] < camera.true_depth_threshold) | (rank < 100)
    )
    # Back-project: world = R^T (z * K^-1 uv~ - t).
    R, t = pose[:, :3], pose[:, 3]
    z = feats["depth"]
    x = (feats["xy"][:, 0] - camera.cx) / camera.fx * z
    y = (feats["xy"][:, 1] - camera.cy) / camera.fy * z
    pc = jnp.stack([x, y, z], axis=-1)
    pw = (pc - t) @ R

    n = feats["xy"].shape[0]
    order = jnp.cumsum(depth_ok.astype(jnp.int32)) - 1
    slots = base_lm_slot + order
    depth_ok = depth_ok & (slots < L)  # capacity gate (count stays honest)
    dist = jnp.linalg.norm(pc, axis=-1)
    level_scale = jnp.power(1.2, feats["level"].astype(jnp.float32))
    dist_max = dist * level_scale
    dist_min = dist_max / (1.2**7)
    view = pw - (-(t @ R))[None, :]
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)

    state = ms.add_landmarks(
        state,
        slots,
        pw,
        feats["desc"],
        view,
        dist_min,
        dist_max,
        jnp.full((n,), slot, jnp.int32),
        depth_ok,
    )
    new_lm = jnp.where(depth_ok, slots, kp_lm)
    state = state._replace(kf_lm_idx=state.kf_lm_idx.at[slot].set(new_lm))
    return state, jnp.sum(depth_ok.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Two-view triangulation with a neighbor keyframe (monocular mapping).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("camera", "scale_factor"))
def triangulate_pair(
    camera,
    state: ms.MapState,
    kf1,
    kf2,
    base_lm_slot,
    enable=True,
    *,
    scale_factor: float = 1.2,
):
    """Create landmarks by matching unassociated keypoints of kf1 and kf2
    along epipolar lines and triangulating (reference:
    mapping_module.cc:359-601 create_new_landmarks +
    match::robust::match_for_triangulation + two_view_triangulator).

    ``enable``: traced bool — a False value makes the call a no-op, which
    lets :func:`triangulate_with_neighbors` run a static-count neighbor
    loop fully on device (no host sync to decide neighbor eligibility).

    Returns (state, num_created).
    """
    N = state.kf_xy.shape[1]
    b1 = state.kf_bearing[kf1]
    b2 = state.kf_bearing[kf2]
    free1 = state.kf_kp_valid[kf1] & (state.kf_lm_idx[kf1] < 0)
    free2 = state.kf_kp_valid[kf2] & (state.kf_lm_idx[kf2] < 0)

    # Relative pose 1->2 and essential matrix for the epipolar gate.
    R1, t1 = state.kf_pose[kf1, :, :3], state.kf_pose[kf1, :, 3]
    R2, t2 = state.kf_pose[kf2, :, :3], state.kf_pose[kf2, :, 3]
    R_21 = R2 @ R1.T
    t_21 = t2 - R_21 @ t1
    E = lie.hat(t_21) @ R_21

    bits1 = matching.unpack_desc_bits(state.kf_desc[kf1])
    bits2 = matching.unpack_desc_bits(state.kf_desc[kf2])
    d = matching.distance_matrix_mxu(bits1, bits2, free1, free2)

    # Epipolar residual (angular): |b2 . E b1| with both-sided normalization.
    Eb1 = b1 @ E.T  # [N, 3]
    num = jnp.einsum("mi,ni->nm", b2, Eb1)  # [N1, N2]
    d1 = jnp.maximum(jnp.sum(Eb1 * Eb1, axis=-1), 1e-12)[:, None]
    Etb2 = b2 @ E
    d2 = jnp.maximum(jnp.sum(Etb2 * Etb2, axis=-1), 1e-12)[None, :]
    epi = num * num * (1.0 / d1 + 1.0 / d2)
    # Threshold ~ (1 px / focal)^2, scaled by keypoint level sigma
    # (focal_like = pixels-per-radian; cols/2pi for equirectangular).
    lvl_sig = jnp.power(scale_factor, state.kf_level[kf1].astype(jnp.float32)) ** 2
    thr = (2.0 / camera.focal_like) ** 2 * lvl_sig
    d = jnp.where(epi <= thr[:, None], d, HAMMING_MASKED)

    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    best_rev = jnp.argmin(d, axis=0)
    ok = (best_d <= 50) & (best_rev[best] == jnp.arange(N))

    # Triangulate world points.
    b2m = b2[best]
    pts_w = triangulation.triangulate_two_view(b1, b2m, R1, t1, R2, t2)
    pts_c1 = pts_w @ R1.T + t1
    pts_c2 = pts_w @ R2.T + t2
    depth_ok = cam_base.cheirality(camera, pts_c1) & cam_base.cheirality(
        camera, pts_c2
    )

    def reproj_ok(pc, kf, idx):
        uv, _ = cam_base.project(camera, pc)
        obs = state.kf_xy[kf]
        if idx is not None:
            obs = obs[idx]
        err = jnp.sum(cam_base.uv_residual(camera, uv, obs) ** 2, axis=-1)
        return err <= 5.991 * lvl_sig

    rp_ok = reproj_ok(pts_c1, kf1, None) & reproj_ok(pts_c2, kf2, best)
    par = jnp.sum((b1 @ R_21.T) * b2m, axis=-1)
    parallax_ok = par < 0.99995
    good = ok & depth_ok & rp_ok & parallax_ok & free1 & enable

    order = jnp.cumsum(good.astype(jnp.int32)) - 1
    slots = base_lm_slot + order
    L_cap = state.lm_pos.shape[0]
    good = good & (slots < L_cap)  # capacity gate
    dist = jnp.linalg.norm(pts_c1, axis=-1)
    level_scale = jnp.power(scale_factor, state.kf_level[kf1].astype(jnp.float32))
    dist_max = dist * level_scale
    dist_min = dist_max / (scale_factor**7)
    cam_center1 = -(t1 @ R1)
    view = pts_w - cam_center1[None, :]
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)

    state = ms.add_landmarks(
        state,
        slots,
        pts_w,
        state.kf_desc[kf1],
        view,
        dist_min,
        dist_max,
        jnp.full((N,), kf1, jnp.int32),
        good,
    )
    # Register observations in both keyframes.
    lm1 = jnp.where(good, slots, state.kf_lm_idx[kf1])
    state = state._replace(kf_lm_idx=state.kf_lm_idx.at[kf1].set(lm1))
    kf2_col = state.kf_lm_idx[kf2]
    kf2_new = kf2_col.at[jnp.where(good, best, N)].set(
        jnp.where(good, slots, -1), mode="drop"
    )
    state = state._replace(kf_lm_idx=state.kf_lm_idx.at[kf2].set(kf2_new))
    return state, jnp.sum(good.astype(jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("camera", "num_neighbors", "return_neighbors")
)
def triangulate_with_neighbors(
    camera, state: ms.MapState, slot, base_lm_slot, ind=None, *,
    num_neighbors: int = 2, return_neighbors: bool = False
):
    """Triangulate new landmarks with the top covisible neighbors of
    ``slot`` — neighbor SELECTION happens on device (covisibility top-k,
    weight >= 15 gate), so the whole creation chain dispatches with no
    host round-trip (the reference iterates top-10/20 covisibilities,
    mapping_module.cc:359-418).

    Returns (state, num_created_total).
    """
    W = ms.covisibility_matrix(state, ind)[slot]
    W = W.at[slot].set(0)
    W = jnp.where(state.kf_valid, W, 0)
    w_top, nbs = jax.lax.top_k(W, num_neighbors)
    next_lm = base_lm_slot
    for i in range(num_neighbors):
        state, n_new = triangulate_pair(
            camera, state, slot, nbs[i], next_lm, enable=w_top[i] >= 15
        )
        next_lm = next_lm + n_new
    if return_neighbors:
        # Rows whose kf_lm_idx this call may have rewritten (slot + the
        # chosen neighbors) — for incremental indicator maintenance.
        return state, next_lm - base_lm_slot, nbs
    return state, next_lm - base_lm_slot


@jax.jit
def map_scale(state: ms.MapState, kf):
    """Median camera-frame landmark distance of keyframe ``kf`` — the map
    scale estimate for plane/baseline thresholds (reference:
    estimate_map_scale, planar_mapping_module.cc:130-183). Falls back to
    1.0 with < 10 observations."""
    L = state.lm_pos.shape[0]
    lm = state.kf_lm_idx[kf]
    ok = (lm >= 0) & state.kf_kp_valid[kf]
    pose = state.kf_pose[kf]
    pts = state.lm_pos[jnp.clip(lm, 0, L - 1)]
    pc = pts @ pose[:, :3].T + pose[:, 3]
    d = jnp.linalg.norm(pc, axis=-1)
    cnt = jnp.sum(ok)
    d_sorted = jnp.sort(jnp.where(ok, d, jnp.inf))
    med = d_sorted[jnp.clip((cnt - 1) // 2, 0, d.shape[0] - 1)]
    return jnp.where(cnt >= 10, jnp.maximum(med, 1e-3), 1.0)


@jax.jit
def update_landmark_normals(state: ms.MapState, ind=None):
    """Refresh each landmark's mean viewing direction over its CURRENT
    observers (reference: landmark::update_normal_and_depth averages unit
    cam->point directions over all observations; landmark.h:105-110).

    TPU form: one indicator matmul. The average here weights each observer
    by 1 before normalizing the SUM of (X - C_k) — equivalent up to the
    per-ray 1/|X - C_k| weights, which only matters for extreme depth
    ratios between observers."""
    if ind is None:
        ind = ms.observation_indicator(state)  # [K, L]
    R = state.kf_pose[:, :, :3]
    t = state.kf_pose[:, :, 3]
    C = -jnp.einsum("kji,kj->ki", R, t)  # [K, 3] camera centers
    n_obs = jnp.sum(ind, axis=0)  # [L]
    sum_C = jnp.einsum("kl,ki->li", ind, C)  # [L, 3]
    dir_sum = n_obs[:, None] * state.lm_pos - sum_C
    norm = jnp.linalg.norm(dir_sum, axis=-1, keepdims=True)
    new_normal = dir_sum / jnp.maximum(norm, 1e-9)
    keep = (n_obs > 0) & state.lm_valid
    return state._replace(
        lm_normal=jnp.where(keep[:, None], new_normal, state.lm_normal)
    )


@functools.partial(
    jax.jit, static_argnames=("scale_factor", "num_levels", "max_obs")
)
def refresh_landmark_stats(state: ms.MapState, ind=None, *,
                           scale_factor: float = 1.2,
                           num_levels: int = 8, max_obs: int = 8,
                           window_kfs=None):
    """Refresh the per-landmark statistics that the reference maintains on
    every observation change (data/landmark.h:99-110):

    - mean viewing direction (``lm_normal``, landmark::update_normal_and_depth)
    - ORB scale-invariance distance bounds (``lm_dist_min/max``) — the
      reference derives them from the reference keyframe's observation;
      here they refresh from the MEAN over current observers'
      ``dist * scale_factor**level`` (smoother, batched);
    - the representative descriptor (``lm_desc``,
      landmark::compute_descriptor): the observation descriptor minimizing
      the median Hamming distance to the other observations.

    TPU form: one flat observation list from ``kf_lm_idx`` (K*N slots), a
    single sort keyed by (landmark, pyramid level) that compacts each
    landmark's finest ``max_obs`` observations into ``[L, max_obs]`` slots,
    then a ``[L, M, M]`` SWAR popcount for the median-Hamming pick — no
    per-landmark host loop.

    Normals and distance bounds ALWAYS aggregate over every observer
    (the reference's update_normal_and_depth walks the full observation
    map): they come from [K, L] indicator contractions — one weighted
    scatter + two matmuls — so restricting them to a window would save
    nothing and (as a round-4 advisor finding showed) corrupts bounds
    for landmarks whose observers straddle the window.

    ``window_kfs`` ([W] int32 keyframe ids, -1 = padding) restricts only
    the DESCRIPTOR refresh's observation list (the sort-dominated part:
    full-K argsort is ~256k keys at production capacities, ~30 ms of the
    chain dispatch; windowed ~32k). Because compute_descriptor must
    aggregate over all observations (landmark.h:99-110), the windowed
    pick only overwrites landmarks whose ENTIRE observer set lies inside
    the window; landmarks with out-of-window observers keep their stored
    representative descriptor until a full refresh sees them.
    """
    from structure_plp_slam_tpu.ops import hamming

    K, N = state.kf_lm_idx.shape
    L = state.lm_pos.shape[0]
    M = max_obs

    # ---- normals: one indicator matmul (as before) --------------------
    if ind is None:
        ind = ms.observation_indicator(state)  # [K, L]
    R = state.kf_pose[:, :, :3]
    t = state.kf_pose[:, :, 3]
    C = -jnp.einsum("kji,kj->ki", R, t)  # [K, 3] camera centers
    n_obs = jnp.sum(ind, axis=0)  # [L]
    sum_C = jnp.einsum("kl,ki->li", ind, C)
    dir_sum = n_obs[:, None] * state.lm_pos - sum_C
    norm = jnp.linalg.norm(dir_sum, axis=-1, keepdims=True)
    new_normal = dir_sum / jnp.maximum(norm, 1e-9)
    keep = (n_obs > 0) & state.lm_valid

    # ---- scale-invariance bounds: full aggregation, no sort ------------
    # mean over ALL observers of dist * scale**level, as two [K, L]
    # contractions: a scale-weighted observation indicator (one scatter,
    # same shape as observation_indicator) times the camera-center ->
    # landmark distance matrix (rank-3 matmul + elementwise sqrt).
    lvl_all = jnp.clip(state.kf_level, 0, num_levels - 1).astype(jnp.float32)
    obs_ok_all = (
        (state.kf_lm_idx >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
    )
    lm_safe_all = jnp.where(obs_ok_all, state.kf_lm_idx, L)
    w_up = jnp.where(obs_ok_all, jnp.float32(scale_factor) ** lvl_all, 0.0)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, state.kf_lm_idx.shape, 0)
    ind_up = (
        jnp.zeros((K, L + 1), jnp.float32)
        .at[rows_iota, lm_safe_all].add(w_up)[:, :L]
    )
    cross = jnp.einsum("ki,li->kl", C, state.lm_pos)  # [K, L]
    d2 = (
        jnp.sum(state.lm_pos ** 2, axis=-1)[None, :]
        - 2.0 * cross
        + jnp.sum(C ** 2, axis=-1)[:, None]
    )
    dist_kl = jnp.sqrt(jnp.maximum(d2, 0.0))
    sum_up = jnp.einsum("kl,kl->l", ind_up, dist_kl)  # [L]
    dist_max = sum_up / jnp.maximum(n_obs, 1.0)
    dist_min = dist_max / jnp.float32(scale_factor) ** (num_levels - 1)
    bound_keep = (n_obs > 0) & state.lm_valid

    # ---- flat observation list (descriptor refresh only) ---------------
    if window_kfs is None:
        lm_idx_w = state.kf_lm_idx
        row_ok = state.kf_valid
        kp_valid_w = state.kf_kp_valid
        level_w = state.kf_level
        desc_w = state.kf_desc
        kf_ids = jnp.arange(K, dtype=jnp.int32)
    else:
        kf_ids = jnp.clip(window_kfs.astype(jnp.int32), 0, K - 1)
        row_ok = (window_kfs >= 0) & state.kf_valid[kf_ids]
        lm_idx_w = state.kf_lm_idx[kf_ids]
        kp_valid_w = state.kf_kp_valid[kf_ids]
        level_w = state.kf_level[kf_ids]
        desc_w = state.kf_desc[kf_ids]
    W = lm_idx_w.shape[0]
    lm = lm_idx_w.reshape(-1)  # [W*N]
    obs_ok = ((lm_idx_w >= 0) & kp_valid_w & row_ok[:, None]).reshape(-1)
    lvl = jnp.clip(level_w.reshape(-1), 0, num_levels - 1)
    lm_safe = jnp.where(obs_ok, lm, L)

    # Sort by (landmark, level): finest-level observations first within
    # each landmark's segment; invalid slots (lm = L) sort last.
    # Everything downstream is GATHERS off this one sorted order —
    # the previous [L, M]-slot scatters serialized ~260k updates on TPU
    # and dominated the 35 ms cost of this function.
    key = lm_safe * jnp.int32(num_levels) + lvl
    order = jnp.argsort(key)
    lm_s = lm_safe[order]
    O = lm_s.shape[0]

    # Segment starts per landmark via binary search on the sorted ids.
    starts = jnp.searchsorted(lm_s, jnp.arange(L + 1, dtype=jnp.int32))
    counts_seg = starts[1:] - starts[:-1]                    # [L]

    # slot r of landmark l = sorted position starts[l] + r. Descriptors
    # come via TWO flat single-index gathers (reorder once, then row
    # gather) — a composite kf_desc[a, b] two-index gather lowers ~2x
    # slower on TPU.
    flat_desc = desc_w.reshape(-1, 8)[order]                 # [O, 8]
    pos = starts[:L, None] + jnp.arange(M, dtype=jnp.int32)[None]  # [L, M]
    slot_ok = jnp.arange(M, dtype=jnp.int32)[None] < counts_seg[:L, None]
    pos_safe = jnp.clip(pos, 0, O - 1)
    slot_desc = flat_desc[pos_safe]                          # [L, M, 8]
    slot_desc = jnp.where(slot_ok[:, :, None], slot_desc, 0)

    # ---- representative descriptor: median-Hamming argmin --------------
    x = jnp.bitwise_xor(slot_desc[:, :, None, :], slot_desc[:, None, :, :])
    d = jnp.sum(hamming.popcount_u32(x), axis=-1).astype(jnp.float32)
    pair_ok = slot_ok[:, :, None] & slot_ok[:, None, :]
    eye = jnp.eye(M, dtype=bool)[None]
    d = jnp.where(pair_ok & ~eye, d, 1e9)          # mask self + invalid
    d_sorted = jnp.sort(d, axis=-1)                # [L, M, M]
    cnt = jnp.sum(slot_ok, axis=-1)                # [L] valid obs count
    med_idx = jnp.clip((cnt - 2) // 2, 0, M - 1)   # median among cnt-1 dists
    med = jnp.take_along_axis(
        d_sorted, med_idx[:, None, None].astype(jnp.int32), axis=-1
    )[..., 0]                                      # [L, M]
    med = jnp.where(slot_ok, med, 1e12)
    best_row = jnp.argmin(med, axis=-1)            # [L]
    best_desc = jnp.take_along_axis(
        slot_desc, best_row[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]                                        # [L, 8]
    desc_keep = (cnt >= 2) & state.lm_valid
    if window_kfs is not None:
        # Window-only aggregation is only exact for landmarks whose full
        # observer set lies inside the window (see docstring).
        desc_keep = desc_keep & (
            counts_seg[:L].astype(jnp.float32) >= n_obs
        )
    new_desc = jnp.where(desc_keep[:, None], best_desc, state.lm_desc)

    return state._replace(
        lm_normal=jnp.where(keep[:, None], new_normal, state.lm_normal),
        lm_desc=new_desc,
        lm_dist_max=jnp.where(bound_keep, dist_max, state.lm_dist_max),
        lm_dist_min=jnp.where(bound_keep, dist_min, state.lm_dist_min),
    )


# ---------------------------------------------------------------------------
# Duplicate landmark fusion.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("camera",))
def fuse_into_keyframe(camera, state: ms.MapState, kf, lm_cand_mask,
                       ind=None):
    """Project candidate landmarks into keyframe ``kf``; where they match a
    keypoint that already references a different landmark, merge the pair
    (keep the more-observed landmark); where the keypoint is free, add the
    observation (reference: match::fuse fuse.cc:168 +
    mapping_module.cc:603-801 update_new_keyframe).

    Returns (state, num_fused).
    """
    L = state.lm_pos.shape[0]
    N = state.kf_xy.shape[1]
    R, t = state.kf_pose[kf, :, :3], state.kf_pose[kf, :, 3]
    uv, pc = _project(camera, R, t, state.lm_pos)
    vis = (
        lm_cand_mask
        & state.lm_valid
        & cam_base.cheirality(camera, pc)
        & cam_base.in_image(camera, uv)
    )
    # Exclude landmarks already observed in kf.
    obs_here = jnp.zeros((L,), bool).at[
        jnp.clip(state.kf_lm_idx[kf], 0, L - 1)
    ].set(state.kf_lm_idx[kf] >= 0)
    vis = vis & ~obs_here

    lm_bits = matching.unpack_desc_bits(state.lm_desc)
    kp_bits = matching.unpack_desc_bits(state.kf_desc[kf])
    from structure_plp_slam_tpu.ops import pallas_matching as pm

    use_pallas = (
        jax.default_backend() == "tpu"
        and L % pm.TILE_L == 0
        and camera.model is not CameraModel.EQUIRECTANGULAR
    )
    if use_pallas:
        # Fused window+top-2 kernel instead of materializing the [L, N]
        # distance matrix (134 MB at production shapes — fuse was ~20 ms,
        # the tracker's path already uses this kernel). The fuse gate has
        # no level window (level_window=8 of 8 levels): both meta levels
        # are zeroed so the kernel's level term always passes.
        N_kp = state.kf_xy.shape[1]
        Np = ((N_kp + pm.TILE_N - 1) // pm.TILE_N) * pm.TILE_N
        kp_lvl0 = jnp.where(state.kf_kp_valid[kf], 0.0, 1e9)
        kp_meta = pm.pack_meta_kp(state.kf_xy[kf], kp_lvl0)
        kp_bits_p = kp_bits
        if Np != N_kp:
            kp_meta = jnp.pad(kp_meta, ((0, Np - N_kp), (0, 0)))
            kp_meta = kp_meta.at[N_kp:, 2].set(1e9)
            kp_bits_p = jnp.pad(kp_bits, ((0, Np - N_kp), (0, 0)))
        lm_meta = pm.pack_meta_lm(
            uv, jnp.where(vis, 3.0, -1.0), jnp.zeros((L,), jnp.float32)
        )
        bd, _sd, kb = pm.fused_match(lm_bits, lm_meta, kp_bits_p, kp_meta)
        okf = bd <= 50
        kp_best = jnp.where(okf & (kb < N_kp), kb, -1)
        d_best = bd.astype(jnp.int32)
    else:
        kp_best, d_best = matching.match_by_projection(
            uv,
            jnp.zeros((L,), jnp.int32),
            lm_bits,
            vis,
            state.kf_xy[kf],
            state.kf_level[kf],
            kp_bits,
            state.kf_kp_valid[kf],
            radius_by_level=jnp.full((8,), 3.0, jnp.float32),
            max_hamming=50,
            level_window=8,
            wrap_cols=(
                float(camera.cols)
                if camera.model is CameraModel.EQUIRECTANGULAR
                else None
            ),
        )
    matched = kp_best >= 0
    safe_kp = jnp.where(matched, kp_best, N)
    existing = jnp.concatenate([state.kf_lm_idx[kf], jnp.array([-1])])[safe_kp]

    counts = ms.landmark_observation_counts(state, ind)
    lm_ids = jnp.arange(L, dtype=jnp.int32)
    # Case A: keypoint free -> register observation.
    free_kp = matched & (existing < 0)
    col = state.kf_lm_idx[kf]
    col = col.at[jnp.where(free_kp, safe_kp, N)].set(
        jnp.where(free_kp, lm_ids, -1), mode="drop"
    )
    state = state._replace(kf_lm_idx=state.kf_lm_idx.at[kf].set(col))

    # Case B: keypoint already has another landmark -> merge: the landmark
    # with fewer observations is replaced by the other everywhere.
    dup = matched & (existing >= 0) & (existing != lm_ids)
    keep_other = counts[jnp.clip(existing, 0, L - 1)] >= counts
    src = jnp.where(dup, jnp.where(keep_other, lm_ids, existing), -1)  # dies
    dst = jnp.where(dup, jnp.where(keep_other, existing, lm_ids), -1)  # lives
    # Build a replacement table old->new (identity elsewhere).
    table = jnp.arange(L + 1, dtype=jnp.int32)
    table = table.at[jnp.where(dup, src, L)].set(
        jnp.where(dup, dst, -1), mode="drop"
    )
    remap = table[jnp.clip(state.kf_lm_idx, 0, L)]
    new_idx = jnp.where(state.kf_lm_idx >= 0, remap, state.kf_lm_idx)
    dead = jnp.zeros((L,), bool).at[jnp.where(dup, src, L)].set(dup, mode="drop")
    state = state._replace(
        kf_lm_idx=new_idx, lm_valid=state.lm_valid & ~dead
    )
    return state, jnp.sum(free_kp) + jnp.sum(dup)


def _project(camera, R, t, pts):
    pc = pts @ R.T + t
    uv, _ = cam_base.project(camera, pc)
    return uv, pc


# ---------------------------------------------------------------------------
# Culling (local_map_cleaner semantics as mask updates).
# ---------------------------------------------------------------------------


@jax.jit
def cull_landmarks(state: ms.MapState, current_kf, recent_window: int = 2,
                   ind=None):
    """Remove unreliable recent landmarks: observed-ratio < 0.3, or created
    >= ``recent_window`` keyframes ago but observed by <= 2 keyframes
    (reference: local_map_cleaner.cc:51; plane-owned landmarks exempt :83).
    """
    counts = ms.landmark_observation_counts(state, ind)
    ratio = state.lm_n_fnd.astype(jnp.float32) / jnp.maximum(
        state.lm_n_vis.astype(jnp.float32), 1.0
    )
    age = current_kf - state.lm_ref_kf
    bad = state.lm_valid & (
        (ratio < 0.3) | ((age >= recent_window) & (counts <= 2))
    )
    bad = bad & (state.lm_plane < 0)
    return ms.remove_landmarks(state, bad), jnp.sum(bad)


@jax.jit
def cull_keyframes(state: ms.MapState, protect_kf, ind=None):
    """Remove redundant keyframes: >= 90% of their landmarks are observed
    by >= 3 other keyframes (reference: local_map_cleaner.cc:201; the scale
    condition is dropped — masked matching replaces the scale-bucketed
    redundancy test)."""
    counts = ms.landmark_observation_counts(state, ind)
    lm = state.kf_lm_idx
    has = (lm >= 0) & state.kf_kp_valid
    c = counts[jnp.clip(lm, 0, None)]
    redundant_obs = has & (c >= 4)  # >= 3 others + itself
    n_obs = jnp.sum(has, axis=1)
    n_red = jnp.sum(redundant_obs, axis=1)
    frac = n_red.astype(jnp.float32) / jnp.maximum(n_obs.astype(jnp.float32), 1.0)
    bad = state.kf_valid & (frac >= 0.9) & (n_obs > 0)
    bad = bad.at[0].set(False)  # origin keyframe is permanent
    bad = bad.at[protect_kf].set(False)
    return ms.remove_keyframes(state, bad), jnp.sum(bad)


# ---------------------------------------------------------------------------
# Local BA window extraction + solve + write-back.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("camera", "max_opt", "max_fix", "max_lms",
                     "with_lines", "max_lines", "return_cams"),
)
def local_ba(
    camera,
    state: ms.MapState,
    current_kf,
    inv_sigma_sq_table,
    *,
    max_opt: int = 16,
    max_fix: int = 16,
    max_lms: int = 4096,
    with_lines: bool = False,
    max_lines: int = 128,
    ind=None,
    return_cams: bool = False,
):
    """Local bundle adjustment around ``current_kf``.

    Window selection mirrors local_bundle_adjuster.cc:73-135: optimized
    cameras = covisibles of current (top ``max_opt`` by weight), landmarks =
    those they observe (first ``max_lms``), fixed cameras = other observers
    (first ``max_fix``). Returns (state, chi2).
    """
    K = state.kf_pose.shape[0]
    L = state.lm_pos.shape[0]
    N = state.kf_xy.shape[1]
    # Clamp window sizes to the (possibly small, pre-growth) capacities.
    max_opt = min(max_opt, K)
    max_fix = min(max_fix, K)
    max_lms = min(max_lms, L)

    if ind is None:
        ind = ms.observation_indicator(state)  # [K, L]
    W_cur = ind @ ind[current_kf]
    W_cur = jnp.where(state.kf_valid, W_cur, -1.0)
    W_cur = W_cur.at[current_kf].set(1e9)  # current always first
    _, opt_kfs = jax.lax.top_k(W_cur, max_opt)  # [max_opt]
    opt_ok = W_cur[opt_kfs] >= 15.0
    opt_ok = opt_ok.at[0].set(True)

    opt_mask = jnp.zeros((K,), bool).at[opt_kfs].set(opt_ok)
    lm_mask = ms.local_landmark_mask(state, opt_mask, ind)
    lm_idx = jnp.nonzero(lm_mask, size=max_lms, fill_value=-1)[0]
    lm_ok = lm_idx >= 0
    lm_safe = jnp.clip(lm_idx, 0, L - 1)

    # Fixed keyframes: observe local landmarks but are not optimized.
    sees_local = (ind @ lm_mask.astype(jnp.float32)) > 0
    fix_cand = sees_local & state.kf_valid & ~opt_mask
    fix_idx = jnp.nonzero(fix_cand, size=max_fix, fill_value=-1)[0]
    fix_ok = fix_idx >= 0

    cams = jnp.concatenate([opt_kfs, jnp.clip(fix_idx, 0, K - 1)])  # [C]
    cam_ok = jnp.concatenate([opt_ok, fix_ok])
    cam_fixed = jnp.concatenate(
        [jnp.zeros((max_opt,), bool), jnp.ones((max_fix,), bool)]
    )
    # Keep the map's gauge: fix the oldest keyframe in the window if it is
    # keyframe 0; otherwise fixed borders anchor it.
    cam_fixed = cam_fixed | (cams == 0)

    # Global -> local landmark lookup.
    g2l = jnp.full((L + 1,), -1, jnp.int32)
    g2l = g2l.at[jnp.where(lm_ok, lm_safe, L)].set(
        jnp.where(lm_ok, jnp.arange(max_lms, dtype=jnp.int32), -1), mode="drop"
    )

    C = max_opt + max_fix
    obs_lm_g = state.kf_lm_idx[cams]  # [C, N]
    obs_lm_l = g2l[jnp.clip(obs_lm_g, 0, L)]
    obs_valid = (
        (obs_lm_g >= 0)
        & (obs_lm_l >= 0)
        & state.kf_kp_valid[cams]
        & cam_ok[:, None]
    )
    # Compact each camera row to ``obs_cap`` observation slots: only the
    # valid landmark-observing keypoints participate (a minority of the
    # padded rows), and every per-iteration tensor inside ba_solve scales
    # with O = C * obs_cap — the compaction buys ~40% of the solve. A
    # stable argsort keeps pyramid-level order (finest first) so any
    # overflow drops the coarsest observations.
    obs_cap = min(640, N)
    ord_ = jnp.argsort(~obs_valid, axis=1, stable=True)[:, :obs_cap]  # [C, cap]
    take = jnp.take_along_axis
    obs_valid_c = take(obs_valid, ord_, 1)
    obs_lm_l_c = take(obs_lm_l, ord_, 1)
    obs_lm_g_c = take(obs_lm_g, ord_, 1)
    obs_uv_c = take(state.kf_xy[cams], ord_[:, :, None], 1)
    obs_xr_c = take(state.kf_xr[cams], ord_, 1)
    lvl_c = take(state.kf_level[cams], ord_, 1)
    obs_cam = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[:, None], (C, obs_cap)
    )
    info = inv_sigma_sq_table[
        jnp.clip(lvl_c, 0, inv_sigma_sq_table.shape[0] - 1)
    ]

    prob = ba.BAProblem(
        cam_pose=state.kf_pose[cams],
        cam_fixed=cam_fixed,
        cam_valid=cam_ok,
        lm_pos=state.lm_pos[lm_safe],
        lm_valid=lm_ok,
        obs_cam=obs_cam.reshape(-1),
        obs_lm=jnp.clip(obs_lm_l_c, 0, max_lms - 1).reshape(-1),
        obs_uv=obs_uv_c.reshape(-1, 2),
        obs_xr=obs_xr_c.reshape(-1),
        obs_inv_sigma_sq=info.reshape(-1),
        obs_valid=obs_valid_c.reshape(-1),
    )
    # Joint point+line terms (reference puts line reprojection edges in
    # the same graph, local_bundle_adjuster_extended_line.cc:69-; the
    # corridor experiment measures ~9x pose-RMSE win over alternation in
    # line-rich/point-poor scenes — tests/test_line_ba_joint_experiment).
    lw = None
    if with_lines:
        from structure_plp_slam_tpu.ops import line_geometry as lg

        L2 = state.ln_pluck.shape[0]
        MLs = state.kf_line_idx.shape[1]
        ln_g = state.kf_line_idx[cams]                    # [C, MLs]
        ln_obs_ok = (
            (ln_g >= 0) & state.kf_seg_valid[cams] & cam_ok[:, None]
        )
        lmask = jnp.zeros((L2 + 1,), bool).at[
            jnp.where(ln_obs_ok, ln_g, L2)
        ].set(True, mode="drop")[:L2] & state.ln_valid
        l_idx = jnp.nonzero(lmask, size=max_lines, fill_value=-1)[0]
        l_ok = l_idx >= 0
        l_safe = jnp.clip(l_idx, 0, L2 - 1)
        g2l_ln = jnp.full((L2 + 1,), -1, jnp.int32).at[
            jnp.where(l_ok, l_safe, L2)
        ].set(jnp.where(l_ok, jnp.arange(max_lines, dtype=jnp.int32), -1),
              mode="drop")
        lobs_line = g2l_ln[jnp.clip(ln_g, 0, L2)]         # [C, MLs]
        lobs_ok = ln_obs_ok & (lobs_line >= 0)
        lobs_line_c = jnp.clip(lobs_line, 0, max_lines - 1).reshape(-1)
        lobs_cam = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[:, None], (C, MLs)
        ).reshape(-1)
        counts_ln = jnp.zeros((max_lines,), jnp.int32).at[
            jnp.where(lobs_ok.reshape(-1), lobs_line_c, max_lines)
        ].add(1, mode="drop")
        U0, w0 = lg.plucker_to_orthonormal(state.ln_pluck[l_safe])
        lw = ba.LineWindow(
            ln_U=U0,
            ln_w=w0,
            ln_valid=l_ok & (counts_ln >= 2),
            lobs_cam=lobs_cam,
            lobs_line=lobs_line_c,
            lobs_seg=state.kf_seg[cams].reshape(-1, 4),
            # Line detection is single-scale here (full-resolution LSD;
            # ops/lines.py), so every segment carries octave-0 information
            # — the reference's per-octave sigma weighting
            # (local_bundle_adjuster_extended_line) degenerates to the
            # level-0 entry of the same table the point terms use.
            lobs_inv_sigma_sq=jnp.full(
                (C * MLs,), inv_sigma_sq_table[0], jnp.float32
            ),
            lobs_valid=lobs_ok.reshape(-1),
        )
    # 8 damped-GN iterations with the outlier cull after 4 (reference:
    # local_bundle_adjuster.cc runs 5 + cull + 10 with exact g2o solves;
    # the damped Schur solve here converges in fewer — the window ATE
    # gates hold at 8, and each iteration is ~3 ms of the keyframe
    # chain's budget).
    result = ba.ba_solve(camera, prob, lw, obs_grid=True, num_iters=8,
                         cull_at_iters=(4,))

    # Write back optimized poses (opt cameras only) and landmark positions.
    write_cam = (~cam_fixed) & cam_ok
    new_pose = state.kf_pose.at[jnp.where(write_cam, cams, K)].set(
        jnp.where(write_cam[:, None, None], result.cam_pose, 0.0), mode="drop"
    )
    new_lm = state.lm_pos.at[jnp.where(lm_ok, lm_safe, L)].set(
        jnp.where(lm_ok[:, None], result.lm_pos, 0.0), mode="drop"
    )
    # Detach outlier observations found by BA (scatter back through the
    # compaction order; untouched slots keep their original values).
    inl = result.obs_inlier.reshape(C, obs_cap)
    bad_obs = obs_valid_c & ~inl
    kf_lm = state.kf_lm_idx.at[
        jnp.clip(cams, 0, K - 1)[:, None], ord_
    ].set(jnp.where(bad_obs, -1, obs_lm_g_c))
    old_pose = state.kf_pose
    state = state._replace(kf_pose=new_pose, lm_pos=new_lm, kf_lm_idx=kf_lm)

    if with_lines:
        # Write back the jointly-optimized window lines: Plücker with the
        # framework's |d| = 1 convention, endpoints projected onto the
        # moved line (line_ba.refine_lines write-back semantics).
        from structure_plp_slam_tpu.ops import line_geometry as lg

        pluck = lg.orthonormal_to_plucker(result.ln_U, result.ln_w)
        d_norm = jnp.maximum(
            jnp.linalg.norm(pluck[:, 3:], axis=-1, keepdims=True), 1e-12
        )
        pluck = pluck / d_norm
        eps_old = state.ln_endpoints[l_safe]
        e1 = lg.closest_point_on_line(pluck, eps_old[:, :3])
        e2 = lg.closest_point_on_line(pluck, eps_old[:, 3:])
        eps = jnp.concatenate([e1, e2], axis=-1)
        # Geometric trust gate (see line_ba.refine_lines): reject updates
        # that fly further than about one segment length.
        span = jnp.linalg.norm(eps_old[:, 3:] - eps_old[:, :3], axis=-1)
        move = jnp.maximum(
            jnp.linalg.norm(e1 - eps_old[:, :3], axis=-1),
            jnp.linalg.norm(e2 - eps_old[:, 3:], axis=-1),
        )
        upd = (
            lw.ln_valid
            & jnp.all(jnp.isfinite(pluck), axis=-1)
            & (move <= span + 0.2)
        )
        tgt = jnp.where(upd, l_safe, L2)
        state = state._replace(
            ln_pluck=state.ln_pluck.at[tgt].set(
                jnp.where(upd[:, None], pluck, 0.0), mode="drop"
            ),
            ln_endpoints=state.ln_endpoints.at[tgt].set(
                jnp.where(upd[:, None], eps, 0.0), mode="drop"
            ),
        )
        # Jointly-optimized lines must NOT also ride the keyframe pose
        # delta below (they are BA variables now, like the points).
        ln_updated = jnp.zeros((L2 + 1,), bool).at[tgt].set(
            upd, mode="drop"
        )[:L2]
    else:
        ln_updated = jnp.zeros_like(state.ln_valid)

    # Lines and planes ride their reference keyframe's pose delta so the
    # structural map stays consistent with the optimized poses (points
    # are BA variables; with_lines, window lines are BA variables too —
    # reference: local_bundle_adjuster_extended_line.cc — so only
    # OUT-OF-WINDOW lines ride).
    from structure_plp_slam_tpu.models import pose_graph as pg

    ones = jnp.ones((K,), jnp.float32)
    state = pg.correct_map_structures(
        state,
        old_pose[:, :, :3], old_pose[:, :, 3], ones,
        new_pose[:, :, :3], new_pose[:, :, 3], ones,
        lm_mask=jnp.zeros_like(state.lm_valid),
        ln_mask=state.ln_valid & ~ln_updated,
    )
    if return_cams:
        # The window cameras whose kf_lm_idx rows the outlier detach may
        # have rewritten — for incremental indicator maintenance. Mask
        # out below-gate / empty slots with -1 (padding) instead of the
        # internal clipped form: clip turned empty fixed slots into
        # keyframe 0 and kept below-weight-gate covisibles, so consumers
        # (windowed stats refresh) saw duplicate / spurious rows
        # (round-4 advisor, medium).
        cams_out = jnp.concatenate([
            jnp.where(opt_ok, opt_kfs, -1),
            jnp.where(fix_ok, fix_idx, -1),
        ])
        return state, result.chi2, cams_out
    return state, result.chi2
