"""Line landmark pipeline: frame matching, triangulation, registration.

TPU-native replacement for the reference's line tracking/mapping
(src/PLPSLAM/tracking_module line paths, mapping_module line triangulation
thread, module/two_view_triangulator_line.cc, match::projection line
variants, data/landmark_line.{h,cc}). Batched over segment slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.ops import line_geometry as lg
from structure_plp_slam_tpu.ops import lines as line_ops


@functools.partial(jax.jit, static_argnames=("camera",))
def match_lines_to_frame(camera, state: ms.MapState, seg, seg_desc, seg_valid,
                         R, t, *, max_desc_dist: float = 0.4,
                         max_px_dist: float = 12.0):
    """Associate detected segments with 3D map lines under pose (R, t).

    Gates (reference: match::projection line matching): segment midpoint
    distance to the projected infinite line, direction agreement, and
    descriptor distance. Returns ``seg_line_idx [ML] i32``.
    """
    L2 = state.ln_pluck.shape[0]
    ML = seg.shape[0]
    pl_c = lg.transform_line(state.ln_pluck, R, t)  # [L2, 6]
    l_img = lg.project_line(camera, pl_c)  # [L2, 3]
    # Visibility proxy: projected endpoints in front of the camera.
    ep_w = state.ln_endpoints
    e1c = ep_w[:, :3] @ R.T + t
    e2c = ep_w[:, 3:] @ R.T + t
    vis = state.ln_valid & (e1c[:, 2] > 0.05) & (e2c[:, 2] > 0.05)

    mid = jnp.stack(
        [(seg[:, 0] + seg[:, 2]) * 0.5, (seg[:, 1] + seg[:, 3]) * 0.5], axis=1
    )
    n = jnp.sqrt(jnp.maximum(l_img[:, 0] ** 2 + l_img[:, 1] ** 2, 1e-12))
    # [L2, ML] midpoint-to-line distances.
    d_mid = jnp.abs(
        l_img[:, 0:1] * mid[None, :, 0]
        + l_img[:, 1:2] * mid[None, :, 1]
        + l_img[:, 2:3]
    ) / n[:, None]
    # Direction agreement between the segment and the projected line.
    seg_dir = jnp.stack([seg[:, 2] - seg[:, 0], seg[:, 3] - seg[:, 1]], axis=1)
    seg_dir = seg_dir / jnp.maximum(
        jnp.linalg.norm(seg_dir, axis=1, keepdims=True), 1e-9
    )
    line_dir = jnp.stack([l_img[:, 1], -l_img[:, 0]], axis=1)
    line_dir = line_dir / jnp.maximum(
        jnp.linalg.norm(line_dir, axis=1, keepdims=True), 1e-9
    )
    cosang = jnp.abs(line_dir @ seg_dir.T)  # [L2, ML]

    desc_d = line_ops.line_descriptor_distance_matrix(
        state.ln_desc, seg_desc, vis, seg_valid
    )
    cost = jnp.where(
        (d_mid <= max_px_dist) & (cosang >= 0.985) & (desc_d <= max_desc_dist),
        desc_d + d_mid * 0.01,
        1e9,
    )
    best_line = jnp.argmin(cost, axis=0)  # per segment
    best_cost = jnp.min(cost, axis=0)
    ok = (best_cost < 1e8) & seg_valid
    return jnp.where(ok, best_line, -1)


@functools.partial(jax.jit, static_argnames=("camera",))
def update_line_stats(camera, state: ms.MapState, seg_line_idx, R, t):
    """Per-frame observed/observable bookkeeping for lines (the line analog
    of landmark::increase_num_observable/observed; feeds culling)."""
    L2 = state.ln_pluck.shape[0]
    e1c = state.ln_endpoints[:, :3] @ R.T + t
    e2c = state.ln_endpoints[:, 3:] @ R.T + t
    mid = 0.5 * (e1c + e2c)
    z = jnp.maximum(mid[:, 2], 1e-6)
    u = camera.fx * mid[:, 0] / z + camera.cx
    v = camera.fy * mid[:, 1] / z + camera.cy
    vis = (
        state.ln_valid
        & (e1c[:, 2] > 0.05)
        & (e2c[:, 2] > 0.05)
        & (u >= 0) & (u < camera.cols) & (v >= 0) & (v < camera.rows)
    )
    fnd = jnp.zeros((L2,), bool).at[
        jnp.clip(seg_line_idx, 0, L2 - 1)
    ].set(seg_line_idx >= 0)
    return state._replace(
        ln_n_vis=state.ln_n_vis + vis.astype(jnp.int32),
        ln_n_fnd=state.ln_n_fnd + (fnd & state.ln_valid).astype(jnp.int32),
    )


@jax.jit
def cull_lines(state: ms.MapState, current_kf):
    """Remove unreliable lines: observed-ratio < 0.3 once seen enough, or
    old enough but registered in <= 1 keyframe (reference:
    local_map_cleaner::remove_redundant_landmarks_line,
    local_map_cleaner.cc:133). Two-view line creation is deliberately
    permissive (plane intersection cannot disambiguate clipped parallel
    segments from a pair alone); re-observation is the real filter.
    """
    L2 = state.ln_pluck.shape[0]
    counts = (
        jnp.zeros((L2 + 1,), jnp.int32)
        .at[jnp.where(state.kf_line_idx >= 0, state.kf_line_idx, L2)]
        .add(1)[:L2]
    )
    ratio = state.ln_n_fnd.astype(jnp.float32) / jnp.maximum(
        state.ln_n_vis.astype(jnp.float32), 1.0
    )
    age = current_kf - state.ln_ref_kf
    bad = state.ln_valid & (
        ((state.ln_n_vis >= 4) & (ratio < 0.3))
        | ((age >= 3) & (counts <= 1))
    )
    kf_line_idx = jnp.where(
        bad[jnp.clip(state.kf_line_idx, 0, L2 - 1)] & (state.kf_line_idx >= 0),
        -1,
        state.kf_line_idx,
    )
    return state._replace(
        ln_valid=state.ln_valid & ~bad, kf_line_idx=kf_line_idx
    ), jnp.sum(bad)


def line_pose_residuals(camera, R, t, pluck_w, seg):
    """Endpoint-to-projected-line residuals ``[M, 2]`` for pose (R, t)."""
    pl_c = lg.transform_line(pluck_w, R, t)
    l = lg.project_line(camera, pl_c)
    return lg.endpoint_line_distances(
        l, seg[..., 0:2], seg[..., 2:4]
    )


@functools.partial(jax.jit, static_argnames=("camera",))
def lines_from_depth(camera, state: ms.MapState, kf, base_slot):
    """Instantiate 3D lines directly from a keyframe's endpoint depths
    (RGB-D/stereo path — the depth-seeded analog of keyframe_inserter's
    landmark creation; mirrors the reference's depth-based line seeding).

    Segment endpoint depths come from the depth map sampled just inside
    the segment (frontend). Returns (state, num_created).
    """
    ML = state.kf_seg.shape[1]
    L2 = state.ln_pluck.shape[0]
    seg = state.kf_seg[kf]
    d = state.kf_seg_depth[kf]
    free = state.kf_seg_valid[kf] & (state.kf_line_idx[kf] < 0)
    ok_d = (d[:, 0] > 0.05) & (d[:, 1] > 0.05) & (
        d[:, 1] < camera.true_depth_threshold + 1e9  # no hard cap for lines
    )

    def backproj(x, y, z):
        return jnp.stack(
            [
                (x - camera.cx) / camera.fx * z,
                (y - camera.cy) / camera.fy * z,
                z,
            ],
            axis=-1,
        )

    # The sampled depths correspond to points at 10% / 90% along the
    # segment; extrapolate the 3D segment back to the full extent.
    x1i = seg[:, 0] + 0.1 * (seg[:, 2] - seg[:, 0])
    y1i = seg[:, 1] + 0.1 * (seg[:, 3] - seg[:, 1])
    x2i = seg[:, 0] + 0.9 * (seg[:, 2] - seg[:, 0])
    y2i = seg[:, 1] + 0.9 * (seg[:, 3] - seg[:, 1])
    p1c = backproj(x1i, y1i, d[:, 0])
    p2c = backproj(x2i, y2i, d[:, 1])
    # Sanity: the 3D chord must project close to the segment direction
    # (depth discontinuity across the line -> reject).
    R, t = state.kf_pose[kf, :, :3], state.kf_pose[kf, :, 3]
    p1w = (p1c - t) @ R
    p2w = (p2c - t) @ R
    length = jnp.linalg.norm(p2c - p1c, axis=-1)
    good = free & ok_d & (length > 0.05)

    pl_w = lg.plucker_from_endpoints(p1w, p2w)
    order = jnp.cumsum(good.astype(jnp.int32)) - 1
    slots = base_slot + order
    good = good & (slots < L2)  # capacity gate
    safe = jnp.where(good, slots, L2)
    state = state._replace(
        ln_pluck=state.ln_pluck.at[safe].set(pl_w, mode="drop"),
        ln_endpoints=state.ln_endpoints.at[safe].set(
            jnp.concatenate([p1w, p2w], axis=-1), mode="drop"
        ),
        ln_desc=state.ln_desc.at[safe].set(state.kf_seg_desc[kf], mode="drop"),
        ln_valid=state.ln_valid.at[safe].set(good, mode="drop"),
        ln_ref_kf=state.ln_ref_kf.at[safe].set(kf, mode="drop"),
    )
    li = jnp.where(good, slots, state.kf_line_idx[kf])
    state = state._replace(kf_line_idx=state.kf_line_idx.at[kf].set(li))
    return state, jnp.sum(good.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("camera",))
def refresh_lines(camera, state: ms.MapState):
    """Re-derive line landmarks from their reference keyframe's stored
    segment + endpoint depths under the CURRENT keyframe poses.

    This is the working stand-in for the reference's line vertices inside
    extended BA (local_bundle_adjuster_extended_line.cc): after bundle
    adjustment or loop correction moves keyframes, each line is rebuilt
    from its anchored observation so the line map stays consistent with
    the optimized poses (including the reference's post-BA endpoint
    re-trimming, loop_bundle_adjuster.h:87).
    """
    K, ML = state.kf_line_idx.shape
    L2 = state.ln_pluck.shape[0]

    seg = state.kf_seg            # [K, ML, 4]
    d = state.kf_seg_depth        # [K, ML, 2]
    li = state.kf_line_idx        # [K, ML]
    R = state.kf_pose[:, :, :3]
    t = state.kf_pose[:, :, 3]

    def backproj(x, y, z):
        return jnp.stack(
            [(x - camera.cx) / camera.fx * z,
             (y - camera.cy) / camera.fy * z, z], axis=-1)

    x1 = seg[..., 0] + 0.1 * (seg[..., 2] - seg[..., 0])
    y1 = seg[..., 1] + 0.1 * (seg[..., 3] - seg[..., 1])
    x2 = seg[..., 0] + 0.9 * (seg[..., 2] - seg[..., 0])
    y2 = seg[..., 1] + 0.9 * (seg[..., 3] - seg[..., 1])
    p1c = backproj(x1, y1, d[..., 0])      # [K, ML, 3]
    p2c = backproj(x2, y2, d[..., 1])
    # world = R^T (p_cam - t), batched over keyframes and segments.
    p1w = jnp.einsum("kij,kmi->kmj", R, p1c - t[:, None, :])
    p2w = jnp.einsum("kij,kmi->kmj", R, p2c - t[:, None, :])

    # Scatter: only the observation in the line's OWN reference keyframe
    # refreshes it, and only when that observation has depth.
    kf_ids = jax.lax.broadcasted_iota(jnp.int32, (K, ML), 0)
    is_ref = (
        (li >= 0)
        & (state.ln_ref_kf[jnp.clip(li, 0, L2 - 1)] == kf_ids)
        & (d[..., 0] > 0.05)
        & (d[..., 1] > 0.05)
        & state.kf_seg_valid
        & state.kf_valid[:, None]
    )
    tgt = jnp.where(is_ref, li, L2).reshape(-1)
    p1f = p1w.reshape(-1, 3)
    p2f = p2w.reshape(-1, 3)
    pl = lg.plucker_from_endpoints(p1f, p2f)
    eps = jnp.concatenate([p1f, p2f], axis=-1)
    state = state._replace(
        ln_pluck=state.ln_pluck.at[tgt].set(pl, mode="drop"),
        ln_endpoints=state.ln_endpoints.at[tgt].set(eps, mode="drop"),
    )
    return state


@functools.partial(jax.jit, static_argnames=("camera",))
def lines_from_points(camera, state: ms.MapState, kf, base_slot):
    """Instantiate 3D lines by anchoring segments to co-located POINT
    landmarks (monocular path).

    For each unassociated segment, landmarks projecting onto it carry
    BA-refined depth; inverse depth is linear along the image segment for
    a 3D line, so a weighted 1/z(t) line fit over those landmarks gives
    the segment's endpoint depths directly. This replaces the reference's
    noise-sensitive two-view plane intersection as the PRIMARY mono line
    source (two_view_triangulator_line.cc stays as the fallback for
    segments without point support) — the structural point<->line coupling
    mirrors how the reference's planes regularize points, in reverse.

    Returns (state, num_created).
    """
    ML = state.kf_seg.shape[1]
    N = state.kf_xy.shape[1]
    Lp = state.lm_pos.shape[0]
    L2 = state.ln_pluck.shape[0]
    seg = state.kf_seg[kf]
    free = state.kf_seg_valid[kf] & (state.kf_line_idx[kf] < 0)

    R, t = state.kf_pose[kf, :, :3], state.kf_pose[kf, :, 3]
    lm_idx = state.kf_lm_idx[kf]
    has_lm = (lm_idx >= 0) & state.kf_kp_valid[kf]
    pc = state.lm_pos[jnp.clip(lm_idx, 0, Lp - 1)] @ R.T + t
    z_lm = pc[:, 2]
    xy = state.kf_xy[kf]

    a = seg[:, 1] - seg[:, 3]
    b = seg[:, 2] - seg[:, 0]
    c = seg[:, 0] * seg[:, 3] - seg[:, 2] * seg[:, 1]
    nrm = jnp.sqrt(jnp.maximum(a * a + b * b, 1e-12))
    d_perp = jnp.abs(
        a[:, None] * xy[None, :, 0] + b[:, None] * xy[None, :, 1] + c[:, None]
    ) / nrm[:, None]
    seg_len = jnp.maximum(
        jnp.linalg.norm(seg[:, 2:4] - seg[:, 0:2], axis=-1), 1e-6
    )
    ux = (seg[:, 2] - seg[:, 0]) / seg_len
    uy = (seg[:, 3] - seg[:, 1]) / seg_len
    t_al = (
        (xy[None, :, 0] - seg[:, 0:1]) * ux[:, None]
        + (xy[None, :, 1] - seg[:, 1:2]) * uy[:, None]
    )  # [ML, N]
    w = (
        has_lm[None, :]
        & (z_lm[None, :] > 1e-6)
        & (d_perp <= 4.0)
        & (t_al >= -3.0)
        & (t_al <= seg_len[:, None] + 3.0)
    ).astype(jnp.float32)

    # Weighted LSQ fit of inverse depth rho(t) = r0 + r1 * t per segment.
    tau = t_al / seg_len[:, None]  # normalize for conditioning
    rho = 1.0 / jnp.maximum(z_lm[None, :], 1e-6)

    # Depth-discontinuity rejection: supports on the two SIDES of the
    # segment must agree in depth. A segment along an occlusion boundary
    # (e.g. a foreground patch edge) has consistent-looking but bimodal
    # support — the fit would thread between the two surfaces (the same
    # check lines_from_depth applies using the depth map).
    side = (
        a[:, None] * xy[None, :, 0] + b[:, None] * xy[None, :, 1] + c[:, None]
    ) > 0.0
    S0 = jnp.sum(w, axis=1)
    S1 = jnp.sum(w * tau, axis=1)
    S2 = jnp.sum(w * tau * tau, axis=1)
    Sr = jnp.sum(w * rho, axis=1)
    Str = jnp.sum(w * tau * rho, axis=1)
    det = S0 * S2 - S1 * S1
    safe_det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    r1 = (S0 * Str - S1 * Sr) / safe_det
    r0 = (Sr - r1 * S1) / jnp.maximum(S0, 1e-6)
    # Fit residual (inverse-depth units) and support spread.
    pred = r0[:, None] + r1[:, None] * tau
    resid = jnp.sum(w * (rho - pred) ** 2, axis=1) / jnp.maximum(S0, 1e-6)
    mean_rho = Sr / jnp.maximum(S0, 1e-6)
    spread = S2 / jnp.maximum(S0, 1e-6) - (S1 / jnp.maximum(S0, 1e-6)) ** 2
    # Endpoints only span the SUPPORTED extent (slightly extended): the
    # fit is an interpolator, not an extrapolator — endpoint depth error
    # grows with distance from the support cluster.
    tau_sup = jnp.where(w > 0, tau, jnp.inf)
    t_lo = jnp.clip(jnp.min(tau_sup, axis=1) - 0.15, 0.0, 1.0)
    tau_sup_hi = jnp.where(w > 0, tau, -jnp.inf)
    t_hi = jnp.clip(jnp.max(tau_sup_hi, axis=1) + 0.15, 0.0, 1.0)
    rho0 = r0 + r1 * t_lo
    rho1 = r0 + r1 * t_hi
    wl = w * side.astype(jnp.float32)
    wr = w * (~side).astype(jnp.float32)
    nl = jnp.sum(wl, axis=1)
    nr = jnp.sum(wr, axis=1)
    rho_l = jnp.sum(wl * rho, axis=1) / jnp.maximum(nl, 1e-6)
    rho_r = jnp.sum(wr * rho, axis=1) / jnp.maximum(nr, 1e-6)
    sides_agree = (
        (nl < 1.0)
        | (nr < 1.0)
        | (jnp.abs(rho_l - rho_r) <= 0.15 * jnp.maximum(mean_rho, 1e-6))
    )

    good = (
        free
        & (S0 >= 3.0)
        & (spread >= 0.06)  # supports spread across the segment
        & (t_hi - t_lo >= 0.5)  # supported extent covers half the segment
        & (resid <= (0.08 * mean_rho) ** 2)  # coplanar support, no jumps
        & sides_agree
        & (rho0 > 1e-6)
        & (rho1 > 1e-6)
    )

    def backproj(u, v, z):
        x = (u - camera.cx) / camera.fx * z
        y = (v - camera.cy) / camera.fy * z
        p_c = jnp.stack([x, y, z], axis=-1)
        return (p_c - t) @ R

    u_lo = seg[:, 0] + t_lo * (seg[:, 2] - seg[:, 0])
    v_lo = seg[:, 1] + t_lo * (seg[:, 3] - seg[:, 1])
    u_hi = seg[:, 0] + t_hi * (seg[:, 2] - seg[:, 0])
    v_hi = seg[:, 1] + t_hi * (seg[:, 3] - seg[:, 1])
    e1w = backproj(u_lo, v_lo, 1.0 / jnp.maximum(rho0, 1e-6))
    e2w = backproj(u_hi, v_hi, 1.0 / jnp.maximum(rho1, 1e-6))
    pl_w = lg.plucker_from_endpoints(e1w, e2w)

    order = jnp.cumsum(good.astype(jnp.int32)) - 1
    slots = base_slot + order
    good = good & (slots < L2)  # capacity gate
    safe = jnp.where(good, slots, L2)
    state = state._replace(
        ln_pluck=state.ln_pluck.at[safe].set(pl_w, mode="drop"),
        ln_endpoints=state.ln_endpoints.at[safe].set(
            jnp.concatenate([e1w, e2w], axis=-1), mode="drop"
        ),
        ln_desc=state.ln_desc.at[safe].set(state.kf_seg_desc[kf], mode="drop"),
        ln_valid=state.ln_valid.at[safe].set(good, mode="drop"),
        ln_ref_kf=state.ln_ref_kf.at[safe].set(kf, mode="drop"),
    )
    li = jnp.where(good, slots, state.kf_line_idx[kf])
    state = state._replace(kf_line_idx=state.kf_line_idx.at[kf].set(li))
    return state, jnp.sum(good.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("camera",))
def triangulate_lines_pair(camera, state: ms.MapState, kf1, kf2, base_slot,
                           enable=True):
    """Create 3D lines from unassociated segments of two keyframes.

    Returns (state, num_created). Mirrors mapping_module's parallel line
    triangulation (mapping_module.cc:407-408 + two_view_triangulator_line)
    with a TPU-shaped twist: instead of matching by descriptor FIRST and
    triangulating the winners (which plane-intersection cannot then verify
    — a wrong match between parallel segments still reprojects exactly
    onto both infinite lines), ALL ML x ML segment pairs are triangulated
    in one batch and the *geometric* evidence — symmetric endpoint
    transfer between views — joins the descriptor in match selection.
    Repetitive structure (parallel grid/edge lines) would otherwise alias.
    """
    ML = state.kf_seg.shape[1]
    L2 = state.ln_pluck.shape[0]
    free1 = state.kf_seg_valid[kf1] & (state.kf_line_idx[kf1] < 0)
    free2 = state.kf_seg_valid[kf2] & (state.kf_line_idx[kf2] < 0)
    desc_d = line_ops.line_descriptor_distance_matrix(
        state.kf_seg_desc[kf1], state.kf_seg_desc[kf2], free1, free2
    )  # [ML, ML]

    R1, t1 = state.kf_pose[kf1, :, :3], state.kf_pose[kf1, :, 3]
    R2, t2 = state.kf_pose[kf2, :, :3], state.kf_pose[kf2, :, 3]
    s1 = jnp.broadcast_to(state.kf_seg[kf1][:, None, :], (ML, ML, 4))
    s2 = jnp.broadcast_to(state.kf_seg[kf2][None, :, :], (ML, ML, 4))
    pl_w, tri_ok = lg.triangulate_line_two_view(camera, s1, s2, R1, t1, R2, t2)

    def transfer(pl_w, R_from, t_from, seg_from, R_to, t_to, seg_to):
        """Trim endpoints against seg_from, reproject into the other view,
        1D overlap with seg_to along its own direction. Overlap (not
        endpoint distance) because image-border clipping puts the two
        views' endpoints at different physical points on the same line."""
        pl_c = lg.transform_line(pl_w, R_from, t_from)
        eps_c, depth_ok = lg.trim_endpoints(camera, pl_c, seg_from)
        C = jnp.broadcast_to(t_from, eps_c[..., 0, :].shape)
        e1w = jnp.einsum("...i,ij->...j", eps_c[..., 0, :] - C, R_from)
        e2w = jnp.einsum("...i,ij->...j", eps_c[..., 1, :] - C, R_from)

        def proj(pw):
            pc = jnp.einsum("...j,ij->...i", pw, R_to) + t_to
            z = jnp.maximum(pc[..., 2], 1e-6)
            return jnp.stack(
                [camera.fx * pc[..., 0] / z + camera.cx,
                 camera.fy * pc[..., 1] / z + camera.cy], axis=-1
            ), pc[..., 2]

        p1, z1 = proj(e1w)
        p2, z2 = proj(e2w)
        a, b = seg_to[..., 0:2], seg_to[..., 2:4]
        length = jnp.maximum(jnp.linalg.norm(b - a, axis=-1), 1e-6)
        u = (b - a) / length[..., None]
        tp1 = jnp.sum((p1 - a) * u, axis=-1)
        tp2 = jnp.sum((p2 - a) * u, axis=-1)
        lo = jnp.minimum(tp1, tp2)
        hi = jnp.maximum(tp1, tp2)
        inter = jnp.minimum(hi, length) - jnp.maximum(lo, 0.0)
        ov = inter / jnp.maximum(jnp.minimum(hi - lo, length), 1e-6)
        ok = depth_ok & (z1 > 0.05) & (z2 > 0.05)
        return ov, ok, e1w, e2w

    ov12, ok12, e1w, e2w = transfer(pl_w, R1, t1, s1, R2, t2, s2)
    ov21, ok21, _, _ = transfer(pl_w, R2, t2, s2, R1, t1, s1)

    # 2D orientation agreement (mod pi): inter-keyframe rotation is small,
    # so matched segments must have similar image orientation — the
    # segment analog of the reference's rotation-consistency histogram.
    # Plane intersection cannot check this itself (any pair of segments
    # yields SOME 3D line that reprojects onto both).
    def seg_dir(seg):
        d = jnp.stack([seg[..., 2] - seg[..., 0], seg[..., 3] - seg[..., 1]],
                      axis=-1)
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)

    dir_cos = jnp.abs(jnp.sum(seg_dir(s1) * seg_dir(s2), axis=-1))

    pair_ok = (
        free1[:, None]
        & free2[None, :]
        & tri_ok
        & ok12
        & ok21
        & (desc_d <= 0.8)  # permissive: re-observation culling filters
        & (dir_cos > 0.966)  # within ~15 deg mod pi
        & (ov12 > 0.5)
        & (ov21 > 0.5)  # symmetric along-line overlap
    )
    cost = jnp.where(pair_ok, (2.0 - ov12 - ov21) + desc_d, jnp.inf)
    best = jnp.argmin(cost, axis=1)
    best_cost = jnp.min(cost, axis=1)
    rev = jnp.argmin(cost, axis=0)
    good = jnp.isfinite(best_cost) & (rev[best] == jnp.arange(ML))

    rows = jnp.arange(ML)
    pl_sel = pl_w[rows, best]
    e1_sel = e1w[rows, best]
    e2_sel = e2w[rows, best]

    # Depth-prior gate against the POINT map: keypoint landmarks whose
    # kf1 projection lies on the segment must agree with the line's depth.
    # Plane intersection cannot disambiguate border-clipped parallel
    # segments (any two parallel verticals are consistent with SOME 3D
    # line); co-located point landmarks carry the trusted depth. This is
    # the point<->line structural coupling this framework adds where the
    # reference relies on LBD descriptor strength alone.
    seg1 = state.kf_seg[kf1]
    a = seg1[:, 1] - seg1[:, 3]  # line coeffs through the two endpoints
    b = seg1[:, 2] - seg1[:, 0]
    c = seg1[:, 0] * seg1[:, 3] - seg1[:, 2] * seg1[:, 1]
    nrm = jnp.sqrt(jnp.maximum(a * a + b * b, 1e-12))
    xy = state.kf_xy[kf1]  # [N, 2]
    lm_idx = state.kf_lm_idx[kf1]
    has_lm = (lm_idx >= 0) & state.kf_kp_valid[kf1]
    Lp = state.lm_pos.shape[0]
    z_lm = (
        state.lm_pos[jnp.clip(lm_idx, 0, Lp - 1)] @ R1.T + t1
    )[:, 2]  # [N]
    d_perp = jnp.abs(
        a[:, None] * xy[None, :, 0] + b[:, None] * xy[None, :, 1] + c[:, None]
    ) / nrm[:, None]  # [ML, N]
    seg_len = jnp.maximum(
        jnp.linalg.norm(seg1[:, 2:4] - seg1[:, 0:2], axis=-1), 1e-6
    )
    ux = (seg1[:, 2] - seg1[:, 0]) / seg_len
    uy = (seg1[:, 3] - seg1[:, 1]) / seg_len
    t_along = (
        (xy[None, :, 0] - seg1[:, 0:1]) * ux[:, None]
        + (xy[None, :, 1] - seg1[:, 1:2]) * uy[:, None]
    )
    frac = jnp.clip(t_along / seg_len[:, None], 0.0, 1.0)
    on_seg = (
        has_lm[None, :]
        & (d_perp <= 6.0)
        & (t_along >= -5.0)
        & (t_along <= seg_len[:, None] + 5.0)
        & (z_lm[None, :] > 1e-6)
    )
    z1_sel = (e1_sel @ R1.T + t1)[:, 2]
    z2_sel = (e2_sel @ R1.T + t1)[:, 2]
    z_line_at = z1_sel[:, None] + frac * (z2_sel - z1_sel)[:, None]
    agree = on_seg & (
        jnp.abs(z_lm[None, :] - z_line_at)
        <= 0.35 * jnp.maximum(z_lm[None, :], 1e-6)
    )
    n_on = jnp.sum(on_seg, axis=1)
    n_agree = jnp.sum(agree, axis=1)
    # Where point evidence exists, the majority must agree; segments with
    # no co-located points pass (no evidence either way).
    depth_prior_ok = (n_on < 2) | (
        n_agree.astype(jnp.float32) >= 0.5 * n_on.astype(jnp.float32)
    )
    good = good & depth_prior_ok & enable

    order = jnp.cumsum(good.astype(jnp.int32)) - 1
    slots = base_slot + order
    good = good & (slots < L2)  # capacity gate
    safe = jnp.where(good, slots, L2)

    state = state._replace(
        ln_pluck=state.ln_pluck.at[safe].set(pl_sel, mode="drop"),
        ln_endpoints=state.ln_endpoints.at[safe].set(
            jnp.concatenate([e1_sel, e2_sel], axis=-1), mode="drop"
        ),
        ln_desc=state.ln_desc.at[safe].set(state.kf_seg_desc[kf1], mode="drop"),
        ln_valid=state.ln_valid.at[safe].set(good, mode="drop"),
        ln_ref_kf=state.ln_ref_kf.at[safe].set(kf1, mode="drop"),
    )
    li1 = jnp.where(good, slots, state.kf_line_idx[kf1])
    state = state._replace(kf_line_idx=state.kf_line_idx.at[kf1].set(li1))
    col2 = state.kf_line_idx[kf2]
    col2 = col2.at[jnp.where(good, best, ML)].set(
        jnp.where(good, slots, -1), mode="drop"
    )
    state = state._replace(kf_line_idx=state.kf_line_idx.at[kf2].set(col2))
    return state, jnp.sum(good.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("camera", "num_neighbors"))
def triangulate_lines_with_neighbors(
    camera, state: ms.MapState, slot, base_slot, *, num_neighbors: int = 3
):
    """Two-view line triangulation against the best covisible neighbors of
    ``slot`` — widest baseline first, requiring baseline >= 3% of scene
    depth (plane intersection is far more noise-sensitive than point DLT).
    Selection runs on device so the keyframe chain needs no host sync
    (reference iterates top covisibilities, mapping_module.cc:359-418).

    Returns (state, num_created_total).
    """
    K = state.kf_pose.shape[0]
    W = ms.covisibility_matrix(state)[slot]
    W = W.at[slot].set(0)
    R = state.kf_pose[:, :, :3]
    t = state.kf_pose[:, :, 3]
    C = -jnp.einsum("kji,kj->ki", R, t)  # [K, 3]
    base = jnp.linalg.norm(C - C[slot], axis=-1)
    from structure_plp_slam_tpu.models import mapper as mapper_mod

    min_base = 0.03 * mapper_mod.map_scale(state, slot)
    eligible = (W >= 15) & state.kf_valid & (base >= min_base)
    score = jnp.where(eligible, base, -1.0)
    s_top, nbs = jax.lax.top_k(score, num_neighbors)
    next_ln = base_slot
    for i in range(num_neighbors):
        state, n_new = triangulate_lines_pair(
            camera, state, slot, nbs[i], next_ln, enable=s_top[i] > 0.0
        )
        next_ln = next_ln + n_new
    return state, next_ln - base_slot


@functools.partial(jax.jit, static_argnames=("camera",))
def track_lines(camera, state: ms.MapState, seg, seg_desc, seg_valid,
                pts_w, obs_uv, obs_info, pts_valid, R, t):
    """Per-frame line tracking as ONE device dispatch: associate detected
    segments with map lines, refine the pose jointly with points when >= 3
    lines matched (reference: pose_optimizer_extended_line path), update
    line visibility statistics.

    Returns (state, R, t, seg_line_idx). With an empty line map the gate
    is False and the input pose passes through unchanged — no host sync
    is needed to decide whether line tracking applies.
    """
    L2 = state.ln_pluck.shape[0]
    seg_lines = match_lines_to_frame(
        camera, state, seg, seg_desc, seg_valid, R, t
    )
    gate = jnp.sum(seg_lines >= 0) >= 3

    pl = state.ln_pluck[jnp.clip(seg_lines, 0, L2 - 1)]
    line_valid = (seg_lines >= 0) & gate
    R2, t2, line_inl = refine_pose_with_lines(
        camera, R, t, pts_w, obs_uv, obs_info, pts_valid,
        pl, seg, line_valid,
    )
    R_out = jnp.where(gate, R2, R)
    t_out = jnp.where(gate, t2, t)
    seg_lines = jnp.where(gate & ~line_inl, -1, seg_lines)
    state = update_line_stats(camera, state, seg_lines, R_out, t_out)
    return state, R_out, t_out, seg_lines


@functools.partial(jax.jit, static_argnames=("camera", "num_iters"))
def refine_pose_with_lines(
    camera, R0, t0,
    pts_w, obs_uv, obs_info, pts_valid,
    pluck_w, seg, line_valid,
    *, num_iters: int = 6, line_weight: float = 1.0,
):
    """Joint point+line motion-only refinement starting from the
    point-only optimum (reference: pose_optimizer_extended_line.cc).

    Point terms reuse the analytic formulation; line terms get forward-mode
    Jacobians of the endpoint-to-line residuals wrt the se(3) perturbation.
    """
    from structure_plp_slam_tpu.ops import lie, robust

    def line_res(xi, R, t, pl, sg):
        dR, dt = lie.se3_exp(xi[None])
        R2, t2 = lie.se3_compose(dR[0], dt[0], R, t)
        return line_pose_residuals(camera, R2, t2, pl[None], sg[None])[0]

    def iteration(carry, _):
        R, t = carry
        # Point block (analytic, same as pose_opt).
        pc = pts_w @ R.T + t
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        u = camera.fx * pc[:, 0] / z + camera.cx
        v = camera.fy * pc[:, 1] / z + camera.cy
        r_uv = jnp.stack([u, v], -1) - obs_uv
        chi2 = jnp.sum(r_uv * r_uv, -1) * obs_info
        w = jnp.where(
            pts_valid & (pc[:, 2] > 1e-6),
            robust.huber_weight(chi2, robust.CHI2_2D) * obs_info,
            0.0,
        )
        iz = 1.0 / z
        iz2 = iz * iz
        zero = jnp.zeros_like(z)
        J_uv_pc = jnp.stack(
            [
                jnp.stack([camera.fx * iz, zero, -camera.fx * pc[:, 0] * iz2], -1),
                jnp.stack([zero, camera.fy * iz, -camera.fy * pc[:, 1] * iz2], -1),
            ],
            axis=-2,
        )
        dpc = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3)),
                -lie.hat(pc),
            ],
            axis=-1,
        )
        J = J_uv_pc @ dpc  # [N, 2, 6]
        H = jnp.einsum("nri,nrj->ij", J * w[:, None, None], J)
        b = -jnp.einsum("nri,nr->i", J * w[:, None, None], r_uv)

        # Line block (autodiff).
        zero6 = jnp.zeros((6,), jnp.float32)
        rl = jax.vmap(lambda pl, sg: line_res(zero6, R, t, pl, sg))(pluck_w, seg)
        Jl = jax.vmap(
            lambda pl, sg: jax.jacfwd(lambda xi: line_res(xi, R, t, pl, sg))(zero6)
        )(pluck_w, seg)  # [M, 2, 6]
        chi2_l = jnp.sum(rl * rl, -1)
        wl = jnp.where(
            line_valid,
            robust.huber_weight(chi2_l, robust.CHI2_2D) * line_weight,
            0.0,
        )
        H = H + jnp.einsum("mri,mrj->ij", Jl * wl[:, None, None], Jl)
        b = b - jnp.einsum("mri,mr->i", Jl * wl[:, None, None], rl)

        H = H + 1e-5 * jnp.trace(H) / 6.0 * jnp.eye(6)
        xi = jnp.linalg.solve(H, b)
        ok = jnp.all(jnp.isfinite(xi))
        xi = jnp.where(ok, xi, 0.0)
        R2, t2 = lie.se3_update(R, t, xi)
        return (R2, t2), None

    (R, t), _ = jax.lax.scan(iteration, (R0, t0), None, length=num_iters)
    # Final line inlier classification.
    rl = line_pose_residuals(camera, R, t, pluck_w, seg)
    inl = line_valid & (jnp.sum(rl * rl, -1) <= robust.CHI2_2D)
    return R, t, inl
