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
def triangulate_lines_pair(camera, state: ms.MapState, kf1, kf2, base_slot):
    """Create 3D lines from unassociated segments of two keyframes.

    Returns (state, num_created). Mirrors mapping_module's parallel line
    triangulation (mapping_module.cc:407-408 + two_view_triangulator_line).
    """
    ML = state.kf_seg.shape[1]
    L2 = state.ln_pluck.shape[0]
    free1 = state.kf_seg_valid[kf1] & (state.kf_line_idx[kf1] < 0)
    free2 = state.kf_seg_valid[kf2] & (state.kf_line_idx[kf2] < 0)
    d = line_ops.line_descriptor_distance_matrix(
        state.kf_seg_desc[kf1], state.kf_seg_desc[kf2], free1, free2
    )
    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    rev = jnp.argmin(d, axis=0)
    ok = (best_d <= 0.45) & (rev[best] == jnp.arange(ML)) & free1

    R1, t1 = state.kf_pose[kf1, :, :3], state.kf_pose[kf1, :, 3]
    R2, t2 = state.kf_pose[kf2, :, :3], state.kf_pose[kf2, :, 3]
    seg1 = state.kf_seg[kf1]
    seg2 = state.kf_seg[kf2][best]
    pl_w, tri_ok = lg.triangulate_line_two_view(
        camera, seg1, seg2, R1, t1, R2, t2
    )

    # Verify by reprojection into both views.
    r1 = line_pose_residuals(camera, R1, t1, pl_w, seg1)
    r2 = line_pose_residuals(camera, R2, t2, pl_w, seg2)
    reproj_ok = (jnp.abs(r1).max(axis=-1) < 3.0) & (jnp.abs(r2).max(axis=-1) < 3.0)

    # Endpoints from kf1's segment trimming.
    pl_c1 = lg.transform_line(pl_w, R1, t1)
    eps_c1, depth_ok = lg.trim_endpoints(camera, pl_c1, seg1)
    # To world: X_w = R^T (X_c - t).
    e1w = (eps_c1[:, 0] - t1) @ R1
    e2w = (eps_c1[:, 1] - t1) @ R1

    # Endpoint-consistency in view 2 (depth-sensitive): a segment nearly
    # parallel to the baseline has an ill-conditioned plane intersection
    # that the infinite-line residual cannot detect — but wrong depth makes
    # the trimmed endpoints slide along the line and miss kf2's endpoints.
    def proj2(pw):
        pc = pw @ R2.T + t2
        z = jnp.maximum(pc[:, 2], 1e-6)
        return jnp.stack(
            [camera.fx * pc[:, 0] / z + camera.cx,
             camera.fy * pc[:, 1] / z + camera.cy], axis=1
        ), pc[:, 2]

    p1_2, z1_2 = proj2(e1w)
    p2_2, z2_2 = proj2(e2w)
    q1 = seg2[:, 0:2]
    q2 = seg2[:, 2:4]
    d_direct = jnp.linalg.norm(p1_2 - q1, axis=1) + jnp.linalg.norm(p2_2 - q2, axis=1)
    d_swap = jnp.linalg.norm(p1_2 - q2, axis=1) + jnp.linalg.norm(p2_2 - q1, axis=1)
    ep_ok = (jnp.minimum(d_direct, d_swap) < 20.0) & (z1_2 > 0.05) & (z2_2 > 0.05)

    good = ok & tri_ok & reproj_ok & depth_ok & ep_ok
    order = jnp.cumsum(good.astype(jnp.int32)) - 1
    slots = base_slot + order
    safe = jnp.where(good, slots, L2)

    state = state._replace(
        ln_pluck=state.ln_pluck.at[safe].set(pl_w, mode="drop"),
        ln_endpoints=state.ln_endpoints.at[safe].set(
            jnp.concatenate([e1w, e2w], axis=-1), mode="drop"
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
