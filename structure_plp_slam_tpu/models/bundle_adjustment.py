"""Batched Schur-complement bundle adjustment.

TPU-native replacement for the reference's g2o BA stack
(src/PLPSLAM/optimize/local_bundle_adjuster.cc — 5+10 iteration two-phase
local BA; global_bundle_adjuster.cc — full-map BA). One solver serves both:
the caller chooses which cameras/landmarks participate and which cameras
are held fixed (gauge).

Formulation (all fixed-shape, all batched):
  observations are flat arrays (cam_idx[O], lm_idx[O], uv[O,2], xr[O],
  inv_sigma_sq[O], valid[O]) — the window-extraction gather lives in
  ``window.py``.

  Per GN/LM iteration:
    1. residuals + analytic Jacobians per observation   (VPU, batched)
    2. Hcc [C,6,6], Hll [M,3,3], b via segment-sum      (scatter-add)
    3. W [M,C,6,3] cam-landmark coupling via scatter    (dense per window)
    4. Schur: S = Hcc_blockdiag - W Hll^-1 W^T          (einsum on MXU)
    5. dense Cholesky solve of S (6C x 6C)              (XLA potrf)
    6. back-substitute landmark updates                 (batched 3x3)
  Huber IRLS weights each iteration; damped diagonals (Levenberg).

The dense [M, C, 6, 3] coupling tensor is the deliberate TPU trade: for
local windows (C <= ~64 cams, M <= ~8k landmarks) it is ~30 MB — small
against HBM — and turns the sparse Schur reduction the reference does with
pointer chasing into two einsums that run on the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.camera import base as cam_base
from structure_plp_slam_tpu.ops import lie, robust
from structure_plp_slam_tpu.ops import linalg as linalg_ops


class BAProblem(NamedTuple):
    """Fixed-shape BA window."""

    cam_pose: jax.Array      # [C, 3, 4] world->cam
    cam_fixed: jax.Array     # [C] bool — gauge/fixed cameras
    cam_valid: jax.Array     # [C] bool
    lm_pos: jax.Array        # [M, 3]
    lm_valid: jax.Array      # [M] bool
    obs_cam: jax.Array       # [O] i32 — local camera index
    obs_lm: jax.Array        # [O] i32 — local landmark index
    obs_uv: jax.Array        # [O, 2] f32
    obs_xr: jax.Array        # [O] f32 (< 0: mono)
    obs_inv_sigma_sq: jax.Array  # [O] f32
    obs_valid: jax.Array     # [O] bool


class LineWindow(NamedTuple):
    """Line terms for the JOINT point+line window BA (reference:
    local_bundle_adjuster_extended_line.cc:69- puts line reprojection
    edges in the same g2o graph as the points; the corridor experiment in
    tests/test_line_ba_joint_experiment.py measures ~8x pose-RMSE win
    over point-only BA + line alternation when points are scarce).

    Lines are 4-DoF orthonormal (U in SO(3), w on the circle —
    optimize/g2o/line3d.h:57-140); observations are detected segments
    whose endpoint-to-projected-line distances form 2-vectors of
    residuals (reproj_edge_line3d_orthonormal.h:49-150)."""

    ln_U: jax.Array        # [Ml, 3, 3]
    ln_w: jax.Array        # [Ml, 2]
    ln_valid: jax.Array    # [Ml] bool (>= 2 window observations)
    lobs_cam: jax.Array    # [Ol] i32 local camera index
    lobs_line: jax.Array   # [Ol] i32 local line index
    lobs_seg: jax.Array    # [Ol, 4] detected segment endpoints
    lobs_inv_sigma_sq: jax.Array  # [Ol]
    lobs_valid: jax.Array  # [Ol] bool


class BAResult(NamedTuple):
    cam_pose: jax.Array
    lm_pos: jax.Array
    obs_inlier: jax.Array    # [O] bool — post-solve chi2 classification
    chi2: jax.Array          # f32 — final total robust error
    ln_U: jax.Array = None   # [Ml, 3, 3] — when solved with a LineWindow
    ln_w: jax.Array = None   # [Ml, 2]


def _project_residuals(camera, cam_pose, lm_pos, prob: BAProblem):
    """Residuals + camera-space points for all observations."""
    R = cam_pose[prob.obs_cam, :, :3]
    t = cam_pose[prob.obs_cam, :, 3]
    X = lm_pos[prob.obs_lm]
    pc = jnp.einsum("oij,oj->oi", R, X) + t
    uv, _ = cam_base.project(camera, pc)
    r_uv = cam_base.uv_residual(camera, uv, prob.obs_uv)
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    r_xr = (uv[..., 0] - camera.focal_x_baseline / z) - prob.obs_xr
    return pc, r_uv, r_xr


def _obs_chi2(prob, r_uv, r_xr, has_stereo):
    chi2 = jnp.sum(r_uv * r_uv, -1) * prob.obs_inv_sigma_sq
    return chi2 + jnp.where(has_stereo, r_xr * r_xr * prob.obs_inv_sigma_sq, 0.0)


def inv3x3(H):
    """Closed-form batched 3x3 inverse via the adjugate — pure VPU
    elementwise math. ``jnp.linalg.inv`` lowers to a batched LU solve that
    costs ~70x more wall time on TPU at [4096, 3, 3]."""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    Cc = d * h - e * g
    det = a * A + b * B + c * Cc
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([Cc, -(a * h - b * g), a * e - b * d], -1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def inv4x4_sym(H):
    """Batched symmetric 4x4 inverse via 3x3-block Schur partitioning —
    closed-form VPU math (same rationale as :func:`inv3x3`)."""
    A = H[..., :3, :3]
    b = H[..., :3, 3]
    c = H[..., 3, 3]
    Ai = inv3x3(A)
    Aib = jnp.einsum("...ij,...j->...i", Ai, b)
    s = c - jnp.einsum("...i,...i->...", b, Aib)
    s_inv = 1.0 / jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)
    TL = Ai + s_inv[..., None, None] * jnp.einsum(
        "...i,...j->...ij", Aib, Aib
    )
    TR = -s_inv[..., None] * Aib
    top = jnp.concatenate([TL, TR[..., :, None]], axis=-1)
    bot = jnp.concatenate([TR, s_inv[..., None]], axis=-1)
    return jnp.concatenate([top, bot[..., None, :]], axis=-2)


@functools.partial(
    jax.jit, static_argnames=("camera", "num_iters", "cull_at_iters", "obs_grid")
)
def ba_solve(
    camera,
    prob: BAProblem,
    lines: "LineWindow" = None,
    *,
    num_iters: int = 15,
    cull_at_iters: tuple = (5,),
    damping: float = 1e-4,
    obs_grid: bool = False,
) -> BAResult:
    """Run damped Gauss-Newton with Schur elimination on a BA window.

    ``cull_at_iters``: iterations after which observations are chi2-gated
    (the reference runs 5 iterations, prunes outliers, then 10 more —
    local_bundle_adjuster.cc two-phase structure).

    ``obs_grid``: promise that observations are laid out as a dense
    [C, O/C] grid with ``obs_cam[o] == o // (O/C)`` (how mapper.local_ba
    flattens keyframe keypoint rows). The normal-equation assembly then
    runs as C batched [M, N] x [N, blk] matmuls instead of one [M, O] x
    [O, C*blk] contraction — 32x fewer FLOPs for the camera-landmark
    coupling W at C=32.
    """
    C = prob.cam_pose.shape[0]
    M = prob.lm_pos.shape[0]
    has_stereo = prob.obs_xr >= 0.0

    obs_live0 = (
        prob.obs_valid
        & prob.cam_valid[prob.obs_cam]
        & prob.lm_valid[prob.obs_lm]
    )

    # One-hot membership matrices, hoisted out of the iteration loop (the
    # obs->cam / obs->lm wiring never changes). All normal-equation
    # assembly then runs as einsums on the MXU instead of scatter-adds —
    # XLA lowers .at[].add() to a serialized scatter on TPU, which
    # dominated the solve (~15x slower than this formulation). Dead
    # observations (index < 0) produce all-zero one-hot rows and drop out.
    onehot_lm = (
        prob.obs_lm[:, None] == jnp.arange(M, dtype=prob.obs_lm.dtype)
    ).astype(jnp.float32)  # [O, M]
    O = prob.obs_lm.shape[0]
    if obs_grid:
        Ng = O // C
        # bf16 halves the HBM traffic of the (hundreds-of-MB) one-hot
        # read; 0/1 are exact in bf16 and the contraction accumulates in
        # f32 after the on-chip upconversion.
        oh_grid = onehot_lm.reshape(C, Ng, M).astype(jnp.bfloat16)

        def assemble(Hcc_o, Hll_o, Hcl_o, bc_o, bl_o):
            Hcc = jnp.sum(Hcc_o.reshape(C, Ng, 6, 6), axis=1)
            bc = jnp.sum(bc_o.reshape(C, Ng, 6), axis=1)
            # ONE contraction against the [C, Ng, M] one-hot for all three
            # landmark-indexed reductions: the one-hot buffer (hundreds of
            # MB) is the bandwidth cost, so it must be read once, not
            # three times.
            blk = jnp.concatenate(
                [
                    Hll_o.reshape(C, Ng, 9),
                    bl_o.reshape(C, Ng, 3),
                    Hcl_o.reshape(C, Ng, 18),
                ],
                axis=-1,
            )  # [C, Ng, 30]
            out = jnp.einsum("cnm,cnd->mcd", oh_grid, blk)  # [M, C, 30]
            Hll = jnp.sum(out[:, :, 0:9], axis=1).reshape(M, 3, 3)
            bl = jnp.sum(out[:, :, 9:12], axis=1)
            W = out[:, :, 12:30].reshape(M, C, 6, 3)
            return Hcc, Hll, bc, bl, W
    else:
        onehot_cam = (
            prob.obs_cam[:, None] == jnp.arange(C, dtype=prob.obs_cam.dtype)
        ).astype(jnp.float32)  # [O, C]

        def assemble(Hcc_o, Hll_o, Hcl_o, bc_o, bl_o):
            Hcc = jnp.einsum("oc,oij->cij", onehot_cam, Hcc_o)
            Hll = jnp.einsum("om,oij->mij", onehot_lm, Hll_o)
            bc = jnp.einsum("oc,oi->ci", onehot_cam, bc_o)
            bl = jnp.einsum("om,oi->mi", onehot_lm, bl_o)
            W = jnp.einsum(
                "om,ocij->mcij",
                onehot_lm,
                jnp.einsum("oc,oij->ocij", onehot_cam, Hcl_o),
            )  # [M, C, 6, 3]
            return Hcc, Hll, bc, bl, W

    if lines is not None:
        from structure_plp_slam_tpu.ops import line_geometry as lg

        Ml = lines.ln_U.shape[0]
        Ol = lines.lobs_cam.shape[0]
        l_oh_cam = (
            lines.lobs_cam[:, None] == jnp.arange(C, dtype=lines.lobs_cam.dtype)
        ).astype(jnp.float32)  # [Ol, C]
        l_oh_ln = (
            lines.lobs_line[:, None]
            == jnp.arange(Ml, dtype=lines.lobs_line.dtype)
        ).astype(jnp.float32)  # [Ol, Ml]
        zero6 = jnp.zeros((6,), jnp.float32)
        zero4 = jnp.zeros((4,), jnp.float32)

        def _line_res(U, w, R, t, seg, xi, dl):
            R2, t2 = lie.se3_update(R, t, xi)
            U2, w2 = lg.orthonormal_update(U, w, dl)
            pl = lg.orthonormal_to_plucker(U2, w2)
            pl_c = lg.transform_line(pl, R2, t2)
            l_img = lg.project_line(camera, pl_c)
            return lg.endpoint_line_distances(l_img, seg[0:2], seg[2:4])

        def _line_res_jac(U, w, R, t, seg):
            f_c = lambda xi: _line_res(U, w, R, t, seg, xi, zero4)
            f_l = lambda dl: _line_res(U, w, R, t, seg, zero6, dl)
            return (
                f_c(zero6),
                jax.jacfwd(f_c)(zero6),
                jax.jacfwd(f_l)(zero4),
            )

        _line_rj = jax.vmap(_line_res_jac)

    def iteration(carry, it):
        cam_pose, lm_pos, obs_live, ln_U, ln_w, lobs_live = carry
        pc, r_uv, r_xr = _project_residuals(camera, cam_pose, lm_pos, prob)
        chi2 = _obs_chi2(prob, r_uv, r_xr, has_stereo)
        delta_sq = jnp.where(has_stereo, robust.CHI2_3D, robust.CHI2_2D)
        w = jnp.where(
            obs_live,
            robust.huber_weight(chi2, delta_sq) * prob.obs_inv_sigma_sq,
            0.0,
        )
        # Behind-camera observations contribute nothing this iteration.
        w = jnp.where(cam_base.cheirality(camera, pc), w, 0.0)

        # --- Jacobians (model-dispatched) --------------------------------
        x, z = pc[:, 0], pc[:, 2]
        z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        iz = 1.0 / z
        iz2 = iz * iz
        fx, fxb = camera.fx, camera.focal_x_baseline
        zero = jnp.zeros_like(z)
        J_uv_pc = cam_base.project_jacobian(camera, pc)  # [O, 2, 3]
        J_xr_pc = jnp.stack([fx * iz, zero, -fx * x * iz2 + fxb * iz2], -1)  # [O,3]

        R = cam_pose[prob.obs_cam, :, :3]
        # d pc / d xi (left-mult update on the camera) = [I | -hat(pc)].
        dpc_dxi = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3)),
                -lie.hat(pc),
            ],
            axis=-1,
        )  # [O, 3, 6]
        # d pc / d X = R.
        Jc2 = J_uv_pc @ dpc_dxi            # [O, 2, 6]
        Jl2 = J_uv_pc @ R                  # [O, 2, 3]
        Jc3 = (J_xr_pc[:, None, :] @ dpc_dxi)[:, 0]  # [O, 6]
        Jl3 = (J_xr_pc[:, None, :] @ R)[:, 0]        # [O, 3]
        w_st = jnp.where(has_stereo, w, 0.0)

        # --- normal equation blocks ------------------------------------
        Hcc_o = jnp.einsum("ori,orj->oij", Jc2 * w[:, None, None], Jc2) + jnp.einsum(
            "oi,oj->oij", Jc3 * w_st[:, None], Jc3
        )  # [O, 6, 6]
        Hll_o = jnp.einsum("ori,orj->oij", Jl2 * w[:, None, None], Jl2) + jnp.einsum(
            "oi,oj->oij", Jl3 * w_st[:, None], Jl3
        )  # [O, 3, 3]
        Hcl_o = jnp.einsum("ori,orj->oij", Jc2 * w[:, None, None], Jl2) + jnp.einsum(
            "oi,oj->oij", Jc3 * w_st[:, None], Jl3
        )  # [O, 6, 3]
        bc_o = -(
            jnp.einsum("ori,or->oi", Jc2 * w[:, None, None], r_uv)
            + Jc3 * (w_st * r_xr)[:, None]
        )  # [O, 6]
        bl_o = -(
            jnp.einsum("ori,or->oi", Jl2 * w[:, None, None], r_uv)
            + Jl3 * (w_st * r_xr)[:, None]
        )  # [O, 3]

        Hcc, Hll, bc, bl, W = assemble(Hcc_o, Hll_o, Hcl_o, bc_o, bl_o)

        # --- line terms (joint point+line window BA) --------------------
        if lines is not None:
            U_o2 = ln_U[lines.lobs_line]
            w_o2 = ln_w[lines.lobs_line]
            R_l = cam_pose[lines.lobs_cam, :, :3]
            t_l = cam_pose[lines.lobs_cam, :, 3]
            r_l, Jc_l, Jl_l = _line_rj(
                U_o2, w_o2, R_l, t_l, lines.lobs_seg
            )  # [Ol,2], [Ol,2,6], [Ol,2,4]
            chi2_l = jnp.sum(r_l * r_l, -1) * lines.lobs_inv_sigma_sq
            w_lo = jnp.where(
                lobs_live,
                robust.huber_weight(chi2_l, robust.CHI2_2D)
                * lines.lobs_inv_sigma_sq,
                0.0,
            )
            Jc_lw = Jc_l * w_lo[:, None, None]
            Hcc_lo = jnp.einsum("ori,orj->oij", Jc_lw, Jc_l)
            Hll_lo = jnp.einsum(
                "ori,orj->oij", Jl_l * w_lo[:, None, None], Jl_l
            )
            Hcl_lo = jnp.einsum("ori,orj->oij", Jc_lw, Jl_l)  # [Ol, 6, 4]
            bc_lo = -jnp.einsum("ori,or->oi", Jc_lw, r_l)
            bl_lo = -jnp.einsum(
                "ori,or->oi", Jl_l * w_lo[:, None, None], r_l
            )
            Hcc = Hcc + jnp.einsum("oc,oij->cij", l_oh_cam, Hcc_lo)
            bc = bc + jnp.einsum("oc,oi->ci", l_oh_cam, bc_lo)
            Hln = jnp.einsum("om,oij->mij", l_oh_ln, Hll_lo)   # [Ml, 4, 4]
            bln = jnp.einsum("om,oi->mi", l_oh_ln, bl_lo)      # [Ml, 4]
            Wl = jnp.einsum(
                "om,ocij->mcij",
                l_oh_ln,
                jnp.einsum("oc,oij->ocij", l_oh_cam, Hcl_lo),
            )  # [Ml, C, 6, 4]

        # --- Schur elimination -----------------------------------------
        lam_l = damping * jnp.maximum(
            jnp.trace(Hll, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1e-6
        )
        Hll_d = Hll + lam_l * jnp.eye(3, dtype=jnp.float32)[None]
        Hll_inv = inv3x3(Hll_d)  # batched 3x3, closed form
        # Landmarks with no observations: identity-damped inverse is fine
        # (their b is 0 so updates are 0).

        WHinv = jnp.einsum("mcij,mjk->mcik", W, Hll_inv)          # [M, C, 6, 3]
        S_red = jnp.einsum("mcik,mdjk->cdij", WHinv, W)           # [C, C, 6, 6]
        # All diagonal-block updates via an eye mask — a TPU scatter has a
        # ~ms fixed cost regardless of size; masked adds are pure VPU.
        eye_cc = jnp.eye(C, dtype=jnp.float32)[:, :, None, None]  # [C,C,1,1]
        S = -S_red + eye_cc * Hcc[:, None]
        rhs = bc - jnp.einsum("mcik,mk->ci", WHinv, bl)           # [C, 6]

        if lines is not None:
            # Eliminate 4-DoF line blocks exactly like the point blocks.
            lam_ln = damping * jnp.maximum(
                jnp.trace(Hln, axis1=-2, axis2=-1)[:, None, None] / 4.0,
                1e-6,
            )
            Hln_inv = inv4x4_sym(
                Hln + (lam_ln + 1e-8) * jnp.eye(4, dtype=jnp.float32)[None]
            )
            WlHinv = jnp.einsum("mcij,mjk->mcik", Wl, Hln_inv)  # [Ml,C,6,4]
            S = S - jnp.einsum("mcik,mdjk->cdij", WlHinv, Wl)
            rhs = rhs - jnp.einsum("mcik,mk->ci", WlHinv, bln)

        # Fix cameras: identity rows/cols (gauge + fixed window borders).
        free = (~prob.cam_fixed) & prob.cam_valid
        free_f = free.astype(jnp.float32)
        S = S * free_f[:, None, None, None] * free_f[None, :, None, None]
        eye6 = jnp.eye(6, dtype=jnp.float32)
        S = S + eye_cc * (
            jnp.where(free[:, None, None], 0.0, 1.0) * eye6[None]
        )[:, None]

        # Damping on camera blocks (trace of the diagonal blocks).
        diag_blocks = jnp.einsum("ccij->cij", S)
        diag_scale = damping * jnp.maximum(
            jnp.trace(diag_blocks, axis1=-2, axis2=-1) / 6.0, 1e-6
        )
        S = S + eye_cc * (diag_scale[:, None, None] * eye6[None])[:, None]
        rhs = rhs * free_f[:, None]

        S_dense = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
        rhs_dense = rhs.reshape(6 * C)
        # Cholesky, deliberately: an approximate matmul-chain solve
        # (ops/linalg.spd_solve) was tried here and reverted — the JOINT
        # point+line windows produce S systems where its percent-level
        # error breaks the line-BA trust gates (the loop-healing e2e
        # regressed), and inside the compiled scan the factorization's
        # kernel latency is amortized anyway.
        L_chol, low = jax.scipy.linalg.cho_factor(S_dense, lower=True)
        dx_c = jax.scipy.linalg.cho_solve((L_chol, low), rhs_dense).reshape(C, 6)

        # Back-substitute landmarks: dX = Hll^-1 (bl - W^T dx_c).
        Wt_dxc = jnp.einsum("mcij,ci->mj", W, dx_c)               # [M, 3]
        dx_l = jnp.einsum("mij,mj->mi", Hll_inv, bl - Wt_dxc)

        ok = jnp.all(jnp.isfinite(dx_c)) & jnp.all(jnp.isfinite(dx_l))
        dx_c = jnp.where(ok, lie.clamp_tangent(dx_c, 0.3, 5.0), 0.0)
        dx_l = jnp.where(ok, jnp.clip(dx_l, -5.0, 5.0), 0.0)

        R_new, t_new = lie.se3_update(
            cam_pose[:, :, :3], cam_pose[:, :, 3], dx_c
        )
        cam_pose_new = jnp.where(
            free[:, None, None], lie.pack_pose(R_new, t_new), cam_pose
        )
        lm_pos_new = jnp.where(
            prob.lm_valid[:, None], lm_pos + dx_l, lm_pos
        )

        if lines is not None:
            # Back-substitute lines: dl = Hln^-1 (bln - Wl^T dx_c).
            Wlt_dxc = jnp.einsum("mcij,ci->mj", Wl, dx_c)        # [Ml, 4]
            dx_ln = jnp.einsum("mij,mj->mi", Hln_inv, bln - Wlt_dxc)
            # A line moves only while >= 2 LIVE observations constrain
            # its 4 DoF (pre-gated + culled observations drop out; a
            # lone surviving observation must not drag the line).
            ln_cnt = jnp.zeros((Ml + 1,), jnp.int32).at[
                jnp.where(lobs_live, lines.lobs_line, Ml)
            ].add(1, mode="drop")[:Ml]
            ok_ln = (
                lines.ln_valid
                & (ln_cnt >= 2)
                & jnp.all(jnp.isfinite(dx_ln), axis=-1)
                & ok
            )
            dx_ln = jnp.where(
                ok_ln[:, None], jnp.clip(dx_ln, -0.3, 0.3), 0.0
            )
            ln_U_new, ln_w_new = lg.orthonormal_update(ln_U, ln_w, dx_ln)
        else:
            ln_U_new, ln_w_new = ln_U, ln_w

        # Outlier culling at designated iterations.
        def cull(live):
            obs_live2, lobs_live2 = live
            _, r_uv2, r_xr2 = _project_residuals(
                camera, cam_pose_new, lm_pos_new, prob
            )
            chi2n = _obs_chi2(prob, r_uv2, r_xr2, has_stereo)
            thr = jnp.where(has_stereo, robust.CHI2_3D, robust.CHI2_2D)
            obs_live2 = obs_live2 & (chi2n <= thr)
            if lines is not None:
                r_l2, _, _ = _line_rj(
                    ln_U_new[lines.lobs_line], ln_w_new[lines.lobs_line],
                    cam_pose_new[lines.lobs_cam, :, :3],
                    cam_pose_new[lines.lobs_cam, :, 3],
                    lines.lobs_seg,
                )
                chi2_l2 = jnp.sum(r_l2 * r_l2, -1) * lines.lobs_inv_sigma_sq
                lobs_live2 = lobs_live2 & (chi2_l2 <= robust.CHI2_2D)
            return obs_live2, lobs_live2

        do_cull = jnp.zeros((), bool)
        for ci in cull_at_iters:
            do_cull = do_cull | (it == ci)
        obs_live, lobs_live = jax.lax.cond(
            do_cull, cull, lambda m: m, (obs_live, lobs_live)
        )
        return (
            cam_pose_new, lm_pos_new, obs_live, ln_U_new, ln_w_new,
            lobs_live,
        ), None

    if lines is not None:
        ln_U0, ln_w0 = lines.ln_U, lines.ln_w
        lobs_live0 = (
            lines.lobs_valid & lines.ln_valid[lines.lobs_line]
        )
        # Pre-gate: an observation grossly inconsistent with the INPUT
        # geometry (e.g. associations spanning an uncorrected loop-drift
        # discontinuity) never enters the solve — Huber down-weights but
        # does not zero, and by the first cull it has already dragged the
        # line (measured: the loop-healing scenario collapsed without
        # this). The gate is SCENE-ADAPTIVE — 9x the median live chi2,
        # floored at 9x the chi2 threshold — so a window whose geometry
        # is merely un-converged (large but consistent residuals, e.g.
        # right after initialization) keeps its edges, while outliers an
        # order above the bulk are dropped.
        r_l0, _, _ = _line_rj(
            lines.ln_U[lines.lobs_line], lines.ln_w[lines.lobs_line],
            prob.cam_pose[lines.lobs_cam, :, :3],
            prob.cam_pose[lines.lobs_cam, :, 3],
            lines.lobs_seg,
        )
        chi2_l0 = jnp.sum(r_l0 * r_l0, -1) * lines.lobs_inv_sigma_sq
        n_live = jnp.sum(lobs_live0)
        chi_sorted = jnp.sort(jnp.where(lobs_live0, chi2_l0, jnp.inf))
        med = chi_sorted[
            jnp.clip((n_live - 1) // 2, 0, chi2_l0.shape[0] - 1)
        ]
        med = jnp.where(jnp.isfinite(med), med, 0.0)
        gate = jnp.maximum(9.0 * robust.CHI2_2D, 9.0 * med)
        lobs_live0 = lobs_live0 & (chi2_l0 <= gate)
    else:
        ln_U0 = jnp.zeros((0, 3, 3), jnp.float32)
        ln_w0 = jnp.zeros((0, 2), jnp.float32)
        lobs_live0 = jnp.zeros((0,), bool)
    (cam_pose, lm_pos, obs_live, ln_U_f, ln_w_f, _), _ = jax.lax.scan(
        iteration,
        (prob.cam_pose, prob.lm_pos, obs_live0, ln_U0, ln_w0, lobs_live0),
        jnp.arange(num_iters),
    )
    # Re-project rotations onto SO(3); fixed cameras keep their exact input
    # pose (the quaternion round trip is not bit-exact).
    cam_pose = lie.pack_pose(
        lie.orthonormalize(cam_pose[:, :, :3]), cam_pose[:, :, 3]
    )
    free_out = (~prob.cam_fixed) & prob.cam_valid
    cam_pose = jnp.where(free_out[:, None, None], cam_pose, prob.cam_pose)

    _, r_uv, r_xr = _project_residuals(camera, cam_pose, lm_pos, prob)
    chi2 = _obs_chi2(prob, r_uv, r_xr, has_stereo)
    thr = jnp.where(has_stereo, robust.CHI2_3D, robust.CHI2_2D)
    inlier = obs_live & (chi2 <= thr)
    total = jnp.sum(jnp.where(inlier, chi2, 0.0))
    if lines is not None:
        return BAResult(cam_pose, lm_pos, inlier, total, ln_U_f, ln_w_f)
    return BAResult(cam_pose, lm_pos, inlier, total)
