"""Motion-only pose optimization (the per-frame hot solve).

TPU-native replacement for the reference's g2o motion-only BA
(src/PLPSLAM/optimize/pose_optimizer.cc:53-: LM on BlockSolver_6_3, 4
trials x 10 iterations with chi2 outlier re-classification between trials,
chi2 = 5.991 mono / 7.815 stereo, Huber kernel).

Design: the whole solve is ONE jitted computation over fixed-shape arrays.
Residuals/Jacobians for all N observations are evaluated in batch; the 6x6
normal equations are formed by reduction (a [N,6] x [N,6] contraction on
the MXU) and solved in f32 with Levenberg damping. The 4x10 trial
structure of the reference is preserved via ``lax.scan`` over a static
trial/iteration grid, with outlier masks updated between trials.

Analytic Jacobians (left-multiplicative se(3) update, translation-first):
  pc = R @ X + t                                   (camera-space point)
  d(pc)/d(xi) = [ I_3 | -hat(pc) ]                 ([3, 6])
  mono residual r = project(pc) - uv_obs
  d(r)/d(pc) = [[fx/z, 0, -fx*x/z^2],
                [0, fy/z, -fy*y/z^2]]
  stereo adds row: d(x_right)/d(pc) = [fx/z, 0, -fx*x/z^2 + fxb/z^2].
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.camera import base as cam_base
from structure_plp_slam_tpu.ops import lie, robust
from structure_plp_slam_tpu.ops import linalg as linalg_ops


class PoseOptResult(NamedTuple):
    R: jax.Array  # [3, 3]
    t: jax.Array  # [3]
    inliers: jax.Array  # [N] bool
    num_inliers: jax.Array  # i32
    chi2: jax.Array  # f32 total weighted error over inliers


def _point_jacobian_blocks(camera, pc):
    """Per-observation projection Jacobian wrt camera-space point ``[N,2,3]``
    and its stereo x_right row ``[N,3]`` (model-dispatched; the stereo row
    only exists for pinhole-style cameras and is masked off otherwise)."""
    J_uv = cam_base.project_jacobian(camera, pc)  # [N, 2, 3]
    x, z = pc[:, 0], pc[:, 2]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z
    iz2 = iz * iz
    fx = camera.fx
    row_xr = jnp.stack(
        [fx * iz, jnp.zeros_like(z), -fx * x * iz2 + camera.focal_x_baseline * iz2],
        axis=-1,
    )
    return J_uv, row_xr


def _residuals(camera, R, t, points_w, obs_uv, obs_xr):
    pc = points_w @ R.T + t
    uv, _ = cam_base.project(camera, pc)
    r_uv = cam_base.uv_residual(camera, uv, obs_uv)
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    xr = uv[..., 0] - camera.focal_x_baseline / z
    r_xr = xr - obs_xr
    return pc, r_uv, r_xr


@functools.partial(jax.jit, static_argnames=("camera", "num_trials", "num_iters"))
def optimize_pose(
    camera,
    R0,
    t0,
    points_w,
    obs_uv,
    obs_xr,
    inv_sigma_sq,
    valid,
    *,
    num_trials: int = 4,
    num_iters: int = 10,
) -> PoseOptResult:
    """Optimize a single world->camera pose against fixed landmarks.

    Args:
      camera: static Camera dataclass (hashable jit constant).
      R0, t0: initial pose.
      points_w: ``[N, 3]`` landmark positions (fixed).
      obs_uv: ``[N, 2]`` undistorted keypoint observations.
      obs_xr: ``[N]`` right-image x coordinate; < 0 means mono observation
        (matches the reference's stereo-availability convention where
        x_right < 0 marks monocular keypoints, frame.h stereo arrays).
      inv_sigma_sq: ``[N]`` information scale per observation (1/sigma^2 of
        the keypoint's pyramid level).
      valid: ``[N]`` observation mask.

    Returns :class:`PoseOptResult` with the refined pose and inlier mask.
    """
    has_stereo = obs_xr >= 0.0

    def robust_cost(R, t, inlier):
        """Total Huber-weighted cost (the LM acceptance criterion)."""
        _, r_uv, r_xr = _residuals(camera, R, t, points_w, obs_uv, obs_xr)
        chi2 = robust.chi2_2d(r_uv, inv_sigma_sq) + jnp.where(
            has_stereo, r_xr * r_xr * inv_sigma_sq, 0.0
        )
        delta_sq = jnp.where(has_stereo, robust.CHI2_3D, robust.CHI2_2D)
        rho = jnp.where(
            chi2 <= delta_sq,
            chi2,
            2.0 * jnp.sqrt(delta_sq * jnp.maximum(chi2, 1e-12)) - delta_sq,
        )
        return jnp.sum(jnp.where(valid & inlier, rho, 0.0))

    def trial_body(carry, _):
        R, t, inlier = carry

        def lm_iter(carry2, _):
            # True Levenberg-Marquardt: adaptive lambda with step
            # accept/reject on the robust cost (matches g2o's behavior —
            # a fixed-damping GN can jump into a spurious local basin when
            # the start pose is off, which a rejected step prevents).
            R, t, lam, cost = carry2
            pc, r_uv, r_xr = _residuals(camera, R, t, points_w, obs_uv, obs_xr)
            chi2 = robust.chi2_2d(r_uv, inv_sigma_sq) + jnp.where(
                has_stereo, r_xr * r_xr * inv_sigma_sq, 0.0
            )
            delta_sq = jnp.where(has_stereo, robust.CHI2_3D, robust.CHI2_2D)
            w_huber = robust.huber_weight(chi2, delta_sq)
            w = jnp.where(valid & inlier, w_huber * inv_sigma_sq, 0.0)

            J_uv, J_xr_pc = _point_jacobian_blocks(camera, pc)
            hat_pc = lie.hat(pc)
            dpc = jnp.concatenate(
                [
                    jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3)),
                    -hat_pc,
                ],
                axis=-1,
            )
            J2 = J_uv @ dpc  # [N, 2, 6]
            J3r = (J_xr_pc[:, None, :] @ dpc)[:, 0, :]  # [N, 6]
            w_st = jnp.where(has_stereo, w, 0.0)

            Jw2 = J2 * w[:, None, None]
            H = jnp.einsum("nri,nrj->ij", Jw2, J2) + jnp.einsum(
                "ni,nj->ij", J3r * w_st[:, None], J3r
            )
            b = -(
                jnp.einsum("nri,nr->i", Jw2, r_uv)
                + jnp.einsum("ni,n->i", J3r * w_st[:, None], r_xr)
            )
            H_lm = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
            # Closed-form equilibrated 6x6 solve: jnp.linalg.solve's LU
            # kernel is latency-bound on TPU and ran once per LM
            # iteration inside the per-frame track step (ops/linalg.py).
            xi = linalg_ops.solve6_spd(H_lm, b)
            ok = jnp.all(jnp.isfinite(xi))
            xi = jnp.where(ok, lie.clamp_tangent(xi), 0.0)
            R_new, t_new = lie.se3_update(R, t, xi)
            new_cost = robust_cost(R_new, t_new, inlier)
            accept = ok & (new_cost < cost)
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7),
                            jnp.minimum(lam * 4.0, 1e4))
            return (R, t, lam, cost), None

        cost0 = robust_cost(R, t, inlier)
        (R, t, _, _), _ = jax.lax.scan(
            lm_iter, (R, t, jnp.float32(1e-3), cost0), None, length=num_iters
        )

        # Re-classify inliers for the next trial (reference :163-201).
        _, r_uv, r_xr = _residuals(camera, R, t, points_w, obs_uv, obs_xr)
        chi2 = robust.chi2_2d(r_uv, inv_sigma_sq) + jnp.where(
            has_stereo, r_xr * r_xr * inv_sigma_sq, 0.0
        )
        thr = jnp.where(has_stereo, robust.CHI2_3D, robust.CHI2_2D)
        inlier = valid & (chi2 <= thr)
        return (R, t, inlier), None

    inlier0 = valid
    (R, t, inlier), _ = jax.lax.scan(
        trial_body, (R0, t0, inlier0), None, length=num_trials
    )

    R = lie.orthonormalize(R)
    _, r_uv, r_xr = _residuals(camera, R, t, points_w, obs_uv, obs_xr)
    chi2 = robust.chi2_2d(r_uv, inv_sigma_sq) + jnp.where(
        has_stereo, r_xr * r_xr * inv_sigma_sq, 0.0
    )
    total = jnp.sum(jnp.where(inlier, chi2, 0.0))
    return PoseOptResult(R, t, inlier, jnp.sum(inlier.astype(jnp.int32)), total)
