"""Batched Sim3 estimation (Umeyama/Horn) + RANSAC.

TPU-native replacement for solve/sim3_solver (src/PLPSLAM/solve/
sim3_solver.{h,cc}: Horn 1987 closed-form similarity from 3 point pairs,
RANSAC with both-way reprojection checks). All hypotheses solved and
scored at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops.ransac import sample_minimal_sets


def umeyama_alignment(P, Q, with_scale: bool = True):
    """Closed-form similarity: finds (R, t, s) minimizing |s R p + t - q|^2.

    ``P, Q: [..., N, 3]``. Returns (R [...,3,3], t [...,3], s [...]).
    """
    mu_p = jnp.mean(P, axis=-2, keepdims=True)
    mu_q = jnp.mean(Q, axis=-2, keepdims=True)
    Pc = P - mu_p
    Qc = Q - mu_q
    # Cross-covariance.
    S = jnp.einsum("...ni,...nj->...ij", Qc, Pc) / P.shape[-2]
    U, D, Vt = jnp.linalg.svd(S)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    W = jnp.broadcast_to(jnp.eye(3, dtype=P.dtype), S.shape).copy()
    W = W.at[..., 2, 2].set(jnp.sign(det))
    R = U @ W @ Vt
    if with_scale:
        var_p = jnp.mean(jnp.sum(Pc * Pc, axis=-1), axis=-1)
        s = jnp.sum(D * W[..., jnp.arange(3), jnp.arange(3)], axis=-1) / jnp.maximum(
            var_p, 1e-12
        )
    else:
        s = jnp.ones(S.shape[:-2], P.dtype)
    t = mu_q[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_p[..., 0, :])
    return R, t, s


@functools.partial(jax.jit, static_argnames=("camera", "num_hypotheses", "fix_scale"))
def sim3_ransac(
    camera,
    pts_1,
    pts_2,
    uv_1,
    uv_2,
    sigma_sq_1,
    sigma_sq_2,
    valid,
    key,
    *,
    num_hypotheses: int = 128,
    fix_scale: bool = False,
):
    """Estimate Sim3 ``S_21`` (camera-1-frame points -> camera-2 frame).

    Args mirror the reference solver (sim3_solver.cc): 3D landmark
    positions in each camera frame, their observed keypoints, per-point
    chi-square sigmas. Inliers are checked by BOTH-way reprojection with
    chi2 < 9.21 * sigma^2 (99% 2-DoF, reference value).

    Returns (R_21, t_21, s_21, inliers [N], num_inliers).
    """
    N = pts_1.shape[0]
    idx = sample_minimal_sets(key, num_hypotheses, 3, N, valid)
    R, t, s = umeyama_alignment(pts_1[idx], pts_2[idx], with_scale=not fix_scale)

    def reproj_err(R, t, s, pts_from, uv_to):
        # [..., N, 3] transform then pinhole project.
        pc = s[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, pts_from) + t[
            ..., None, :
        ]
        z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
        u = camera.fx * pc[..., 0] / z + camera.cx
        v = camera.fy * pc[..., 1] / z + camera.cy
        err = (u - uv_to[..., 0]) ** 2 + (v - uv_to[..., 1]) ** 2
        return jnp.where(pc[..., 2] > 0, err, jnp.inf)

    e12 = reproj_err(R, t, s, pts_1[None], uv_2[None])  # project 1 into 2
    R_inv = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / jnp.maximum(s, 1e-12)
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", R_inv, t)
    e21 = reproj_err(R_inv, t_inv, s_inv, pts_2[None], uv_1[None])

    ok = (
        (e12 <= 9.21 * sigma_sq_2[None, :])
        & (e21 <= 9.21 * sigma_sq_1[None, :])
        & valid[None, :]
    )
    counts = jnp.sum(ok, axis=-1)
    best = jnp.argmax(counts)
    return R[best], t[best], s[best], ok[best], counts[best]


def refine_sim3(camera, R, t, s, pts_1, pts_2, uv_1, uv_2, inliers,
                num_iters: int = 10):
    """Gauss-Newton polish of a Sim3 on inlier correspondences (replaces
    optimize/transform_optimizer.cc mutual-reprojection refinement).

    Minimizes both-way reprojection via the Umeyama fit on inliers followed
    by re-gating — at TPU batch sizes a couple of reweighted closed-form
    fits dominate iterative GN for this 7-DoF problem.
    """
    def body(carry, _):
        R, t, s, inl = carry
        w = inl.astype(jnp.float32)
        # Weighted Umeyama via resampling: mask outliers by collapsing them
        # onto the centroid (zero contribution to covariance).
        wsum = jnp.maximum(jnp.sum(w), 3.0)
        mu1 = jnp.sum(pts_1 * w[:, None], axis=0) / wsum
        mu2 = jnp.sum(pts_2 * w[:, None], axis=0) / wsum
        P = jnp.where(inl[:, None], pts_1, mu1)
        Q = jnp.where(inl[:, None], pts_2, mu2)
        R2, t2, s2 = umeyama_alignment(P[None], Q[None])
        R2, t2, s2 = R2[0], t2[0], s2[0]

        pc = s2 * pts_1 @ R2.T + t2
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        u = camera.fx * pc[:, 0] / z + camera.cx
        v = camera.fy * pc[:, 1] / z + camera.cy
        err = (u - uv_2[:, 0]) ** 2 + (v - uv_2[:, 1]) ** 2
        inl2 = inliers & (err <= 9.21) & (pc[:, 2] > 0)
        return (R2, t2, s2, inl2), None

    (R, t, s, inl), _ = jax.lax.scan(body, (R, t, s, inliers), None, length=num_iters)
    return R, t, s, inl, jnp.sum(inl)
