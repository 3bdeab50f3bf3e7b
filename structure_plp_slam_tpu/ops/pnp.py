"""Batched PnP RANSAC (relocalization pose solver).

TPU-native replacement for solve/pnp_solver (src/PLPSLAM/solve/
pnp_solver.{h,cc}: EPnP + RANSAC from bearing/3D correspondences). Instead
of EPnP's control-point machinery, each hypothesis uses the 6-point DLT
projection-matrix fit (batched SVD of [12, 12] systems) with orthonormal
factorization — equivalent accuracy under RANSAC + GN polish, and maps
directly onto batched TPU linear algebra.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import lie
from structure_plp_slam_tpu.ops.ransac import sample_minimal_sets
from structure_plp_slam_tpu.models import pose_opt


def pnp_dlt(points_w, bearings):
    """Batched 6-point DLT: ``[S, 6, 3]`` world points + unit bearings ->
    (R [S,3,3], t [S,3]) world->camera, via projection-matrix factorization.

    Uses normalized camera coords x = bx/bz, y = by/bz of the bearings.
    """
    z = bearings[..., 2:3]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    x = bearings[..., 0:1] / safe_z
    y = bearings[..., 1:2] / safe_z
    X = points_w
    ones = jnp.ones_like(x)
    zeros4 = jnp.zeros((*x.shape[:-1], 4), X.dtype)
    Xh = jnp.concatenate([X, ones], axis=-1)  # [S, 6, 4]
    # Rows: [X 1 0 -x*X] ; [0 X 1... ] standard DLT for P [3,4].
    r1 = jnp.concatenate([Xh, zeros4, -x * Xh], axis=-1)  # [S, 6, 12]
    r2 = jnp.concatenate([zeros4, Xh, -y * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [S, 12, 12]
    _, _, Vt = jnp.linalg.svd(A)
    p = Vt[..., -1, :]
    P = p.reshape(*p.shape[:-1], 3, 4)
    # Resolve the global sign of P first: projective depths w_i = P3 . Xh_i
    # must be positive for points in front of the camera (cheirality).
    w_depth = jnp.einsum("...j,...nj->...n", P[..., 2, :], Xh)
    flip = jnp.sum(jnp.sign(w_depth), axis=-1) < 0
    P = jnp.where(flip[..., None, None], -P, P)
    M = P[..., :3]
    # Factor M = s R: nearest rotation by SVD (det-corrected), scale from
    # the singular values. A mirrored/degenerate sample yields det(M) < 0
    # here; its pose scores ~0 RANSAC inliers and is discarded naturally.
    U, D, Vt2 = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(U) * jnp.linalg.det(Vt2)
    W = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape).copy()
    W = W.at[..., 2, 2].set(jnp.sign(detUV))
    R = U @ W @ Vt2
    scale = jnp.sum(D * W[..., jnp.arange(3), jnp.arange(3)], axis=-1) / 3.0
    safe_scale = jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    t = P[..., 3] / safe_scale[..., None]
    return R, t


@functools.partial(jax.jit, static_argnames=("camera", "num_hypotheses"))
def pnp_ransac(camera, points_w, uv, inv_sigma_sq, valid, key, *,
               num_hypotheses: int = 256):
    """RANSAC PnP on pixel observations, polished with the motion-only LM.

    Returns (R, t, inliers [N], num_inliers).
    """
    N = points_w.shape[0]
    # Bearings from undistorted pixels.
    bx = (uv[:, 0] - camera.cx) / camera.fx
    by = (uv[:, 1] - camera.cy) / camera.fy
    b = jnp.stack([bx, by, jnp.ones_like(bx)], axis=-1)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)

    idx = sample_minimal_sets(key, num_hypotheses, 6, N, valid)
    R, t = pnp_dlt(points_w[idx], b[idx])

    pc = jnp.einsum("sij,nj->sni", R, points_w) + t[:, None, :]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    u = camera.fx * pc[..., 0] / z + camera.cx
    v = camera.fy * pc[..., 1] / z + camera.cy
    err = ((u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2) * inv_sigma_sq[None]
    ok = (err <= 5.991) & (pc[..., 2] > 0) & valid[None]
    counts = jnp.sum(ok, axis=-1)
    best = jnp.argmax(counts)

    res = pose_opt.optimize_pose(
        camera,
        R[best],
        t[best],
        points_w,
        uv,
        jnp.full((N,), -1.0, uv.dtype),
        inv_sigma_sq,
        ok[best],
    )
    return res.R, res.t, res.inliers, res.num_inliers
