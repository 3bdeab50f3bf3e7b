"""Batched two-view triangulation.

Replaces the reference's per-point triangulator (src/PLPSLAM/solve/
triangulator.h:37-121: DLT via JacobiSVD, plus midpoint variants) with
batched closed-form linear solves — the DLT normal equations for a 4x4
system are formed and solved for N points at once (no per-point SVD; the
4x4 symmetric eigenproblem is solved via ``jnp.linalg`` batched routines).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_dlt(bearings_1, bearings_2, R_21, t_21):
    """Triangulate in camera-1 frame from bearing correspondences.

    Args:
      bearings_1: ``[N, 3]`` unit rays in camera 1.
      bearings_2: ``[N, 3]`` unit rays in camera 2.
      R_21, t_21: pose of camera 1 as seen from camera 2
        (``x_2 = R_21 @ x_1 + t_21``).

    Returns ``[N, 3]`` points in camera-1 coordinates.

    DLT rows (reference triangulator.h): for P1 = [I|0] and P2 = [R|t]:
      A = [ x1 * P1_row3 - P1_row1
            y1 * P1_row3 - P1_row2
            x2 * P2_row3 - P2_row1
            y2 * P2_row3 - P2_row2 ]
    using normalized (bearing) coordinates. The solution is the null vector
    of A, computed as the eigenvector of A^T A with smallest eigenvalue.
    """
    z1 = bearings_1[..., 2:3]
    z2 = bearings_2[..., 2:3]
    x1 = bearings_1[..., 0:1] / jnp.where(jnp.abs(z1) < 1e-12, 1e-12, z1)
    y1 = bearings_1[..., 1:2] / jnp.where(jnp.abs(z1) < 1e-12, 1e-12, z1)
    x2 = bearings_2[..., 0:1] / jnp.where(jnp.abs(z2) < 1e-12, 1e-12, z2)
    y2 = bearings_2[..., 1:2] / jnp.where(jnp.abs(z2) < 1e-12, 1e-12, z2)

    P1 = jnp.concatenate(
        [jnp.eye(3, dtype=bearings_1.dtype), jnp.zeros((3, 1), bearings_1.dtype)],
        axis=1,
    )  # [3, 4]
    P2 = jnp.concatenate([R_21, t_21[..., None]], axis=-1)  # [3, 4]

    A0 = x1 * P1[2] - P1[0]
    A1 = y1 * P1[2] - P1[1]
    A2 = x2 * P2[..., 2, :] - P2[..., 0, :]
    A3 = y2 * P2[..., 2, :] - P2[..., 1, :]
    A = jnp.stack([A0, A1, A2, A3], axis=-2)  # [N, 4, 4]

    AtA = jnp.einsum("...ij,...ik->...jk", A, A)
    # Smallest eigenvector of symmetric 4x4.
    w, v = jnp.linalg.eigh(AtA)
    h = v[..., :, 0]  # eigenvector for smallest eigenvalue
    w_h = h[..., 3]
    safe = jnp.where(jnp.abs(w_h) < 1e-12, 1e-12, w_h)
    return h[..., :3] / safe[..., None]


def triangulate_two_view(bear_1, bear_2, R_1w, t_1w, R_2w, t_2w):
    """Triangulate to *world* coordinates given world->cam poses."""
    # Relative pose: x_2 = R_2w R_1w^T (x_1 - t... ) -> R_21 = R_2w R_1w^T.
    R_21 = R_2w @ jnp.swapaxes(R_1w, -1, -2)
    t_21 = t_2w - jnp.einsum("...ij,...j->...i", R_21, t_1w)
    pts_c1 = triangulate_dlt(bear_1, bear_2, R_21, t_21)
    # world = R_1w^T (x_1 - t_1w)
    return jnp.einsum("...ji,...nj->...ni", R_1w, pts_c1 - t_1w[..., None, :])


def rays_parallax_cos(bear_1, bear_2, R_21):
    """cos of the ray parallax angle between correspondences (for gating).

    Reference: two_view_triangulator.h:70-120 rejects low-parallax pairs.
    """
    b1_in_2 = jnp.einsum("...ij,...nj->...ni", R_21, bear_1)
    return jnp.sum(b1_in_2 * bear_2, axis=-1)


def check_triangulation(
    pts_c1, bear_1, bear_2, R_21, t_21, *, reproj_thr_sq=5.99, min_parallax_cos=0.9998
):
    """Validity checks after triangulation (depth, reprojection, parallax).

    Mirrors module::two_view_triangulator checks (positive depth in both
    views, angular reprojection error, parallax) in batch. Returns bool
    ``[N]``.
    """
    pts_c2 = jnp.einsum("...ij,...nj->...ni", R_21, pts_c1) + t_21[..., None, :]
    depth_ok = (pts_c1[..., 2] > 1e-6) & (pts_c2[..., 2] > 1e-6)

    def ang_err(pts, bear):
        d = pts / jnp.maximum(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-12)
        return jnp.sum(d * bear, axis=-1)

    # Angular agreement between triangulated ray and observed bearing.
    cos1 = ang_err(pts_c1, bear_1)
    cos2 = ang_err(pts_c2, bear_2)
    reproj_ok = (cos1 > 0.9998) & (cos2 > 0.9998)

    par = rays_parallax_cos(bear_1, bear_2, R_21)
    parallax_ok = par < min_parallax_cos  # enough angle between rays

    return depth_ok & reproj_ok & parallax_ok
