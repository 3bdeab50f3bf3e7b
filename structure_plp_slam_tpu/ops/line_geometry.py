"""3D line geometry: Plücker coordinates, triangulation, reprojection.

TPU-native replacement for the reference's line machinery
(src/PLPSLAM/optimize/g2o/line3d.{h,cc} Plücker<->orthonormal,
module/two_view_triangulator_line.cc plane-intersection triangulation,
optimize/g2o/se3/reproj_edge_line3d_orthonormal.h projection + endpoint
distances). All batched.

Conventions:
* A Plücker line is (m, d): direction ``d`` (not necessarily unit inside
  the orthonormal parameterization) and moment ``m = p x d`` for any point
  ``p`` on the line. Stored ``[..., 6]`` as [m, d].
* World->camera transform of a line under (R, t):
    d_c = R d_w ;  m_c = R m_w + hat(t) R d_w.
* Projection to the image: the infinite line's coefficients are
    l = K_line @ m_c,  K_line = [[fy, 0, 0], [0, fx, 0],
                                 [-fy*cx, -fx*cy, fx*fy]].
* Residual of an observed segment: perpendicular distances of both
  detected endpoints to ``l`` (reference edge error, 2-vector).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import lie


def plucker_from_endpoints(p1, p2):
    """Two 3D points ``[..., 3]`` -> Plücker ``[..., 6]`` ([m, d], d unit)."""
    d = p2 - p1
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    m = jnp.cross(p1, d)
    return jnp.concatenate([m, d], axis=-1)


def closest_point_on_line(pluck, p):
    """Closest point on line to ``p`` ``[..., 3]``."""
    m, d = pluck[..., :3], pluck[..., 3:]
    # Point on line closest to origin: p0 = d x m / |d|^2 (d unit -> d x m).
    p0 = jnp.cross(d, m)
    t = jnp.sum((p - p0) * d, axis=-1, keepdims=True)
    return p0 + t * d


def transform_line(pluck_w, R, t):
    """World->camera Plücker transform. Shapes broadcast."""
    m = pluck_w[..., :3]
    d = pluck_w[..., 3:]
    d_c = jnp.einsum("...ij,...j->...i", R, d)
    m_c = jnp.einsum("...ij,...j->...i", R, m) + jnp.cross(
        jnp.broadcast_to(t, d_c.shape), d_c
    )
    return jnp.concatenate([m_c, d_c], axis=-1)


def line_intrinsics(camera):
    return jnp.asarray(
        [
            [camera.fy, 0.0, 0.0],
            [0.0, camera.fx, 0.0],
            [-camera.fy * camera.cx, -camera.fx * camera.cy, camera.fx * camera.fy],
        ],
        jnp.float32,
    )


def project_line(camera, pluck_c):
    """Camera-frame Plücker -> image line coefficients ``[..., 3]``
    (un-normalized ax + by + c = 0)."""
    KL = line_intrinsics(camera)
    return jnp.einsum("ij,...j->...i", KL, pluck_c[..., :3])


def endpoint_line_distances(l, ep1, ep2):
    """Perpendicular distances (signed) of two 2D endpoints to line
    ``l=[a,b,c]``. Returns ``[..., 2]``."""
    n = jnp.sqrt(jnp.maximum(l[..., 0] ** 2 + l[..., 1] ** 2, 1e-12))
    d1 = (l[..., 0] * ep1[..., 0] + l[..., 1] * ep1[..., 1] + l[..., 2]) / n
    d2 = (l[..., 0] * ep2[..., 0] + l[..., 1] * ep2[..., 1] + l[..., 2]) / n
    return jnp.stack([d1, d2], axis=-1)


def triangulate_line_two_view(camera, seg1, seg2, R1, t1, R2, t2):
    """Two observed segments -> world Plücker line by plane intersection.

    Reference: two_view_triangulator_line.cc:52- — each segment
    back-projects to the plane through the camera center and the two
    endpoint rays; the 3D line is the planes' intersection, extracted from
    the dual Plücker matrix L* = pi1 pi2^T - pi2 pi1^T.

    ``seg*``: [..., 4] (x1, y1, x2, y2) undistorted pixel endpoints.
    Returns (pluck_w [..., 6], ok [...]).
    """

    def backproject_plane(seg, R, t):
        # Bearings of the two endpoints in camera frame.
        b1 = jnp.stack(
            [
                (seg[..., 0] - camera.cx) / camera.fx,
                (seg[..., 1] - camera.cy) / camera.fy,
                jnp.ones_like(seg[..., 0]),
            ],
            axis=-1,
        )
        b2 = jnp.stack(
            [
                (seg[..., 2] - camera.cx) / camera.fx,
                (seg[..., 3] - camera.cy) / camera.fy,
                jnp.ones_like(seg[..., 0]),
            ],
            axis=-1,
        )
        # Plane normal in camera frame; to world: n_w = R^T n_c; the plane
        # passes through the camera center C = -R^T t.
        n_c = jnp.cross(b1, b2)
        n_w = jnp.einsum("...ji,...j->...i", R, n_c)
        C = -jnp.einsum("...ji,...j->...i", R, t)
        d = -jnp.sum(n_w * C, axis=-1)
        return jnp.concatenate([n_w, d[..., None]], axis=-1)  # [..., 4]

    pi1 = backproject_plane(seg1, R1, t1)
    pi2 = backproject_plane(seg2, R2, t2)
    # Dual Plücker matrix: L* = pi1 pi2^T - pi2 pi1^T.
    # Extract: d = n1 x n2 ; m = d1 * n2 - d2 * n1  (up to sign/scale).
    n1, d1 = pi1[..., :3], pi1[..., 3]
    n2, d2 = pi2[..., :3], pi2[..., 3]
    d = jnp.cross(n1, n2)
    m = d1[..., None] * n2 - d2[..., None] * n1
    d_norm = jnp.linalg.norm(d, axis=-1)
    # Degenerate when planes are parallel (low-parallax line pair).
    n1n = n1 / jnp.maximum(jnp.linalg.norm(n1, axis=-1, keepdims=True), 1e-12)
    n2n = n2 / jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True), 1e-12)
    parallax_ok = jnp.abs(jnp.sum(n1n * n2n, axis=-1)) < 0.9995
    safe = jnp.maximum(d_norm, 1e-12)[..., None]
    pluck = jnp.concatenate([m / safe, d / safe], axis=-1)
    return pluck, parallax_ok & (d_norm > 1e-9)


def trim_endpoints(camera, pluck_c, seg):
    """3D endpoints on the (camera-frame) line matching an observed
    segment: intersect the line with the back-projected endpoint rays
    (closest-point between ray and line). Returns ``[..., 2, 3]``
    camera-frame endpoints and a depth-positivity flag."""
    m, d = pluck_c[..., :3], pluck_c[..., 3:]
    p0 = jnp.cross(d, m)  # point on line nearest origin

    def hit(ux, uy):
        b = jnp.stack(
            [
                (ux - camera.cx) / camera.fx,
                (uy - camera.cy) / camera.fy,
                jnp.ones_like(ux),
            ],
            axis=-1,
        )
        # Closest point on the 3D line to the ray (origin, b): solve 2x2.
        bb = jnp.sum(b * b, axis=-1)
        dd = jnp.sum(d * d, axis=-1)
        bd = jnp.sum(b * d, axis=-1)
        w0 = p0  # line origin
        c1 = jnp.sum(w0 * b, axis=-1)
        c2 = jnp.sum(w0 * d, axis=-1)
        det = bb * dd - bd * bd
        safe_det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        t_line = (bb * (-c2) + bd * c1) / safe_det
        return w0 + t_line[..., None] * d

    e1 = hit(seg[..., 0], seg[..., 1])
    e2 = hit(seg[..., 2], seg[..., 3])
    ok = (e1[..., 2] > 1e-6) & (e2[..., 2] > 1e-6)
    return jnp.stack([e1, e2], axis=-2), ok


# ---------------------------------------------------------------------------
# Orthonormal 4-DoF parameterization (for BA updates).
# Reference: line3d.h:57-140 (U in SO(3), W in SO(2)).
# ---------------------------------------------------------------------------


def plucker_to_orthonormal(pluck):
    """[..., 6] -> (U [..., 3, 3], w [..., 2] with |w| = 1)."""
    m, d = pluck[..., :3], pluck[..., 3:]
    nm = jnp.linalg.norm(m, axis=-1)
    nd = jnp.linalg.norm(d, axis=-1)
    u1 = m / jnp.maximum(nm, 1e-12)[..., None]
    u2 = d / jnp.maximum(nd, 1e-12)[..., None]
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], axis=-1)
    n = jnp.sqrt(jnp.maximum(nm * nm + nd * nd, 1e-24))
    w = jnp.stack([nm / n, nd / n], axis=-1)
    return U, w


def orthonormal_to_plucker(U, w, scale=1.0):
    """(U, w) -> Plücker [..., 6] with |(m, d)| = ``scale``."""
    m = w[..., 0:1] * U[..., :, 0]
    d = w[..., 1:2] * U[..., :, 1]
    return jnp.concatenate([m, d], axis=-1) * scale


def orthonormal_update(U, w, delta):
    """Apply the 4-DoF update: U <- U exp_so3(delta[0:3]),
    w <- R2(delta[3]) w."""
    dR = lie.so3_exp(delta[..., :3])
    U2 = U @ dR
    c = jnp.cos(delta[..., 3])
    s = jnp.sin(delta[..., 3])
    w1 = c * w[..., 0] - s * w[..., 1]
    w2 = s * w[..., 0] + c * w[..., 1]
    return U2, jnp.stack([w1, w2], axis=-1)
