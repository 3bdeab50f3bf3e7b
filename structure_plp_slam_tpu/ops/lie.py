"""Batched Lie-group operations: SO(3), SE(3), Sim(3).

TPU-native replacement for the reference's reliance on Eigen + g2o internal
pose types (reference: src/PLPSLAM/type.h, src/PLPSLAM/optimize/g2o/se3/
shot_vertex.h, optimize/g2o/sim3/shot_vertex.h). Everything here is written
for arbitrary leading batch dimensions and is jit/vmap/grad-safe, including
at the small-angle limit (Taylor branches selected with ``jnp.where`` on
safe denominators — no data-dependent control flow).

Conventions:
* Rotations are 3x3 matrices ``R`` with shape ``[..., 3, 3]``.
* SE(3) poses are ``(R, t)`` pairs or packed ``[..., 3, 4]`` matrices
  mapping world -> camera (``x_c = R @ x_w + t``), matching the reference's
  ``cam_pose_cw`` convention (src/PLPSLAM/data/frame.h pose members).
* se(3) tangent vectors are ``[..., 6]`` ordered ``[rho(3), phi(3)]``
  (translation first, rotation second).
* sim(3) tangent vectors are ``[..., 7]`` ordered ``[rho, phi, sigma]``.
* Quaternions are ``[..., 4]`` in ``[w, x, y, z]`` order (converted to TUM's
  ``qx qy qz qw`` only at trajectory-IO time, io/trajectory.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import linalg as _linalg

_EPS = 1e-8


def hat(v):
    """so(3) hat operator: ``[..., 3] -> [..., 3, 3]`` skew matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m):
    """Inverse of :func:`hat`: ``[..., 3, 3] -> [..., 3]``."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _sinc(theta):
    """sin(x)/x with Taylor fallback near 0."""
    small = jnp.abs(theta) < 1e-4
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 - theta * theta / 6.0, jnp.sin(safe) / safe)


def _cosc(theta):
    """(1-cos(x))/x^2 with Taylor fallback near 0."""
    small = jnp.abs(theta) < 1e-4
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(
        small, 0.5 - theta * theta / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe)
    )


def _sincc(theta):
    """(x - sin(x))/x^3 with Taylor fallback near 0."""
    small = jnp.abs(theta) < 1e-4
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(
        small,
        1.0 / 6.0 - theta * theta / 120.0,
        (safe - jnp.sin(safe)) / (safe * safe * safe),
    )


def so3_exp(phi):
    """Rodrigues formula: ``[..., 3] -> [..., 3, 3]``."""
    # Clamped sqrt: d/dx sqrt at 0 is inf, which poisons jacfwd even when
    # the value itself is routed through the Taylor branch of a where().
    theta = jnp.sqrt(jnp.maximum(jnp.sum(phi * phi, axis=-1), 1e-24))
    K = hat(phi)
    K2 = K @ K
    a = _sinc(theta)[..., None, None]
    b = _cosc(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R):
    """Log map ``[..., 3, 3] -> [..., 3]`` (angle in [0, pi]).

    Computed through the quaternion representation (Shepperd's branch-free
    conversion), which is numerically stable at theta -> 0 and theta -> pi,
    unlike the classic arccos(trace) formula.
    """
    q = quat_from_rotmat(R)  # canonical w >= 0 -> theta in [0, pi]
    w = q[..., 0]
    xyz = q[..., 1:]
    n = jnp.sqrt(jnp.maximum(jnp.sum(xyz * xyz, axis=-1), 1e-24))
    small = n < 1e-6
    safe_n = jnp.where(small, 1.0, n)
    safe_w = jnp.maximum(w, 1e-12)
    # theta = 2 atan2(n, w); phi = theta/n * xyz, with Taylor at n -> 0.
    scale_generic = 2.0 * jnp.arctan2(n, w) / safe_n
    scale_small = (2.0 / safe_w) * (1.0 - n * n / (3.0 * safe_w * safe_w))
    scale = jnp.where(small, scale_small, scale_generic)
    return scale[..., None] * xyz


def so3_left_jacobian(phi):
    """Left Jacobian of SO(3): J_l = I + cosc(θ) K + sincc(θ) K²."""
    theta = jnp.sqrt(jnp.maximum(jnp.sum(phi * phi, axis=-1), 1e-24))
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + _cosc(theta)[..., None, None] * K + _sincc(theta)[..., None, None] * K2


def se3_exp(xi):
    """se(3) exp: ``[..., 6] ([rho, phi]) -> (R [...,3,3], t [...,3])``."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    J = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", J, rho)
    return R, t


def se3_log(R, t):
    """se(3) log: ``(R, t) -> [..., 6]``."""
    phi = so3_log(R)
    J = so3_left_jacobian(phi)
    # Adjugate 3x3 solve: the batched LU kernel is latency-bound on TPU
    # and the left Jacobian is well-conditioned near identity.
    rho = _linalg.solve3(J, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra, ta) ∘ (Rb, tb): apply b first, then a."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, points):
    """Transform points ``[..., N, 3]`` by pose (R ``[...,3,3]``, t ``[...,3]``)."""
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


def pack_pose(R, t):
    """(R, t) -> ``[..., 3, 4]``."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


def unpack_pose(P):
    """``[..., 3, 4]`` -> (R, t)."""
    return P[..., :3], P[..., 3]


def se3_update(R, t, xi):
    """Left-multiplicative update: exp(xi) ∘ (R, t). The optimizer step."""
    dR, dt = se3_exp(xi)
    return se3_compose(dR, dt, R, t)


def orthonormalize(R):
    """Project a near-rotation back onto SO(3) (quaternion round trip).

    Optimizer steps with huge rotation tangents (degenerate normal
    equations) make Rodrigues' formula cancel catastrophically in f32 and
    the result drifts off the manifold; a det != 1 'rotation' then acts as
    an illegal scale DoF that robust costs happily exploit. Call this after
    any solver that composes many updates.
    """
    return rotmat_from_quat(quat_from_rotmat(R))


def clamp_tangent(xi, max_rot: float = 0.5, max_trans: float = 10.0):
    """Trust-region clamp of an se(3) step ``[..., 6]`` ([rho, phi])."""
    rho, phi = xi[..., :3], xi[..., 3:]
    nr = jnp.sqrt(jnp.maximum(jnp.sum(rho * rho, -1, keepdims=True), 1e-24))
    np_ = jnp.sqrt(jnp.maximum(jnp.sum(phi * phi, -1, keepdims=True), 1e-24))
    rho = rho * jnp.minimum(1.0, max_trans / nr)
    phi = phi * jnp.minimum(1.0, max_rot / np_)
    return jnp.concatenate([rho, phi], axis=-1)


# ---------------------------------------------------------------------------
# Sim(3) — used by loop closing (pose-graph optimization and Sim3 fitting),
# reference: src/PLPSLAM/optimize/g2o/sim3/shot_vertex.h, graph_optimizer.cc.
# Represented as (R, t, s) with action x -> s * R @ x + t.
# ---------------------------------------------------------------------------


def sim3_exp(xi):
    """sim(3) exp: ``[..., 7] ([rho, phi, sigma]) -> (R, t, s)``.

    Uses the closed-form W matrix (Ethan Eade's notes on Lie groups).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    theta = jnp.sqrt(jnp.maximum(jnp.sum(phi * phi, axis=-1), 1e-24))
    K = hat(phi)
    K2 = K @ K

    # W = A I + B K + C K2 (Eade, "Lie Groups for 2D and 3D transformations").
    eps = 1e-5
    sig_small = jnp.abs(sigma) < eps
    th_small = theta < eps
    safe_sig = jnp.where(sig_small, 1.0, sigma)
    safe_th = jnp.where(th_small, 1.0, theta)
    th2 = safe_th * safe_th

    A_generic = (s - 1.0) / safe_sig
    A = jnp.where(sig_small, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, A_generic)

    # B = (sigma*(s*sin - ...) ... use standard expansion:
    # With a = s*sin(theta), b = s*cos(theta), c = theta^2 + sigma^2:
    a = s * jnp.sin(safe_th)
    b = s * jnp.cos(safe_th)
    c = th2 + safe_sig * safe_sig
    B_generic = (a * safe_sig + (1.0 - b) * safe_th) / (safe_th * c)
    C_generic = (A_generic - ((b - 1.0) * safe_sig + a * safe_th) / c) / th2

    # Fallbacks: sigma->0: B -> (1-cos)/th^2, C -> (th - sin)/th^3.
    B_sig0 = _cosc(theta)
    C_sig0 = _sincc(theta)
    # theta->0 (sigma generic): B -> (s*sigma - s + 1... ) standard limits:
    B_th0 = ((safe_sig - 1.0) * s + 1.0) / (safe_sig * safe_sig)
    C_th0 = (s * (0.5 * safe_sig * safe_sig - safe_sig + 1.0) - 1.0) / (
        safe_sig * safe_sig * safe_sig
    )
    B = jnp.where(sig_small, B_sig0, jnp.where(th_small, B_th0, B_generic))
    C = jnp.where(
        sig_small, C_sig0, jnp.where(th_small, C_th0, C_generic)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    W = A[..., None, None] * eye + B[..., None, None] * K + C[..., None, None] * K2
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return R, t, s


def sim3_compose(Ra, ta, sa, Rb, tb, sb):
    """(Ra,ta,sa) ∘ (Rb,tb,sb): x -> sa*Ra(sb*Rb x + tb) + ta."""
    R = Ra @ Rb
    s = sa * sb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t, s


def sim3_inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    return Rt, t_inv, s_inv


def sim3_apply(R, t, s, points):
    return s[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, points) + t[
        ..., None, :
    ]


def sim3_log(R, t, s):
    """sim(3) log: inverse of :func:`sim3_exp` (solves W rho = t)."""
    phi = so3_log(R)
    sigma = jnp.log(s)
    # Rebuild W directly from (phi, sigma) with the same coefficients as
    # sim3_exp.
    theta = jnp.sqrt(jnp.maximum(jnp.sum(phi * phi, axis=-1), 1e-24))
    K = hat(phi)
    K2 = K @ K
    eps = 1e-5
    sig_small = jnp.abs(sigma) < eps
    th_small = theta < eps
    safe_sig = jnp.where(sig_small, 1.0, sigma)
    safe_th = jnp.where(th_small, 1.0, theta)
    th2 = safe_th * safe_th
    A_generic = (s - 1.0) / safe_sig
    A = jnp.where(sig_small, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, A_generic)
    a = s * jnp.sin(safe_th)
    b = s * jnp.cos(safe_th)
    c = th2 + safe_sig * safe_sig
    B_generic = (a * safe_sig + (1.0 - b) * safe_th) / (safe_th * c)
    C_generic = (A_generic - ((b - 1.0) * safe_sig + a * safe_th) / c) / th2
    B_sig0 = _cosc(theta)
    C_sig0 = _sincc(theta)
    B_th0 = ((safe_sig - 1.0) * s + 1.0) / (safe_sig * safe_sig)
    C_th0 = (s * (0.5 * safe_sig * safe_sig - safe_sig + 1.0) - 1.0) / (
        safe_sig * safe_sig * safe_sig
    )
    B = jnp.where(sig_small, B_sig0, jnp.where(th_small, B_th0, B_generic))
    C = jnp.where(sig_small, C_sig0, jnp.where(th_small, C_th0, C_generic))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), K.shape)
    W = A[..., None, None] * eye + B[..., None, None] * K + C[..., None, None] * K2
    rho = _linalg.solve3(W, t)  # see se3_log: adjugate beats batched LU
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (wxyz) — for trajectory IO and map snapshots.
# ---------------------------------------------------------------------------


def quat_from_rotmat(R):
    """``[..., 3, 3] -> [..., 4]`` (wxyz), branch-free Shepperd's method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (up to scale), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    case = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(case), 4(wxyz)]
    q = jnp.take_along_axis(cands, case[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign (w >= 0).
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def rotmat_from_quat(q):
    """``[..., 4] (wxyz) -> [..., 3, 3]``."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
