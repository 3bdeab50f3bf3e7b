"""Batched-hypothesis RANSAC solvers: essential, fundamental, homography.

TPU-native replacement for the reference's iterative RANSAC solvers
(src/PLPSLAM/solve/essential_solver.cc, fundamental_solver.cc,
homography_solver.cc and the GC-RANSAC variants): instead of a sequential
hypothesize-verify loop with early exit, ALL hypotheses are generated and
scored at once —

  sample S minimal sets -> batched SVD model fit [S, ...] ->
  score all S x N residuals in one pass -> argmax inliers.

S = 256 hypotheses covers the reference's max-iteration budgets; scoring
uses the same truncated chi-square (MSAC) scheme the reference uses
(essential_solver.cc check_inliers).

Pose recovery from E (4 candidates) and H (8 Faugeras motions) is also
batched: every candidate pose triangulates every correspondence and the
candidate with the most cheirality+parallax-consistent points wins
(reference: initialize/perspective.cc reconstruct_with_*, initialize/base.cc
check_pose).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import linalg as _linalg

from structure_plp_slam_tpu.ops import triangulation


def sample_minimal_sets(key, num_sets: int, set_size: int, num_points: int, valid):
    """``[S, k]`` random indices drawn from valid points (with replacement
    across sets; collisions within a set are tolerable at these densities —
    a degenerate sample simply scores 0 inliers)."""
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    return jax.random.choice(
        key, num_points, shape=(num_sets, set_size), replace=True, p=p
    )


# ---------------------------------------------------------------------------
# Essential matrix (8-point) on bearing vectors.
# ---------------------------------------------------------------------------


def essential_8pt(b1, b2):
    """Batched 8-point algorithm. ``b1, b2: [S, 8, 3]`` -> E ``[S, 3, 3]``
    with rank-2 projection."""
    # Constraint rows: b2^T E b1 = 0 -> row[3i+j] = b2_i * b1_j so that
    # dot(row, vec(E)) = sum_ij E_ij b2_i b1_j.
    A = jnp.einsum("ski,skj->skij", b2, b1).reshape(*b1.shape[:-2], 8, 9)
    # Null vector of A via SVD.
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    e = Vt[..., -1, :]
    E = e.reshape(*e.shape[:-1], 3, 3)
    # Project to essential manifold: singular values (s, s, 0).
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[..., 0] + S[..., 1]) * 0.5
    S_new = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    return U @ (S_new[..., :, None] * Vt2)


def epipolar_error_angular(E, b1, b2):
    """Squared angular epipolar residual per correspondence ``[..., N]``.

    Uses the sine of the angle between b2 and the epipolar plane normal
    E b1 (symmetric form), matching the reference's bearing-based check
    (essential_solver.cc check_inliers).
    """
    Eb1 = jnp.einsum("...ij,...nj->...ni", E, b1)
    Etb2 = jnp.einsum("...ji,...nj->...ni", E, b2)
    num = jnp.einsum("...ni,...ni->...n", b2, Eb1)
    d1 = jnp.maximum(jnp.sum(Eb1 * Eb1, axis=-1), 1e-12)
    d2 = jnp.maximum(jnp.sum(Etb2 * Etb2, axis=-1), 1e-12)
    return num * num * (1.0 / d1 + 1.0 / d2)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def essential_ransac(b1, b2, valid, key, *, num_hypotheses: int = 256,
                     inlier_thr: float = 1e-6):
    """MSAC over batched 8-point hypotheses.

    ``b1, b2: [N, 3]`` bearings. Returns (E [3,3], inlier_mask [N],
    score f32). ``inlier_thr`` is the squared angular residual bound
    (1e-6 ~= 0.06 deg, comparable to 1 px at 500 px focal length).
    """
    N = b1.shape[0]
    idx = sample_minimal_sets(key, num_hypotheses, 8, N, valid)
    E = essential_8pt(b1[idx], b2[idx])  # [S, 3, 3]
    err = epipolar_error_angular(E, b1[None], b2[None])  # [S, N]
    err = jnp.where(valid[None, :], err, jnp.inf)
    # MSAC score: sum of (thr - min(err, thr)).
    score = jnp.sum(jnp.maximum(inlier_thr - err, 0.0), axis=-1)
    best = jnp.argmax(score)
    E_best = E[best]
    inliers = (err[best] <= inlier_thr) & valid
    return E_best, inliers, score[best]


def _match_knn_graph(uv, valid, k: int):
    """k-NN graph over frame-1 keypoint IMAGE positions (the spatial
    neighborhood GC-RANSAC's smoothness term uses)."""
    N = uv.shape[0]
    d2 = jnp.sum((uv[:, None, :] - uv[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(valid[None, :] & valid[:, None], d2, jnp.inf)
    d2 = d2 + jnp.where(jnp.eye(N, dtype=bool), jnp.inf, 0.0)
    neg, nbr = jax.lax.top_k(-d2, k)
    return nbr, jnp.isfinite(-neg)


def _weighted_nullvec9(A, w):
    """Smallest eigenvector of A^T diag(w) A for [N, 9] design rows —
    the weighted DLT/8-point refit (9x9 eigh; tiny)."""
    M = jnp.einsum("ni,nj->ij", A * w[:, None], A)
    _, V = jnp.linalg.eigh(M)
    return V[:, 0]


def essential_ransac_coherent(b1, b2, uv1, valid, key, *,
                              inlier_thr: float = 1e-6,
                              num_hypotheses: int = 256,
                              num_neighbors: int = 8,
                              num_sweeps: int = 4,
                              smoothness: float = 2.0):
    """Spatially-coherent essential-matrix consensus: MSAC seed +
    mean-field inlier-label smoothing over the match k-NN graph,
    alternating with a weighted 8-point refit.

    The reference runs GC-RANSAC for BOTH mono-init model races
    (initialize/perspective.cc:70-85, solve/GCRANSAC) — the same
    E = data + w * sum_{i~j}[x_i != x_j] energy the plane path
    re-expresses with mean-field sweeps (ops/plane_fit.
    plane_ransac_coherent); this is that consensus applied to E.
    Coherence recruits threshold-boundary matches surrounded by inliers
    (low-parallax inits) and expels isolated residual-lucky matches
    (repetitive texture)."""
    E0, inl0, _ = essential_ransac(
        b1, b2, valid, key, num_hypotheses=num_hypotheses,
        inlier_thr=inlier_thr,
    )
    nbr, nbr_ok = _match_knn_graph(uv1, valid, num_neighbors)
    tau = 0.5 * inlier_thr
    A = jnp.einsum("ni,nj->nij", b2, b1).reshape(-1, 9)

    def sweep(carry, _):
        E, x = carry
        err = epipolar_error_angular(E, b1, b2)
        unary = (inlier_thr - err) / tau
        field = jnp.sum(
            jnp.where(nbr_ok, 2.0 * x[nbr] - 1.0, 0.0), axis=1
        ) / jnp.maximum(jnp.sum(nbr_ok, axis=1), 1)
        x = jax.nn.sigmoid(unary + smoothness * field)
        x = jnp.where(valid, x, 0.0)
        e = _weighted_nullvec9(A, x)
        E2 = e.reshape(3, 3)
        U, S, Vt2 = jnp.linalg.svd(E2)
        sm = (S[0] + S[1]) * 0.5
        E2 = U @ (jnp.stack([sm, sm, 0.0 * sm])[:, None] * Vt2)
        return (E2, x), None

    (E, x), _ = jax.lax.scan(
        sweep, (E0, inl0.astype(jnp.float32)), None, length=num_sweeps
    )
    err = epipolar_error_angular(E, b1, b2)
    inl = (x > 0.5) & (err <= 2.0 * inlier_thr) & valid
    score = jnp.sum(jnp.maximum(inlier_thr - jnp.where(valid, err, jnp.inf),
                                0.0))
    return E, inl, score


def homography_ransac_coherent(p1, p2, valid, key, *,
                               inlier_thr: float = 11.98,
                               num_hypotheses: int = 256,
                               num_neighbors: int = 8,
                               num_sweeps: int = 4,
                               smoothness: float = 2.0):
    """Spatially-coherent homography consensus (see
    :func:`essential_ransac_coherent`); weighted-DLT refit."""
    H0, inl0, _ = homography_ransac(
        p1, p2, valid, key, num_hypotheses=num_hypotheses,
        inlier_thr=inlier_thr,
    )
    nbr, nbr_ok = _match_knn_graph(p1, valid, num_neighbors)
    tau = 0.5 * inlier_thr

    def rows(p, q):
        x, y = p[:, 0], p[:, 1]
        u, v = q[:, 0], q[:, 1]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], -1)
        r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], -1)
        return jnp.concatenate([r1, r2], axis=0)

    T1s = _normalize_pts(p1)
    T2s = _normalize_pts(p2)
    p1n, T1 = T1s
    p2n, T2 = T2s
    A = rows(p1n, p2n)

    def sweep(carry, _):
        H, x = carry
        err = homography_transfer_error(H, p1, p2)
        unary = (inlier_thr - err) / tau
        field = jnp.sum(
            jnp.where(nbr_ok, 2.0 * x[nbr] - 1.0, 0.0), axis=1
        ) / jnp.maximum(jnp.sum(nbr_ok, axis=1), 1)
        x = jax.nn.sigmoid(unary + smoothness * field)
        x = jnp.where(valid, x, 0.0)
        h = _weighted_nullvec9(A, jnp.concatenate([x, x]))
        Hn = h.reshape(3, 3)
        H2 = _linalg.inv3x3(T2) @ Hn @ T1
        H2 = H2 / jnp.where(
            jnp.abs(H2[2:3, 2:3]) < 1e-12, 1e-12, H2[2:3, 2:3]
        )
        return (H2, x), None

    (H, x), _ = jax.lax.scan(
        sweep, (H0, inl0.astype(jnp.float32)), None, length=num_sweeps
    )
    err = homography_transfer_error(H, p1, p2)
    inl = (x > 0.5) & (err <= 2.0 * inlier_thr) & valid
    score = jnp.sum(jnp.maximum(inlier_thr - jnp.where(valid, err, jnp.inf),
                                0.0))
    return H, inl, score


def decompose_essential(E):
    """E -> 4 candidate poses (R ``[4,3,3]``, t ``[4,3]`` unit norm)."""
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2], axis=0)
    ts = jnp.stack([t, -t, t, -t], axis=0)
    return Rs, ts


# ---------------------------------------------------------------------------
# Homography (4-point DLT) on undistorted pixel coordinates.
# ---------------------------------------------------------------------------


def _normalize_pts(pts):
    """Hartley normalization. ``[..., N, 2]`` -> (normed, T [...,3,3])."""
    mean = jnp.mean(pts, axis=-2, keepdims=True)
    d = jnp.mean(jnp.linalg.norm(pts - mean, axis=-1), axis=-1)
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
    normed = (pts - mean) * s[..., None, None]
    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, zeros, -s * mean[..., 0, 0]], -1),
            jnp.stack([zeros, s, -s * mean[..., 0, 1]], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    return normed, T


def homography_4pt(p1, p2):
    """Batched DLT homography. ``p1, p2: [S, 4, 2]`` -> H ``[S, 3, 3]``
    with H p1 ~ p2."""
    n1, T1 = _normalize_pts(p1)
    n2, T2 = _normalize_pts(p2)
    x, y = n1[..., 0], n1[..., 1]
    u, v = n2[..., 0], n2[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], -1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [S, 8, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Hn = Vt[..., -1, :].reshape(*p1.shape[:-2], 3, 3)
    T2_inv = _linalg.inv3x3(T2)  # adjugate: batched LU is latency-bound
    H = T2_inv @ Hn @ T1
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-12, 1e-12, H[..., 2:3, 2:3])


def homography_transfer_error(H, p1, p2):
    """Symmetric transfer error (squared px) ``[..., N]``."""

    def fwd(H, p, q):
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1)
        Hp = jnp.einsum("...ij,...nj->...ni", H, ph)
        w = jnp.where(jnp.abs(Hp[..., 2:3]) < 1e-9, 1e-9, Hp[..., 2:3])
        return jnp.sum((Hp[..., :2] / w - q) ** 2, axis=-1)

    H_inv = _linalg.inv3x3(H)
    return fwd(H, p1, p2) + fwd(H_inv, p2, p1)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def homography_ransac(p1, p2, valid, key, *, num_hypotheses: int = 256,
                      inlier_thr: float = 11.98):
    """MSAC over batched 4-point homographies on pixel coordinates.

    ``inlier_thr`` = 2 * 5.99 (symmetric sum of two chi2-gated transfer
    errors at sigma=1, matching the reference's scoring).
    Returns (H [3,3], inliers [N], score).
    """
    N = p1.shape[0]
    idx = sample_minimal_sets(key, num_hypotheses, 4, N, valid)
    H = homography_4pt(p1[idx], p2[idx])
    err = homography_transfer_error(H, p1[None], p2[None])
    err = jnp.where(valid[None, :], err, jnp.inf)
    score = jnp.sum(jnp.maximum(inlier_thr - err, 0.0), axis=-1)
    best = jnp.argmax(score)
    return H[best], (err[best] <= inlier_thr) & valid, score[best]


def decompose_homography(H, K):
    """H (pixel frame) -> 8 candidate (R, t) motions, Faugeras SVD method.

    Reference: initialize/perspective.cc reconstruct_with_H relies on the
    equivalent ORB-SLAM decomposition. Returns (R [8,3,3], t [8,3]).
    Scale of t is arbitrary (normalized); plane normal candidates are not
    returned (cheirality selection does not need them).
    """
    K_inv = _linalg.inv3x3(K)
    A = K_inv @ H @ K
    U, S, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = S[0], S[1], S[2]
    safe = lambda x: jnp.where(jnp.abs(x) < 1e-12, 1e-12, x)

    # Faugeras SVD decomposition (Faugeras & Lustman 1988; standard 8-motion
    # enumeration). x1/x3 magnitudes:
    denom13 = safe(d1 * d1 - d3 * d3)
    x1m = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom13, 0.0, None))
    x3m = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom13, 0.0, None))

    # Case d' = +d2: rotation about y by theta.
    aux_st = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)
    ) / safe((d1 + d3) * d2)
    ct = (d2 * d2 + d1 * d3) / safe((d1 + d3) * d2)
    # Case d' = -d2: rotation by phi with reflection.
    aux_sp = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)
    ) / safe((d1 - d3) * d2)
    cp = (d1 * d3 - d2 * d2) / safe((d1 - d3) * d2)

    zero = jnp.zeros(())
    one = jnp.ones(())
    Rs, ts = [], []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            st = e1 * e3 * aux_st
            Rp = jnp.stack(
                [
                    jnp.stack([ct, zero, -st]),
                    jnp.stack([zero, one, zero]),
                    jnp.stack([st, zero, ct]),
                ]
            )
            tp = (d1 - d3) * jnp.stack([e1 * x1m, zero, -e3 * x3m])
            Rs.append(s * U @ Rp @ Vt)
            ts.append(U @ tp)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            sp = e1 * e3 * aux_sp
            Rp = jnp.stack(
                [
                    jnp.stack([cp, zero, sp]),
                    jnp.stack([zero, -one, zero]),
                    jnp.stack([sp, zero, -cp]),
                ]
            )
            tp = (d1 + d3) * jnp.stack([e1 * x1m, zero, e3 * x3m])
            Rs.append(s * U @ Rp @ Vt)
            ts.append(U @ tp)
    Rs = jnp.stack(Rs, axis=0)
    ts = jnp.stack(ts, axis=0)
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts


# ---------------------------------------------------------------------------
# Pose selection by cheirality (batched over candidates).
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("min_parallax_deg", "spherical", "reproj_cos")
)
def select_pose_by_cheirality(Rs, ts, b1, b2, valid, *,
                              min_parallax_deg: float = 1.0,
                              spherical: bool = False,
                              reproj_cos: float = 0.9998):
    """Pick the (R, t) candidate maximizing valid triangulations.

    ``Rs [C,3,3], ts [C,3]``: candidate poses of cam2 wrt cam1 (x2 = R x1 + t).
    ``b1, b2 [N, 3]`` bearings; ``valid [N]``.
    Returns (R, t, points_c1 [N,3], good_mask [N], num_good).

    ``min_parallax_deg`` gates per-point ray parallax (reference:
    initialize/base.cc check_pose parallax_deg_thr = 1.0) — two-view
    initialization MUST refuse low-parallax geometry or the map is born
    with unusable depths.

    ``spherical``: full-sphere bearings (equirectangular) — points behind
    the camera are observable, so the z > 0 cheirality gate is replaced by
    along-the-ray positivity, which the direction-cosine check enforces
    (reference: initialize/bearing_vector.cc relies on the same ray-side
    disambiguation).
    """
    import math

    max_cos = math.cos(math.radians(min_parallax_deg))
    C = Rs.shape[0]

    def tri(R, t):
        pts = triangulation.triangulate_dlt(b1, b2, R, t)
        pts_c2 = pts @ R.T + t
        if spherical:
            depth_ok = (jnp.sum(pts * b1, axis=-1) > 1e-6) & (
                jnp.sum(pts_c2 * b2, axis=-1) > 1e-6
            )
        else:
            depth_ok = (pts[:, 2] > 1e-6) & (pts_c2[:, 2] > 1e-6)

        def dircos(p, b):
            d = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
            return jnp.sum(d * b, axis=-1)

        # reproj_cos ~ cos(5 px / focal): ray-direction agreement gate
        # (caller scales it by the camera's angular pixel pitch).
        reproj_ok = (dircos(pts, b1) > reproj_cos) & (
            dircos(pts_c2, b2) > reproj_cos
        )
        par = jnp.sum((b1 @ R.T) * b2, axis=-1)
        parallax_ok = par < max_cos
        good = depth_ok & reproj_ok & parallax_ok & valid
        return pts, good

    pts_all, good_all = jax.vmap(tri)(Rs, ts)  # [C, N, 3], [C, N]
    counts = jnp.sum(good_all, axis=-1)
    best = jnp.argmax(counts)
    return (
        Rs[best],
        ts[best],
        pts_all[best],
        good_all[best],
        counts[best],
    )
