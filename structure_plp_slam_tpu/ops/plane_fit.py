"""Plane fitting: weighted SVD fit + batched-hypothesis RANSAC.

TPU-native replacement for the reference's plane machinery
(src/PLPSLAM/planar_mapping_module.cc:412-591 sequential RANSAC,
:735-771 estimate_plane_SVD, and the vendored Graph-Cut RANSAC
solve/GCRANSAC/** used at :1006-1156). On GC-RANSAC: its spatial-coherence
term exists to clean up inlier selection on CPU-sized sample budgets; with
hundreds of simultaneous hypotheses + an SVD refit on the consensus set,
batched MSAC reaches the same fits on these problems — the graph-cut
energy minimization is deliberately not ported (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops.ransac import sample_minimal_sets


def fit_plane_svd(points, weights):
    """Weighted total-least-squares plane through ``points [N, 3]``.

    Returns (n [3] unit, d) with n.x + d = 0 for points on the plane.
    """
    w = jnp.maximum(weights, 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu = jnp.sum(points * w[:, None], axis=0) / wsum
    X = (points - mu) * jnp.sqrt(w)[:, None]
    cov = X.T @ X
    eigval, eigvec = jnp.linalg.eigh(cov)
    n = eigvec[:, 0]  # smallest eigenvalue -> normal
    d = -jnp.dot(n, mu)
    return n, d


def point_plane_distance(coef, points):
    """|n.x + d| for coef ``[..., 4]`` and points ``[..., N, 3]``."""
    return jnp.abs(
        jnp.einsum("...i,...ni->...n", coef[..., :3], points) + coef[..., 3:4]
    )


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def plane_ransac(points, valid, key, *, inlier_thr: float,
                 num_hypotheses: int = 128):
    """Batched 3-point plane RANSAC + SVD consensus refit.

    Returns (coef [4], inliers [N], num_inliers).
    """
    N = points.shape[0]
    idx = sample_minimal_sets(key, num_hypotheses, 3, N, valid)
    p = points[idx]  # [S, 3, 3]
    n = jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    d = -jnp.einsum("si,si->s", n, p[:, 0])
    coef = jnp.concatenate([n, d[:, None]], axis=-1)  # [S, 4]

    dist = point_plane_distance(coef, points[None])  # [S, N]
    ok = (dist <= inlier_thr) & valid[None]
    # Degenerate samples (collinear) produce |n| ~ 0 -> score 0.
    score = jnp.where(norm[:, 0] > 1e-9, jnp.sum(ok, axis=-1), 0)
    best = jnp.argmax(score)
    inl0 = ok[best]

    # SVD refit on the consensus set, then re-gate (one reweighted round).
    n1, d1 = fit_plane_svd(points, inl0.astype(jnp.float32))
    coef1 = jnp.concatenate([n1, jnp.array([d1])])
    dist1 = point_plane_distance(coef1[None], points[None])[0]
    inl1 = (dist1 <= inlier_thr) & valid
    n2, d2 = fit_plane_svd(points, inl1.astype(jnp.float32))
    coef2 = jnp.concatenate([n2, jnp.array([d2])])
    dist2 = point_plane_distance(coef2[None], points[None])[0]
    inl2 = (dist2 <= inlier_thr) & valid
    return coef2, inl2, jnp.sum(inl2)


def knn_graph(points, valid, num_neighbors: int = 8):
    """k-NN graph among valid points (3D Euclidean).

    Returns (nbr [N, K] i32, nbr_ok [N, K] bool). Shared across callers:
    detect_planes builds it ONCE over a keyframe's candidate landmarks and
    reuses it for every mask instance (the points are identical; only the
    per-instance validity differs), instead of paying the N^2 distance
    matrix per instance."""
    N = points.shape[0]
    d2m = jnp.sum((points[:, None] - points[None]) ** 2, axis=-1)
    big = jnp.float32(1e30)
    d2m = jnp.where(valid[None] & valid[:, None], d2m, big)
    d2m = d2m + jnp.eye(N) * big  # no self-edges
    _, nbr = jax.lax.top_k(-d2m, num_neighbors)  # [N, K]
    nbr_ok = jnp.take_along_axis(d2m, nbr, axis=1) < big
    return nbr, nbr_ok


@functools.partial(
    jax.jit,
    static_argnames=("num_hypotheses", "num_neighbors", "num_sweeps"),
)
def plane_ransac_coherent(points, valid, key, graph=None, *,
                          inlier_thr: float,
                          num_hypotheses: int = 128, num_neighbors: int = 8,
                          num_sweeps: int = 4, smoothness: float = 2.0):
    """Spatially-coherent plane consensus: batched MSAC seed + mean-field
    label smoothing over the k-NN graph.

    The reference's GC-RANSAC (solve/GCRANSAC/GCRANSAC.h:50, used for
    planes at planar_mapping_module.cc:1006-1156) minimizes
    E = sum_i data(i) + w * sum_{i~j} [label_i != label_j] with an s-t
    min-cut per local-optimization step — inherently sequential. This is
    the TPU re-expression of the same energy: soft inlier labels
    x in [0,1] relaxed by fixed-iteration mean-field sweeps
    (sigmoid(unary + smoothness * neighbor-mean field)), alternating with
    a weighted SVD refit — every sweep is dense batched linear algebra.
    Spatial coherence does what the graph cut does: points surrounded by
    inliers are pulled in across the threshold boundary, isolated
    residual-lucky points are pushed out.

    ``graph``: optional precomputed ``knn_graph`` (nbr, nbr_ok) over a
    SUPERSET of ``valid``; per-call validity is applied to the stored
    edges. Built internally when absent.

    Returns (coef [4], inliers [N], num_inliers) like ``plane_ransac``.
    """
    coef0, inl0, _ = plane_ransac(
        points, valid, key, inlier_thr=inlier_thr,
        num_hypotheses=num_hypotheses,
    )

    if graph is None:
        nbr, nbr_ok = knn_graph(points, valid, num_neighbors)
    else:
        nbr, nbr_ok = graph
        nbr_ok = nbr_ok & valid[nbr]

    tau = 0.5 * inlier_thr

    def sweep(carry, _):
        coef, x = carry
        dist = point_plane_distance(coef[None], points[None])[0]
        unary = (inlier_thr - dist) / tau
        field = jnp.sum(
            jnp.where(nbr_ok, 2.0 * x[nbr] - 1.0, 0.0), axis=1
        ) / jnp.maximum(jnp.sum(nbr_ok, axis=1), 1)
        x = jax.nn.sigmoid(unary + smoothness * field)
        x = jnp.where(valid, x, 0.0)
        n, d = fit_plane_svd(points, x)
        return (jnp.concatenate([n, jnp.array([d])]), x), None

    (coef, x), _ = jax.lax.scan(
        sweep, (coef0, inl0.astype(jnp.float32)), None, length=num_sweeps
    )
    dist = point_plane_distance(coef[None], points[None])[0]
    # Accept by smoothed label, with a hard residual cap so coherence can
    # recruit boundary points (<= 2*thr) but never gross outliers.
    inl = (x > 0.5) & (dist <= 2.0 * inlier_thr) & valid
    return coef, inl, jnp.sum(inl)
