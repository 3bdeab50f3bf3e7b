"""Large-K pose-graph machinery: block-cyclic-reduction tridiagonal solve
and the matrix-free PCG Sim3 pose graph (reference: graph_optimizer.cc's
sparse CSparse solve — here the scalable path past the dense [7K, 7K]
ceiling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structure_plp_slam_tpu.models import pose_graph as pg
from structure_plp_slam_tpu.ops import lie


def _random_block_tridiag(rng, n, d):
    """Random SPD block-tridiagonal system (diagonally dominant)."""
    A = np.zeros((n, d, d), np.float32)   # couples (i, i-1)
    C = np.zeros((n, d, d), np.float32)   # couples (i, i+1)
    B = np.zeros((n, d, d), np.float32)
    for i in range(n - 1):
        M = rng.normal(size=(d, d)).astype(np.float32) * 0.3
        C[i] = M
        A[i + 1] = M.T
    for i in range(n):
        B[i] = np.eye(d, dtype=np.float32) * (d + 2.0) + \
            rng.normal(size=(d, d)).astype(np.float32) * 0.1
        B[i] = (B[i] + B[i].T) / 2
    return B, A, C


def test_bcr_matches_dense_solve():
    rng = np.random.default_rng(3)
    n, d = 16, 7
    B, A, C = _random_block_tridiag(rng, n, d)
    b = rng.normal(size=(n, d)).astype(np.float32)

    # Dense assembly.
    T = np.zeros((n * d, n * d), np.float32)
    for i in range(n):
        T[i * d:(i + 1) * d, i * d:(i + 1) * d] = B[i]
        if i + 1 < n:
            T[i * d:(i + 1) * d, (i + 1) * d:(i + 2) * d] = C[i]
            T[(i + 1) * d:(i + 2) * d, i * d:(i + 1) * d] = A[i + 1]
    x_dense = np.linalg.solve(T, b.reshape(-1)).reshape(n, d)

    factor = pg._bcr_factor(jnp.asarray(B), jnp.asarray(A), jnp.asarray(C))
    x_bcr = np.asarray(pg._bcr_apply(factor, jnp.asarray(b)))
    assert np.allclose(x_bcr, x_dense, atol=1e-3, rtol=1e-3)


def _circle_problem(K=32, n_loop=2, noise=0.05, seed=0):
    """Sim3 pose-graph on a circle trajectory with loop closures: initial
    estimates are drift-perturbed, measurements are exact."""
    rng = np.random.default_rng(seed)
    theta = np.linspace(0, 2 * np.pi, K, endpoint=False)
    R_gt = np.zeros((K, 3, 3), np.float32)
    t_gt = np.zeros((K, 3), np.float32)
    for k in range(K):
        c, s = np.cos(theta[k]), np.sin(theta[k])
        Rwc = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        C = np.array([5 * c, 5 * s, 0], np.float32)
        R_gt[k] = Rwc.T
        t_gt[k] = -Rwc.T @ C

    # Perturb all but the anchor.
    R0 = R_gt.copy()
    t0 = t_gt.copy()
    for k in range(1, K):
        ax = rng.normal(size=3) * noise * (k / K)
        dR = np.asarray(jax.device_get(lie.so3_exp(jnp.asarray(
            ax, jnp.float32)[None]))[0])
        R0[k] = dR @ R_gt[k]
        t0[k] = t_gt[k] + rng.normal(size=3).astype(np.float32) * noise * 5 * (k / K)

    def rel(i, j):
        R_ij = R_gt[j] @ R_gt[i].T
        t_ij = t_gt[j] - R_ij @ t_gt[i]
        return R_ij, t_ij

    ei = list(range(K - 1)) + [K - 1] + [int(k) for k in
                                         rng.integers(0, K // 2, n_loop)]
    ej = list(range(1, K)) + [0] + [int(k) for k in
                                    rng.integers(K // 2, K, n_loop)]
    E = len(ei)
    eR = np.zeros((E, 3, 3), np.float32)
    et = np.zeros((E, 3), np.float32)
    for e, (i, j) in enumerate(zip(ei, ej)):
        eR[e], et[e] = rel(i, j)

    prob = pg.PoseGraphProblem(
        R=jnp.asarray(R0), t=jnp.asarray(t0), s=jnp.ones((K,), jnp.float32),
        fixed=jnp.asarray(np.arange(K) == 0),
        valid=jnp.ones((K,), bool),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        edge_R=jnp.asarray(eR), edge_t=jnp.asarray(et),
        edge_s=jnp.ones((E,), jnp.float32),
        edge_valid=jnp.ones((E,), bool),
        edge_weight=jnp.ones((E,), jnp.float32),
    )
    return prob, R_gt, t_gt


def test_pcg_pose_graph_matches_dense():
    K = 32
    prob, R_gt, t_gt = _circle_problem(K=K)
    raw_of_comp = jnp.arange(K, dtype=jnp.int32)
    chain_pos = jnp.asarray(
        [c if c < K - 1 else -1 for c in range(prob.edge_i.shape[0])],
        jnp.int32,
    )
    # Chain edges are the first K-1 by construction in _circle_problem.
    chain_pos = jnp.asarray(
        np.r_[np.arange(K - 1), -np.ones(prob.edge_i.shape[0] - (K - 1))],
        jnp.int32,
    )
    Rd, td, sd, chi2_d = pg.optimize_pose_graph(prob)
    Rp, tp, sp, chi2_p = pg.optimize_pose_graph_pcg(
        prob, raw_of_comp, chain_pos
    )
    # Both must recover the ground truth (exact measurements).
    err_d = np.max(np.linalg.norm(np.asarray(td) - t_gt, axis=-1))
    err_p = np.max(np.linalg.norm(np.asarray(tp) - t_gt, axis=-1))
    assert err_d < 1e-2
    assert err_p < 1e-2
    assert np.allclose(np.asarray(sp), 1.0, atol=1e-3)


@pytest.mark.slow
def test_pcg_pose_graph_large_k():
    """1024-keyframe circle: the dense [7K, 7K] path would materialize a
    7168^2 Cholesky; the PCG path must converge with O(K + E) memory."""
    K = 1024
    prob, R_gt, t_gt = _circle_problem(K=K, n_loop=4, noise=0.02)
    raw_of_comp = jnp.arange(K, dtype=jnp.int32)
    E = prob.edge_i.shape[0]
    chain_pos = jnp.asarray(
        np.r_[np.arange(K - 1), -np.ones(E - (K - 1))], jnp.int32
    )
    Rp, tp, sp, chi2 = pg.optimize_pose_graph_pcg(
        prob, raw_of_comp, chain_pos, num_iters=20, cg_iters=30
    )
    err = np.max(np.linalg.norm(np.asarray(tp) - t_gt, axis=-1))
    assert err < 5e-2, f"max translation error {err}"
