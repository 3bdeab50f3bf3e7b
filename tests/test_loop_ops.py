"""Tests for loop-closing building blocks: Sim3 RANSAC, PnP, pose graph,
retrieval index."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.data.bow import BowIndex
from structure_plp_slam_tpu.models import pose_graph as pg
from structure_plp_slam_tpu.ops import lie, pnp, sim3_solver
from tests.helpers import create_random_landmarks, make_camera, random_rotation


def test_umeyama_exact(rng):
    P = create_random_landmarks(rng, 30).astype(np.float32)
    R_gt = random_rotation(rng).astype(np.float32)
    s_gt = 1.7
    t_gt = np.array([0.3, -1.0, 0.5], np.float32)
    Q = s_gt * P @ R_gt.T + t_gt
    R, t, s = sim3_solver.umeyama_alignment(jnp.asarray(P[None]), jnp.asarray(Q[None]))
    np.testing.assert_allclose(np.asarray(R)[0], R_gt, atol=1e-4)
    np.testing.assert_allclose(float(s[0]), s_gt, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t)[0], t_gt, atol=1e-3)


def test_sim3_ransac_with_outliers(rng):
    cam = make_camera()
    n = 150
    pts1 = create_random_landmarks(rng, n).astype(np.float32)
    R_gt = np.asarray(
        lie.so3_exp(jnp.asarray((rng.normal(size=3) * 0.1)[None], jnp.float32))
    )[0]
    s_gt, t_gt = 1.25, np.array([0.4, -0.2, 0.6])
    pts2 = (s_gt * pts1 @ R_gt.T + t_gt).astype(np.float32)
    # Observations = projections of each point set in its own camera.
    def proj(p):
        return np.stack(
            [cam.fx * p[:, 0] / p[:, 2] + cam.cx, cam.fy * p[:, 1] / p[:, 2] + cam.cy],
            axis=1,
        ).astype(np.float32)

    uv1, uv2 = proj(pts1), proj(pts2)
    out = rng.choice(n, 30, replace=False)
    pts2_n = pts2.copy()
    pts2_n[out] += rng.normal(scale=2.0, size=(30, 3))
    R, t, s, inl, cnt = sim3_solver.sim3_ransac(
        cam,
        jnp.asarray(pts1),
        jnp.asarray(pts2_n),
        jnp.asarray(uv1),
        jnp.asarray(uv2),
        jnp.ones((n,), jnp.float32),
        jnp.ones((n,), jnp.float32),
        jnp.ones((n,), bool),
        jax.random.PRNGKey(0),
    )
    assert int(cnt) > 100
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=5e-3)
    np.testing.assert_allclose(float(s), s_gt, rtol=1e-2)


def test_pnp_ransac(rng):
    cam = make_camera()
    n = 120
    pts = create_random_landmarks(rng, n).astype(np.float32)
    R_gt = np.asarray(
        lie.so3_exp(jnp.asarray((rng.normal(size=3) * 0.2)[None], jnp.float32))
    )[0]
    t_gt = np.array([0.3, -0.1, 0.5])
    pc = pts @ R_gt.T + t_gt
    uv = np.stack(
        [cam.fx * pc[:, 0] / pc[:, 2] + cam.cx, cam.fy * pc[:, 1] / pc[:, 2] + cam.cy],
        axis=1,
    ).astype(np.float32)
    out = rng.choice(n, 25, replace=False)
    uv[out] += rng.uniform(30, 90, (25, 2)) * rng.choice([-1, 1], (25, 2))
    R, t, inl, cnt = pnp.pnp_ransac(
        cam,
        jnp.asarray(pts),
        jnp.asarray(uv),
        jnp.ones((n,), jnp.float32),
        jnp.ones((n,), bool),
        jax.random.PRNGKey(1),
    )
    assert int(cnt) >= n - 25 - 5
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-2)


def _chain_problem(rng, K=12, drift=0.02):
    """A keyframe chain with accumulated drift and one loop edge back to 0."""
    R_gt, t_gt = [np.eye(3)], [np.zeros(3)]
    for k in range(1, K):
        phi = np.array([0.0, 0.25, 0.0])  # turn in a circle
        dR = np.asarray(lie.so3_exp(jnp.asarray(phi[None], jnp.float32)))[0]
        R_gt.append(dR @ R_gt[-1])
        t_gt.append(np.array([0.0, 0.0, 0.4]) + dR @ t_gt[-1])
    # Noisy/drifted estimates: accumulate noisy relative transforms.
    R_est, t_est = [np.eye(3)], [np.zeros(3)]
    rels = []
    for k in range(1, K):
        R_rel = R_gt[k] @ R_gt[k - 1].T
        t_rel = t_gt[k] - R_rel @ t_gt[k - 1]
        rels.append((R_rel, t_rel))
        dphi = rng.normal(size=3) * drift
        nR = np.asarray(lie.so3_exp(jnp.asarray(dphi[None], jnp.float32)))[0]
        R_est.append(nR @ R_rel @ R_est[-1])
        t_est.append(nR @ (R_rel @ t_est[-1] + t_rel) + rng.normal(size=3) * drift)
    edges = []
    for k in range(1, K):
        R_rel, t_rel = rels[k - 1]
        edges.append((k - 1, k, R_rel, t_rel, 1.0))
    # Loop edge K-1 -> 0 with the TRUE relative transform.
    R_loop = R_gt[0] @ R_gt[K - 1].T  # pose of K-1 in 0's frame... (S_ji: i=K-1, j=0)
    t_loop = t_gt[0] - R_loop @ t_gt[K - 1]
    edges.append((K - 1, 0, R_loop, t_loop, 5.0))
    return R_gt, t_gt, R_est, t_est, edges


def test_pose_graph_closes_loop(rng):
    K = 12
    R_gt, t_gt, R_est, t_est, edges = _chain_problem(rng)
    E = len(edges)
    prob = pg.PoseGraphProblem(
        R=jnp.asarray(np.stack(R_est), jnp.float32),
        t=jnp.asarray(np.stack(t_est), jnp.float32),
        s=jnp.ones((K,), jnp.float32),
        fixed=jnp.asarray(np.arange(K) == 0),
        valid=jnp.ones((K,), bool),
        edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
        edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
        edge_R=jnp.asarray(np.stack([e[2] for e in edges]), jnp.float32),
        edge_t=jnp.asarray(np.stack([e[3] for e in edges]), jnp.float32),
        edge_s=jnp.ones((E,), jnp.float32),
        edge_valid=jnp.ones((E,), bool),
        edge_weight=jnp.asarray([e[4] for e in edges], jnp.float32),
    )
    R, t, s, chi2 = pg.optimize_pose_graph(prob, num_iters=25)

    def errs(Rs, ts):
        ang, trans = [], []
        for k in range(K):
            dR = np.asarray(Rs)[k] @ R_gt[k].T
            ang.append(
                np.linalg.norm(
                    np.asarray(lie.so3_log(jnp.asarray(dR[None], jnp.float32)))
                )
            )
            trans.append(np.linalg.norm(np.asarray(ts)[k] - t_gt[k]))
        return np.array(ang), np.array(trans)

    ang0, tr0 = errs(np.stack(R_est), np.stack(t_est))
    ang1, tr1 = errs(R, t)
    # The loop edge can only correct down to the odometry noise floor
    # (0.02 rad/edge); require a large reduction of accumulated drift plus
    # absolute bounds a few times the noise.
    assert ang1.max() < max(0.06, 0.5 * ang0.max()), (ang0.max(), ang1.max())
    assert tr1.max() < max(0.15, 0.5 * tr0.max()), (tr0.max(), tr1.max())
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=0.05)


def test_bow_index_retrieval(rng):
    idx = BowIndex()

    def rand_desc(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.integers(0, 2**32, (64, 8), dtype=np.uint32))

    # The index is stateless over the MapState: keyframe descriptors ARE
    # the index (no add/remove bookkeeping).
    state = ms.create(8, 64, 128)
    for k in range(6):
        state = state._replace(
            kf_desc=state.kf_desc.at[k].set(rand_desc(k)),
            kf_kp_valid=state.kf_kp_valid.at[k].set(True),
            kf_valid=state.kf_valid.at[k].set(True),
        )
    valid = jnp.ones((64,), bool)
    # Query similar to kf 3 (same descriptors, a few flipped bits).
    d3 = np.array(rand_desc(3))
    d3[:5] ^= 0xF
    sims = np.asarray(idx.scores(state, jnp.asarray(d3), valid))
    assert np.argmax(sims[:6]) == 3
    assert sims[3] > 0.9
    # Unrelated random descriptor sets: chance 256-bit matches under 30
    # bits essentially never happen.
    others = sims[[0, 1, 2, 4, 5]]
    assert others.max() < 0.05
    # Unused slots score 0.
    assert sims[6] == 0.0 and sims[7] == 0.0


def test_correct_landmarks_identity():
    L = 10
    lm = jnp.asarray(np.random.default_rng(0).normal(size=(L, 3)), jnp.float32)
    R = jnp.tile(jnp.eye(3)[None], (4, 1, 1))
    t = jnp.zeros((4, 3))
    s = jnp.ones((4,))
    out = pg.correct_landmarks(
        lm, jnp.zeros((L,), jnp.int32), jnp.ones((L,), bool), R, t, s, R, t, s
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(lm), atol=1e-6)
