"""Loop-closure machinery at 1024 keyframes (round-2 verdict, next #3).

Builds a synthetic 1024-keyframe map directly in MapState (a KITTI-like
forward run with a revisit), then drives the FULL loop-correction path —
Sim3 propagation, vectorized edge enumeration, the PCG pose graph with
its cyclic-reduction chain preconditioner, and the matrix-free Schur PCG
global BA — asserting it completes with bounded memory and a finite,
drift-collapsed map. The reference's map grows unboundedly
(data/map_database.h:59-270); the dense [7K,7K]/[K,K,6,6] forms were the
K~2048 structural ceiling."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.models import loop_closer as lc_mod
from structure_plp_slam_tpu.ops import lie
from tests.helpers import make_camera


def _build_large_map(rng, K=1024, lm_per_kf=24, N=64):
    """Forward corridor of K keyframes; each keyframe observes its own
    fresh landmarks plus the previous keyframe's (chain covisibility).
    The LAST keyframe revisits the first (loop) with injected drift."""
    cam = make_camera()
    L = K * lm_per_kf
    state = ms.create(max_keyframes=K, max_kps=N, max_landmarks=L)

    # Ground-truth forward trajectory with a revisit at the end.
    C_gt = np.zeros((K, 3))
    C_gt[:, 2] = 0.25 * np.arange(K)
    C_gt[K - 1] = C_gt[0] + [0.05, 0.0, 0.1]  # revisit start

    pose = np.zeros((K, 3, 4), np.float32)
    lm_pos = np.zeros((L, 3), np.float32)
    lm_ref = np.zeros((L,), np.int32)
    kf_lm_idx = np.full((K, N), -1, np.int32)
    kf_xy = np.zeros((K, N, 2), np.float32)
    kp_valid = np.zeros((K, N), bool)

    for k in range(K):
        R = np.eye(3, dtype=np.float32)
        t = (-R @ C_gt[k]).astype(np.float32)
        pose[k, :, :3] = R
        pose[k, :, 3] = t
        base = k * lm_per_kf
        # Fresh landmarks ~4-8 m ahead of this keyframe.
        pts = np.stack([
            rng.uniform(-3, 3, lm_per_kf),
            rng.uniform(-2, 2, lm_per_kf),
            C_gt[k, 2] + rng.uniform(4, 8, lm_per_kf),
        ], axis=1).astype(np.float32)
        lm_pos[base:base + lm_per_kf] = pts
        lm_ref[base:base + lm_per_kf] = k

        def obs(kk, pts_w, ids, slot0):
            Rk, tk = pose[kk, :, :3], pose[kk, :, 3]
            pc = pts_w @ Rk.T + tk
            ok = pc[:, 2] > 0.5
            uv = np.stack([
                cam.fx * pc[:, 0] / np.maximum(pc[:, 2], 0.5) + cam.cx,
                cam.fy * pc[:, 1] / np.maximum(pc[:, 2], 0.5) + cam.cy,
            ], axis=1)
            for j, (o, m) in enumerate(zip(ok, ids)):
                if o and slot0 + j < N:
                    kf_lm_idx[kk, slot0 + j] = m
                    kf_xy[kk, slot0 + j] = uv[j]
                    kp_valid[kk, slot0 + j] = True

        obs(k, pts, range(base, base + lm_per_kf), 0)
        if k > 0:
            prev = (k - 1) * lm_per_kf
            obs(k, lm_pos[prev:prev + lm_per_kf],
                range(prev, prev + lm_per_kf), lm_per_kf)
    # The revisit keyframe also observes keyframe 0's landmarks.
    obs_ids = range(0, lm_per_kf)
    obs(K - 1, lm_pos[0:lm_per_kf], obs_ids, 2 * lm_per_kf)

    state = state._replace(
        kf_pose=jnp.asarray(pose),
        kf_valid=jnp.ones((K,), bool),
        kf_timestamp=jnp.arange(K, dtype=jnp.float32),
        kf_lm_idx=jnp.asarray(kf_lm_idx),
        kf_xy=jnp.asarray(kf_xy),
        kf_kp_valid=jnp.asarray(kp_valid),
        lm_pos=jnp.asarray(lm_pos),
        lm_valid=jnp.ones((L,), bool),
        lm_ref_kf=jnp.asarray(lm_ref),
    )
    return cam, state, C_gt


@pytest.mark.slow
def test_loop_correction_at_1024_keyframes(rng):
    K = 1024
    cam, state, C_gt = _build_large_map(rng, K=K)

    # Inject drift into the later half (poses + their landmarks).
    T_t = np.array([1.2, 0.0, 0.6], np.float32)
    kf_cut = K // 2
    pose = np.array(state.kf_pose)
    pose[kf_cut:, :, 3] += pose[kf_cut:, :, :3] @ (-T_t)
    lm = np.array(state.lm_pos)
    sel = np.array(state.lm_ref_kf) >= kf_cut
    lm[sel] += T_t
    state = state._replace(kf_pose=jnp.asarray(pose), lm_pos=jnp.asarray(lm))

    lc = lc_mod.LoopCloser(cam, K)
    kf_cur = K - 1
    # Known Sim3 constraint between the (drifted) revisit keyframe and
    # keyframe 0 — from the shared observations' geometry the validator
    # would find the same; here it is supplied directly so the test
    # isolates the large-K CORRECTION machinery.
    # S_21 maps kf_cur-camera-frame points to kf0-camera-frame points.
    # The physical (undrifted) camera of the revisit sits at the GT pose,
    # so a world point X appears at x1 = R_true X + t_true in kf_cur and
    # x0 = R0 X + t0 in kf0 -> x0 = (R0 R_true^T) x1 + (t0 - R0 R_true^T
    # t_true).
    P0 = np.array(state.kf_pose[0])
    R_true = np.eye(3, dtype=np.float32)
    t_true = (-R_true @ C_gt[K - 1]).astype(np.float32)
    A = P0[:, :3] @ R_true.T
    b = P0[:, 3] - A @ t_true
    t0 = time.time()
    state2 = lc.correct(
        state, kf_cur, 0, A.astype(np.float32), b.astype(np.float32),
        1.0, np.ones(8, np.float32),
    )
    wall = time.time() - t0
    pose2 = np.asarray(state2.kf_pose)
    assert np.all(np.isfinite(pose2))
    assert np.all(np.isfinite(np.asarray(state2.lm_pos)))
    # The loop keyframe's center must be back near the start.
    C_last = -pose2[kf_cur, :, :3].T @ pose2[kf_cur, :, 3]
    err_after = np.linalg.norm(C_last - C_gt[K - 1])
    # Pre-correction drift was |T_t| ~ 1.34 m.
    assert err_after < 0.4, f"revisit err {err_after} after correction"
    # Machinery sanity: it ran the sparse paths (K > 512) and completed.
    assert lc.num_loops_closed == 1
    print(f"\n1024-kf loop correction in {wall:.1f}s wall (CPU)")
