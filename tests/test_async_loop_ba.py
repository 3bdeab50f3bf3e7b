"""Deferred (asynchronous) post-loop global BA.

The reference runs loop BA on a dedicated 4th thread so tracking never
stalls on the solve (global_optimization_module.cc:287,
loop_bundle_adjuster.cc:68-145); here the solve is CHUNKED across
subsequent fed frames and merged with parent-delta propagation for
keyframes inserted during the solve (loop_bundle_adjuster.cc:110-145)."""

import jax.numpy as jnp
import numpy as np

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.models import global_ba
from structure_plp_slam_tpu.ops.orb import OrbParams
from structure_plp_slam_tpu.system import System
from tests.test_global_ba import _make_state


def _system_with_state(cam, state, next_kf, with_lines=False):
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=256, num_levels=4),
                 raw={})
    slam = System.__new__(System)  # bare instance: we drive internals only
    slam.camera = cam
    slam._state = state
    slam.next_kf = next_kf
    slam.ref_kf = 0
    slam.with_lines = with_lines
    slam.pose = (jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), jnp.float32))
    slam.vel = (jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), jnp.float32))
    slam._pending_gba = None
    slam.gba_iters_per_chunk = 2
    slam.gba_num_chunks = 4
    slam._ind_cache = None

    class _T:
        def stage(self, *a, **k):
            import contextlib
            return contextlib.nullcontext()

    slam.timer = _T()

    class _FE:
        inv_sigma_sq = jnp.ones((8,), jnp.float32)

    slam.frontend = _FE()

    class _LC:
        mesh = None

    slam.loop_closer = _LC()
    return slam


def test_deferred_gba_matches_synchronous(rng):
    """Chunked advance must land on the same solution as the one-shot
    run_global_ba (same solver, same data, same total iterations)."""
    cam, state, poses_gt, pts = _make_state(rng, K=6, M=150)
    table = np.ones(8, np.float32)

    sync = global_ba.run_global_ba(cam, state, table, anchor_kf=0,
                                   num_iters=8)

    slam = _system_with_state(cam, state, next_kf=6)
    slam._start_deferred_gba(anchor_kf=0)
    assert slam._pending_gba["phase"] == "fetch"
    slam._advance_deferred_gba()  # fetch -> enumerate
    assert slam._pending_gba["phase"] == "enumerate"
    slam._advance_deferred_gba()  # enumerate -> solve
    assert slam._pending_gba["phase"] == "solve"
    for i in range(4):
        slam._advance_deferred_gba()
    assert slam._pending_gba["phase"] == "adopt"
    slam._advance_deferred_gba()
    assert slam._pending_gba is None

    kf_valid = np.asarray(state.kf_valid)
    np.testing.assert_allclose(
        np.asarray(slam._state.kf_pose)[kf_valid],
        np.asarray(sync.kf_pose)[kf_valid], atol=5e-3,
    )


def test_deferred_gba_with_lines_refines_in_adopt(rng):
    """with_lines=True systems run the full-map line polish in the adopt
    phase (system.py adopt branch; loop_bundle_adjuster.cc:110-145 corrects
    lines after its BA the same way). A line observed by two keyframes must
    survive the merge and land near its true geometry."""
    cam, state, poses_gt, pts = _make_state(rng, K=6, M=150)
    table = np.ones(8, np.float32)

    # One 3D line observed by keyframes 0 and 1: endpoints in world space,
    # segments = their projections.
    p1 = np.array([-0.5, -0.2, 7.0], np.float32)
    p2 = np.array([0.7, 0.4, 7.5], np.float32)
    d = p2 - p1
    d = d / np.linalg.norm(d)
    m = np.cross(p1, d)
    segs = []
    for c in (0, 1):
        R, t = poses_gt[c]
        uv = []
        for p in (p1, p2):
            pc = R @ p + t
            uv += [cam.fx * pc[0] / pc[2] + cam.cx,
                   cam.fy * pc[1] / pc[2] + cam.cy]
        segs.append(np.asarray(uv, np.float32))
    st = state._replace(
        ln_pluck=state.ln_pluck.at[0].set(
            jnp.asarray(np.concatenate([m, d]), jnp.float32)),
        ln_endpoints=state.ln_endpoints.at[0].set(
            jnp.asarray(np.concatenate([p1, p2]), jnp.float32)),
        ln_valid=state.ln_valid.at[0].set(True),
        ln_ref_kf=state.ln_ref_kf.at[0].set(0),
        kf_seg=state.kf_seg.at[0, 0].set(jnp.asarray(segs[0]))
                        .at[1, 0].set(jnp.asarray(segs[1])),
        kf_seg_valid=state.kf_seg_valid.at[0, 0].set(True)
                                       .at[1, 0].set(True),
        kf_line_idx=state.kf_line_idx.at[0, 0].set(0).at[1, 0].set(0),
    )

    slam = _system_with_state(cam, st, next_kf=6, with_lines=True)
    slam._start_deferred_gba(anchor_kf=0)
    while slam._pending_gba is not None:
        slam._advance_deferred_gba()

    out = slam._state
    assert bool(out.ln_valid[0])
    ep = np.asarray(out.ln_endpoints[0])
    # Direction must agree with ground truth (endpoints may slide along
    # the line; the direction is the invariant).
    d_out = ep[3:] - ep[:3]
    d_out = d_out / (np.linalg.norm(d_out) + 1e-12)
    assert abs(float(np.dot(d_out, d))) > 0.99


def test_deferred_gba_propagates_to_midsolve_keyframe(rng):
    """A keyframe (and landmark) created DURING the deferred solve must
    ride its parent's delta at merge (loop_bundle_adjuster.cc:110-145)."""
    from structure_plp_slam_tpu.data import map_state as ms

    cam, state, poses_gt, pts = _make_state(rng, K=6, M=150)
    table = np.ones(8, np.float32)

    slam = _system_with_state(cam, state, next_kf=6)
    slam._start_deferred_gba(anchor_kf=0)
    slam._advance_deferred_gba()  # fetch
    slam._advance_deferred_gba()  # enumerate
    slam._advance_deferred_gba()  # one chunk

    # Mid-solve: "insert" keyframe 6 with a known pose, and a new landmark
    # referenced to it.
    st = slam._state
    P_child = np.asarray(st.kf_pose[5]).copy()
    P_child[:, 3] += np.array([0.25, 0.0, 0.0], np.float32)  # offset from kf5
    st = st._replace(
        kf_pose=st.kf_pose.at[6].set(jnp.asarray(P_child)),
        kf_valid=st.kf_valid.at[6].set(True),
    )
    new_lm_pos = np.array([0.5, -0.3, 7.0], np.float32)
    st = st._replace(
        lm_pos=st.lm_pos.at[200].set(jnp.asarray(new_lm_pos)),
        lm_valid=st.lm_valid.at[200].set(True),
        lm_ref_kf=st.lm_ref_kf.at[200].set(6),
    )
    slam._state = st
    slam.next_kf = 7

    while slam._pending_gba is not None:
        slam._advance_deferred_gba()

    out = slam._state
    # kf5 (snapshot era) got its solved pose; kf6 must preserve its
    # RELATIVE pose to kf5: P6_new = P6_cur o P5_cur^-1 o P5_new.
    P5_cur = P_child.copy()
    P5_cur[:, 3] -= np.array([0.25, 0.0, 0.0], np.float32)
    P5_new = np.asarray(out.kf_pose[5])
    Rm = P5_cur[:, :3].T @ P5_new[:, :3]
    tm = P5_cur[:, :3].T @ (P5_new[:, 3] - P5_cur[:, 3])
    expect = np.concatenate(
        [P_child[:, :3] @ Rm, (P_child[:, :3] @ tm + P_child[:, 3])[:, None]],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(out.kf_pose[6]), expect, atol=1e-4)

    # The new landmark rides kf6's delta: X' = S_new^-1(S_old(X)).
    P6_old = P_child
    P6_new = np.asarray(out.kf_pose[6])
    Xc = new_lm_pos @ P6_old[:, :3].T + P6_old[:, 3]
    X_expect = (Xc - P6_new[:, 3]) @ P6_new[:, :3]
    np.testing.assert_allclose(
        np.asarray(out.lm_pos[200]), X_expect, atol=1e-4
    )
