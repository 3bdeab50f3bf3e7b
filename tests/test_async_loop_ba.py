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


def _system_with_state(cam, state, next_kf):
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=256, num_levels=4),
                 raw={})
    slam = System.__new__(System)  # bare instance: we drive internals only
    slam.camera = cam
    slam._state = state
    slam.next_kf = next_kf
    slam.ref_kf = 0
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
    slam._advance_deferred_gba()  # fetch -> prepare
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


def test_deferred_gba_propagates_to_midsolve_keyframe(rng):
    """A keyframe (and landmark) created DURING the deferred solve must
    ride its parent's delta at merge (loop_bundle_adjuster.cc:110-145)."""
    from structure_plp_slam_tpu.data import map_state as ms

    cam, state, poses_gt, pts = _make_state(rng, K=6, M=150)
    table = np.ones(8, np.float32)

    slam = _system_with_state(cam, state, next_kf=6)
    slam._start_deferred_gba(anchor_kf=0)
    slam._advance_deferred_gba()  # prepare
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
