"""Distributed Schur BA on a virtual 8-device CPU mesh.

Checks that the sharded solver matches the single-device solver's result
(same problem, same damping) and that the psum-reduced camera system is
exact, substituting for multi-host testing (SURVEY.md §4 note).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from structure_plp_slam_tpu.models import bundle_adjustment as ba
from structure_plp_slam_tpu.parallel import distributed_ba as dba
from tests.test_bundle_adjustment import _make_problem, _pose_errors


@pytest.fixture
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    return Mesh(np.array(devs[:8]), ("lm",))


def test_sharded_matches_single_device(rng, mesh8):
    cam, prob, poses, pts = _make_problem(rng, C=5, M=96, noise=0.3)
    ref = ba.ba_solve(cam, prob, num_iters=8, cull_at_iters=())

    sp = dba.shard_problem(prob, 8)
    run = dba.make_distributed_ba(mesh8, cam, num_iters=8)
    cam_pose, lm_pos_sharded = run(sp)

    # Poses must match the single-device solve closely. Tolerance reflects
    # f32 reduction-order differences (psum partial sums) amplified over 8
    # damped-GN iterations on a noisy problem.
    np.testing.assert_allclose(
        np.asarray(cam_pose), np.asarray(ref.cam_pose), atol=5e-3
    )

    # Landmarks: un-shard (block-cyclic layout) and compare where valid.
    M = prob.lm_pos.shape[0]
    n = 8
    M_shard = -(-M // n)
    lm = np.asarray(lm_pos_sharded).reshape(n, M_shard, 3)
    owner = np.arange(M) % n
    local = np.arange(M) // n
    lm_unshard = lm[owner, local]
    np.testing.assert_allclose(
        lm_unshard, np.asarray(ref.lm_pos), atol=2e-2
    )


def test_sharded_converges(rng, mesh8):
    cam, prob, poses, pts = _make_problem(rng, C=5, M=96, noise=0.0, perturb=0.02)
    sp = dba.shard_problem(prob, 8)
    run = dba.make_distributed_ba(mesh8, cam, num_iters=10)
    cam_pose, _ = run(sp)

    class R:
        pass

    r = R()
    r.cam_pose = cam_pose
    errs_R, errs_t = _pose_errors(r, poses)
    assert errs_R.max() < 1e-3
