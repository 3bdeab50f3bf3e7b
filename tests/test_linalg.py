"""ops.linalg — recursive blocked SPD inversion vs LAPACK reference.

The solver replaces cho_factor inside every GN iteration (latency-bound
on TPU, see ops/linalg.py docstring); correctness gate: random damped
SPD systems across the sizes the BA/pose-graph windows produce."""

import jax.numpy as jnp
import numpy as np
import pytest

from structure_plp_slam_tpu.ops import linalg as lin


def _random_spd(rng, n, cond=1e4):
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eig = np.logspace(0, np.log10(cond), n)
    return (Q * eig) @ Q.T


@pytest.mark.parametrize("n", [6, 12, 48, 192, 384])
def test_spd_inverse_matches_numpy(rng, n):
    S = _random_spd(rng, n, cond=1e3)
    Si = np.asarray(lin.spd_inverse(jnp.asarray(S, jnp.float32)))
    ref = np.linalg.inv(S)
    rel = np.abs(Si - ref).max() / np.abs(ref).max()
    assert rel < 5e-3  # ~cond * f32 eps; GN damping keeps cond ~<=1e3


def test_spd_inverse_high_condition(rng):
    # cond 1e4 — the worst a Levenberg-damped GN system reaches; f32
    # block elimination stays within cond * eps of the true inverse.
    S = _random_spd(rng, 192, cond=1e4)
    Si = np.asarray(lin.spd_inverse(jnp.asarray(S, jnp.float32)))
    ref = np.linalg.inv(S)
    rel = np.abs(Si - ref).max() / np.abs(ref).max()
    assert rel < 5e-2


@pytest.mark.parametrize("n", [6, 30, 192, 768])
def test_spd_solve(rng, n):
    # 30 and 768 exercise the identity-padding path (not base*2^k).
    S = _random_spd(rng, n, cond=1e3)
    x_gt = rng.normal(size=n)
    rhs = S @ x_gt
    x = np.asarray(
        lin.spd_solve(jnp.asarray(S, jnp.float32), jnp.asarray(rhs, jnp.float32))
    )
    rel = np.linalg.norm(x - x_gt) / np.linalg.norm(x_gt)
    # ~cond * f32 eps with block-elimination growth; each GN iteration
    # re-evaluates residuals, so percent-level solve error only perturbs
    # the step direction, never the fixed point.
    assert rel < 5e-2


def test_spd_solve_batched_6x6(rng):
    S = np.stack([_random_spd(rng, 6, cond=100.0) for _ in range(32)])
    Si = np.asarray(lin.inv6x6_spd(jnp.asarray(S, jnp.float32)))
    err = np.abs(np.einsum("bij,bjk->bik", Si, S) - np.eye(6)).max()
    assert err < 1e-3
