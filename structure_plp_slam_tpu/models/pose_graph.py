"""Sim3 pose-graph ("essential graph") optimization.

TPU-native replacement for optimize/graph_optimizer.cc (g2o Sim3 pose
graph over spanning tree + loop edges + high-covisibility edges on
BlockSolver_7_3/CSparse, solved sparsely on CPU). Here the graph is small
enough (K <= hundreds of keyframes) that the DENSE normal system [7K, 7K]
is the fastest formulation on TPU: per-edge Jacobian blocks come from
vmapped forward-mode autodiff of the Sim3 residual, are scattered into
[K, K, 7, 7] blocks, and one Cholesky solves the whole graph per GN step.

Edge residual (matching g2o's sim3 edge): for measurement S_ji (pose of i
in j at edge-creation time) and variables S_i, S_j (world->cam Sim3):
    r = log_sim3( S_ji_meas^-1 ∘ S_j ∘ S_i^-1 )  in R^7.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import lie


class PoseGraphProblem(NamedTuple):
    # Variables: world->cam Sim3 per keyframe.
    R: jax.Array        # [K, 3, 3]
    t: jax.Array        # [K, 3]
    s: jax.Array        # [K]
    fixed: jax.Array    # [K] bool (loop keyframe anchored)
    valid: jax.Array    # [K] bool
    # Edges.
    edge_i: jax.Array   # [E] i32
    edge_j: jax.Array   # [E] i32
    edge_R: jax.Array   # [E, 3, 3] measured S_ji rotation
    edge_t: jax.Array   # [E, 3]
    edge_s: jax.Array   # [E]
    edge_valid: jax.Array  # [E] bool
    edge_weight: jax.Array  # [E] f32


def _edge_residual(Ri, ti, si, Rj, tj, sj, Rm, tm, sm, xi_i, xi_j):
    """Residual with left-multiplicative perturbations exp(xi) applied to
    each variable (xi = 0 at linearization point)."""
    dRi, dti, dsi = lie.sim3_exp(xi_i[None])
    dRj, dtj, dsj = lie.sim3_exp(xi_j[None])
    Ri2, ti2, si2 = lie.sim3_compose(dRi[0], dti[0], dsi[0], Ri, ti, si)
    Rj2, tj2, sj2 = lie.sim3_compose(dRj[0], dtj[0], dsj[0], Rj, tj, sj)
    # S_j ∘ S_i^-1
    Rii, tii, sii = lie.sim3_inverse(Ri2, ti2, si2)
    Rji, tji, sji = lie.sim3_compose(Rj2, tj2, sj2, Rii, tii, sii)
    # S_m^-1 ∘ (S_j S_i^-1)
    Rmi, tmi, smi = lie.sim3_inverse(Rm, tm, sm)
    Re, te, se = lie.sim3_compose(Rmi, tmi, smi, Rji, tji, sji)
    return lie.sim3_log(Re, te, se)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def optimize_pose_graph(prob: PoseGraphProblem, *, num_iters: int = 20,
                        damping: float = 1e-6):
    """Batched GN on the Sim3 pose graph. Returns (R, t, s)."""
    K = prob.R.shape[0]
    E = prob.edge_i.shape[0]
    zeros7 = jnp.zeros((7,), prob.t.dtype)

    res_and_jac = jax.vmap(
        lambda Ri, ti, si, Rj, tj, sj, Rm, tm, sm: (
            _edge_residual(Ri, ti, si, Rj, tj, sj, Rm, tm, sm, zeros7, zeros7),
            jax.jacfwd(
                lambda xi: _edge_residual(
                    Ri, ti, si, Rj, tj, sj, Rm, tm, sm, xi, zeros7
                )
            )(zeros7),
            jax.jacfwd(
                lambda xj: _edge_residual(
                    Ri, ti, si, Rj, tj, sj, Rm, tm, sm, zeros7, xj
                )
            )(zeros7),
        )
    )

    def iteration(carry, _):
        R, t, s = carry
        Ri, ti, si = R[prob.edge_i], t[prob.edge_i], s[prob.edge_i]
        Rj, tj, sj = R[prob.edge_j], t[prob.edge_j], s[prob.edge_j]
        r, Ji, Jj = res_and_jac(
            Ri, ti, si, Rj, tj, sj, prob.edge_R, prob.edge_t, prob.edge_s
        )  # [E,7], [E,7,7], [E,7,7]
        w = jnp.where(prob.edge_valid, prob.edge_weight, 0.0)

        # Assemble block H [K, K, 7, 7] and b [K, 7].
        H = jnp.zeros((K, K, 7, 7), jnp.float32)
        JiT_w = Ji * w[:, None, None]
        H = H.at[prob.edge_i, prob.edge_i].add(
            jnp.einsum("eri,erj->eij", JiT_w, Ji)
        )
        H = H.at[prob.edge_j, prob.edge_j].add(
            jnp.einsum("eri,erj->eij", Jj * w[:, None, None], Jj)
        )
        H = H.at[prob.edge_i, prob.edge_j].add(
            jnp.einsum("eri,erj->eij", JiT_w, Jj)
        )
        H = H.at[prob.edge_j, prob.edge_i].add(
            jnp.einsum("eri,erj->eij", Jj * w[:, None, None], Ji)
        )
        b = jnp.zeros((K, 7), jnp.float32)
        b = b.at[prob.edge_i].add(-jnp.einsum("eri,er->ei", JiT_w, r))
        b = b.at[prob.edge_j].add(
            -jnp.einsum("eri,er->ei", Jj * w[:, None, None], r)
        )

        free = prob.valid & ~prob.fixed
        free_f = free.astype(jnp.float32)
        H = H * free_f[:, None, None, None] * free_f[None, :, None, None]
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.where(free[:, None, None], 0.0, 1.0) * jnp.eye(7)[None]
        )
        diag = jnp.trace(H[jnp.arange(K), jnp.arange(K)], axis1=-2, axis2=-1)
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            (damping * jnp.maximum(diag / 7.0, 1e-6))[:, None, None]
            * jnp.eye(7)[None]
        )
        b = b * free_f[:, None]

        Hd = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        bd = b.reshape(7 * K)
        L, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
        dx = jax.scipy.linalg.cho_solve((L, low), bd).reshape(K, 7)
        ok = jnp.all(jnp.isfinite(dx))
        dx = jnp.where(ok, dx, 0.0)

        dR, dt, ds = lie.sim3_exp(dx)
        R2, t2, s2 = lie.sim3_compose(dR, dt, ds, R, t, s)
        R2 = jnp.where(free[:, None, None], R2, R)
        t2 = jnp.where(free[:, None], t2, t)
        s2 = jnp.where(free, s2, s)
        return (R2, t2, s2), jnp.sum(w * jnp.sum(r * r, axis=-1))

    (R, t, s), chi2s = jax.lax.scan(
        iteration, (prob.R, prob.t, prob.s), None, length=num_iters
    )
    return R, t, s, chi2s[-1]


def correct_landmarks(lm_pos, lm_ref_kf, lm_valid, R_old, t_old, s_old,
                      R_new, t_new, s_new):
    """Move landmarks through their reference keyframe's Sim3 correction:
    X' = S_new^-1 ( S_old (X) )  (reference: graph_optimizer.cc landmark
    transformation after pose-graph optimization)."""
    K = R_old.shape[0]
    ref = jnp.clip(lm_ref_kf, 0, K - 1)
    Ro, to, so = R_old[ref], t_old[ref], s_old[ref]
    Rn, tn, sn = R_new[ref], t_new[ref], s_new[ref]
    # S_old(X)
    Xc = so[:, None] * jnp.einsum("lij,lj->li", Ro, lm_pos) + to
    # S_new^-1(Xc)
    Rni = jnp.swapaxes(Rn, -1, -2)
    sni = 1.0 / jnp.maximum(sn, 1e-12)
    Xw = sni[:, None] * jnp.einsum("lij,lj->li", Rni, Xc - tn)
    return jnp.where(lm_valid[:, None], Xw, lm_pos)


def correct_lines(ln_endpoints, ln_pluck, ln_ref_kf, ln_valid,
                  R_old, t_old, s_old, R_new, t_new, s_new):
    """Move 3D line landmarks through their reference keyframe's Sim3
    correction: both world endpoints transform as points, the Plücker
    coordinates are rebuilt from them (reference:
    global_optimization_module.cc:233-255 moves landmarks AND lines;
    graph_optimizer.cc transforms lines via corrected Sim3s).

    Returns (ln_endpoints', ln_pluck')."""
    from structure_plp_slam_tpu.ops import line_geometry as lg

    e1 = correct_landmarks(ln_endpoints[:, :3], ln_ref_kf, ln_valid,
                           R_old, t_old, s_old, R_new, t_new, s_new)
    e2 = correct_landmarks(ln_endpoints[:, 3:], ln_ref_kf, ln_valid,
                           R_old, t_old, s_old, R_new, t_new, s_new)
    eps = jnp.concatenate([e1, e2], axis=-1)
    pluck = jnp.where(
        ln_valid[:, None], lg.plucker_from_endpoints(e1, e2), ln_pluck
    )
    return jnp.where(ln_valid[:, None], eps, ln_endpoints), pluck


def correct_planes(pl_coef, pl_ref_kf, pl_valid,
                   R_old, t_old, s_old, R_new, t_new, s_new):
    """Move plane landmarks (n, d with n.X + d = 0) through their reference
    keyframe's Sim3 correction. For the composite point map
    X' = A X + b with A = (s_o/s_n) R_n^T R_o, b = (1/s_n) R_n^T (t_o-t_n),
    the plane maps as n' = R_n^T R_o n (unit),
    d' = (s_o d - n . R_o^T (t_o - t_n)) / s_n — derived from
    (A^{-T} n) . X' + (d - n . A^{-1} b) = 0 and renormalizing |n'| = 1.
    """
    K = R_old.shape[0]
    ref = jnp.clip(pl_ref_kf, 0, K - 1)
    Ro, to, so = R_old[ref], t_old[ref], s_old[ref]
    Rn, tn, sn = R_new[ref], t_new[ref], s_new[ref]
    n = pl_coef[:, :3]
    d = pl_coef[:, 3]
    # n' = R_n^T (R_o n)
    Ron = jnp.einsum("pij,pj->pi", Ro, n)
    n_new = jnp.einsum("pji,pj->pi", Rn, Ron)
    # d - n . A^{-1} b, with A^{-1} b = (1/s_o) R_o^T (t_o - t_n), then
    # scaled by s_o/s_n to renormalize the (s_n/s_o)-length normal.
    d_new = (so * d - jnp.einsum(
        "pi,pi->p", n, jnp.einsum("pji,pj->pi", Ro, to - tn)
    )) / jnp.maximum(sn, 1e-12)
    coef = jnp.concatenate([n_new, d_new[:, None]], axis=-1)
    return jnp.where(pl_valid[:, None], coef, pl_coef)


def correct_map_structures(state, R_old, t_old, s_old, R_new, t_new, s_new,
                           lm_mask=None, ln_mask=None, pl_mask=None):
    """Apply a per-keyframe Sim3 correction to ALL landmark types —
    points, lines, planes — through their reference keyframes. Masks
    default to each type's validity."""
    lm_mask = state.lm_valid if lm_mask is None else lm_mask
    ln_mask = state.ln_valid if ln_mask is None else ln_mask
    pl_mask = state.pl_valid if pl_mask is None else pl_mask
    lm_pos = correct_landmarks(
        state.lm_pos, state.lm_ref_kf, lm_mask,
        R_old, t_old, s_old, R_new, t_new, s_new,
    )
    eps, pluck = correct_lines(
        state.ln_endpoints, state.ln_pluck, state.ln_ref_kf, ln_mask,
        R_old, t_old, s_old, R_new, t_new, s_new,
    )
    pl_coef = correct_planes(
        state.pl_coef, state.pl_ref_kf, pl_mask,
        R_old, t_old, s_old, R_new, t_new, s_new,
    )
    return state._replace(
        lm_pos=lm_pos, ln_endpoints=eps, ln_pluck=pluck, pl_coef=pl_coef
    )
