"""Line bundle adjustment: orthonormal 4-DoF Gauss-Newton over 3D lines.

TPU-native re-expression of the reference's line terms in bundle
adjustment (optimize/local_bundle_adjuster_extended_line.cc:69-,
optimize/g2o/se3/reproj_edge_line3d_orthonormal.h:49-150 — project the
Plücker line through the 6x6 motion matrix + line intrinsics, error =
detected-endpoint-to-projected-line distances;
optimize/g2o/line3d.h:57-140 — the orthonormal (U in SO(3), w in SO(2))
minimal parameterization updated by a 4-vector).

Structure: the reference solves poses+points+lines jointly in one g2o
graph. Here the point Schur system (models/bundle_adjustment.py) already
optimizes poses+points; lines are then refined against the OPTIMIZED
poses by batched GN over all line observations — an alternation step of
the same joint objective. Poses are dominated by hundreds of point
observations; the line edges' marginal effect on poses is far below the
point noise floor, while the line geometry itself gets the full
multi-view correction the reference's line vertices get.

All observations (every keyframe segment slot with a line association)
are processed as ONE flat batch; per-line normal equations assemble by
scatter-add and solve as batched 4x4 systems.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.ops import line_geometry as lg
from structure_plp_slam_tpu.ops import robust


def _obs_residual(camera, U, w, delta, R, t, seg):
    """Endpoint-to-line residual [2] of one observation under a 4-DoF
    orthonormal update ``delta`` of the line (delta = 0 at linearization).
    """
    U2, w2 = lg.orthonormal_update(U, w, delta)
    pluck = lg.orthonormal_to_plucker(U2, w2)
    pl_c = lg.transform_line(pluck, R, t)
    l_img = lg.project_line(camera, pl_c)
    return lg.endpoint_line_distances(l_img, seg[..., 0:2], seg[..., 2:4])


@functools.partial(jax.jit, static_argnames=("camera", "num_iters"))
def refine_lines(camera, state: ms.MapState, *, num_iters: int = 4,
                 damping: float = 1e-3):
    """GN-refine every line with >= 2 segment observations against the
    current keyframe poses. Returns the updated MapState (ln_pluck +
    ln_endpoints; endpoints are re-projected onto the refined line —
    the reference's post-BA endpoint trimming, loop_bundle_adjuster.h:87).
    """
    K, ML = state.kf_line_idx.shape
    L2 = state.ln_pluck.shape[0]

    li = state.kf_line_idx.reshape(-1)  # [O]
    obs_valid = (
        (state.kf_line_idx >= 0)
        & state.kf_seg_valid
        & state.kf_valid[:, None]
    ).reshape(-1)
    li_safe = jnp.clip(li, 0, L2 - 1)
    kf_of = jax.lax.broadcasted_iota(jnp.int32, (K, ML), 0).reshape(-1)
    R_o = state.kf_pose[kf_of, :, :3]  # [O, 3, 3]
    t_o = state.kf_pose[kf_of, :, 3]
    seg_o = state.kf_seg.reshape(-1, 4)

    n_obs = (
        jnp.zeros((L2 + 1,), jnp.int32)
        .at[jnp.where(obs_valid, li, L2)]
        .add(1)[:L2]
    )
    # A line needs >= 2 observations (4 residuals) to constrain 4 DoF.
    refinable = state.ln_valid & (n_obs >= 2)

    zero4 = jnp.zeros((4,), jnp.float32)

    def res_and_jac(U, w, R, t, seg):
        f = lambda d: _obs_residual(camera, U, w, d, R, t, seg)
        return f(zero4), jax.jacfwd(f)(zero4)

    def iteration(carry, _):
        U, w = carry  # [L2, 3, 3], [L2, 2]
        U_o = U[li_safe]
        w_o = w[li_safe]
        r, J = jax.vmap(res_and_jac)(U_o, w_o, R_o, t_o, seg_o)  # [O,2],[O,2,4]
        chi2 = jnp.sum(r * r, axis=-1)
        wgt = jnp.where(
            obs_valid, robust.huber_weight(chi2, robust.CHI2_2D), 0.0
        )
        Jw = J * wgt[:, None, None]
        H_o = jnp.einsum("ori,orj->oij", Jw, J)  # [O, 4, 4]
        b_o = -jnp.einsum("ori,or->oi", Jw, r)   # [O, 4]
        tgt = jnp.where(obs_valid, li, L2)
        H = jnp.zeros((L2 + 1, 4, 4), jnp.float32).at[tgt].add(H_o)[:L2]
        b = jnp.zeros((L2 + 1, 4), jnp.float32).at[tgt].add(b_o)[:L2]
        lam = damping * jnp.maximum(
            jnp.trace(H, axis1=-2, axis2=-1)[:, None, None] / 4.0, 1e-6
        )
        H = H + (lam + 1e-8) * jnp.eye(4, dtype=jnp.float32)[None]
        delta = jnp.linalg.solve(H, b[..., None])[..., 0]  # [L2, 4]
        ok = refinable & jnp.all(jnp.isfinite(delta), axis=-1)
        delta = jnp.where(ok[:, None], jnp.clip(delta, -0.3, 0.3), 0.0)
        U2, w2 = lg.orthonormal_update(U, w, delta)
        return (U2, w2), None

    U0, w0 = lg.plucker_to_orthonormal(state.ln_pluck)
    (U, w), _ = jax.lax.scan(iteration, (U0, w0), None, length=num_iters)

    # Back to Plücker with this framework's |d| = 1 convention.
    pluck = lg.orthonormal_to_plucker(U, w)
    d_norm = jnp.maximum(
        jnp.linalg.norm(pluck[:, 3:], axis=-1, keepdims=True), 1e-12
    )
    pluck = pluck / d_norm
    # Endpoint trimming: project the stored endpoints onto the moved line.
    e1 = lg.closest_point_on_line(pluck, state.ln_endpoints[:, :3])
    e2 = lg.closest_point_on_line(pluck, state.ln_endpoints[:, 3:])
    eps = jnp.concatenate([e1, e2], axis=-1)
    # Geometric trust gate: the orthonormal w-update changes the line's
    # distance from the origin MULTIPLICATIVELY, so an ill-conditioned
    # line (near-parallel observations) can fly tens of meters across
    # iterations while every tangent step stays inside its clip. Reject
    # refinements that move the endpoints further than about one segment
    # length — large enough for genuine post-loop healing (~drift size),
    # small enough to stop runaways.
    span = jnp.linalg.norm(
        state.ln_endpoints[:, 3:] - state.ln_endpoints[:, :3], axis=-1
    )
    move = jnp.maximum(
        jnp.linalg.norm(e1 - state.ln_endpoints[:, :3], axis=-1),
        jnp.linalg.norm(e2 - state.ln_endpoints[:, 3:], axis=-1),
    )
    refinable = refinable & (move <= span + 0.2)
    upd = refinable[:, None]
    return state._replace(
        ln_pluck=jnp.where(upd, pluck, state.ln_pluck),
        ln_endpoints=jnp.where(upd, eps, state.ln_endpoints),
    )
