"""Latency-optimized dense linear algebra for TPU.

LAPACK-style factorizations (``cho_factor`` / ``linalg.solve``) lower to
sequential panel algorithms whose wall time on TPU is dominated by kernel
latency, not FLOPs: a single 192x192 Cholesky solve measures ~3 ms on a
v5e chip — run inside a 10-iteration Gauss-Newton scan that is 30 ms of
pure latency (the reference's g2o solves the same systems on CPU where
tiny factorizations are cheap: optimize/local_bundle_adjuster.cc).

The replacement is a RECURSIVE BLOCKED SCHUR INVERSION: split the SPD
matrix into 2x2 blocks, invert the halves recursively, combine with
matmuls. The recursion is unrolled at trace time (shapes are static), so
the whole inverse is a flat chain of ~30 small matmuls that XLA schedules
back-to-back on the MXU — ~0.2 ms for 192x192, an order of magnitude
under the LAPACK path. Accuracy on damped GN normal matrices (SPD with
bounded condition after Levenberg damping) matches Cholesky to f32
round-off; tests/test_linalg.py checks random SPD systems up to 768.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv3x3(H):
    """Closed-form batched 3x3 inverse via the adjugate — pure VPU math.
    (``jnp.linalg.inv`` is a batched LU: ~70x slower at [4096, 3, 3].)"""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    Cc = d * h - e * g
    det = a * A + b * B + c * Cc
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([Cc, -(a * h - b * g), a * e - b * d], -1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def inv6x6_spd(H):
    """Batched symmetric 6x6 inverse via one level of 3x3 Schur blocks."""
    A = H[..., :3, :3]
    B = H[..., :3, 3:]
    D = H[..., 3:, 3:]
    Ai = inv3x3(A)
    AiB = Ai @ B
    Sd = D - jnp.swapaxes(B, -1, -2) @ AiB
    Sdi = inv3x3(Sd)
    AiB_Sdi = AiB @ Sdi
    TL = Ai + AiB_Sdi @ jnp.swapaxes(AiB, -1, -2)
    TR = -AiB_Sdi
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(TR, -1, -2), Sdi], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spd_inverse(S, base: int = 6):
    """Inverse of an SPD matrix [n, n] (n = base * 2^k) by trace-time
    recursive 2x2-block Schur partitioning — a flat matmul chain on the
    MXU instead of a sequential factorization.

    Intended for damped Gauss-Newton normal matrices: Levenberg damping
    bounds the condition number, so f32 block elimination is as accurate
    as Cholesky. Callers with n not of the form base*2^k should pad with
    identity rows/cols (see :func:`pad_spd`).
    """
    n = S.shape[-1]
    if n <= base or n % 2 == 1:
        if n == 6:
            return inv6x6_spd(S)
        if n == 3:
            return inv3x3(S)
        return jnp.linalg.inv(S)
    h = n // 2
    A = S[..., :h, :h]
    B = S[..., :h, h:]
    D = S[..., h:, h:]
    Ai = spd_inverse(A, base)
    AiB = Ai @ B
    # Symmetrize at EVERY level: the closed-form base inverses are only
    # symmetric to round-off, and Sd = D - B^T Ai B amplifies any input
    # asymmetry multiplicatively through the recursion (measured: 6e-8
    # at the leaves growing to 0.76 at depth 3 on a BA camera system).
    Sd = D - jnp.swapaxes(B, -1, -2) @ AiB
    Sd = 0.5 * (Sd + jnp.swapaxes(Sd, -1, -2))
    Sdi = spd_inverse(Sd, base)
    AiB_Sdi = AiB @ Sdi
    TL = Ai + AiB_Sdi @ jnp.swapaxes(AiB, -1, -2)
    TL = 0.5 * (TL + jnp.swapaxes(TL, -1, -2))
    TR = -AiB_Sdi
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(TR, -1, -2), Sdi], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def solve3(A, b):
    """Batched 3x3 solve via the adjugate inverse (VPU, no LAPACK)."""
    return jnp.einsum("...ij,...j->...i", inv3x3(A), b)


def solve6_spd(H, b, refine: int = 2):
    """Batched damped-SPD 6x6 solve: Jacobi equilibration + closed-form
    Schur inverse + ``refine`` iterative-refinement steps. Replaces
    ``jnp.linalg.solve`` inside per-frame LM loops, where the batched LU
    kernel's latency dominates the whole iteration on TPU. Equilibration
    is required: pixel-unit pose Hessians have diagonals spanning ~1e7
    (fx^2-scaled image terms vs unit rotation terms)."""
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12))
    dinv = 1.0 / d
    He = H * dinv[..., :, None] * dinv[..., None, :]
    be = b * dinv
    Hi = inv6x6_spd(He)
    x = jnp.einsum("...ij,...j->...i", Hi, be)
    for _ in range(refine):
        r = be - jnp.einsum("...ij,...j->...i", He, x)
        x = x + jnp.einsum("...ij,...j->...i", Hi, r)
    return x * dinv


def spd_solve(S, rhs, base: int = 6, refine: int = 2):
    """Solve ``S x = rhs`` for SPD ``S`` via :func:`spd_inverse`,
    transparently padding n up to base * 2^k with identity diagonal
    (padded rows carry zero rhs, so the solution is unchanged).

    Numerical shape of BA/pose-graph camera systems: diagonal entries
    span ~7 orders of magnitude (pixel-unit Hessian blocks ~fx^2 vs the
    unit identity rows of fixed cameras), which alone pushes the raw
    condition past 1e7 — fatal for an f32 block inverse (measured: a
    0.89 rad gauge-orbit drift per GN solve on mono BA). Three guards
    restore Cholesky-grade behavior at matmul-chain cost:
      1. symmetrize (einsum round-off breaks S = S^T at ~1e-6 relative);
      2. Jacobi equilibration D^-1/2 S D^-1/2 — the 1e7 spread is pure
         scaling, the equilibrated condition is ~1e2-1e4;
      3. the block inverse serves as PRECONDITIONER of ``refine * 4``
         fixed CG steps (CG confines iterates to the Krylov space of S,
         so preconditioner error cannot inject null-space drift).
    Total cost ~2 matvecs per CG step — still an order of magnitude under
    cho_factor's sequential-panel kernel latency on TPU."""
    n = S.shape[-1]
    S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(S, axis1=-2, axis2=-1), 1e-12))
    dinv = 1.0 / d
    S = S * dinv[..., :, None] * dinv[..., None, :]
    rhs = rhs * dinv
    target = base
    while target < n:
        target *= 2
    if target != n:
        eye_pad = jnp.eye(target, dtype=S.dtype)
        Sp = eye_pad.at[..., :n, :n].set(S)
        rp = jnp.zeros(S.shape[:-2] + (target,), rhs.dtype).at[..., :n].set(rhs)
        S, rhs = Sp, rp
    Si = spd_inverse(S, base)

    def mv(A, v):
        return jnp.einsum("...ij,...j->...i", A, v)

    def dot(a, b):
        return jnp.sum(a * b, axis=-1, keepdims=True)

    x = jnp.zeros_like(rhs)
    r = rhs
    z = mv(Si, r)
    p = z
    rz = dot(r, z)
    for _ in range(max(refine, 1) * 4):
        Ap = mv(S, p)
        denom = dot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = mv(Si, r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        rz = rz_new
    return x[..., :n] * dinv  # undo equilibration (dinv is pre-pad, [n])
