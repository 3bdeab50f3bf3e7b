"""Fused masked-Hamming matching as a Pallas TPU kernel.

The XLA path (ops/matching.py) materializes the full ``[L, N]`` i32
distance matrix in HBM (67 MB at L=16k, N=1.5k), then re-reads it for the
window mask and the min/second-min reductions. This kernel fuses all of it
flash-attention-style: each landmark tile streams keypoint tiles through
VMEM — MXU matmul for the bit-plane dot, VPU window masking, and a running
(best, second, argbest) reduction — so HBM traffic drops from O(L*N) to
O((L + N) * 256).

TPU layout notes: per-row scalars travel in lane-aligned ``[*, 128]``
meta blocks (cols 0..3 used) and every in-kernel intermediate stays 2-D —
Mosaic's tiling wants (sublane, 128-lane) shapes.

Grid: (L / TILE_L,); the keypoint set is small enough to sit whole in VMEM.

meta layouts:
  lm_meta [L, 128]: col0 = u, col1 = v, col2 = radius (<=0: inactive),
                    col3 = predicted level
  kp_meta [N, 128]: col0 = x, col1 = y, col2 = level (1e9: invalid)
Output out [L, 128]: col0 = best distance, col1 = second-best,
                     col2 = best keypoint index (as f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from structure_plp_slam_tpu.utils.types import HAMMING_MASKED

TILE_L = 512
TILE_N = 512
LEVEL_WINDOW = 1.5
_MASKED = float(HAMMING_MASKED)


def _kernel(lm_bits_ref, lm_meta_ref, kp_bits_ref, kp_meta_ref, out_ref):
    # NOTE structure: the matmul comes first in the loop body and the
    # remaining meta slices happen inside it — hoisting them all above the
    # fori_loop reliably crashes this toolchain's Mosaic pass, while this
    # body-local form compiles (bisected empirically).
    N = kp_bits_ref.shape[0]
    lm_bits = lm_bits_ref[:]                      # [TILE_L, 256] bf16
    lm_u = lm_meta_ref[:, 0:1]                    # [TILE_L, 1]
    lm_rad = lm_meta_ref[:, 2:3]
    init = (
        jnp.full((TILE_L, 1), _MASKED, jnp.float32),
        jnp.full((TILE_L, 1), _MASKED, jnp.float32),
        jnp.zeros((TILE_L, 1), jnp.float32),
    )

    def body(n_tile, carry):
        best, second, bidx = carry
        off = n_tile * TILE_N
        kp_bits = kp_bits_ref[pl.ds(off, TILE_N), :]      # [TILE_N, 256]
        dot = jax.lax.dot_general(
            lm_bits, kp_bits,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # Explicit DEFAULT: the framework sets the GLOBAL matmul
            # precision to "highest" (f32 accuracy for geometry), but a
            # HIGHEST-precision bf16 matmul crashes this toolchain's Mosaic
            # pass — and is pointless here: ±1 products with f32
            # accumulation are exact at DEFAULT.
            precision=jax.lax.Precision.DEFAULT,
        )                                                  # [TILE_L, TILE_N]
        d = (256.0 - dot) * 0.5
        kp_x = kp_meta_ref[pl.ds(off, TILE_N), 0:1]       # [TILE_N, 1]
        lm_v = lm_meta_ref[:, 1:2]
        lm_lvl = lm_meta_ref[:, 3:4]
        kp_y = kp_meta_ref[pl.ds(off, TILE_N), 1:2]
        kp_l = kp_meta_ref[pl.ds(off, TILE_N), 2:3]
        mask = (
            (jnp.abs(lm_u - kp_x.T) <= lm_rad)
            & (jnp.abs(lm_v - kp_y.T) <= lm_rad)
            & (jnp.abs(lm_lvl - kp_l.T) <= LEVEL_WINDOW)
        )
        d = jnp.where(mask, d, _MASKED)
        tb = jnp.min(d, axis=1, keepdims=True)             # [TILE_L, 1]
        # TPU iota must be integer-typed; cast for the float min-trick.
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1).astype(jnp.float32)
        arg = jnp.min(
            jnp.where(d == tb, col, 1e9), axis=1, keepdims=True
        ) + jnp.float32(off)
        d2 = jnp.where(col == (arg - jnp.float32(off)), _MASKED, d)
        ts = jnp.min(d2, axis=1, keepdims=True)
        # Merge two (best, second) pairs: the merged second-best is the
        # smallest of {both seconds, the larger of the two bests}.
        nb = jnp.minimum(best, tb)
        ni = jnp.where(tb < best, arg, bidx)
        ns = jnp.minimum(jnp.minimum(second, ts), jnp.maximum(best, tb))
        return (nb, ns, ni)

    best, second, bidx = jax.lax.fori_loop(0, N // TILE_N, body, init)
    out = jnp.concatenate(
        [best, second, bidx, jnp.zeros((TILE_L, 125), jnp.float32)], axis=1
    )
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_match(lm_bits, lm_meta, kp_bits, kp_meta, *, interpret: bool = False):
    """Run the fused matcher (see module docstring for layouts).

    Returns (best_d [L] f32, second_d [L] f32, best_idx [L] i32).
    """
    L = lm_bits.shape[0]
    grid = (L // TILE_L,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_L, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_L, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kp_bits (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kp_meta (whole)
        ],
        out_specs=pl.BlockSpec(
            (TILE_L, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, 128), jnp.float32),
        interpret=interpret,
    )(lm_bits, lm_meta, kp_bits, kp_meta)
    return out[:, 0], out[:, 1], out[:, 2].astype(jnp.int32)


def pack_meta_lm(uv, rad, lvl):
    """Build the [L, 128] landmark meta block."""
    L = uv.shape[0]
    m = jnp.zeros((L, 128), jnp.float32)
    m = m.at[:, 0].set(uv[:, 0])
    m = m.at[:, 1].set(uv[:, 1])
    m = m.at[:, 2].set(rad)
    m = m.at[:, 3].set(lvl)
    return m


def pack_meta_kp(xy, lvl):
    N = xy.shape[0]
    m = jnp.zeros((N, 128), jnp.float32)
    m = m.at[:, 0].set(xy[:, 0])
    m = m.at[:, 1].set(xy[:, 1])
    m = m.at[:, 2].set(lvl)
    return m


def fused_match_reference(lm_bits, lm_meta, kp_bits, kp_meta):
    """Plain-XLA reference implementation (ground truth for kernel tests)."""
    dot = jax.lax.dot_general(
        lm_bits, kp_bits, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = (256.0 - dot) * 0.5
    lm_uv = lm_meta[:, 0:2]
    lm_rad = lm_meta[:, 2]
    lm_lvl = lm_meta[:, 3]
    kp_xy = kp_meta[:, 0:2]
    kp_lvl = kp_meta[:, 2]
    in_window = (
        (jnp.abs(lm_uv[:, 0:1] - kp_xy[None, :, 0]) <= lm_rad[:, None])
        & (jnp.abs(lm_uv[:, 1:2] - kp_xy[None, :, 1]) <= lm_rad[:, None])
        & (jnp.abs(lm_lvl[:, None] - kp_lvl[None, :]) <= LEVEL_WINDOW)
    )
    d = jnp.where(in_window, d, _MASKED)
    best = jnp.min(d, axis=1)
    bidx = jnp.argmin(d, axis=1).astype(jnp.int32)
    d2 = d.at[jnp.arange(d.shape[0]), bidx].set(_MASKED)
    second = jnp.min(d2, axis=1)
    return best, second, bidx
