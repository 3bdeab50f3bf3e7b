"""Core dtype policy and small array helpers.

Replaces the reference's Eigen typedef header (src/PLPSLAM/type.h): instead of
``Mat44_t``/``Vec3_t`` aliases we fix a framework-wide dtype policy and the
padding/masking discipline that static-shape XLA programs require.

Policy:
* Geometry (poses, points, residuals, normal equations) runs in float32.
  The reference uses double throughout; on TPU f64 is emulated and slow, so
  solvers are written to be well-conditioned in f32 (normalized coordinates,
  Schur elimination with damped 3x3 inverses).
* Descriptors are uint32[8] words (256-bit rBRIEF), matched via XOR+popcount.
* Images enter as uint8 and are converted to f32 on device.
* Invalid slots in padded arrays are marked by boolean masks, never NaN.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Framework-wide dtypes.
F = jnp.float32
I = jnp.int32
U8 = jnp.uint8
U32 = jnp.uint32
BOOL = jnp.bool_

# Sentinel index for "no landmark / no match" in index tensors.
INVALID = -1

# A large-but-finite distance used to mask out candidates in min-reductions
# (f32-safe; avoids inf arithmetic in argmin chains).
BIG = 1e30
# Max Hamming distance for 256-bit descriptors + 1; used as masked value.
HAMMING_MASKED = 1024


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m`` (static Python int)."""
    return ((x + m - 1) // m) * m


def pad_to(arr: np.ndarray, size: int, axis: int = 0, fill=0) -> np.ndarray:
    """Pad a host array with ``fill`` along ``axis`` to length ``size``."""
    n = arr.shape[axis]
    if n > size:
        raise ValueError(f"cannot pad axis of length {n} down to {size}")
    if n == size:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, size - n)
    return np.pad(arr, widths, constant_values=fill)


def masked_argmin(values, mask, axis: int = -1):
    """Argmin over ``values`` considering only entries where ``mask`` is True.

    Returns ``(indices, min_values)``; where a row has no valid entry the
    min value is ``BIG`` and the index is arbitrary — callers must gate on
    ``min_values < threshold``.
    """
    v = jnp.where(mask, values, BIG)
    idx = jnp.argmin(v, axis=axis)
    mn = jnp.min(v, axis=axis)
    return idx, mn


def masked_topk_smallest(values, mask, k: int):
    """Top-k *smallest* values along the last axis under a mask.

    Returns ``(values, indices)``; invalid slots surface as ``BIG``.
    """
    import jax

    v = jnp.where(mask, values, BIG)
    neg_vals, idx = jax.lax.top_k(-v, k)
    return -neg_vals, idx


def safe_norm(x, axis=-1, eps=1e-12, keepdims=False):
    """L2 norm that is differentiable at 0 (clamped below by eps)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps))


def normalize(x, axis=-1, eps=1e-12):
    """Unit-normalize along ``axis`` with safe division."""
    return x / safe_norm(x, axis=axis, eps=eps, keepdims=True)
