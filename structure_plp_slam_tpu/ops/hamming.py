"""Batched Hamming distance over 256-bit binary descriptors.

Replaces the reference's scalar popcount loop (match::base
hamming_distance, src/PLPSLAM/match/base.h:95) and every BoW-bucketed /
windowed matching strategy built on it. On TPU, brute-force masked
``[N, M]`` distance matrices are cheap (XOR + popcount on the VPU), so the
BoW bucketing that exists purely to cut CPU cost disappears; spatial
windowing survives as *masks* on the dense matrix (ops/matching.py).

Descriptors are ``[*, 8] uint32`` (256 bits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.utils.types import HAMMING_MASKED


def popcount_u32(x):
    """Per-element popcount of a uint32 array (SWAR bit trick)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def hamming_distance(desc_a, desc_b):
    """Elementwise Hamming distance between matching rows ``[..., 8]``."""
    x = jnp.bitwise_xor(desc_a, desc_b)
    return jnp.sum(popcount_u32(x), axis=-1).astype(jnp.int32)


def distance_matrix(desc_a, desc_b, valid_a=None, valid_b=None):
    """All-pairs Hamming distances ``[N, M]`` (i32).

    Invalid rows/cols are set to ``HAMMING_MASKED`` (= 1024 > max distance
    256) so downstream argmin/threshold logic needs no special cases.
    """
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])  # [N, M, 8]
    d = jnp.sum(popcount_u32(x), axis=-1).astype(jnp.int32)
    if valid_a is not None:
        d = jnp.where(valid_a[:, None], d, HAMMING_MASKED)
    if valid_b is not None:
        d = jnp.where(valid_b[None, :], d, HAMMING_MASKED)
    return d


def mutual_best_matches(dist, max_dist: int, ratio: float | None = None):
    """Mutual nearest neighbors with optional Lowe ratio test.

    ``dist``: ``[N, M]`` masked distance matrix. Returns
    ``(idx_b_for_a [N] i32 with -1 for no match)``.
    """
    best_b = jnp.argmin(dist, axis=1)  # [N]
    best_ab = jnp.min(dist, axis=1)
    best_a = jnp.argmin(dist, axis=0)  # [M]

    ok = best_ab <= max_dist
    # Mutual check: a's best b must have a as its best.
    mutual = best_a[best_b] == jnp.arange(dist.shape[0])
    ok = ok & mutual

    if ratio is not None:
        # Second-best along axis 1 for the ratio test (Lowe).
        masked = dist.at[jnp.arange(dist.shape[0]), best_b].set(HAMMING_MASKED)
        second = jnp.min(masked, axis=1)
        ok = ok & (best_ab.astype(jnp.float32) <= ratio * second.astype(jnp.float32))

    return jnp.where(ok, best_b, -1)
