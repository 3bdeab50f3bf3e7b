"""Descriptor matching strategies as dense masked kernels.

Replaces the reference matching layer (src/PLPSLAM/match/: projection.cc,
area.cc, bow_tree.cc, robust.cc, fuse.cc) with a single TPU pattern:

    dense pairwise Hamming distances  (MXU bit-plane matmul)
  + boolean gate masks               (spatial window / pyramid level / view)
  + masked argmin + ratio test       (VPU reductions)

The reference's BoW-bucketed matching (bow_tree.cc) exists purely to cut
CPU cost of brute force; on TPU brute force IS the fast path, so BoW
bucketing disappears from matching entirely (retrieval keeps a global
descriptor — data/bow.py).

MXU trick: a 256-bit descriptor maps to a ±1 vector b in {-1,+1}^256; for
two descriptors, <a, b> = 256 - 2*hamming, so hamming = (256 - a.b) / 2.
With bf16 inputs (±1 exact) and f32 accumulation the result is exact while
running at full MXU rate — this is the speed-of-light formulation for
binary descriptor matching on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import hamming
from structure_plp_slam_tpu.utils.types import HAMMING_MASKED

# Rotation-consistency histogram bins (reference: match::angle_checker 30 bins).
ANGLE_BINS = 30


def _abs_du(pred_u, kp_u, wrap_cols):
    """|u_pred - u_kp| per pair ``[L, N]``; wraps horizontally when
    ``wrap_cols`` is set (equirectangular images are periodic in u)."""
    du = jnp.abs(pred_u[:, None] - kp_u[None, :])
    if wrap_cols is not None:
        du = jnp.minimum(du, wrap_cols - du)
    return du


def unpack_desc_bits(desc_u32):
    """``[..., 8] u32 -> [..., 256]`` bf16 in {-1, +1} (bit-plane form)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc_u32[..., :, None] >> shifts[None, :]) & jnp.uint32(1)  # [...,8,32]
    bits = bits.reshape(*desc_u32.shape[:-1], 256)
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(jnp.bfloat16)


def distance_matrix_mxu(bits_a, bits_b, valid_a=None, valid_b=None):
    """All-pairs Hamming from ±1 bit-plane descriptors via one MXU matmul.

    ``bits_*``: ``[N, 256]`` bf16 ±1. Returns i32 ``[N, M]`` with invalid
    entries = HAMMING_MASKED.
    """
    dot = jax.lax.dot_general(
        bits_a,
        bits_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    d = ((256.0 - dot) * 0.5).astype(jnp.int32)
    if valid_a is not None:
        d = jnp.where(valid_a[:, None], d, HAMMING_MASKED)
    if valid_b is not None:
        d = jnp.where(valid_b[None, :], d, HAMMING_MASKED)
    return d


def match_by_projection_precomputed(
    d,
    pred_uv,
    pred_level,
    lm_valid,
    kp_xy,
    kp_level,
    *,
    radius_by_level,
    max_hamming: int = 50,
    ratio: float | None = None,
    level_window: int = 1,
    wrap_cols: float | None = None,
):
    """Windowed matching over a PRECOMPUTED distance matrix ``d [L, N]``.

    The [L, N] bit-plane matmul dominates association cost; computing it
    once per frame and re-masking for each strategy (narrow/wide windows,
    different poses) replaces three matmuls with one.
    """
    d = jnp.where(lm_valid[:, None], d, HAMMING_MASKED)
    radius = radius_by_level[jnp.clip(pred_level, 0, radius_by_level.shape[0] - 1)]
    dx = _abs_du(pred_uv[:, 0], kp_xy[:, 0], wrap_cols)
    dy = jnp.abs(pred_uv[:, 1:2] - kp_xy[None, :, 1])
    in_window = (dx <= radius[:, None]) & (dy <= radius[:, None])
    in_level = jnp.abs(kp_level[None, :] - pred_level[:, None]) <= level_window
    d = jnp.where(in_window & in_level, d, HAMMING_MASKED)

    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    ok = best_d <= max_hamming
    if ratio is not None:
        masked = d.at[jnp.arange(d.shape[0]), best].set(HAMMING_MASKED)
        second = jnp.min(masked, axis=1)
        ok = ok & (
            best_d.astype(jnp.float32) <= ratio * second.astype(jnp.float32)
        )
    return jnp.where(ok, best, -1), best_d


def match_by_projection(
    pred_uv,
    pred_level,
    lm_bits,
    lm_valid,
    kp_xy,
    kp_level,
    kp_bits,
    kp_valid,
    *,
    radius_by_level,
    max_hamming: int = 50,
    ratio: float | None = None,
    level_window: int = 1,
    wrap_cols: float | None = None,
):
    """Landmark -> keypoint matching inside a reprojection window.

    Batched equivalent of match::projection::match_frame_and_landmarks and
    match_current_and_last_frames (src/PLPSLAM/match/projection.cc): each
    predicted landmark projection searches keypoints within a per-level
    pixel radius, within +-level_window pyramid levels, best Hamming with
    optional Lowe ratio against the second best.

    Args:
      pred_uv: ``[L, 2]`` predicted image points of landmarks.
      pred_level: ``[L]`` i32 predicted pyramid level per landmark.
      lm_bits: ``[L, 256]`` bf16 ±1 landmark descriptors.
      lm_valid: ``[L]`` bool (includes visibility gating).
      kp_xy / kp_level / kp_bits / kp_valid: frame keypoints ``[N, ...]``.
      radius_by_level: ``[num_levels]`` f32 search radius per *landmark*
        predicted level (the reference scales the window by the keypoint's
        scale factor).

    Returns ``(kp_idx [L] i32 (-1 = none), dist [L] i32)``.
    """
    d = distance_matrix_mxu(lm_bits, kp_bits, lm_valid, kp_valid)  # [L, N]

    radius = radius_by_level[jnp.clip(pred_level, 0, radius_by_level.shape[0] - 1)]
    dx = _abs_du(pred_uv[:, 0], kp_xy[:, 0], wrap_cols)
    dy = jnp.abs(pred_uv[:, 1:2] - kp_xy[None, :, 1])
    in_window = (dx <= radius[:, None]) & (dy <= radius[:, None])
    in_level = jnp.abs(kp_level[None, :] - pred_level[:, None]) <= level_window
    d = jnp.where(in_window & in_level, d, HAMMING_MASKED)

    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    ok = best_d <= max_hamming
    if ratio is not None:
        masked = d.at[jnp.arange(d.shape[0]), best].set(HAMMING_MASKED)
        second = jnp.min(masked, axis=1)
        ok = ok & (
            best_d.astype(jnp.float32) <= ratio * second.astype(jnp.float32)
        )
    return jnp.where(ok, best, -1), best_d


def match_in_area(
    kp_xy_1,
    kp_angle_1,
    kp_bits_1,
    kp_valid_1,
    kp_xy_2,
    kp_angle_2,
    kp_bits_2,
    kp_valid_2,
    *,
    window: float = 100.0,
    max_hamming: int = 50,
    ratio: float = 0.9,
    check_orientation: bool = True,
    wrap_cols: float | None = None,
):
    """2D-2D windowed matching for monocular initialization.

    Batched match::area::match_in_consistent_area
    (src/PLPSLAM/match/area.cc): frame-1 keypoints match frame-2 keypoints
    within a square window around their own coordinates, Lowe-ratio tested,
    then filtered by the rotation-consistency histogram.

    Returns ``idx_2_for_1 [N1] i32`` (-1 for unmatched).
    """
    d = distance_matrix_mxu(kp_bits_1, kp_bits_2, kp_valid_1, kp_valid_2)
    dx = _abs_du(kp_xy_1[:, 0], kp_xy_2[:, 0], wrap_cols)
    dy = jnp.abs(kp_xy_1[:, 1:2] - kp_xy_2[None, :, 1])
    d = jnp.where((dx <= window) & (dy <= window), d, HAMMING_MASKED)

    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    masked = d.at[jnp.arange(d.shape[0]), best].set(HAMMING_MASKED)
    second = jnp.min(masked, axis=1)
    ok = (best_d <= max_hamming) & (
        best_d.astype(jnp.float32) <= ratio * second.astype(jnp.float32)
    )

    # Enforce uniqueness: keep only mutual best (cheap on TPU, strictly
    # stronger than the reference's last-writer-wins dedup).
    best_rev = jnp.argmin(d, axis=0)
    ok = ok & (best_rev[best] == jnp.arange(d.shape[0]))

    matches = jnp.where(ok, best, -1)
    if check_orientation:
        matches = filter_by_rotation_histogram(
            matches, kp_angle_1, kp_angle_2
        )
    return matches


def filter_by_rotation_histogram(matches, angle_1, angle_2, keep_bins: int = 3):
    """Keep matches whose angle difference falls in the 3 most popular bins.

    Batched match::angle_checker (src/PLPSLAM/match/angle_checker.h): builds
    a 30-bin histogram of keypoint orientation differences and keeps the
    top-3 bins.
    """
    valid = matches >= 0
    dtheta = angle_1 - angle_2[jnp.clip(matches, 0, angle_2.shape[0] - 1)]
    # Wrap to [0, 2pi).
    two_pi = 2.0 * jnp.pi
    dtheta = jnp.mod(dtheta, two_pi)
    bins = jnp.clip(
        (dtheta * (ANGLE_BINS / two_pi)).astype(jnp.int32), 0, ANGLE_BINS - 1
    )
    hist = jnp.zeros((ANGLE_BINS,), jnp.int32).at[bins].add(valid.astype(jnp.int32))
    _, top = jax.lax.top_k(hist, keep_bins)
    in_top = (bins[:, None] == top[None, :]).any(axis=1)
    return jnp.where(valid & in_top, matches, -1)


def predict_scale_level(dist, max_dist, scale_factor: float, num_levels: int):
    """Predicted pyramid level of a landmark at distance ``dist``.

    Reference: landmark::predict_scale_level (src/PLPSLAM/data/landmark.cc)
    -> ceil(log(max_dist / dist) / log(scale_factor)).
    """
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-9), 1.0)
    lv = jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor)).astype(jnp.int32)
    return jnp.clip(lv, 0, num_levels - 1)
