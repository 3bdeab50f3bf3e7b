"""FAST corner detection as dense vectorized XLA ops.

Replaces the reference's per-cell cv::FAST calls + quadtree redistribution
(src/PLPSLAM/feature/orb_extractor.cc:328-468, orb_extractor_node.cc) with a
TPU-native formulation:

1. Dense segment test over the whole image at once: the 16 Bresenham-circle
   neighbors are materialized as 16 shifted copies (pure VPU work), and the
   "9 contiguous pixels all brighter/darker" predicate is evaluated with a
   log-step AND-rotate reduction over the circular neighbor axis.
2. A corner score (sum of absolute threshold exceedances over the 16
   neighbors, OpenCV's score flavor) feeds 3x3 non-max suppression.
3. Spatial distribution: instead of a sequential quadtree, the image is cut
   into fixed cells and each cell contributes its top-k corners, followed by
   a global top-K — same "spread keypoints evenly, keep strongest" effect
   with fully static shapes.

The two-threshold retry of the reference (ini_fast_thr, then min_fast_thr
for empty cells, orb_params.h:52-56) is captured by scoring with the low
threshold and *biasing* scores that pass the high threshold, so high-response
corners win but weak cells still contribute their best low-threshold corner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 (dy, dx), OpenCV ordering (top, clockwise).
_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)


def _shifted_stack(img):
    """``[H, W]`` -> ``[16, H, W]`` of circle-neighbor values (edge-padded)."""
    outs = []
    for dy, dx in _CIRCLE:
        outs.append(jnp.roll(img, shift=(-int(dy), -int(dx)), axis=(0, 1)))
    return jnp.stack(outs, axis=0)


def _contiguous_9(flags):
    """``[16, H, W]`` bool -> ``[H, W]`` bool: any 9 contiguous True on the ring.

    AND-rotate reduction: c2 = f & rot1(f); c4 = c2 & rot2(c2);
    c8 = c4 & rot4(c4); c9 = c8 & rot8(f). Any position with c9 True means 9
    consecutive flags are all True.
    """
    c2 = flags & jnp.roll(flags, -1, axis=0)
    c4 = c2 & jnp.roll(c2, -2, axis=0)
    c8 = c4 & jnp.roll(c4, -4, axis=0)
    c9 = c8 & jnp.roll(flags, -8, axis=0)
    return jnp.any(c9, axis=0)


def fast_score_map(img, ini_threshold: float, min_threshold: float):
    """Dense FAST-9 response map.

    Returns f32 ``[H, W]``: 0 where not a corner at ``min_threshold``;
    otherwise the corner score, plus a large constant bias where the corner
    also passes ``ini_threshold`` (see module docstring).
    """
    neigh = _shifted_stack(img)
    diff = neigh - img[None, :, :]

    def corner_and_score(thr):
        brighter = diff > thr
        darker = diff < -thr
        is_corner = _contiguous_9(brighter) | _contiguous_9(darker)
        # OpenCV-flavored score: max of summed exceedances over polarity.
        s_b = jnp.sum(jnp.where(brighter, diff - thr, 0.0), axis=0)
        s_d = jnp.sum(jnp.where(darker, -diff - thr, 0.0), axis=0)
        return is_corner, jnp.maximum(s_b, s_d)

    corner_lo, score_lo = corner_and_score(min_threshold)
    corner_hi, _ = corner_and_score(ini_threshold)
    score = jnp.where(corner_lo, score_lo, 0.0)
    score = jnp.where(corner_hi, score + 1e4, score)

    # Invalidate the 3px border (circle would wrap via jnp.roll).
    H, W = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(interior, score, 0.0)


def nms3x3(score):
    """3x3 non-maximum suppression; keeps strict local maxima."""
    neigh_max = jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(3, 3),
        window_strides=(1, 1),
        padding="SAME",
    )
    return jnp.where(score >= neigh_max, score, 0.0)


@functools.partial(jax.jit, static_argnames=("cell", "per_cell", "max_total", "margin"))
def select_keypoints(score, *, cell: int = 16, per_cell: int = 4, max_total: int,
                     margin: int = 16):
    """Cell-wise top-k then global top-K keypoint selection.

    Returns ``(xy [K, 2] f32 (x, y), response [K] f32, valid [K] bool)`` with
    ``K = max_total`` (padded).

    ``margin`` additionally suppresses a border so that orientation/BRIEF
    patches stay inside the image (reference: orb_extractor.cc uses
    an edge margin around cell detection).
    """
    H, W = score.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = (ys >= margin) & (ys < H - margin) & (xs >= margin) & (xs < W - margin)
    score = jnp.where(ok, score, 0.0)

    Hp = ((H + cell - 1) // cell) * cell
    Wp = ((W + cell - 1) // cell) * cell
    pad = jnp.zeros((Hp, Wp), score.dtype).at[:H, :W].set(score)
    ncy, ncx = Hp // cell, Wp // cell
    cells = pad.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3).reshape(
        ncy * ncx, cell * cell
    )
    vals, idx = jax.lax.top_k(cells, per_cell)  # [ncells, per_cell]

    # Flatten cell-local indices back to image coordinates.
    cy = jax.lax.broadcasted_iota(jnp.int32, (ncy * ncx, per_cell), 0) // ncx
    cx = jax.lax.broadcasted_iota(jnp.int32, (ncy * ncx, per_cell), 0) % ncx
    ly = idx // cell
    lx = idx % cell
    yy = cy * cell + ly
    xx = cx * cell + lx

    flat_vals = vals.reshape(-1)
    flat_y = yy.reshape(-1)
    flat_x = xx.reshape(-1)

    k = min(max_total, flat_vals.shape[0])
    top_vals, top_i = jax.lax.top_k(flat_vals, k)
    sel_y = flat_y[top_i]
    sel_x = flat_x[top_i]
    valid = top_vals > 0.0

    if k < max_total:
        padn = max_total - k
        top_vals = jnp.concatenate([top_vals, jnp.zeros((padn,), top_vals.dtype)])
        sel_y = jnp.concatenate([sel_y, jnp.zeros((padn,), sel_y.dtype)])
        sel_x = jnp.concatenate([sel_x, jnp.zeros((padn,), sel_x.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((padn,), jnp.bool_)])

    xy = jnp.stack([sel_x, sel_y], axis=-1).astype(jnp.float32)
    # Remove the ini-threshold bias from reported responses.
    resp = jnp.where(top_vals > 1e4 * 0.5, top_vals - 1e4, top_vals)
    return xy, resp, valid
