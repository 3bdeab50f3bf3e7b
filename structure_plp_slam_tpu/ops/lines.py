"""Line segment detection + description, TPU-native.

Replaces the reference's vendored LSD detector + LBD binary descriptor
(src/PLPSLAM/feature/line_extractor.cc, feature/line_descriptor/ — both
sequential region-growing/band-walking algorithms). The TPU formulation:

Detection — batched RANSAC over oriented edge points:
  1. Sobel gradients; edge points = cell-wise strongest gradient pixels
     (fixed count P, reusing the FAST selection machinery);
  2. S 2-point line hypotheses sampled from edge points; inlier = edge
     point within ``inlier_dist`` of the line AND gradient roughly
     perpendicular to it;
  3. greedy non-maximum suppression over hypotheses in (angle, offset)
     space picks up to ``max_lines`` segments;
  4. endpoints = extreme inlier projections onto each chosen line, with an
     interior-coverage check (reject hypotheses whose inliers are sparse
     along the segment — the substitute for region-growing contiguity).

Description — band-gradient statistics (LBD-flavored, float):
  sample T points along the segment, gather gradients in B parallel bands,
  accumulate per-band mean of (g_parallel, g_perp) -> [B*2] descriptor,
  L2-normalized. Matching is a dot-product matrix on the MXU. The
  framework is self-consistent (descriptors never compared with OpenCV's).

Output per frame (fixed capacity ``max_lines``):
  seg   [M, 4]  (x1, y1, x2, y2) endpoints, level-0 coords
  desc  [M, D]  f32 unit descriptors
  valid [M]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from structure_plp_slam_tpu.ops import fast as fast_ops

NUM_BANDS = 9
NUM_SAMPLES = 16
# Per band: mean + std of (g_parallel, g_perp) like the reference LBD's
# 8-stat bands (binary_descriptor_custom.cpp), plus a band-intensity
# context term that disambiguates parallel lines with identical edge
# profiles but different surroundings.
DESC_DIM = NUM_BANDS * 5


def sobel_gradients(img):
    """f32 [H, W] -> (gx, gy) via 3x3 Sobel with reflect padding."""
    kx = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    ky = kx.T
    x = jnp.pad(img, 1, mode="reflect")[None, None]

    def conv(k):
        return jax.lax.conv_general_dilated(
            x, k[None, None], window_strides=(1, 1), padding="VALID"
        )[0, 0]

    return conv(kx), conv(ky)


@functools.partial(
    jax.jit,
    static_argnames=("num_points", "num_hypotheses", "max_lines", "min_length"),
)
def detect_line_segments(
    img,
    key,
    *,
    num_points: int = 2048,
    num_hypotheses: int = 512,
    max_lines: int = 64,
    min_length: float = 40.0,
    inlier_dist: float = 1.5,
    grad_thr: float = 30.0,
):
    """Detect up to ``max_lines`` segments. Returns (seg [M,4], valid [M],
    strength [M])."""
    H, W = img.shape
    gx, gy = sobel_gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)

    # Edge point selection: strongest gradient per cell, then global top-P.
    xy, resp, valid_p = fast_ops.select_keypoints(
        jnp.where(mag >= grad_thr, mag, 0.0),
        cell=8,
        per_cell=2,
        max_total=num_points,
        margin=4,
    )
    px = xy[:, 0]
    py = xy[:, 1]
    ix = px.astype(jnp.int32)
    iy = py.astype(jnp.int32)
    pgx = gx[iy, ix]
    pgy = gy[iy, ix]
    pmag = jnp.maximum(mag[iy, ix], 1e-6)

    # Hypotheses: every strong edge point proposes the line through itself
    # perpendicular to its own gradient (the LSD principle — level lines
    # are orthogonal to the gradient). DETERMINISTIC, unlike random pair
    # sampling: any single edge point on a physical line regenerates that
    # line, so detection is repeatable frame to frame — which the map-line
    # re-observation bookkeeping (and culling) depends on. ``key`` is kept
    # for API stability but no longer drives the hypotheses.
    del key
    order = jnp.argsort(jnp.where(valid_p, -resp, jnp.inf))
    ia = order[:num_hypotheses]
    ax, ay = px[ia], py[ia]
    ok_h = valid_p[ia]
    hgx, hgy = pgx[ia], pgy[ia]
    hmag = jnp.maximum(jnp.sqrt(hgx * hgx + hgy * hgy), 1e-6)
    nx, ny = hgx / hmag, hgy / hmag  # unit normal = gradient direction
    dirx, diry = -ny, nx

    # Point-line distances [S, P] and orientation gating.
    dist = jnp.abs(
        nx[:, None] * (px[None, :] - ax[:, None])
        + ny[:, None] * (py[None, :] - ay[:, None])
    )
    # Gradient must be ~ parallel to the line normal.
    gdotn = jnp.abs(pgx[None, :] * nx[:, None] + pgy[None, :] * ny[:, None]) / pmag[None, :]
    inl = (dist <= inlier_dist) & (gdotn >= 0.85) & valid_p[None, :]

    # Projections along the line for endpoint/coverage statistics.
    t = dirx[:, None] * (px[None, :] - ax[:, None]) + diry[:, None] * (
        py[None, :] - ay[:, None]
    )
    t_masked_lo = jnp.where(inl, t, 1e9)
    t_masked_hi = jnp.where(inl, t, -1e9)
    t_min = jnp.min(t_masked_lo, axis=1)
    t_max = jnp.max(t_masked_hi, axis=1)
    seg_len = t_max - t_min
    count = jnp.sum(inl, axis=1)
    # Coverage: inliers per unit length (edge points are ~cell-dense, so a
    # real segment has roughly 1 inlier / cell).
    coverage = count.astype(jnp.float32) / jnp.maximum(seg_len / 8.0, 1.0)
    score = jnp.where(
        ok_h & (seg_len >= min_length) & (coverage >= 0.8),
        count.astype(jnp.float32),
        0.0,
    )

    # Greedy NMS over hypotheses: suppress hypotheses whose (normal, offset)
    # are near-duplicates of a stronger one. Implemented as iterative
    # selection of max_lines winners (max_lines is small and static).
    rho = nx * ax + ny * ay  # signed offset of each line (w.r.t. origin)

    def pick(carry, _):
        score_live, = carry
        best = jnp.argmax(score_live)
        s_best = score_live[best]
        # Suppress near-duplicates: |cos angle| high and |rho| close and
        # overlapping t-range.
        cosang = jnp.abs(nx * nx[best] + ny * ny[best])
        rho_d = jnp.abs(jnp.abs(rho) - jnp.abs(rho[best]))
        overlap = ~(
            (t_min + (dirx * ax + diry * ay) > t_max[best] + (dirx[best] * ax[best] + diry[best] * ay[best]))
        )
        dup = (cosang > 0.985) & (rho_d < 6.0)
        score_live = jnp.where(dup, 0.0, score_live)
        score_live = score_live.at[best].set(0.0)
        return (score_live,), (best, s_best)

    (_,), (picked, picked_score) = jax.lax.scan(
        pick, (score,), None, length=max_lines
    )

    sx1 = ax[picked] + t_min[picked] * dirx[picked]
    sy1 = ay[picked] + t_min[picked] * diry[picked]
    sx2 = ax[picked] + t_max[picked] * dirx[picked]
    sy2 = ay[picked] + t_max[picked] * diry[picked]
    seg = jnp.stack([sx1, sy1, sx2, sy2], axis=1)
    valid = picked_score > 0.0
    return seg, valid, picked_score


@jax.jit
def line_band_descriptors(img, seg, valid):
    """LBD-flavored band-gradient descriptors ``[M, DESC_DIM]`` (unit L2).

    For each segment: NUM_SAMPLES points along it x NUM_BANDS offsets along
    the normal; per band, mean AND std of gradient components rotated into
    the line frame (the reference LBD's band statistics,
    feature/line_descriptor/binary_descriptor_custom.cpp), plus the
    band-relative mean intensity — edge-profile statistics alone cannot
    tell apart parallel lines of the same polarity; the intensity context
    of the flanking bands can.
    """
    H, W = img.shape
    gx, gy = sobel_gradients(img)
    x1, y1, x2, y2 = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
    dx = x2 - x1
    dy = y2 - y1
    length = jnp.sqrt(dx * dx + dy * dy)
    inv = 1.0 / jnp.maximum(length, 1e-6)
    dirx, diry = dx * inv, dy * inv
    nx, ny = -diry, dirx

    ts = jnp.linspace(0.05, 0.95, NUM_SAMPLES)
    bands = jnp.arange(NUM_BANDS, dtype=jnp.float32) - (NUM_BANDS - 1) / 2.0

    # Sample grid [M, T, B].
    cx = (
        x1[:, None, None]
        + ts[None, :, None] * dx[:, None, None]
        + bands[None, None, :] * nx[:, None, None] * 2.0
    )
    cy = (
        y1[:, None, None]
        + ts[None, :, None] * dy[:, None, None]
        + bands[None, None, :] * ny[:, None, None] * 2.0
    )
    xi = jnp.clip(cx.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(cy.astype(jnp.int32), 0, H - 1)
    sgx = gx[yi, xi]
    sgy = gy[yi, xi]
    g_par = sgx * dirx[:, None, None] + sgy * diry[:, None, None]
    g_per = sgx * nx[:, None, None] + sgy * ny[:, None, None]
    inten = img[yi, xi]  # [M, T, B]
    # Band-relative intensity: invariant to global brightness, keeps the
    # cross-band contrast pattern.
    band_mean = jnp.mean(inten, axis=1)  # [M, B]
    band_rel = band_mean - jnp.mean(band_mean, axis=1, keepdims=True)
    feat = jnp.concatenate(
        [
            jnp.mean(g_par, axis=1),
            jnp.mean(g_per, axis=1),
            jnp.std(g_par, axis=1),
            jnp.std(g_per, axis=1),
            band_rel * 0.5,  # balance scale vs gradient stats
        ],
        axis=1,
    )  # [M, 5B]
    n = jnp.linalg.norm(feat, axis=1, keepdims=True)
    feat = feat / jnp.where(n < 1e-6, 1.0, n)
    return jnp.where(valid[:, None], feat, 0.0)


def line_descriptor_distance_matrix(desc_a, desc_b, valid_a=None, valid_b=None):
    """Cosine-distance matrix for band descriptors (0 = identical, 2 = anti).
    Invalid entries get distance 10."""
    sim = desc_a @ desc_b.T
    d = 1.0 - sim
    if valid_a is not None:
        d = jnp.where(valid_a[:, None], d, 10.0)
    if valid_b is not None:
        d = jnp.where(valid_b[None, :], d, 10.0)
    return d
