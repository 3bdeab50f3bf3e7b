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
# 4 tight-band gradient stats + 4 wide-band gradient stats + band-relative
# intensity + 4 quarter profiles + wide band-relative intensity (all x B),
# + the double-angle image-orientation pair.
ANGLE_WEIGHT = 0.45
DESC_DIM = NUM_BANDS * 14 + 2


def sobel_gradients(img):
    """f32 [H, W] -> (gx, gy) via 3x3 Sobel with reflect padding.

    Written as shifted adds, NOT ``lax.conv``: a single-channel 3x3 conv
    lowers to a layout-hostile TPU path costing ~10 ms at 640x480
    (measured — it dominated the whole line front-end); the shift+add
    form is pure VPU elementwise work at memory bandwidth."""
    p = jnp.pad(img, 1, mode="reflect")
    tl, tc, tr = p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:]
    ml, mr = p[1:-1, :-2], p[1:-1, 2:]
    bl, bc, br = p[2:, :-2], p[2:, 1:-1], p[2:, 2:]
    gx = (tr + 2.0 * mr + br) - (tl + 2.0 * ml + bl)
    gy = (bl + 2.0 * bc + br) - (tl + 2.0 * tc + tr)
    return gx, gy


@functools.partial(
    jax.jit,
    static_argnames=("num_points", "num_hypotheses", "max_lines", "min_length"),
)
def detect_line_segments(
    img,
    key,
    *,
    num_points: int = 2048,
    num_hypotheses: int = 2048,
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

    # Directional non-maximum suppression: keep only ridge pixels — local
    # maxima of |grad| ALONG the gradient direction (approximated by the
    # dominant axis). Thins every edge to ~1 px so the per-cell budget
    # goes to real contours instead of texture blobs (the LSD/Canny
    # standard; without it a gradient-rich natural texture floods the
    # edge-point set and line support drowns).
    def shift(a, dy, dx):
        return jnp.roll(a, (dy, dx), (0, 1))

    horiz = jnp.abs(gx) >= jnp.abs(gy)
    nms_x = (mag >= shift(mag, 0, 1)) & (mag >= shift(mag, 0, -1))
    nms_y = (mag >= shift(mag, 1, 0)) & (mag >= shift(mag, -1, 0))
    ridge = jnp.where(horiz, nms_x, nms_y)
    mag_nms = jnp.where(ridge, mag, 0.0)

    # Edge point selection: strongest ridge pixels per cell, then top-P.
    xy, resp, valid_p = fast_ops.select_keypoints(
        jnp.where(mag_nms >= grad_thr, mag_nms, 0.0),
        cell=8,
        per_cell=3,
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

    # Refit each hypothesis to its inliers (total least squares): the
    # proposing pixel's Sobel direction is single-pixel noisy (a 1-2 deg
    # tilt moves a 100 px segment's far end several pixels — measured
    # repeatability killer). The TLS direction is the principal axis of
    # the inlier scatter; then re-gate inliers with the refit line.
    w = inl.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mx = jnp.sum(w * px[None, :], axis=1) / cnt
    my = jnp.sum(w * py[None, :], axis=1) / cnt
    dxp = px[None, :] - mx[:, None]
    dyp = py[None, :] - my[:, None]
    sxx = jnp.sum(w * dxp * dxp, axis=1)
    sxy = jnp.sum(w * dxp * dyp, axis=1)
    syy = jnp.sum(w * dyp * dyp, axis=1)
    # Principal axis of the 2x2 scatter (closed form).
    theta = 0.5 * jnp.arctan2(2.0 * sxy, sxx - syy)
    dirx2, diry2 = jnp.cos(theta), jnp.sin(theta)
    # Keep orientation continuity with the proposal (sign only).
    flip = jnp.sign(dirx2 * dirx + diry2 * diry)
    flip = jnp.where(flip == 0, 1.0, flip)
    dirx = dirx2 * flip
    diry = diry2 * flip
    nx, ny = -diry, dirx
    ax, ay = mx, my
    dist = jnp.abs(
        nx[:, None] * (px[None, :] - ax[:, None])
        + ny[:, None] * (py[None, :] - ay[:, None])
    )
    # Polarity-consistent support: along a real edge the gradient keeps
    # ONE sign relative to the line normal (bright-to-dark stays
    # bright-to-dark); accidental alignments of texture points have mixed
    # signs. Keep the majority polarity only — this alone removes most
    # phantom full-image lines.
    sdot = (
        pgx[None, :] * nx[:, None] + pgy[None, :] * ny[:, None]
    ) / pmag[None, :]
    near = (dist <= inlier_dist) & valid_p[None, :]
    inl_pos = near & (sdot >= 0.85)
    inl_neg = near & (sdot <= -0.85)
    use_pos = jnp.sum(inl_pos, axis=1) >= jnp.sum(inl_neg, axis=1)
    inl = jnp.where(use_pos[:, None], inl_pos, inl_neg)

    # Projections along the line.
    t = dirx[:, None] * (px[None, :] - ax[:, None]) + diry[:, None] * (
        py[None, :] - ay[:, None]
    )

    # Contiguity: the reference's LSD grows a connected region; the batch
    # equivalent bins inliers along the line (8 px bins) and keeps each
    # hypothesis's LONGEST CONTIGUOUS RUN of occupied bins (1-bin gaps
    # tolerated via dilation). A random alignment scatters its support
    # across the whole image and leaves only short runs.
    BIN = 8.0
    T0 = float(np.hypot(H, W))
    nbins = int(2 * T0 / BIN) + 2
    t_bin = jnp.clip(((t + T0) / BIN).astype(jnp.int32), 0, nbins - 1)
    S = t.shape[0]
    # Per-hypothesis bin occupancy WITHOUT a scatter and WITHOUT a sort:
    # the natural [S, P] -> [S, nbins] scatter-max serializes ~4M updates
    # on TPU (~100 ms — the whole with_lines fps collapse), and a row
    # sort of [2048, 2048] costs ~55 ms in XLA. Occupancy is a BITMASK:
    # each inlier sets bit (t_bin % 32) of word (t_bin / 32), and a
    # bitwise-OR tree reduction over the point axis collapses it — pure
    # bandwidth (~100 MB), no serialization.
    NW = (nbins + 31) // 32
    w_idx = t_bin >> 5
    bit = (jnp.uint32(1) << (t_bin & 31).astype(jnp.uint32))
    bit = jnp.where(inl, bit, jnp.uint32(0))
    occ_words = jnp.stack(
        [
            jax.lax.reduce(
                jnp.where(w_idx == w, bit, jnp.uint32(0)),
                jnp.uint32(0), jax.lax.bitwise_or, (1,),
            )
            for w in range(NW)
        ],
        axis=1,
    )  # [S, NW]
    b_ids = jnp.arange(nbins)
    occ = (
        (occ_words[:, b_ids >> 5] >> (b_ids & 31)[None, :].astype(jnp.uint32))
        & 1
    ).astype(bool)                               # [S, nbins]
    occ_d = occ | jnp.roll(occ, 1, axis=1) | jnp.roll(occ, -1, axis=1)

    def run_step(carry, b):
        run, best_len, best_end = carry
        o = occ_d[:, b]
        run = jnp.where(o, run + 1, 0)
        better = run > best_len
        best_len = jnp.where(better, run, best_len)
        best_end = jnp.where(better, b, best_end)
        return (run, best_len, best_end), None

    zero_s = jnp.zeros((S,), jnp.int32)
    (_, best_len, best_end), _ = jax.lax.scan(
        run_step, (zero_s, zero_s, zero_s), jnp.arange(nbins)
    )
    t_lo = (best_end - best_len + 1).astype(jnp.float32) * BIN - T0 - BIN
    t_hi = (best_end + 1).astype(jnp.float32) * BIN - T0 + BIN
    in_run = inl & (t >= t_lo[:, None]) & (t <= t_hi[:, None])
    t_min = jnp.min(jnp.where(in_run, t, 1e9), axis=1)
    t_max = jnp.max(jnp.where(in_run, t, -1e9), axis=1)
    seg_len = t_max - t_min
    count = jnp.sum(in_run, axis=1)
    # Density over the run: a real contour populates most of its bins
    # with >= 1 edge point.
    coverage = count.astype(jnp.float32) / jnp.maximum(seg_len / BIN, 1.0)
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
        ndot = nx * nx[best] + ny * ny[best]
        cosang = jnp.abs(ndot)
        # Same geometric line iff normals align up to a JOINT sign flip of
        # (n, rho): compare rho against sign(ndot) * rho_best (comparing
        # |rho| would also dedup distinct parallel lines mirrored about
        # the origin).
        sgn = jnp.where(ndot >= 0, 1.0, -1.0)
        rho_d = jnp.abs(rho - sgn * rho[best])
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


import os as _os

_BOX_OFF = _os.environ.get("PLPSLAM_NO_BOX") == "1"
# Scale of the estimated gradient-noise floor subtracted from the band
# std statistics (see line_band_descriptors); 0 disables deflation.
NOISE_DEFLATE = 1.0


@jax.jit
def _box3(img):
    """3x3 box blur via shifted adds (VPU; see sobel_gradients)."""
    p = jnp.pad(img, 1, mode="reflect")
    return (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    ) * (1.0 / 9.0)


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
    # Descriptor sampling reads a lightly smoothed image: sigma-5 pixel
    # noise maps to ~sigma-20 Sobel noise against 30-100 edge gradients
    # (measured 0.60 matching precision under noise vs 0.91 clean); a
    # 3x3 box cuts gradient noise ~3x while both band scales (2 and 5
    # px) stay far above the blur radius. Detection keeps the raw image
    # (its NMS wants the sharpest ridges).
    img_raw = img
    img = img if _BOX_OFF else _box3(img)
    # Noise-floor estimate for the band std statistics. Additive pixel
    # noise sigma^2 inflates every per-band gradient std toward
    # sqrt(std^2 + k sigma_g^2), rotating the normalized descriptor away
    # from its clean direction (std terms are ~half the gradient block).
    # Estimate sigma^2 from the residual against a 3x3 box blur
    # (median-of-squares: robust to true texture edges; for Gaussian
    # noise Var(resid) = 8/9 sigma^2 and median(resid^2) = 0.455 Var),
    # propagate through the box+Sobel kernel (||box*sobel||^2 = 16/9 per
    # component), and DEFLATE the stds: sqrt(max(std^2 - floor, 0)).
    # Clean images estimate a tiny floor (texture-only residual), so the
    # clean descriptor is nearly unchanged.
    resid = img_raw - _box3(img_raw)
    sigma2_px = jnp.median(resid * resid) * (1.0 / (0.455 * 8.0 / 9.0))
    grad_noise_var = NOISE_DEFLATE * (16.0 / 9.0) * sigma2_px
    gx, gy = sobel_gradients(img)
    x1, y1, x2, y2 = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]

    # Canonical orientation: endpoint order is detector-arbitrary, and a
    # swapped order would MIRROR the bands and negate both gradient
    # components (measured: true matches drop to ~0.4 cosine). Orient each
    # segment so the mean on-line perpendicular gradient is positive —
    # the same physical edge then always yields the same band frame
    # (the reference LBD fixes its frame by the gradient too).
    dx0, dy0 = x2 - x1, y2 - y1
    len0 = jnp.maximum(jnp.sqrt(dx0 * dx0 + dy0 * dy0), 1e-6)
    nx0, ny0 = -dy0 / len0, dx0 / len0
    tsf = jnp.linspace(0.1, 0.9, 8)
    fx = jnp.clip((x1[:, None] + tsf[None] * dx0[:, None]).astype(jnp.int32),
                  0, W - 1)
    fy = jnp.clip((y1[:, None] + tsf[None] * dy0[:, None]).astype(jnp.int32),
                  0, H - 1)
    gp0 = gx[fy, fx] * nx0[:, None] + gy[fy, fx] * ny0[:, None]
    flip = jnp.sum(gp0, axis=1) < 0
    x1, x2 = jnp.where(flip, x2, x1), jnp.where(flip, x1, x2)
    y1, y2 = jnp.where(flip, y2, y1), jnp.where(flip, y1, y2)

    dx = x2 - x1
    dy = y2 - y1
    length = jnp.sqrt(dx * dx + dy * dy)
    inv = 1.0 / jnp.maximum(length, 1e-6)
    dirx, diry = dx * inv, dy * inv
    nx, ny = -diry, dirx

    ts = jnp.linspace(0.05, 0.95, NUM_SAMPLES)
    bands = jnp.arange(NUM_BANDS, dtype=jnp.float32) - (NUM_BANDS - 1) / 2.0

    def band_stats(spacing):
        """Gradient band statistics + intensity context at one band
        spacing. Returns ([M, 4B] gradient stats, [M, T, B] intensity)."""
        cx = (
            x1[:, None, None]
            + ts[None, :, None] * dx[:, None, None]
            + bands[None, None, :] * nx[:, None, None] * spacing
        )
        cy = (
            y1[:, None, None]
            + ts[None, :, None] * dy[:, None, None]
            + bands[None, None, :] * ny[:, None, None] * spacing
        )
        xi = jnp.clip(cx.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(cy.astype(jnp.int32), 0, H - 1)
        sgx = gx[yi, xi]
        sgy = gy[yi, xi]
        g_par = sgx * dirx[:, None, None] + sgy * diry[:, None, None]
        g_per = sgx * nx[:, None, None] + sgy * ny[:, None, None]

        def std_deflated(g):
            v = jnp.var(g, axis=1)
            return jnp.sqrt(jnp.maximum(v - grad_noise_var, 0.0))

        stats = jnp.concatenate(
            [
                jnp.mean(g_par, axis=1),
                jnp.mean(g_per, axis=1),
                std_deflated(g_par),
                std_deflated(g_per),
            ],
            axis=1,
        )
        return stats, img[yi, xi]

    # Two band scales (round-2 review, weak #5): the tight scale reads
    # the edge profile itself, the wide scale reads the CONTEXT several
    # pixels out — what separates visually similar parallel lines (the
    # reference LBD gets its context from multi-octave detection,
    # line_extractor.cc:130-136).
    g_tight, inten = band_stats(2.0)
    g_wide, inten_w = band_stats(5.0)

    # Band-relative intensity: invariant to global brightness, keeps the
    # cross-band contrast pattern. Computed per line-QUARTER as well —
    # the canonical orientation makes quarters comparable across views,
    # and along-line structure (intensity ramps, asymmetric context) is
    # what separates visually similar parallel lines.
    band_mean = jnp.mean(inten, axis=1)  # [M, B]
    band_rel = band_mean - jnp.mean(band_mean, axis=1, keepdims=True)
    q = NUM_SAMPLES // 4
    quarter_mean = jnp.stack(
        [jnp.mean(inten[:, i * q:(i + 1) * q], axis=1) for i in range(4)],
        axis=-1,
    )  # [M, B, 4]
    quarter_rel = (
        quarter_mean - jnp.mean(quarter_mean, axis=(1, 2), keepdims=True)
    ).reshape(inten.shape[0], -1)
    band_mean_w = jnp.mean(inten_w, axis=1)
    band_rel_w = band_mean_w - jnp.mean(band_mean_w, axis=1, keepdims=True)
    feat = jnp.concatenate(
        [
            g_tight,
            g_wide * 0.7,
            band_rel * 0.5,  # balance scale vs gradient stats
            quarter_rel * 0.35,
            band_rel_w * 0.35,
        ],
        axis=1,
    )
    n = jnp.linalg.norm(feat, axis=1, keepdims=True)
    feat = feat / jnp.where(n < 1e-6, 1.0, n)
    # Image-space orientation, double-angle encoded (flip/endpoint-order
    # invariant): a true match under a modest viewpoint change cannot
    # rotate tens of degrees, and appearance-only bands happily confuse
    # differently-oriented strips (measured: 4 of 5 ranking failures
    # matched >15 deg apart). The reference enforces the same prior via
    # its rotation-consistency check (match/angle_checker.h); encoding it
    # in descriptor space keeps matching a pure MXU similarity product.
    ang = jnp.stack([dirx * dirx - diry * diry, 2.0 * dirx * diry], axis=1)
    feat = jnp.concatenate([feat, ang * ANGLE_WEIGHT], axis=1)
    n2 = jnp.linalg.norm(feat, axis=1, keepdims=True)
    feat = feat / jnp.where(n2 < 1e-6, 1.0, n2)
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


@functools.partial(jax.jit, static_argnames=("max_lines", "min_length"))
def detect_line_segments_multiscale(img, key, *, max_lines: int = 64,
                                    min_length: float = 40.0):
    """Two-scale detection (reference: the LSD runs a scale pyramid and
    keeps octave-0 lines, line_extractor.cc:130-136; here the coarse
    scale contributes the long/soft structures the fine scale fragments).

    Three quarters of the budget comes from full resolution, one quarter
    from a half-resolution pass whose segments map back to level-0 coords
    and are deduplicated against the fine set in (angle, offset) space.
    Returns (seg [max_lines, 4], valid, strength)."""
    from structure_plp_slam_tpu.ops import image as image_ops

    n_coarse = max(max_lines // 4, 4)
    n_fine = max_lines - n_coarse
    k1, k2 = jax.random.split(key)
    seg_f, val_f, str_f = detect_line_segments(
        img, k1, max_lines=n_fine, min_length=min_length
    )
    H, W = img.shape
    half = image_ops.resize_bilinear(img, (H // 2, W // 2))
    seg_c, val_c, str_c = detect_line_segments(
        half, k2, max_lines=n_coarse, min_length=min_length * 0.5,
        num_points=1024, num_hypotheses=1024,
    )
    seg_c = seg_c * 2.0  # back to level-0 pixels

    def params(seg):
        d = seg[:, 2:4] - seg[:, 0:2]
        ln = jnp.maximum(jnp.linalg.norm(d, axis=1), 1e-6)
        dirv = d / ln[:, None]
        n = jnp.stack([-dirv[:, 1], dirv[:, 0]], 1)
        rho = jnp.sum(n * seg[:, 0:2], axis=1)
        return dirv, n, rho

    df, nf, rf = params(seg_f)
    dc, nc, rc = params(seg_c)
    ndot = nc @ nf.T                                   # [C, F]
    sgn = jnp.where(ndot >= 0, 1.0, -1.0)
    rho_d = jnp.abs(rc[:, None] - sgn * rf[None, :])
    dup = (jnp.abs(ndot) > 0.985) & (rho_d < 8.0) & val_f[None, :]
    val_c = val_c & ~jnp.any(dup, axis=1)

    seg = jnp.concatenate([seg_f, seg_c], axis=0)
    valid = jnp.concatenate([val_f, val_c], axis=0)
    strength = jnp.concatenate([str_f, str_c], axis=0)
    return seg, valid, strength
