"""Line front-end evaluation harness (round-1 VERDICT next-step 9).

Quantifies detection repeatability and descriptor matching precision of
``ops/lines.py`` on harder-than-grid imagery: a natural-statistics (1/f
noise) texture with embedded line structure, rendered under perspective
viewpoint changes, contrast reduction and additive noise. The reference's
LSD/LBD quality claims are about real images; this harness is the closest
synthetic analog with exact ground-truth correspondence (the plane-induced
homography is known).

Metrics:
- repeatability: fraction of reference-view segments for which some
  warped-view segment lies within distance/angle tolerance after mapping
  through the ground-truth homography;
- matching precision: of mutual-best descriptor matches, the fraction that
  are geometrically correct under the homography.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from structure_plp_slam_tpu.ops import lines as line_ops

from tests import synthetic_scene

CAM = Camera(
    name="le", setup=CameraSetup.MONOCULAR, model=CameraModel.PERSPECTIVE,
    cols=320, rows=240, fx=260.0, fy=260.0, cx=159.5, cy=119.5,
)
Z_PLANE = 6.0


def _natural_texture(rng, size=768, n_lines=40):
    """1/f ('natural-statistics') background + embedded line structure."""
    f = np.fft.fftfreq(size)
    fx, fy = np.meshgrid(f, f)
    amp = 1.0 / np.maximum(np.sqrt(fx * fx + fy * fy), 1.0 / size)
    phase = rng.uniform(0, 2 * np.pi, (size, size))
    spec = amp * np.exp(1j * phase)
    img = np.real(np.fft.ifft2(spec))
    img = (img - img.min()) / (img.max() - img.min())
    tex = (60 + 110 * img).astype(np.float32)
    # Embedded line structure: long strips with VARIED appearance (width,
    # brightness, a gradient along the strip) — identical-twin strips
    # would make matching ill-posed for any descriptor; the harness tests
    # invariance to viewpoint/noise/contrast, not twin disambiguation.
    for _ in range(n_lines):
        x0, y0 = rng.uniform(0.1 * size, 0.9 * size, 2)
        ang = rng.uniform(0, np.pi)
        ln = rng.uniform(0.3 * size, 0.8 * size)
        w = rng.uniform(2.0, 6.0)
        v0 = rng.choice([rng.uniform(0, 45), rng.uniform(195, 255)])
        v1 = np.clip(v0 + rng.uniform(-60, 60), 0, 255)
        dx, dy = np.cos(ang), np.sin(ang)
        ts = np.arange(0, ln)
        vals = v0 + (v1 - v0) * (ts / max(ln, 1.0))
        for off in np.arange(-w / 2, w / 2 + 0.5, 0.5):
            xs = np.clip((x0 + ts * dx - off * dy).astype(int), 0, size - 1)
            ys = np.clip((y0 + ts * dy + off * dx).astype(int), 0, size - 1)
            tex[ys, xs] = vals
    return tex


def _pose(angle_deg):
    """Camera rotated by angle around Y, keeping the plane centered."""
    a = np.deg2rad(angle_deg)
    R = np.array([
        [np.cos(a), 0, np.sin(a)],
        [0, 1, 0],
        [-np.sin(a), 0, np.cos(a)],
    ])
    C = np.array([Z_PLANE * np.sin(a) * 0.25, 0.0, 0.0])
    return R, -R @ C


def _homography(Ra, ta, Rb, tb):
    """Plane-induced homography mapping view-a pixels to view-b pixels for
    the z = Z_PLANE world plane."""
    K = np.array([[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1.0]])
    n = np.array([0.0, 0.0, 1.0])
    d = Z_PLANE
    # world->a and world->b; H_ab = K (R_ba - t_ba n_a^T / d_a) K^-1 with
    # everything expressed in frame a.
    # Plane n.X = d in world; in frame a: (Ra n).Xa = d + n.(Ra^T ta).
    R_ba = Rb @ Ra.T
    t_ba = tb - R_ba @ ta
    n_a = Ra @ n
    d_a = d + float(n @ (Ra.T @ ta))
    H = K @ (R_ba + np.outer(t_ba, n_a) / d_a) @ np.linalg.inv(K)
    return H


def _detect(img, seed=0, depth=None):
    key = jax.random.PRNGKey(seed)
    seg, valid, _ = line_ops.detect_line_segments(
        jnp.asarray(img, jnp.float32), key
    )
    seg = np.asarray(seg)[np.asarray(valid)]
    if depth is not None:
        # Keep only segments fully on the z=6 background plane — the
        # renderer's z=3.5 foreground patch does not follow the
        # background homography, so fg segments have no ground truth.
        keep = []
        H, W = depth.shape
        for s in seg:
            pts = np.stack([
                s[0:2], s[2:4], 0.5 * (s[0:2] + s[2:4]),
            ])
            xs = np.clip(pts[:, 0].astype(int), 0, W - 1)
            ys = np.clip(pts[:, 1].astype(int), 0, H - 1)
            keep.append(bool((depth[ys, xs] > 4.5).all()))
        seg = seg[np.array(keep, bool)]
    return seg


def _warp_seg(seg, H):
    out = []
    for s in seg:
        p1 = H @ np.array([s[0], s[1], 1.0])
        p2 = H @ np.array([s[2], s[3], 1.0])
        out.append([p1[0] / p1[2], p1[1] / p1[2], p2[0] / p2[2], p2[1] / p2[2]])
    return np.array(out).reshape(-1, 4)


def _seg_close(a, b, dist_tol=5.0, ang_tol_deg=6.0):
    """Segment similarity: endpoints-to-infinite-line distance + angle."""
    da = a[2:4] - a[0:2]
    db = b[2:4] - b[0:2]
    la, lb = np.linalg.norm(da), np.linalg.norm(db)
    if la < 1e-6 or lb < 1e-6:
        return False
    cos = abs(np.dot(da, db)) / (la * lb)
    if cos < np.cos(np.deg2rad(ang_tol_deg)):
        return False
    nb = np.array([-db[1], db[0]]) / lb
    d1 = abs(np.dot(a[0:2] - b[0:2], nb))
    d2 = abs(np.dot(a[2:4] - b[0:2], nb))
    if max(d1, d2) > dist_tol:
        return False
    # Along-line overlap.
    tb = db / lb
    t0 = 0.0
    t1 = lb
    ta1 = np.dot(a[0:2] - b[0:2], tb)
    ta2 = np.dot(a[2:4] - b[0:2], tb)
    lo, hi = min(ta1, ta2), max(ta1, ta2)
    overlap = min(hi, t1) - max(lo, t0)
    return overlap > 0.3 * min(la, lb)


def _clip_seg(m, margin=6.0, min_len=56.0):
    """Liang-Barsky clip of a segment to the image interior; None if the
    visible portion is shorter than ``min_len`` (below the detector's
    length threshold, so re-detection cannot be expected)."""
    p = m[0:2]
    d = m[2:4] - m[0:2]
    t0, t1 = 0.0, 1.0
    for lo, hi, pc, dc in (
        (margin, CAM.cols - margin, p[0], d[0]),
        (margin, CAM.rows - margin, p[1], d[1]),
    ):
        if abs(dc) < 1e-9:
            if pc < lo or pc > hi:
                return None
        else:
            ta, tb = (lo - pc) / dc, (hi - pc) / dc
            if ta > tb:
                ta, tb = tb, ta
            t0, t1 = max(t0, ta), min(t1, tb)
    if t1 <= t0:
        return None
    a = p + t0 * d
    b = p + t1 * d
    if np.hypot(*(b - a)) < min_len:
        return None
    return np.array([a[0], a[1], b[0], b[1]])


def repeatability(seg_a, seg_b, H_ab):
    """Fraction of view-a segments re-detected in view-b; mapped segments
    are clipped to view-b's interior (a partially visible line should
    still be re-detected in its visible portion)."""
    if len(seg_a) == 0:
        return 0.0
    mapped = _warp_seg(seg_a, H_ab)
    hits, total = 0, 0
    for m in mapped:
        c = _clip_seg(m)
        if c is None:
            continue  # (mostly) left the view; not a repeatability failure
        total += 1
        if any(_seg_close(c, b) for b in seg_b):
            hits += 1
    return hits / max(total, 1)


def match_precision(img_a, img_b, seg_a, seg_b, H_ab):
    """Mutual-best descriptor matching precision under the homography."""
    if len(seg_a) < 3 or len(seg_b) < 3:
        return 0.0, 0
    pad = 64

    def desc(img, seg):
        s = np.zeros((pad, 4), np.float32)
        v = np.zeros((pad,), bool)
        s[: len(seg)] = seg[:pad]
        v[: len(seg)] = True
        return np.asarray(line_ops.line_band_descriptors(
            jnp.asarray(img, jnp.float32), jnp.asarray(s), jnp.asarray(v)))

    da = desc(img_a, seg_a)[: len(seg_a)]
    db = desc(img_b, seg_b)[: len(seg_b)]
    sim = da @ db.T
    best_ab = sim.argmax(1)
    mapped = _warp_seg(seg_a, H_ab)
    # Precision over MATCHABLE pairs: only a-segments whose true
    # counterpart was actually detected in view b can be matched
    # correctly; an a-segment with no true counterpart measures detection
    # recall, not descriptor quality (standard matching-score protocol).
    good, n = 0, 0
    for i in range(len(seg_a)):
        if not any(_seg_close(mapped[i], b) for b in seg_b):
            continue
        n += 1
        if _seg_close(mapped[i], seg_b[best_ab[i]]):
            good += 1
    return (good / max(n, 1)), n


@pytest.mark.slow
def test_line_repeatability_under_viewpoint():
    rng = np.random.default_rng(7)
    tex = _natural_texture(rng)
    Ra, ta = _pose(0.0)
    img_a, dep_a = synthetic_scene.render(CAM, tex, Ra, ta)
    seg_a = _detect(img_a, depth=dep_a)
    assert len(seg_a) >= 6, f"too few segments on natural texture: {len(seg_a)}"
    for angle, floor in ((5.0, 0.7), (10.0, 0.8)):
        Rb, tb = _pose(angle)
        img_b, dep_b = synthetic_scene.render(CAM, tex, Rb, tb)
        seg_b = _detect(img_b, depth=dep_b)
        H = _homography(Ra, ta, Rb, tb)
        rep = repeatability(seg_a, seg_b, H)
        # Measured level as of round 3: 0.78 at 5 deg / 0.88 at 10 deg
        # (the 5-deg misses are two long horizontal strips whose edge
        # points lose the per-cell budget race — a top-64-by-strength
        # selection-stability issue, not an appearance one; larger
        # budgets measurably HURT by crowding the cut with weak
        # hypotheses). Gates hold the measured line against regressions.
        assert rep > floor, f"repeatability {rep:.2f} at {angle} deg viewpoint"


@pytest.mark.slow
def test_line_matching_precision_with_degradations():
    rng = np.random.default_rng(11)
    tex = _natural_texture(rng)
    Ra, ta = _pose(0.0)
    Rb, tb = _pose(8.0)
    img_a, dep_a = synthetic_scene.render(CAM, tex, Ra, ta)
    img_b0, dep_b = synthetic_scene.render(CAM, tex, Rb, tb)
    H = _homography(Ra, ta, Rb, tb)
    seg_a = _detect(img_a, depth=dep_a)
    cases = {
        "clean": img_b0,
        "low contrast": 0.55 * img_b0 + 50.0,
        "noise": np.clip(
            img_b0 + rng.normal(0, 5.0, img_b0.shape), 0, 255
        ).astype(np.float32),
    }
    results = {}
    for name, img_b in cases.items():
        seg_b = _detect(img_b, depth=dep_b)
        prec, n = match_precision(img_a, img_b, seg_a, seg_b, H)
        assert n >= 5, f"{name}: only {n} matchable pairs"
        # Measured level as of round 3: 0.91 clean / 0.91 low-contrast /
        # 0.60 noise (was ~0.55 clean in round 2; the double-angle
        # orientation pair in the descriptor killed the
        # cross-orientation confusions — 4 of round 2's 5 ranking
        # failures matched >15 deg apart). The remaining noise failures
        # are parallel same-orientation strips, which only the SLAM
        # matcher's projection windows can separate.
        floor = 0.65 if name == "clean" else 0.5
        assert prec >= floor, f"{name}: precision {prec:.2f} over {n} matches"
        results[name] = prec
    # Degradations must not collapse matching relative to clean. (The
    # clean level rose to ~0.91 in round 3; the noise case keeps its
    # absolute floor above but trails the better clean number by more.)
    assert results["low contrast"] >= results["clean"] - 0.25
    assert results["noise"] >= results["clean"] - 0.35
