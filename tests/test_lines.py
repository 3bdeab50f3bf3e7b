"""Tests for line detection, description, and Plücker geometry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import line_geometry as lg
from structure_plp_slam_tpu.ops import lines
from tests.helpers import make_camera


def synthetic_line_image(segments, h=240, w=320, thickness=2):
    """White background with dark line segments drawn."""
    img = np.full((h, w), 200.0, np.float32)
    for (x1, y1, x2, y2) in segments:
        n = int(max(abs(x2 - x1), abs(y2 - y1)) * 2 + 1)
        xs = np.linspace(x1, x2, n)
        ys = np.linspace(y1, y2, n)
        for dx in range(-thickness // 2, thickness // 2 + 1):
            for dy in range(-thickness // 2, thickness // 2 + 1):
                xi = np.clip((xs + dx).astype(int), 0, w - 1)
                yi = np.clip((ys + dy).astype(int), 0, h - 1)
                img[yi, xi] = 30.0
    return img


SEGS = [(40, 40, 260, 60), (60, 200, 280, 120), (150, 30, 160, 210)]


def _detect(img, seed=0):
    return lines.detect_line_segments(jnp.asarray(img), jax.random.PRNGKey(seed))


def test_detects_drawn_segments():
    img = synthetic_line_image(SEGS)
    seg, valid, score = _detect(img)
    seg = np.asarray(seg)[np.asarray(valid)]
    assert len(seg) >= 3
    # Every drawn segment should have a detection with similar direction
    # and small midpoint distance.
    for (x1, y1, x2, y2) in SEGS:
        gt_dir = np.array([x2 - x1, y2 - y1], float)
        gt_dir /= np.linalg.norm(gt_dir)
        gt_mid = np.array([(x1 + x2) / 2, (y1 + y2) / 2])
        found = False
        for s in seg:
            d = np.array([s[2] - s[0], s[3] - s[1]])
            if np.linalg.norm(d) < 20:
                continue
            d = d / np.linalg.norm(d)
            mid = np.array([(s[0] + s[2]) / 2, (s[1] + s[3]) / 2])
            # Distance from gt midpoint to the detected line.
            nrm = np.array([-d[1], d[0]])
            dist = abs(np.dot(gt_mid - mid, nrm))
            if abs(np.dot(d, gt_dir)) > 0.98 and dist < 4.0:
                found = True
                break
        assert found, f"segment {(x1, y1, x2, y2)} not detected"


def test_no_lines_in_flat_image():
    img = np.full((240, 320), 128.0, np.float32)
    seg, valid, score = _detect(img)
    assert not np.asarray(valid).any()


def test_descriptors_match_across_shift():
    img1 = synthetic_line_image(SEGS)
    img2 = np.roll(img1, 5, axis=1)
    s1, v1, _ = _detect(img1, 0)
    s2, v2, _ = _detect(img2, 1)
    d1 = lines.line_band_descriptors(jnp.asarray(img1), s1, v1)
    d2 = lines.line_band_descriptors(jnp.asarray(img2), s2, v2)
    dist = np.asarray(lines.line_descriptor_distance_matrix(d1, d2, v1, v2))
    n1 = int(np.asarray(v1).sum())
    # Each valid line in img1 should have a strong match in img2.
    good = 0
    for i in range(len(dist)):
        if not np.asarray(v1)[i]:
            continue
        if dist[i].min() < 0.25:
            good += 1
    assert good >= max(2, int(0.6 * n1))


# ---------------------------------------------------------------------------
# Plücker geometry.
# ---------------------------------------------------------------------------


def test_plucker_roundtrip_orthonormal(rng):
    p1 = rng.normal(size=(16, 3)).astype(np.float32) * 2
    p2 = p1 + rng.normal(size=(16, 3)).astype(np.float32)
    pl = lg.plucker_from_endpoints(jnp.asarray(p1), jnp.asarray(p2))
    U, w = lg.plucker_to_orthonormal(pl)
    norm = np.linalg.norm(np.asarray(pl), axis=-1)
    pl2 = lg.orthonormal_to_plucker(U, w, scale=jnp.asarray(norm)[:, None])
    np.testing.assert_allclose(np.asarray(pl2), np.asarray(pl), atol=1e-5)


def test_transform_line_consistency(rng):
    from structure_plp_slam_tpu.ops import lie

    p1 = rng.normal(size=(8, 3)).astype(np.float32)
    p2 = p1 + rng.normal(size=(8, 3)).astype(np.float32)
    pl_w = lg.plucker_from_endpoints(jnp.asarray(p1), jnp.asarray(p2))
    phi = rng.normal(size=3).astype(np.float32) * 0.5
    R = lie.so3_exp(jnp.asarray(phi[None]))[0]
    t = jnp.asarray(rng.normal(size=3).astype(np.float32))
    pl_c = lg.transform_line(pl_w, R, t)
    # Transformed endpoints must lie on the transformed line: |p x d - m|=0.
    q1 = p1 @ np.asarray(R).T + np.asarray(t)
    m_c = np.asarray(pl_c)[:, :3]
    d_c = np.asarray(pl_c)[:, 3:]
    err = np.cross(q1, d_c) - m_c
    np.testing.assert_allclose(err, 0, atol=1e-5)


def test_line_triangulation_and_projection(rng):
    cam = make_camera(cols=320, rows=240, fx=260.0, fy=260.0, cx=159.5, cy=119.5)
    # A 3D segment in front of two cameras.
    P1 = np.array([[-1.0, -0.5, 6.0]], np.float32)
    P2 = np.array([[1.2, 0.6, 7.0]], np.float32)
    from structure_plp_slam_tpu.ops import lie

    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    R2 = np.array(
        lie.so3_exp(jnp.asarray(np.array([[0.0, 0.06, 0.0]]), jnp.float32))
    )[0]
    t2 = np.array([-0.5, 0.05, 0.0], np.float32)

    def project_pts(P, R, t):
        pc = P @ R.T + t
        return np.stack(
            [
                cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                cam.fy * pc[:, 1] / pc[:, 2] + cam.cy,
            ],
            axis=1,
        )

    uv1a = project_pts(P1, R1, t1)[0]
    uv1b = project_pts(P2, R1, t1)[0]
    uv2a = project_pts(P1, R2, t2)[0]
    uv2b = project_pts(P2, R2, t2)[0]
    seg1 = jnp.asarray(np.concatenate([uv1a, uv1b])[None], jnp.float32)
    seg2 = jnp.asarray(np.concatenate([uv2a, uv2b])[None], jnp.float32)

    pl_w, ok = lg.triangulate_line_two_view(
        cam, seg1, seg2,
        jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2), jnp.asarray(t2),
    )
    assert bool(ok[0])
    # GT endpoints must lie on the line.
    m = np.asarray(pl_w)[0, :3]
    d = np.asarray(pl_w)[0, 3:]
    for P in (P1[0], P2[0]):
        np.testing.assert_allclose(np.cross(P, d), m, atol=1e-3)

    # Projection into view 2 must pass through both observed endpoints.
    pl_c2 = lg.transform_line(pl_w, jnp.asarray(R2), jnp.asarray(t2))
    l2 = lg.project_line(cam, pl_c2)
    dists = lg.endpoint_line_distances(
        l2, jnp.asarray(uv2a[None]), jnp.asarray(uv2b[None])
    )
    np.testing.assert_allclose(np.asarray(dists), 0, atol=0.1)

    # Endpoint trimming recovers camera-frame endpoints.
    eps, ok2 = lg.trim_endpoints(cam, pl_c2, seg2)
    assert bool(ok2[0])
    pc_gt = np.stack([P1[0] @ np.asarray(R2).T + t2, P2[0] @ np.asarray(R2).T + t2])
    np.testing.assert_allclose(np.asarray(eps)[0], pc_gt, atol=5e-2)
