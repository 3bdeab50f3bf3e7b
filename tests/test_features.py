"""Tests for the ORB pipeline: FAST, selection, orientation, BRIEF, Hamming.

Validation strategy mirrors the reference's orb_extractor test
(test/PLPSLAM/feature/orb_extractor.cc): run on synthetic images with known
structure and check statistical properties, plus invariance checks (the
descriptor of a rotated patch should match the unrotated one).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from structure_plp_slam_tpu.ops import fast as fast_ops
from structure_plp_slam_tpu.ops import hamming, image as image_ops
from structure_plp_slam_tpu.ops import orb


def isolated_squares(h=480, w=640, pitch=48, size=20, off=8):
    """Bright squares on black: every square corner is an ideal FAST corner.

    (A perfect checkerboard is a FAST *counter*-example: at its X-junctions
    the diagonal squares share a color, so the longest contiguous arc is 4
    of 16 and FAST-9 correctly stays silent.)
    """
    img = np.zeros((h, w), np.float32)
    corners = []
    for y0 in range(off, h - size, pitch):
        for x0 in range(off, w - size, pitch):
            img[y0 : y0 + size, x0 : x0 + size] = 255.0
            corners += [
                (x0, y0),
                (x0 + size - 1, y0),
                (x0, y0 + size - 1),
                (x0 + size - 1, y0 + size - 1),
            ]
    return img, np.array(corners, np.float32)


def textured_image(rng, h=240, w=320):
    """Smooth random texture with good corners: blurred noise + blobs."""
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    img = np.array(image_ops.gaussian_blur(jnp.asarray(img), 7, 2.0))
    # Add some strong square corners.
    for _ in range(30):
        cy, cx = rng.integers(30, h - 30), rng.integers(30, w - 30)
        img[cy : cy + 12, cx : cx + 12] = rng.uniform(0, 255)
    return img


def test_fast_detects_square_corners():
    img, corners = isolated_squares()
    score = fast_ops.fast_score_map(jnp.asarray(img), 20.0, 7.0)
    score = fast_ops.nms3x3(score)
    xy, resp, valid = fast_ops.select_keypoints(score, max_total=1024, margin=8)
    xy = np.asarray(xy)[np.asarray(valid)]
    assert len(xy) > 100
    # Every detection lies within 2.5 px of a true square corner.
    d = np.linalg.norm(xy[:, None, :] - corners[None, :, :], axis=-1).min(axis=1)
    assert np.median(d) <= 1.5
    assert (d <= 2.5).mean() > 0.9


def test_fast_flat_image_no_corners():
    img = np.full((120, 160), 128.0, np.float32)
    score = fast_ops.fast_score_map(jnp.asarray(img), 20.0, 7.0)
    xy, resp, valid = fast_ops.select_keypoints(score, max_total=64, margin=8)
    assert not np.asarray(valid).any()


def test_nms_keeps_single_peak():
    img = np.zeros((64, 64), np.float32)
    img[32, 32] = 10.0
    img[32, 33] = 8.0
    out = np.asarray(fast_ops.nms3x3(jnp.asarray(img)))
    assert out[32, 32] == 10.0
    assert out[32, 33] == 0.0


def test_orb_extractor_shapes(rng):
    img = textured_image(rng)
    ext = orb.OrbExtractor(240, 320, orb.OrbParams(max_num_keypts=500, num_levels=4))
    feats = ext(jnp.asarray(img))
    K = ext.capacity
    assert feats["xy"].shape == (K, 2)
    assert feats["desc"].shape == (K, 8)
    assert feats["valid"].shape == (K,)
    assert int(np.asarray(feats["valid"]).sum()) > 100
    # Level-0 coordinates stay in image bounds.
    xy = np.asarray(feats["xy"])[np.asarray(feats["valid"])]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 320).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 240).all()


def test_brief_descriptor_determinism(rng):
    img = textured_image(rng)
    ext = orb.OrbExtractor(240, 320, orb.OrbParams(max_num_keypts=300, num_levels=2))
    f1 = ext(jnp.asarray(img))
    f2 = ext(jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(f1["desc"]), np.asarray(f2["desc"]))


def test_descriptor_matches_under_translation(rng):
    """Shifting the image should preserve most descriptors (trackability)."""
    img = textured_image(rng)
    shift = 6
    img2 = np.roll(img, shift, axis=1)
    ext = orb.OrbExtractor(240, 320, orb.OrbParams(max_num_keypts=400, num_levels=1))
    fa = ext(jnp.asarray(img))
    fb = ext(jnp.asarray(img2))
    dist = hamming.distance_matrix(fa["desc"], fb["desc"], fa["valid"], fb["valid"])
    matches = hamming.mutual_best_matches(dist, max_dist=60)
    m = np.asarray(matches)
    va = np.asarray(fa["valid"])
    xa = np.asarray(fa["xy"])
    xb = np.asarray(fb["xy"])
    matched = [(i, j) for i, j in enumerate(m) if j >= 0 and va[i]]
    assert len(matched) > 30
    dx = np.array([xb[j, 0] - xa[i, 0] for i, j in matched])
    # Majority of matches should show the true shift.
    frac_correct = np.mean(np.abs(dx - shift) < 2.0)
    assert frac_correct > 0.6


def test_popcount():
    x = jnp.asarray(np.array([0, 1, 3, 0xFFFFFFFF, 0x80000000], np.uint32))
    out = np.asarray(hamming.popcount_u32(x))
    np.testing.assert_array_equal(out, [0, 1, 2, 32, 1])


def test_hamming_distance_matrix_masks():
    a = jnp.asarray(np.zeros((3, 8), np.uint32))
    b = jnp.asarray(np.zeros((2, 8), np.uint32))
    va = jnp.asarray(np.array([True, False, True]))
    vb = jnp.asarray(np.array([True, True]))
    d = np.asarray(hamming.distance_matrix(a, b, va, vb))
    assert d[0, 0] == 0
    assert d[1, 0] == 1024
    assert d.shape == (3, 2)


def test_ic_angle_gradient_direction():
    """A patch brighter on the right should give angle ~ 0."""
    img = np.tile(np.linspace(0, 255, 64, dtype=np.float32), (64, 1))
    xy = jnp.asarray(np.array([[32.0, 32.0]], np.float32))
    ang = float(np.asarray(orb.ic_angles(jnp.asarray(img), xy))[0])
    assert abs(ang) < 0.1


def test_pyramid_shapes():
    shapes = image_ops.pyramid_shapes(480, 640, 8, 1.2)
    assert shapes[0] == (480, 640)
    assert len(shapes) == 8
    assert shapes[1] == (400, 533)


def test_extraction_mask_per_frame(rng):
    """feed-time mask (0 = excluded) drops keypoints in masked regions
    (reference: orb_extractor::extract with in_image_mask)."""
    from structure_plp_slam_tpu.models import frontend as frontend_mod
    from structure_plp_slam_tpu.ops.orb import OrbParams
    from tests.helpers import make_camera

    cam = make_camera(cols=256, rows=192, fx=200.0, fy=200.0, cx=127.5,
                      cy=95.5)
    fe = frontend_mod.Frontend(cam, OrbParams(max_num_keypts=400,
                                              num_levels=3), pad_to=1024)
    img = rng.uniform(0, 255, (192, 256)).astype(np.float32)
    mask = np.ones((192, 256), np.uint8)
    mask[:, 128:] = 0  # exclude right half
    out = fe.mono(img, mask=mask)
    xy = np.asarray(out["xy"])[np.asarray(out["valid"])]
    assert len(xy) > 20
    assert (xy[:, 0] < 128).all()
    # Unmasked extraction does produce right-half keypoints.
    out2 = fe.mono(img)
    xy2 = np.asarray(out2["xy"])[np.asarray(out2["valid"])]
    assert (xy2[:, 0] >= 128).any()


def test_extraction_mask_rectangles(rng):
    """Config-level normalized rectangles (Feature.mask_rectangles) are
    applied to every frame (reference: create_rectangle_mask)."""
    from structure_plp_slam_tpu.config import load_config
    from structure_plp_slam_tpu.models import frontend as frontend_mod

    cfg = load_config(yaml_text="""%YAML:1.0
Camera.name: m
Camera.setup: monocular
Camera.model: perspective
Camera.fx: 200.0
Camera.fy: 200.0
Camera.cx: 127.5
Camera.cy: 95.5
Camera.cols: 256
Camera.rows: 192
Feature.max_num_keypoints: 400
Feature.num_levels: 3
Feature.mask_rectangles:
  - [0.0, 1.0, 0.0, 0.5]
""")
    assert cfg.orb.mask_rects == ((0.0, 1.0, 0.0, 0.5),)
    fe = frontend_mod.Frontend(cfg.camera, cfg.orb, pad_to=1024)
    img = rng.uniform(0, 255, (192, 256)).astype(np.float32)
    out = fe.mono(img)
    xy = np.asarray(out["xy"])[np.asarray(out["valid"])]
    assert len(xy) > 20
    assert (xy[:, 1] >= 96).all()  # top half excluded
