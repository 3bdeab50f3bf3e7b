"""Spatially-coherent consensus for the mono-init model races
(reference: GC-RANSAC for H and F, initialize/perspective.cc:70-85;
re-expressed as MSAC seed + mean-field label smoothing over the match
k-NN graph, like the plane path — ops/ransac.essential_ransac_coherent /
homography_ransac_coherent).

The smoothness energy pays off when inlierness has SPATIAL STRUCTURE —
the regime GC-RANSAC was built for:

* E race: boundary-noise true matches dropped by the hard MSAC gate
  are recruited back through their inlier neighborhoods (support gain),
  while a compact image region of WRONG associations (repeated-texture
  mismatching) stays out — its members' neighborhoods are fellow
  outliers.
* H race: the homography's true support IS a contiguous image region
  (the dominant plane); with boundary-level noise plain MSAC's hard gate
  drops scattered members of the region, which coherence recruits back
  (recall gain on the plane region).
"""

import numpy as np
import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import ransac
from tests.helpers import make_camera


def _bearing(cam, uv):
    b = np.concatenate(
        [(uv - [cam.cx, cam.cy]) / [cam.fx, cam.fy],
         np.ones((len(uv), 1))], axis=1)
    return b / np.linalg.norm(b, axis=1, keepdims=True)


def test_coherent_essential_expels_contaminated_block(rng):
    """A compact region of wrong associations: lucky members admitted by
    plain MSAC must be expelled by the coherent consensus."""
    cam = make_camera()
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    t2 = np.array([0.35, 0.0, 0.02])
    n_true, n_blk = 170, 130
    n = n_true + n_blk
    pts = np.stack([
        rng.uniform(-3.5, 3.5, n), rng.uniform(-2.5, 2.5, n),
        np.full(n, 6.0) + rng.uniform(-0.3, 0.3, n),
    ], axis=1)
    # Contaminated block: compact in view 1.
    pts[n_true:, 0] = rng.uniform(1.6, 2.9, n_blk)
    pts[n_true:, 1] = rng.uniform(-0.9, 0.5, n_blk)

    def proj(p, R, t):
        pc = p @ R.T + t
        return ((pc / pc[:, 2:3]) @ K.T)[:, :2]

    uv1 = proj(pts, np.eye(3), np.zeros(3))
    uv2 = proj(pts, np.eye(3), t2)
    uv1 += rng.normal(scale=0.3, size=uv1.shape)
    uv2[:n_true] += rng.normal(scale=0.4, size=(n_true, 2))
    # Wrong associations in the block: random view-2 positions. A few
    # land near their epipolar line by luck.
    uv2[n_true:] = np.stack([
        rng.uniform(0, cam.cols, n_blk), rng.uniform(0, cam.rows, n_blk)
    ], axis=1)

    b1 = jnp.asarray(_bearing(cam, uv1), jnp.float32)
    b2 = jnp.asarray(_bearing(cam, uv2), jnp.float32)
    valid = jnp.ones((n,), bool)
    true_mask = np.arange(n) < n_true
    thr = (2.0 / cam.focal_like) ** 2
    key = jax.random.PRNGKey(0)

    _, inl_plain, _ = ransac.essential_ransac(b1, b2, valid, key,
                                              inlier_thr=thr)
    _, inl_coh, _ = ransac.essential_ransac_coherent(
        b1, b2, jnp.asarray(uv1, jnp.float32), valid, key, inlier_thr=thr)

    false_plain = int((np.asarray(inl_plain) & ~true_mask).sum())
    false_coh = int((np.asarray(inl_coh) & ~true_mask).sum())
    true_plain = int((np.asarray(inl_plain) & true_mask).sum())
    true_coh = int((np.asarray(inl_coh) & true_mask).sum())
    # Coherence RECRUITS the spatially-supported true matches the hard
    # MSAC gate dropped (measured: 118 -> 147 on this scenario)...
    assert true_coh >= true_plain + 15, (true_plain, true_coh)
    # ...without admitting the contaminated block (whose members' k-NN
    # neighborhoods are fellow outliers).
    assert false_coh <= max(false_plain, 2), (false_plain, false_coh)


def test_coherent_homography_recruits_plane_region(rng):
    """The H race's support is the dominant-plane REGION; boundary-noise
    members dropped by the hard gate must be recruited by coherence."""
    cam = make_camera()
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    R2 = np.eye(3)
    t2 = np.array([0.4, 0.05, 0.0])
    n_pl, n_off = 170, 60
    # Plane points at z=6; off-plane points at scattered depths (they do
    # NOT satisfy the plane homography).
    pts = np.stack([
        rng.uniform(-3.5, 3.5, n_pl + n_off),
        rng.uniform(-2.5, 2.5, n_pl + n_off),
        np.concatenate([np.full(n_pl, 6.0),
                        rng.uniform(3.0, 5.0, n_off)]),
    ], axis=1)

    def proj(p, R, t):
        pc = p @ R.T + t
        return ((pc / pc[:, 2:3]) @ K.T)[:, :2]

    uv1 = proj(pts, np.eye(3), np.zeros(3))
    uv2 = proj(pts, R2, t2)
    uv1 += rng.normal(scale=0.3, size=uv1.shape)
    # Boundary-level noise on the plane members only.
    uv2[:n_pl] += rng.normal(scale=1.6, size=(n_pl, 2))
    uv2[n_pl:] += rng.normal(scale=0.3, size=(n_off, 2))

    valid = jnp.ones((n_pl + n_off,), bool)
    plane_mask = np.arange(n_pl + n_off) < n_pl
    key = jax.random.PRNGKey(1)
    p1 = jnp.asarray(uv1, jnp.float32)
    p2 = jnp.asarray(uv2, jnp.float32)

    _, inl_plain, _ = ransac.homography_ransac(p1, p2, valid, key)
    _, inl_coh, _ = ransac.homography_ransac_coherent(p1, p2, valid, key)

    rec_plain = (np.asarray(inl_plain) & plane_mask).sum() / n_pl
    rec_coh = (np.asarray(inl_coh) & plane_mask).sum() / n_pl
    off_coh = (np.asarray(inl_coh) & ~plane_mask).sum()
    # The hard gate must actually be dropping plane members here.
    assert rec_plain <= 0.85, rec_plain
    assert rec_coh >= rec_plain + 0.05, (rec_plain, rec_coh)
    # Off-plane points stay out (their neighborhoods are plane-dominated
    # only at region borders; depth difference keeps residuals large).
    assert off_coh <= 0.15 * n_off, off_coh
