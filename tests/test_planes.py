"""Plane landmark tests: RANSAC fitting, mask bucketing, system run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import CameraSetup
from structure_plp_slam_tpu.models import planar_mapper
from structure_plp_slam_tpu.ops import plane_fit
from structure_plp_slam_tpu.system import System, TrackerState
from tests import synthetic_scene
from tests.test_system_e2e import _camera, _orb


def test_plane_ransac_recovers_plane(rng):
    n_gt = np.array([0.2, -0.3, 0.93])
    n_gt /= np.linalg.norm(n_gt)
    d_gt = -2.0
    # Points on the plane + noise + outliers.
    basis = np.linalg.svd(n_gt[None])[2][1:]
    uv = rng.uniform(-3, 3, (200, 2))
    pts = (-d_gt) * n_gt + uv @ basis + rng.normal(scale=0.01, size=(200, 3))
    out = rng.normal(scale=2.0, size=(60, 3)) + [0, 0, 2.0]
    allp = np.concatenate([pts, out]).astype(np.float32)
    coef, inl, n_inl = plane_fit.plane_ransac(
        jnp.asarray(allp), jnp.ones((260,), bool), jax.random.PRNGKey(0),
        inlier_thr=0.04,
    )
    coef = np.asarray(coef)
    if coef[:3] @ n_gt < 0:
        coef = -coef
    assert int(n_inl) > 150
    np.testing.assert_allclose(coef[:3], n_gt, atol=0.02)
    np.testing.assert_allclose(coef[3], d_gt, atol=0.05)


def test_plane_ransac_coherent_recovers_plane(rng):
    # Same setup as the plain-RANSAC test: the coherent consensus must fit
    # at least as well.
    n_gt = np.array([0.2, -0.3, 0.93])
    n_gt /= np.linalg.norm(n_gt)
    d_gt = -2.0
    basis = np.linalg.svd(n_gt[None])[2][1:]
    uv = rng.uniform(-3, 3, (200, 2))
    pts = (-d_gt) * n_gt + uv @ basis + rng.normal(scale=0.01, size=(200, 3))
    out = rng.normal(scale=2.0, size=(60, 3)) + [0, 0, 2.0]
    allp = np.concatenate([pts, out]).astype(np.float32)
    coef, inl, n_inl = plane_fit.plane_ransac_coherent(
        jnp.asarray(allp), jnp.ones((260,), bool), jax.random.PRNGKey(0),
        inlier_thr=0.04,
    )
    coef = np.asarray(coef)
    if coef[:3] @ n_gt < 0:
        coef = -coef
    assert int(n_inl) > 150
    np.testing.assert_allclose(coef[:3], n_gt, atol=0.02)
    np.testing.assert_allclose(coef[3], d_gt, atol=0.05)


def test_plane_ransac_coherent_spatial_coherence(rng):
    """The mean-field smoothing must do the graph cut's job: recruit a
    boundary point surrounded by inliers, reject a residual-lucky point
    embedded in an outlier cluster."""
    thr = 0.04
    # z=0 plane cluster around the origin.
    plane_pts = np.concatenate(
        [rng.uniform(-1, 1, (150, 2)), rng.normal(scale=0.005, size=(150, 1))],
        axis=1,
    )
    # Boundary point: 1.5*thr off-plane, spatially inside the cluster.
    boundary = np.array([[0.1, 0.1, 1.5 * thr]])
    # Outlier cluster far away in x, spread in z — except one member that
    # happens to lie within the residual threshold.
    out_cluster = np.concatenate(
        [10.0 + rng.uniform(-0.3, 0.3, (40, 2)),
         rng.uniform(0.5, 2.0, (40, 1))], axis=1,
    )
    lucky = np.array([[10.0, 10.0, 0.5 * thr]])
    allp = np.concatenate([plane_pts, boundary, out_cluster, lucky]).astype(
        np.float32
    )
    coef, inl, _ = plane_fit.plane_ransac_coherent(
        jnp.asarray(allp), jnp.ones((len(allp),), bool),
        jax.random.PRNGKey(1), inlier_thr=thr,
    )
    inl = np.asarray(inl)
    assert inl[:150].mean() > 0.9          # plane cluster kept
    assert inl[150]                        # boundary point recruited
    assert not inl[151:191].any()          # outlier cluster rejected
    assert not inl[191]                    # residual-lucky point rejected
    # Plain MSAC keeps the lucky point (no spatial term) — the coherent
    # variant is strictly the differentiator here.
    _, inl_plain, _ = plane_fit.plane_ransac(
        jnp.asarray(allp), jnp.ones((len(allp),), bool),
        jax.random.PRNGKey(1), inlier_thr=thr,
    )
    assert np.asarray(inl_plain)[191]


def test_fit_plane_svd_weighted(rng):
    pts = np.zeros((50, 3), np.float32)
    pts[:, :2] = rng.uniform(-1, 1, (50, 2))
    pts[:, 2] = 5.0  # z = 5 plane
    garbage = rng.normal(size=(20, 3)).astype(np.float32)
    allp = jnp.asarray(np.concatenate([pts, garbage]))
    w = jnp.asarray(np.concatenate([np.ones(50), np.zeros(20)]), jnp.float32)
    n, d = plane_fit.fit_plane_svd(allp, w)
    n = np.asarray(n)
    if n[2] < 0:
        n, d = -n, -d
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-4)
    np.testing.assert_allclose(float(d), -5.0, atol=1e-3)


def test_label_keypoints_consistency():
    mask = np.zeros((60, 80), np.int32)
    mask[10:30, 10:40] = 1
    mask[35:55, 45:75] = 2
    xy = jnp.asarray(
        np.array(
            [[20.0, 20.0], [60.0, 45.0], [10.0, 10.0], [5.0, 5.0]], np.float32
        )
    )
    valid = jnp.ones((4,), bool)
    labels = np.asarray(
        planar_mapper.label_keypoints(jnp.asarray(mask), xy, valid)
    )
    assert labels[0] == 1
    assert labels[1] == 2
    assert labels[2] == 0  # boundary pixel: 3x3 not consistent
    assert labels[3] == 0  # background


@pytest.mark.slow
def test_rgbd_plane_slam(rng):
    """Full run with synthetic PlaneRecNet-style masks: fg patch =
    instance 1, background plane = instance 2."""
    cam = _camera(CameraSetup.RGBD)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    tex = synthetic_scene.make_texture(rng)
    poses = synthetic_scene.trajectory(10, step=0.06)
    slam = System(cfg, max_keyframes=32, max_landmarks=8192, max_kf_interval=2)
    slam.startup()
    for i, (R, t) in enumerate(poses):
        img, depth = synthetic_scene.render(cam, tex, R, t)
        mask = np.where(depth < 4.5, 1, 2).astype(np.int32)
        slam.feed_RGBD_frame(img, depth, float(i) / 30.0, seg_mask=mask)
    slam.shutdown()
    assert slam.tracking_state is TrackerState.TRACKING
    pl_valid = np.asarray(slam.state.pl_valid)
    assert pl_valid.sum() >= 1, "no planes instantiated"
    coefs = np.asarray(slam.state.pl_coef)[pl_valid]
    # Both scene planes are z = const: normals ~ ±z, offsets ~ 3.5 or 6.
    for c in coefs:
        n, d = c[:3], c[3]
        if n[2] < 0:
            n, d = -n, -d
        assert abs(n[2]) > 0.98, f"normal {n}"
        assert min(abs(-d - 3.5), abs(-d - 6.0)) < 0.3, f"offset {d}"
    # Owned landmarks exist and lie on their planes.
    owned = np.asarray(slam.state.lm_plane) >= 0
    assert owned.sum() > 30
