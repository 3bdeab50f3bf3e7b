"""Landmark statistics maintenance (reference: data/landmark.h:99-110 —
compute_descriptor keeps the median-Hamming representative descriptor;
update_normal_and_depth refreshes the ORB scale-invariance bounds)."""

import jax.numpy as jnp
import numpy as np

from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.models import mapper


def _blank_feats(N):
    return {
        "xy": jnp.zeros((N, 2), jnp.float32),
        "xr": jnp.full((N,), -1.0, jnp.float32),
        "depth": jnp.full((N,), -1.0, jnp.float32),
        "level": jnp.zeros((N,), jnp.int32),
        "angle": jnp.zeros((N,), jnp.float32),
        "desc": jnp.zeros((N, 8), jnp.uint32),
        "bearing": jnp.zeros((N, 3), jnp.float32),
        "valid": jnp.zeros((N,), bool),
    }


def _state_three_observers():
    """Three keyframes on the -z axis all observing landmark 0 at origin.

    Keyframe cameras at z = -1, -2, -4 (identity rotation), keypoint 0 of
    each keyframe references landmark 0. Descriptors: kf0 and kf1 carry
    NEAR-IDENTICAL descriptors (1 bit apart), kf2 an outlier (~128 bits
    away from both). Levels: 0, 1, 2.
    """
    st = ms.create(max_keyframes=4, max_kps=16, max_landmarks=8)
    descs = [
        np.zeros(8, np.uint32),
        np.zeros(8, np.uint32),
        np.full(8, 0xFFFFFFFF, np.uint32),
    ]
    descs[1][0] = 1  # 1 bit from descs[0]
    zs = [1.0, 2.0, 4.0]
    for k in range(3):
        feats = _blank_feats(16)
        feats["valid"] = feats["valid"].at[0].set(True)
        feats["level"] = feats["level"].at[0].set(k)
        feats["desc"] = feats["desc"].at[0].set(jnp.asarray(descs[k]))
        pose = jnp.concatenate(
            [jnp.eye(3, dtype=jnp.float32),
             jnp.array([[0.0], [0.0], [zs[k]]], jnp.float32)], axis=1
        )  # world->cam: camera center at (0,0,-z)
        lm_idx = jnp.full((16,), -1, jnp.int32).at[0].set(0)
        st = ms.add_keyframe(st, k, pose, float(k), feats, lm_idx)
    st = ms.add_landmarks(
        st,
        slots=jnp.array([0], jnp.int32),
        pos=jnp.zeros((1, 3), jnp.float32),
        desc=jnp.asarray(descs[2])[None],  # stale: created from the outlier
        normal=jnp.array([[1.0, 0.0, 0.0]], jnp.float32),
        dist_min=jnp.array([99.0], jnp.float32),
        dist_max=jnp.array([99.0], jnp.float32),
        ref_kf=jnp.array([0], jnp.int32),
        valid=jnp.array([True]),
    )
    return st


def test_representative_descriptor_median_hamming():
    st = _state_three_observers()
    out = mapper.refresh_landmark_stats(st, scale_factor=1.2, num_levels=8)
    got = np.asarray(out.lm_desc[0])
    # The two near-identical descriptors have median distance ~1/127 to
    # the others; the outlier's median is ~128. The representative must be
    # one of the near-identical pair, not the stale creation descriptor.
    assert got[7] != 0xFFFFFFFF
    assert got[0] in (0, 1) and np.all(got[1:] == 0)


def test_scale_bounds_refresh_mean_rule():
    st = _state_three_observers()
    sf, nlev = 1.2, 8
    out = mapper.refresh_landmark_stats(st, scale_factor=sf, num_levels=nlev)
    # dist_k = z_k (camera centers at (0,0,-z), landmark at origin).
    expect_max = np.mean([1.0 * sf**0, 2.0 * sf**1, 4.0 * sf**2])
    assert np.isclose(float(out.lm_dist_max[0]), expect_max, rtol=1e-5)
    assert np.isclose(
        float(out.lm_dist_min[0]), expect_max / sf ** (nlev - 1), rtol=1e-5
    )
    # Normal: all cameras look down +z toward the landmark.
    assert np.allclose(np.asarray(out.lm_normal[0]), [0, 0, 1], atol=1e-6)


def test_unobserved_landmarks_untouched():
    st = _state_three_observers()
    # Add a second landmark with no observers.
    st = ms.add_landmarks(
        st,
        slots=jnp.array([1], jnp.int32),
        pos=jnp.ones((1, 3), jnp.float32),
        desc=jnp.full((1, 8), 7, jnp.uint32),
        normal=jnp.array([[0.0, 1.0, 0.0]], jnp.float32),
        dist_min=jnp.array([0.5], jnp.float32),
        dist_max=jnp.array([2.0], jnp.float32),
        ref_kf=jnp.array([0], jnp.int32),
        valid=jnp.array([True]),
    )
    out = mapper.refresh_landmark_stats(st)
    assert np.all(np.asarray(out.lm_desc[1]) == 7)
    assert float(out.lm_dist_min[1]) == 0.5
    assert float(out.lm_dist_max[1]) == 2.0


def test_windowed_refresh_matches_full_and_preserves_outside():
    """``window_kfs`` covering every observer must reproduce the full
    refresh exactly; a window NOT containing a landmark's observers must
    leave that landmark's descriptor/bounds untouched (the chain only
    refreshes what its BA window mutated)."""
    st = _state_three_observers()
    full = mapper.refresh_landmark_stats(st)
    win = mapper.refresh_landmark_stats(
        st, window_kfs=jnp.array([0, 1, 2, -1], jnp.int32)
    )
    np.testing.assert_array_equal(np.asarray(full.lm_desc),
                                  np.asarray(win.lm_desc))
    np.testing.assert_allclose(np.asarray(full.lm_dist_max),
                               np.asarray(win.lm_dist_max), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(full.lm_dist_min),
                               np.asarray(win.lm_dist_min), rtol=1e-6)

    # Window excluding all of landmark 0's observers: descriptor
    # preserved (window-only aggregation can't see its observations);
    # bounds/normals always aggregate over ALL observers regardless of
    # the window (they are cheap indicator contractions), so they match
    # the full refresh.
    out = mapper.refresh_landmark_stats(
        st, window_kfs=jnp.array([3, -1], jnp.int32)
    )
    np.testing.assert_array_equal(np.asarray(out.lm_desc[0]),
                                  np.asarray(st.lm_desc[0]))
    assert np.isclose(float(out.lm_dist_max[0]), float(full.lm_dist_max[0]))


def test_windowed_refresh_partial_overlap_aggregates_all_observers():
    """Round-4 advisor (high): a landmark observed by keyframes both
    inside and outside the window must NOT have its stats recomputed from
    the in-window subset alone. Bounds must equal the full-aggregation
    value (reference landmark::update_normal_and_depth walks every
    observation); the representative descriptor must not be overwritten
    from a subset (kept until a refresh sees the full observer set)."""
    st = _state_three_observers()
    full = mapper.refresh_landmark_stats(st)
    # Window holds ONE of landmark 0's three observers (kf 1).
    out = mapper.refresh_landmark_stats(
        st, window_kfs=jnp.array([1, -1, -1, -1], jnp.int32)
    )
    # Bounds: full-aggregation mean, not the z=2 single-observer value.
    assert np.isclose(float(out.lm_dist_max[0]), float(full.lm_dist_max[0]),
                      rtol=1e-5)
    assert np.isclose(float(out.lm_dist_min[0]), float(full.lm_dist_min[0]),
                      rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.lm_normal[0]),
                               np.asarray(full.lm_normal[0]), atol=1e-6)
    # Descriptor: subset pick suppressed — stored descriptor kept.
    np.testing.assert_array_equal(np.asarray(out.lm_desc[0]),
                                  np.asarray(st.lm_desc[0]))


def test_local_ba_returned_cams_have_no_duplicates():
    """Round-4 advisor (medium): local_ba's return_cams must pad empty
    fixed slots with -1 (not clip to keyframe 0) and mask below-gate
    covisibles, so windowed stats consumers never see duplicate rows."""
    from tests import helpers

    rng = np.random.default_rng(3)
    cam = helpers.make_camera()
    K_mat = helpers.K_of(cam)
    pts = rng.uniform([-1.5, -1.0, 3.0], [1.5, 1.0, 6.0], (24, 3))
    st = ms.create(max_keyframes=4, max_kps=32, max_landmarks=32)
    for k in range(3):
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.12 * k, 0.0, 0.0], np.float32)
        uv, _ = helpers.project_points(R, t, K_mat, pts)
        feats = _blank_feats(32)
        feats["xy"] = feats["xy"].at[:24].set(jnp.asarray(uv, jnp.float32))
        feats["valid"] = feats["valid"].at[:24].set(True)
        b = np.concatenate([(uv - K_mat[:2, 2]) / np.diag(K_mat)[:2],
                            np.ones((24, 1))], axis=1)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        feats["bearing"] = feats["bearing"].at[:24].set(
            jnp.asarray(b, jnp.float32))
        pose = jnp.asarray(
            np.concatenate([R, t[:, None]], axis=1), jnp.float32)
        lm_idx = jnp.full((32,), -1, jnp.int32).at[:24].set(
            jnp.arange(24, dtype=jnp.int32))
        st = ms.add_keyframe(st, k, pose, float(k), feats, lm_idx)
    st = ms.add_landmarks(
        st,
        slots=jnp.arange(24, dtype=jnp.int32),
        pos=jnp.asarray(pts, jnp.float32),
        desc=jnp.zeros((24, 8), jnp.uint32),
        normal=jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (24, 1)),
        dist_min=jnp.full((24,), 0.5, jnp.float32),
        dist_max=jnp.full((24,), 20.0, jnp.float32),
        ref_kf=jnp.zeros((24,), jnp.int32),
        valid=jnp.ones((24,), bool),
    )
    inv_sig = jnp.asarray(1.0 / (1.2 ** (2 * np.arange(8))), jnp.float32)
    _, _, cams = mapper.local_ba(
        cam, st, jnp.int32(1), inv_sig, return_cams=True
    )
    cams = np.asarray(cams)
    live = cams[cams >= 0]
    # 3 valid keyframes, all covisible (weight 24 >= 15) -> all three in
    # the optimize half, every other slot -1. No duplicates, no phantom
    # keyframe 0 from clipped padding.
    assert sorted(live.tolist()) == [0, 1, 2]
    assert len(cams) > 3 and np.all(cams[np.isin(cams, live, invert=True)] == -1)
