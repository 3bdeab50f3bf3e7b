"""Fused Pallas matcher vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import matching, pallas_matching as pm


def _setup(rng, L=1024, N=512):
    desc_lm = rng.integers(0, 2**32, (L, 8), dtype=np.uint32)
    desc_kp = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
    # Make some keypoints near-duplicates of landmarks so real matches exist.
    for i in range(0, N, 3):
        d = desc_lm[(i * 7) % L].copy()
        d[0] ^= 0x3
        desc_kp[i] = d
    lm_bits = matching.unpack_desc_bits(jnp.asarray(desc_lm))
    kp_bits = matching.unpack_desc_bits(jnp.asarray(desc_kp))
    lm_uv = jnp.asarray(rng.uniform(0, 600, (L, 2)), jnp.float32)
    lm_rad = jnp.asarray(
        np.where(rng.uniform(size=L) < 0.9, rng.uniform(50, 400, L), -1.0),
        jnp.float32,
    )
    lm_lvl = jnp.asarray(rng.integers(0, 4, L), jnp.float32)
    kp_xy = jnp.asarray(rng.uniform(0, 600, (N, 2)), jnp.float32)
    kp_lvl = jnp.asarray(
        np.where(rng.uniform(size=N) < 0.95, rng.integers(0, 4, N), 1e9),
        jnp.float32,
    )
    lm_meta = pm.pack_meta_lm(lm_uv, lm_rad, lm_lvl)
    kp_meta = pm.pack_meta_kp(kp_xy, kp_lvl)
    return lm_bits, lm_meta, kp_bits, kp_meta


def test_fused_match_matches_reference(rng):
    args = _setup(rng)
    b_ref, s_ref, i_ref = pm.fused_match_reference(*args)
    b, s, i = pm.fused_match(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), atol=0)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=0)
    # Index must agree wherever a real match exists (masked rows arbitrary).
    has = np.asarray(b_ref) < 1024
    np.testing.assert_array_equal(np.asarray(i)[has], np.asarray(i_ref)[has])
    assert has.sum() > 50


def test_fused_match_all_masked(rng):
    args = list(_setup(rng, L=512, N=512))
    meta = np.array(args[1])
    meta[:, 2] = -1.0  # all landmarks inactive
    args[1] = jnp.asarray(meta)
    b, s, i = pm.fused_match(*args, interpret=True)
    assert (np.asarray(b) >= 1024).all()
