"""Place-recognition retrieval (loop closing / relocalization).

TPU-native replacement for the reference's DBoW2 vocabulary + inverted
index (src/PLPSLAM/data/bow_vocabulary.h, bow_database.{h,cc}). The
reference needs a learned tree vocabulary and inverted files because CPU
place scoring must avoid touching every keyframe. On TPU the strongest
scoring — direct descriptor matching against EVERY keyframe — is one
chunked bit-plane matmul, so the vocabulary disappears entirely:

  score(query, kf) = (# query descriptors whose best Hamming distance in
                      kf is < thr) / (# valid query descriptors)

This is strictly more discriminative than word-histogram cosine (a word
histogram is a lossy proxy for exactly this count) and needs no training
data. Scores land in [0, 1]; unrelated views score ~0 (a 256-bit chance
match below 30 bits is ~12 sigma out), re-visits score like the fraction
of co-observed features.

STATELESS by design: the MapState's ``kf_desc`` / ``kf_kp_valid`` /
``kf_valid`` ARE the index. Descriptor bit-planes are unpacked on the fly
per chunk inside the scoring scan — no [K, N, 256] cache to keep in HBM
(268 MB at K=256/N=2048, >1 GB at KITTI scale), no add/remove bookkeeping
to keep in sync with keyframe culling or capacity growth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.ops import matching


@functools.partial(jax.jit, static_argnames=("max_hamming", "chunk"))
def _scores_impl(kf_desc, kf_kp_valid, kf_valid, q_desc, q_valid,
                 *, max_hamming: int = 30, chunk: int = 8):
    """[K] match-count scores of a query descriptor set against every
    stored keyframe. One bf16 matmul per ``chunk`` keyframes."""
    K, N, _ = kf_desc.shape
    C = chunk
    Kp = ((K + C - 1) // C) * C
    if Kp != K:
        kf_desc = jnp.pad(kf_desc, ((0, Kp - K), (0, 0), (0, 0)))
        kf_kp_valid = jnp.pad(kf_kp_valid, ((0, Kp - K), (0, 0)))
        kf_valid = jnp.pad(kf_valid, (0, Kp - K))
    q_bits = matching.unpack_desc_bits(q_desc)  # [Nq, 256]

    def body(carry, k0):
        blk_desc = jax.lax.dynamic_slice(kf_desc, (k0, 0, 0), (C, N, 8))
        blk_kp = jax.lax.dynamic_slice(kf_kp_valid, (k0, 0), (C, N))
        blk_kf = jax.lax.dynamic_slice(kf_valid, (k0,), (C,))
        blk_bits = matching.unpack_desc_bits(blk_desc)  # [C, N, 256]
        dot = jax.lax.dot_general(
            q_bits,
            blk_bits.reshape(C * N, 256),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # [Nq, C*N]
        d = ((256.0 - dot) * 0.5).reshape(-1, C, N)
        d = jnp.where((blk_kp & blk_kf[:, None])[None], d, 1024.0)
        best = jnp.min(d, axis=-1)  # [Nq, C]
        cnt = jnp.sum((best <= max_hamming) & q_valid[:, None], axis=0)
        return carry, cnt

    k0s = jnp.arange(0, Kp, C)
    _, counts = jax.lax.scan(body, None, k0s)
    counts = counts.reshape(-1)[:K].astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(q_valid), 1).astype(jnp.float32)
    return counts / denom


class BowIndex:
    """Match-count retrieval over the MapState's keyframe descriptors.

    Construction takes only scoring knobs; queries take the state."""

    def __init__(self, max_hamming: int = 30, chunk: int = 8):
        self.max_hamming = max_hamming
        self.chunk = chunk

    def scores(self, state, query_desc_u32, query_valid) -> jax.Array:
        """``[K]`` scores of a query frame's descriptors (relocalization
        candidates, bow_database.cc:170)."""
        return _scores_impl(
            state.kf_desc, state.kf_kp_valid, state.kf_valid,
            query_desc_u32, query_valid,
            max_hamming=self.max_hamming, chunk=self.chunk,
        )

    def scores_for_slot(self, state, slot) -> jax.Array:
        """``[K]`` scores of stored keyframe ``slot`` against all keyframes
        (loop candidates, bow_database.cc:97)."""
        return _scores_impl(
            state.kf_desc, state.kf_kp_valid, state.kf_valid,
            state.kf_desc[slot], state.kf_kp_valid[slot],
            max_hamming=self.max_hamming, chunk=self.chunk,
        )
