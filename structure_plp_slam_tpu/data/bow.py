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

Descriptor storage is the MapState's own ``kf_desc`` — the index adds no
state beyond a cached bit-plane tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from structure_plp_slam_tpu.ops import matching


class BowIndex:
    """Match-count retrieval over keyframe slots.

    Keeps a ``[K, N, 256]`` bf16 bit-plane cache updated per keyframe
    (device-resident; ~270 MB at K=256, N=2048 — small against HBM).
    """

    def __init__(self, max_keyframes: int, max_hamming: int = 30,
                 chunk: int = 8):
        self.max_keyframes = max_keyframes
        self.max_hamming = max_hamming
        self.chunk = chunk
        self._bits = None  # lazily shaped on first add: [K, N, 256] bf16
        self._valid = None  # [K, N] bool
        self._score = jax.jit(self._score_impl)

    def _ensure(self, n_kps):
        if self._bits is None:
            self._bits = jnp.zeros(
                (self.max_keyframes, n_kps, 256), jnp.bfloat16
            )
            self._valid = jnp.zeros((self.max_keyframes, n_kps), bool)

    # ------------------------------------------------------------------
    def add(self, slot: int, desc_u32, valid):
        self._ensure(desc_u32.shape[0])
        bits = matching.unpack_desc_bits(desc_u32)
        self._bits = self._bits.at[slot].set(bits)
        self._valid = self._valid.at[slot].set(valid)

    def remove(self, slot: int):
        if self._valid is not None:
            self._valid = self._valid.at[slot].set(False)

    # ------------------------------------------------------------------
    def _score_impl(self, kf_bits, kf_valid, q_bits, q_valid):
        K, N, _ = kf_bits.shape
        C = self.chunk

        def body(carry, k0):
            blk_bits = jax.lax.dynamic_slice(
                kf_bits, (k0, 0, 0), (C, N, 256)
            )
            blk_valid = jax.lax.dynamic_slice(kf_valid, (k0, 0), (C, N))
            dot = jax.lax.dot_general(
                q_bits,
                blk_bits.reshape(C * N, 256),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # [Nq, C*N]
            d = ((256.0 - dot) * 0.5).reshape(-1, C, N)
            d = jnp.where(blk_valid[None], d, 1024.0)
            best = jnp.min(d, axis=-1)  # [Nq, C]
            cnt = jnp.sum(
                (best <= self.max_hamming) & q_valid[:, None], axis=0
            )  # [C]
            return carry, cnt

        k0s = jnp.arange(0, K, C)
        _, counts = jax.lax.scan(body, None, k0s)
        counts = counts.reshape(-1)[:K].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(q_valid), 1).astype(jnp.float32)
        return counts / denom

    def scores(self, query_desc_u32, query_valid) -> jax.Array:
        """``[K]`` match-count scores of a query descriptor set."""
        self._ensure(query_desc_u32.shape[0])
        q_bits = matching.unpack_desc_bits(query_desc_u32)
        return self._score(self._bits, self._valid, q_bits, query_valid)

    # Back-compat shims for callers that stored "encoded" queries.
    def encode(self, desc_u32, valid):
        return (desc_u32, valid)

    def similarities(self, encoded_or_slot):
        if isinstance(encoded_or_slot, tuple):
            return self.scores(*encoded_or_slot)
        raise TypeError("pass (desc, valid) from encode()")

    def scores_for_slot(self, slot: int) -> jax.Array:
        """Scores of a stored keyframe against all keyframes."""
        # Rebuild u32 is unnecessary: score directly with the cached bits.
        q_bits = self._bits[slot].astype(jnp.bfloat16)
        q_valid = self._valid[slot]
        return self._score(self._bits, self._valid, q_bits, q_valid)
