"""libhaloc-style global image hashing as one matmul.

TPU-native equivalent of the trimmed haloc used by the reference
(reference: src/hash.cpp:39-85 init/getHash, include/hash.h — three
seeded random unit projections of the frame's descriptor matrix giving a
compact float hash; loop candidates ranked by L1 hash distance,
src/KeyFrameDatabase.cc:74-136 DetectLoopCandidatesHaloc).

Here the hash of a frame is H = R @ D where R is a [n_proj, N_feat]
seeded random unit-row matrix and D the [N_feat, 256] 0/1 descriptor
matrix (masked rows zeroed): one [n_proj x N] x [N x 256] matmul ->
flattened [n_proj * 256] float signature. Distances between all stored
hashes are a single broadcast L1 reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_PROJ = 3
HASH_DIM = N_PROJ * 256


@functools.lru_cache(maxsize=8)
def _projections(n_feat: int, n_proj: int = N_PROJ, seed: int = 42) -> np.ndarray:
    """Seeded random unit projection rows (reference:
    Hash::compute_random_vector, src/hash.cpp)."""
    rs = np.random.RandomState(seed)
    R = rs.randn(n_proj, n_feat).astype(np.float32)
    R /= np.linalg.norm(R, axis=1, keepdims=True)
    return R


def compute_hash(desc: jax.Array, valid: jax.Array) -> jax.Array:
    """[N, 256] i8 descriptors (+mask) -> [n_proj * 256] f32 hash."""
    N = desc.shape[0]
    R = jnp.asarray(_projections(N))
    D = desc.astype(jnp.float32) * valid.astype(jnp.float32)[:, None]
    H = jax.lax.dot_general(
        R, D, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return H.reshape(-1)


def hash_distance(h1: jax.Array, h2: jax.Array) -> jax.Array:
    """L1 distance (reference: Hash::match). Batched over h2's leading."""
    return jnp.sum(jnp.abs(h1 - h2), axis=-1)


def detect_candidates_haloc(
    query_hash: jax.Array,    # [D]
    kf_hashes: jax.Array,     # [K, D]
    kf_valid: jax.Array,      # [K]
    exclude: jax.Array,       # [K]
    top_k: int = 3,
    rel_threshold: float = 0.8,
):
    """Best-k hash matches under the reference's relative gate: keep
    candidates whose (negated) distance clears rel_threshold * best
    (reference: src/KeyFrameDatabase.cc:115,:125 — best-3 under
    0.8 * maxScore). Returns (idx [k], dist [k], ok [k])."""
    d = hash_distance(query_hash, kf_hashes)
    big = jnp.asarray(jnp.inf, d.dtype)
    d = jnp.where(kf_valid & ~exclude, d, big)
    neg_top, idx = jax.lax.top_k(-d, top_k)
    dist = -neg_top
    # similarity = 1/(1+d); gate: sim >= rel_threshold * best_sim
    best = dist[0]
    sim = 1.0 / (1.0 + dist)
    ok = (sim >= rel_threshold * (1.0 / (1.0 + best))) & jnp.isfinite(dist)
    return idx.astype(jnp.int32), dist, ok
