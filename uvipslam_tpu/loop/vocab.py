"""Bag-of-words place recognition as device tensor ops.

TPU-native replacement for DBoW2's ORBVocabulary
(reference: Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h — a k=10, L=6
tree of 1M binary words loaded from a 140 MB ORBvoc.txt, scored with
L1/TF-IDF) and the KeyFrameDatabase inverted index
(reference: src/KeyFrameDatabase.cc:144 DetectLoopCandidates, :267
DetectRelocalisationCandidates).

Redesign: on TPU a FLAT codebook beats tree descent — quantizing N
descriptors against W words is ONE Hamming matmul on the MXU
([N, 256] x [W, 256] in +-1 bf16), whereas tree descent is a serial
chain of tiny lookups. The codebook is trained with binary k-means
(majority-vote centroids) on descriptors sampled from the target
domain; idf weights come from the same training set. Retrieval scoring
is the same normalized-L1 similarity DBoW2 uses, but computed densely
for all stored keyframes in one matmul-like op (the inverted index is
an optimization for sparse CPUs; dense is faster here at our KF
capacities).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.ops.hamming import hamming_matrix


def train_codebook(descs: np.ndarray, n_words: int = 1024, n_iters: int = 8,
                   seed: int = 0) -> np.ndarray:
    """Binary k-means (host-side, offline): [M, 256] 0/1 -> [W, 256] 0/1.

    Majority-vote centroid update; empty clusters are re-seeded from the
    farthest descriptors. Stands in for DBoW2's offline vocabulary
    training (reference: the pre-trained ORBvoc.txt download,
    README.md:90)."""
    rs = np.random.RandomState(seed)
    M = descs.shape[0]
    centers = descs[rs.choice(M, n_words, replace=M < n_words)].astype(np.float32)
    d = descs.astype(np.float32)
    for _ in range(n_iters):
        # hamming distances via +-1 dot
        D = (256 - (2 * d - 1) @ (2 * centers - 1).T) / 2
        assign = D.argmin(1)
        for w in range(n_words):
            sel = assign == w
            if sel.sum() == 0:
                centers[w] = d[rs.randint(M)]
            else:
                centers[w] = (d[sel].mean(0) > 0.5).astype(np.float32)
    return centers.astype(np.int8)


@functools.partial(jax.jit, static_argnames=())
def bow_vector(desc: jax.Array, valid: jax.Array, codebook: jax.Array,
               idf: jax.Array) -> jax.Array:
    """Quantize descriptors and build the normalized TF-IDF BoW vector.

    desc [N, 256] i8, codebook [W, 256] i8, idf [W] -> [W] f32 with
    L1 norm 1 (DBoW2's normalization; TemplatedVocabulary.h:470).
    """
    D = hamming_matrix(desc, codebook)             # [N, W]
    word = jnp.argmin(D, axis=1)
    W = codebook.shape[0]
    v = jnp.zeros((W,), jnp.float32).at[word].add(
        jnp.where(valid, 1.0, 0.0)
    )
    v = v * idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


def bow_words(desc: jax.Array, codebook: jax.Array) -> jax.Array:
    """Word id per descriptor (the 'direct index' used to constrain
    feature matching in SearchByBoW; reference: src/ORBmatcher.cc:155)."""
    D = hamming_matrix(desc, codebook)
    return jnp.argmin(D, axis=1).astype(jnp.int32)


def l1_score(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """DBoW2 L1 similarity: s = 1 - 0.5 * |v1 - v2|_1 for L1-normalized
    vectors (in [0, 1], 1 = identical). Batched over leading dims of v2."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2), axis=-1)


def detect_candidates(
    query_bow: jax.Array,       # [W]
    kf_bows: jax.Array,         # [K, W] stored keyframe BoW vectors
    kf_valid: jax.Array,        # [K]
    exclude: jax.Array,         # [K] bool: covisible/current KFs to skip
    min_score: jax.Array,       # scalar: min score among covisible KFs
    top_k: int = 8,
):
    """Loop-candidate retrieval (reference:
    KeyFrameDatabase::DetectLoopCandidates, src/KeyFrameDatabase.cc:144):
    score all stored KFs at once, gate by the covisible min-score, and
    return the top candidates. Returns (idx [top_k], score [top_k],
    ok [top_k])."""
    s = l1_score(query_bow, kf_bows)
    s = jnp.where(kf_valid & ~exclude, s, -1.0)
    val, idx = jax.lax.top_k(s, top_k)
    ok = val >= jnp.maximum(min_score, 0.0)
    return idx.astype(jnp.int32), val, ok
