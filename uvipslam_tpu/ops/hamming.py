"""Batched Hamming-distance descriptor matching on the MXU.

TPU-native equivalent of the reference ORBmatcher's per-pair popcount
loops (reference: src/ORBmatcher.cc:1794 DescriptorDistance; thresholds
TH_HIGH=100/TH_LOW=50/HISTO_LENGTH=30 at :40-42). The key re-design:
256-bit descriptors are stored as 0/1 vectors, mapped to +-1, and the
entire NA x NB distance matrix becomes ONE matmul:

    dot(a_pm, b_pm) = 256 - 2 * hamming(a, b)

+-1 products are exact in bf16 and accumulate in f32 int-exactly
(values <= 256), so the MXU computes exact Hamming distances at
bf16 throughput. Spatial search windows (SearchByProjection et al.)
become masks on the distance matrix instead of per-cell candidate lists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

N_BITS = 256
TH_HIGH = 100
TH_LOW = 50
HISTO_BINS = 30


def hamming_matrix(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """[NA, 256] x [NB, 256] (0/1 int8) -> [NA, NB] Hamming distances (f32).

    One MXU matmul; exact (see module docstring).
    """
    a = (desc_a.astype(jnp.bfloat16) * 2 - 1)
    b = (desc_b.astype(jnp.bfloat16) * 2 - 1)
    dot = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (N_BITS - dot) * 0.5


def match_best(
    desc_a: jax.Array,
    desc_b: jax.Array,
    valid_a: jax.Array,
    valid_b: jax.Array,
    pair_mask: jax.Array | None = None,
    max_dist: float = TH_LOW,
    ratio: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Best-match search A -> B with optional candidate mask and
    best/second-best ratio test (the reference's mfNNratio gate).

    pair_mask: [NA, NB] bool of allowed candidate pairs (e.g. spatial
    search window, BoW node equality, epipolar band). None = all.

    Returns (idx_b [NA] i32, dist [NA] f32, ok [NA] bool).
    """
    D = hamming_matrix(desc_a, desc_b)
    big = jnp.asarray(1e9, D.dtype)
    bad = ~(valid_a[:, None] & valid_b[None, :])
    if pair_mask is not None:
        bad = bad | ~pair_mask
    D = jnp.where(bad, big, D)

    # best and second-best along B — two min-reduction passes instead of
    # lax.top_k, whose TPU lowering is a full [NA, NB] sort (measured
    # ~1.8 ms per call at 400x8192; the reductions are ~bandwidth)
    idx = jnp.argmin(D, axis=1)
    best = jnp.min(D, axis=1)
    D2 = jnp.where(jnp.arange(D.shape[1])[None, :] == idx[:, None], big, D)
    second = jnp.min(D2, axis=1)
    ok = valid_a & (best <= max_dist)
    if ratio < 1.0:
        ok = ok & (best <= ratio * second)
    return idx.astype(jnp.int32), best, ok


def mutual_filter(
    idx_ab: jax.Array, ok_ab: jax.Array, idx_ba: jax.Array, ok_ba: jax.Array
) -> jax.Array:
    """Keep only mutual best matches (cross-check)."""
    nb = idx_ba.shape[0]
    back = jnp.where((idx_ab >= 0) & (idx_ab < nb), idx_ba[jnp.clip(idx_ab, 0, nb - 1)], -1)
    back_ok = jnp.where((idx_ab >= 0) & (idx_ab < nb), ok_ba[jnp.clip(idx_ab, 0, nb - 1)], False)
    return ok_ab & back_ok & (back == jnp.arange(idx_ab.shape[0]))


def rotation_consistency(
    angle_a: jax.Array,
    angle_b: jax.Array,
    idx_ab: jax.Array,
    ok: jax.Array,
    n_keep_bins: int = 3,
    min_top_fraction: float = 0.35,
) -> jax.Array:
    """Keep matches whose orientation difference falls in the 3 dominant
    histogram bins (reference: ORBmatcher::ComputeThreeMaxima +
    mbCheckOrientation, src/ORBmatcher.cc).

    Adaptive: if the dominant `n_keep_bins` hold < `min_top_fraction` of
    the matches, the orientation signal is weak (e.g. low-gradient
    content where the IC angle is noisy) and the gate widens to the top
    2*n_keep_bins bins — still a gate, never a full pass-through, so the
    downstream RANSAC keeps some orientation-based outlier rejection on
    rotationally ambiguous content. On real imagery with consistent
    camera roll the top-3 bins hold the large majority, so the reference
    behavior is preserved exactly when it matters."""
    nb = angle_b.shape[0]
    rot = angle_a - angle_b[jnp.clip(idx_ab, 0, nb - 1)]
    # wrap to [0, 2pi)
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(rot, two_pi)
    bins = jnp.clip((rot * (HISTO_BINS / two_pi)).astype(jnp.int32), 0, HISTO_BINS - 1)
    hist = jnp.zeros((HISTO_BINS,), jnp.float32).at[bins].add(jnp.where(ok, 1.0, 0.0))
    n_wide = min(2 * n_keep_bins, HISTO_BINS)
    topv, top_bins = jax.lax.top_k(hist, n_wide)
    hit = bins[:, None] == top_bins[None, :]
    in_top = hit[:, :n_keep_bins].any(axis=1)
    in_wide = hit.any(axis=1)
    informative = jnp.sum(topv[:n_keep_bins]) >= min_top_fraction * jnp.maximum(
        jnp.sum(hist), 1.0)
    return ok & jnp.where(informative, in_top, in_wide)


def window_mask(
    xy_a: jax.Array, xy_b: jax.Array, radius: jax.Array | float
) -> jax.Array:
    """[NA, NB] mask: b within `radius` px of a's predicted position.

    radius may be scalar or per-A (e.g. scale-dependent th*scaleFactor^level
    as in SearchByProjection)."""
    d2 = jnp.sum((xy_a[:, None, :] - xy_b[None, :, :]) ** 2, axis=-1)
    r = jnp.asarray(radius)
    r2 = (r * r) if r.ndim == 0 else (r * r)[:, None]
    return d2 <= r2


def level_mask(level_a: jax.Array, level_b: jax.Array, tol: int = 1) -> jax.Array:
    """[NA, NB] mask: pyramid levels within tolerance (the reference's
    octave gating in projection search)."""
    return jnp.abs(level_a[:, None] - level_b[None, :]) <= tol


def bow_node_mask(words_a: jax.Array, words_b: jax.Array) -> jax.Array:
    """[NA, NB] mask: descriptors quantized to the SAME vocabulary word —
    the reference's BoW-node-constrained search (SearchByBoW walks the
    shared FeatureVector nodes, src/ORBmatcher.cc:155; with a flat
    codebook the node IS the word)."""
    return words_a[:, None] == words_b[None, :]


def epipolar_band_mask(
    F12: jax.Array,       # [3, 3] fundamental matrix: x2^T F12 x1 = 0
    xy_1: jax.Array,      # [N1, 2]
    xy_2: jax.Array,      # [N2, 2]
    band: jax.Array | float,   # px; scalar or per-2 (scale-dependent)
) -> jax.Array:
    """[N1, N2] mask: feature 2 within `band` px of feature 1's epipolar
    line (the reference's triangulation search gate,
    ORBmatcher::SearchForTriangulation + CheckDistEpipolarLine,
    src/ORBmatcher.cc:852,33)."""
    one1 = jnp.ones_like(xy_1[..., :1])
    x1h = jnp.concatenate([xy_1, one1], axis=-1)            # [N1, 3]
    l2 = x1h @ F12.T                                        # lines in image 2
    num = jnp.abs(
        l2[:, None, 0] * xy_2[None, :, 0]
        + l2[:, None, 1] * xy_2[None, :, 1]
        + l2[:, None, 2]
    )
    den = jnp.sqrt(jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12))
    d = num / den[:, None]
    b = jnp.asarray(band)
    b2 = b if b.ndim == 0 else b[None, :]
    return (d <= b2) & (den > 1e-6)[:, None]
