"""Relocalization: BoW candidate retrieval + feature matching + PnP.

TPU-native equivalent of Tracking::Relocalisation
(reference: src/Tracking.cc:2373-2534): rank stored keyframes against the
lost frame's descriptors (BoW scoring against ALL keyframes in one pass —
the dense form of DetectRelocalisationCandidates), match the frame's
descriptors to the best candidates' features, gather their landmarks, and
solve PnP RANSAC + pose refinement.

The vocabulary is a TRAINED binary codebook with idf weights, baked as a
package artifact (`loop/vocab_data.npz`, produced by
scripts/train_vocab.py — binary k-means + document-frequency idf over
ORB descriptors from the synthetic rendering domain). This replaces the
reference's external 140 MB ORBvoc.txt download (DBoW2
TemplatedVocabulary, Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:56
TF_IDF + :470 L1 norm). If the artifact is missing, a seeded random
LSH codebook with flat idf stands in (locality-sensitive word
assignment still retrieves, with weaker discrimination).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.loop.vocab import bow_vector, l1_score
from uvipslam_tpu.ops import hamming
from uvipslam_tpu.ops.pnp import pnp_ransac
from uvipslam_tpu.solver.pose_opt import pose_optimization_se3

_VOCAB_PATH = os.path.join(os.path.dirname(__file__), "vocab_data.npz")


def _make_codebook(n_words: int = 512, seed: int = 7):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 2, (n_words, 256)).astype(np.int8)


def _load_vocab():
    if os.path.exists(_VOCAB_PATH):
        z = np.load(_VOCAB_PATH)
        return z["codebook"].astype(np.int8), z["idf"].astype(np.float32)
    cb = _make_codebook()
    return cb, np.ones((cb.shape[0],), np.float32)


# module-level constants (never construct inside a trace: an lru_cache
# primed under jit would capture tracers)
_CODEBOOK, _IDF = _load_vocab()
N_WORDS = _CODEBOOK.shape[0]


def _codebook():
    return jnp.asarray(_CODEBOOK)


def _idf():
    return jnp.asarray(_IDF)


@functools.partial(jax.jit, static_argnames=("min_matches",))
def first_try_associations(tracks, m, kf_slot, Rcw, tcw, fx, fy, cx, cy,
                           radius: float = 15.0, radius_wide: float = 40.0,
                           min_matches: int = 30):
    """One-frame projection re-association against a single keyframe —
    the cheap FIRST relocalization tier (reference: IMU_Relocalisation,
    src/Tracking.cc:3012-3060: SearchByProjection of the LAST keyframe's
    map points into the current frame at the IMU-predicted pose; the
    reference retries with a WIDER window when the narrow one comes up
    short — its th is further octave-scaled, so the effective radius is
    tens of px).

    Returns (pt_id [N_tracks] — recovered associations, -1 elsewhere;
    n_matches). The caller re-runs the VI pose solve with these
    associations and applies the reference's >= 25-inlier acceptance."""
    F = m.kf_feat_pt.shape[1]
    pid = m.kf_feat_pt[kf_slot]
    okf = m.kf_feat_valid[kf_slot] & (pid >= 0) \
        & m.pt_valid[jnp.clip(pid, 0, m.pt_cap - 1)]
    X = m.pt_xyz[jnp.clip(pid, 0, m.pt_cap - 1)]
    Xc = jnp.einsum("ij,nj->ni", Rcw, X) + tcw
    z = Xc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    proj = jnp.stack([fx * Xc[:, 0] / zs + cx, fy * Xc[:, 1] / zs + cy], -1)
    good_z = (z > 0.05)[None, :] & okf[None, :]

    def match_at(r):
        pair = hamming.window_mask(tracks.xy_und, proj, r) & good_z
        idx, dist, ok = hamming.match_best(
            tracks.desc, m.kf_feat_desc[kf_slot], tracks.valid, okf,
            pair_mask=pair, max_dist=hamming.TH_HIGH, ratio=0.9)
        ok = hamming.rotation_consistency(
            tracks.angle, m.kf_feat_angle[kf_slot], idx, ok)
        new_pid = jnp.where(ok, pid[jnp.clip(idx, 0, F - 1)], -1)
        return new_pid.astype(jnp.int32), jnp.sum(ok).astype(jnp.int32)

    pid1, n1 = match_at(radius)
    pid2, n2 = match_at(radius_wide)
    narrow_ok = n1 >= min_matches
    return (jnp.where(narrow_ok, pid1, pid2),
            jnp.where(narrow_ok, n1, n2))


@jax.jit
def relocalize_frame(tracks, m, key, fx, fy, cx, cy):
    """Returns (Rcw, tcw, pt_id [N_tracks], n_inliers). pt_id carries the
    recovered landmark associations for inlier matches (-1 otherwise)."""
    cb = _codebook()
    idf = _idf()

    # frame BoW vs the keyframes' BoW vectors stored at insertion
    # (reference: per-KF ComputeBoW once, scored by the database query)
    v_frame = bow_vector(tracks.desc, tracks.valid, cb, idf)
    scores = l1_score(v_frame, m.kf_bow)
    scores = jnp.where(m.kf_valid, scores, -1.0)
    _, top_kfs = jax.lax.top_k(scores, 3)

    def try_candidate(best_kf, subkey):
        kf_desc = m.kf_feat_desc[best_kf]
        kf_pt = m.kf_feat_pt[best_kf]
        kf_ok = m.kf_feat_valid[best_kf] & (kf_pt >= 0)
        idx, dist, ok = hamming.match_best(
            tracks.desc, kf_desc, tracks.valid, kf_ok,
            max_dist=hamming.TH_HIGH, ratio=0.9,
        )
        # mutual cross-check: match precision is what makes or breaks the
        # PnP RANSAC (the reference relies on BoW-node gating for the
        # same purpose, src/ORBmatcher.cc SearchByBoW)
        idx_b, dist_b, ok_b = hamming.match_best(
            kf_desc, tracks.desc, kf_ok, tracks.valid,
            max_dist=hamming.TH_HIGH, ratio=0.9,
        )
        ok = hamming.mutual_filter(idx, ok, idx_b, ok_b)
        # rotation-consistency histogram gate (reference:
        # ComputeThreeMaxima + mbCheckOrientation, src/ORBmatcher.cc)
        ok = hamming.rotation_consistency(
            tracks.angle, m.kf_feat_angle[best_kf], idx, ok)
        pid = jnp.where(ok, kf_pt[jnp.clip(idx, 0, kf_pt.shape[0] - 1)], -1)
        pw = m.pt_xyz[jnp.clip(pid, 0, m.pt_cap - 1)]
        cand = ok & (pid >= 0) & m.pt_valid[jnp.clip(pid, 0, m.pt_cap - 1)]
        # independent re-detections jitter by ~2-3 px relative to the
        # keyframe's stored features; gate at sigma ~ 2 px
        R0, t0, inl0, n0 = pnp_ransac(
            subkey, pw, tracks.xy_und, cand, fx, fy, cx, cy,
            n_iters=256, max_err2=24.0,
        )
        # refine with motion-only BA (as the reference refines PnP poses)
        R1, t1, inl1, n1 = pose_optimization_se3(
            R0, t0, pw, tracks.xy_und, cand,
            jnp.full((pw.shape[0],), 0.25, jnp.float32),
            fx, fy, cx, cy, rounds=3, iters=8,
        )
        return R1, t1, jnp.where(inl1, pid, -1).astype(jnp.int32), n1

    keys = jax.random.split(key, 3)
    Rs, ts, pids, ns = jax.vmap(try_candidate)(top_kfs, keys)
    b = jnp.argmax(ns)
    return Rs[b], ts[b], pids[b], ns[b], top_kfs
