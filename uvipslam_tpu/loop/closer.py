"""Loop closing: detect -> Sim3 -> correct (the LoopClosing thread).

TPU-native equivalent of the reference LoopClosing
(reference: src/LoopClosing.cc — DetectLoop :119, ComputeSim3 :364,
CorrectLoop :539). Gated behind the LoopC flag exactly like the
reference (default OFF in the harbor config, yaml:90).

The reference's polling thread becomes a functional `close_loop(map, kf)`
pass invoked after keyframe insertion:

  1. candidates from BoW scores (gated by the min covisible score) and
     haloc hash distance, deduplicated — one dense pass over the KF table;
  2. 3D-3D correspondence from descriptor matching between the query and
     candidate keyframes' landmarks, Horn Sim3 RANSAC + inlier gate
     (reference requires >= 20 inliers after OptimizeSim3);
  3. correction: essential-graph optimization over all keyframes with
     odometry edges (consecutive + covisibility) plus the loop edge,
     then the landmark re-expression sweep.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.lie import mm, mv
from uvipslam_tpu.frontend.tracker import _ns_to_cam_pose
from uvipslam_tpu.loop import haloc
from uvipslam_tpu.loop.reloc import _codebook
from uvipslam_tpu.loop.vocab import bow_vector, l1_score
from uvipslam_tpu.mapstate.map import MapState
from uvipslam_tpu.ops import hamming
from uvipslam_tpu.ops.sim3solver import optimize_sim3, sim3_ransac
from uvipslam_tpu.solver.essential_graph import (
    correct_points_after_pose_graph,
    optimize_essential_graph,
)


def detect_loop_candidates(m: MapState, query_kf: int, min_gap: int = 10,
                           top_k: int = 3, min_score: float | None = None):
    """BoW + haloc candidate retrieval for `query_kf`, excluding the
    recent window (reference: DetectLoop's covisible exclusion) and
    gating BoW candidates at `min_score` (reference: the min score vs
    covisible KFs, src/LoopClosing.cc:164-175). Uses the retrieval
    vectors stored at KF insertion — O(K) per query.
    Returns (idx [<=2*top_k], scores [top_k]) — host-friendly numpy."""
    v_q = m.kf_bow[query_kf]
    scores = l1_score(v_q, m.kf_bow)

    kf_ids = jnp.arange(m.kf_cap)
    exclude = (kf_ids > query_kf - min_gap) | ~m.kf_valid
    s = jnp.where(exclude, -1.0, scores)
    bow_val, bow_idx = jax.lax.top_k(s, top_k)

    # haloc ranking as the second channel (reference: getCandidates_haloc)
    h_idx, h_dist, h_ok = haloc.detect_candidates_haloc(
        m.kf_hash[query_kf], m.kf_hash, m.kf_valid, exclude, top_k=top_k,
    )

    gate = 0.0 if min_score is None else max(float(min_score), 0.0)
    bow_keep = np.asarray(bow_idx)[np.asarray(bow_val) > gate]
    h_keep = np.asarray(h_idx)[np.asarray(h_ok)]
    idx = np.unique(np.concatenate([bow_keep, h_keep]))
    idx = idx[np.asarray(s)[idx] > 0]
    return idx, np.asarray(bow_val)


def min_covisible_score(m: MapState, query_kf: int, covis_th: int = 15):
    """Min BoW similarity between the query KF and its covisible KFs —
    the reference's candidate gate (src/LoopClosing.cc:164-175)."""
    one = jnp.zeros((m.kf_cap,), bool).at[query_kf].set(True)
    pts = m.points_seen_by(one)
    w = m.covisibility_with(pts)
    covis = m.kf_valid & (w >= covis_th)
    covis = covis.at[query_kf].set(False)
    s = l1_score(m.kf_bow[query_kf], m.kf_bow)
    s = jnp.where(covis, s, jnp.inf)
    mn = jnp.min(s)
    return float(jnp.where(jnp.isinf(mn), 0.0, mn))


def compute_loop_sim3(m: MapState, kf_a: int, kf_b: int, key,
                      fx, fy, cx, cy, min_inliers: int = 20):
    """Match landmarks between two keyframes and solve the relative Sim3
    (reference: ComputeSim3 — SearchByBoW matches -> Sim3Solver RANSAC ->
    OptimizeSim3 -> Sim3-guided projection search extends the matches ->
    final >= `min_inliers` acceptance, src/LoopClosing.cc:364-537).
    Returns (ok, s, R, t, n) with (s, R, t) mapping kf_b-camera coords to
    kf_a-camera coords."""
    da, va = m.kf_feat_desc[kf_a], m.kf_feat_valid[kf_a] & (m.kf_feat_pt[kf_a] >= 0)
    db, vb = m.kf_feat_desc[kf_b], m.kf_feat_valid[kf_b] & (m.kf_feat_pt[kf_b] >= 0)
    # appearance matches feed RANSAC directly — no mutual cross-check
    # (the reference's SearchByBoW doesn't cross-check either; the Sim3
    # RANSAC is the outlier filter)
    idx, dist, ok = hamming.match_best(da, db, va, vb,
                                       max_dist=hamming.TH_HIGH, ratio=0.9)
    # rotation-consistency gate (reference: SearchByBoW's orientation
    # histogram inside ComputeSim3's matching, src/ORBmatcher.cc:155)
    ok = hamming.rotation_consistency(
        m.kf_feat_angle[kf_a], m.kf_feat_angle[kf_b], idx, ok)

    pid_a = m.kf_feat_pt[kf_a]
    pid_b = m.kf_feat_pt[kf_b][jnp.clip(idx, 0, m.n_feat - 1)]
    good = ok & (pid_a >= 0) & (pid_b >= 0)

    # landmark positions in each keyframe's CAMERA frame
    ns_a = jax.tree_util.tree_map(lambda x: x[kf_a], m.kf_ns)
    ns_b = jax.tree_util.tree_map(lambda x: x[kf_b], m.kf_ns)
    Ra, ta = _ns_to_cam_pose(ns_a)
    Rb, tb = _ns_to_cam_pose(ns_b)
    Xa = mv(Ra, m.pt_xyz[jnp.clip(pid_a, 0, m.pt_cap - 1)]) + ta
    Xb = mv(Rb, m.pt_xyz[jnp.clip(pid_b, 0, m.pt_cap - 1)]) + tb

    s, R, t, inl, n_in = sim3_ransac(key, Xb, Xa, good, fx, fy, cx, cy)

    # GN refinement with paired reprojection edges + re-gate (reference:
    # OptimizeSim3, src/Optimizer.cc:2660)
    uv_b = m.kf_feat_xy[kf_b][jnp.clip(idx, 0, m.n_feat - 1)]
    uv_a = m.kf_feat_xy[kf_a]
    s, R, t, inl, n_in = optimize_sim3(
        s, R, t, Xb, Xa, uv_b, uv_a, inl & good, fx, fy, cx, cy)

    # Sim3-guided extension (reference: SearchByProjection(Scw) :512):
    # project ALL of b's landmark features into a's camera through the
    # refined Sim3 and window-match the appearance — recovers the
    # correspondences the ratio test dropped
    pid_b_all = m.kf_feat_pt[kf_b]
    Xb_all = mv(Rb, m.pt_xyz[jnp.clip(pid_b_all, 0, m.pt_cap - 1)]) + tb
    Xb_in_a = s * mv(R, Xb_all) + t
    z = Xb_in_a[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    proj = jnp.stack([fx * Xb_in_a[:, 0] / zs + cx,
                      fy * Xb_in_a[:, 1] / zs + cy], -1)
    pair = hamming.window_mask(m.kf_feat_xy[kf_a], proj, 9.0) & (z > 0.1)[None, :]
    idx2, dist2, ok2 = hamming.match_best(
        da, db, va, vb & (pid_b_all >= 0), pair_mask=pair,
        max_dist=hamming.TH_HIGH, ratio=1.0)
    # union: RANSAC inliers keep their match; unmatched a-features adopt
    # the guided match
    use2 = ok2 & ~(inl & good)
    idx_u = jnp.where(use2, idx2, idx)
    good_u = (inl & good) | use2
    pid_b_u = m.kf_feat_pt[kf_b][jnp.clip(idx_u, 0, m.n_feat - 1)]
    good_u = good_u & (pid_a >= 0) & (pid_b_u >= 0)
    Xb_u = mv(Rb, m.pt_xyz[jnp.clip(pid_b_u, 0, m.pt_cap - 1)]) + tb
    uv_b_u = m.kf_feat_xy[kf_b][jnp.clip(idx_u, 0, m.n_feat - 1)]
    s2, R2, t2, inl2, n2 = optimize_sim3(
        s, R, t, Xb_u, Xa, uv_b_u, uv_a, good_u, fx, fy, cx, cy)
    # adopt the extended solve only if it strictly gains support — on
    # ambiguous content the window search can add wrong matches that
    # drag the refinement off
    if int(n2) > int(n_in):
        s, R, t, n_in = s2, R2, t2, n2
    return int(n_in) >= min_inliers, s, R, t, int(n_in)


def close_loop(m: MapState, query_kf: int, loop_kf: int,
               s_rel, R_rel, t_rel, n_iters: int = 20) -> MapState:
    """Apply a verified loop: essential-graph optimization + landmark
    correction (reference: CorrectLoop + OptimizeEssentialGraph).

    The pose graph state is each KF's world->camera Sim3 (scale 1);
    odometry edges link consecutive KFs with their current relative
    transforms; the loop edge carries the measured Sim3.
    """
    K = m.kf_cap
    kf_R, kf_t = jax.vmap(lambda i: _ns_to_cam_pose(
        jax.tree_util.tree_map(lambda x: x[i], m.kf_ns)))(jnp.arange(K))
    kf_s = jnp.ones((K,), jnp.float32)

    # odometry edges: S_m = S_j S_i^-1 from current estimates
    e_i = jnp.arange(K, dtype=jnp.int32)
    e_j = jnp.clip(e_i - 1, 0, K - 1)      # edge (k, k-1)
    S_i = (kf_s[e_i], kf_R[e_i], kf_t[e_i])
    S_j = (kf_s[e_j], kf_R[e_j], kf_t[e_j])
    Sm = lie.sim3_compose(*S_j, *lie.sim3_inverse(*S_i))
    e_mask = m.kf_valid & (e_i > 0) & m.kf_valid[e_j]

    # append the loop edge: the measured Sim3 maps loop-KF camera coords
    # into query-KF camera coords, i.e. S_query = S_rel S_loop; the factor
    # convention r = log(S_m S_i S_j^-1) = 0 with S_m = S_j S_i^-1 makes
    # that edge (i=loop, j=query) with measurement S_rel
    e_i = jnp.concatenate([e_i, jnp.asarray([loop_kf], jnp.int32)])
    e_j = jnp.concatenate([e_j, jnp.asarray([query_kf], jnp.int32)])
    m_s = jnp.concatenate([Sm[0], jnp.asarray([s_rel], jnp.float32)])
    m_R = jnp.concatenate([Sm[1], R_rel[None]])
    m_t = jnp.concatenate([Sm[2], t_rel[None]])
    e_mask = jnp.concatenate([e_mask, jnp.asarray([True])])

    fixed = jnp.zeros((K,), bool).at[loop_kf].set(True)
    s2, R2, t2 = optimize_essential_graph(
        kf_s, kf_R, kf_t, m.kf_valid, fixed,
        e_i, e_j, m_s, m_R, m_t, e_mask, n_iters=n_iters,
    )

    pts2 = correct_points_after_pose_graph(
        m.pt_xyz, m.pt_ref_kf, kf_s, kf_R, kf_t, s2, R2, t2, m.pt_valid,
    )

    # write corrected camera poses back as NavStates (scale folds into t)
    def to_ns(s, R, t, ns_old):
        Rcw = R
        tcw = t / jnp.maximum(s, 1e-9)
        Rwc = jnp.swapaxes(Rcw, -1, -2)
        C = -mv(Rwc, tcw)
        return dataclasses.replace(ns_old, p=C, R=Rwc)

    kf_ns2 = jax.vmap(to_ns)(s2, R2, t2, m.kf_ns)
    return dataclasses.replace(m, kf_ns=kf_ns2, pt_xyz=pts2)


class LoopCloser:
    """Per-keyframe loop-closing orchestration with covisibility-
    consistency gating (the LoopClosing thread's control flow;
    reference: src/LoopClosing.cc:71-344).

    A candidate group = the candidate KF plus its covisible KFs; a
    candidate is accepted only after its group shares a member with a
    chain of groups from `consistency_th` consecutive detections
    (reference: mvConsistentGroups, :285-344). On acceptance: Sim3
    verification, essential-graph correction, landmark re-expression,
    and post-loop duplicate fusion (reference: CorrectLoop :539-691).
    """

    def __init__(self, fx, fy, cx, cy, consistency_th: int = 3,
                 covis_th: int = 15, min_gap: int = 10,
                 min_sim3_inliers: int = 20, seed: int = 11):
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.consistency_th = consistency_th
        self.covis_th = covis_th
        self.min_gap = min_gap
        self.min_sim3_inliers = min_sim3_inliers
        self.key = jax.random.PRNGKey(seed)
        # list of (frozenset group, chain_length)
        self.consistent_groups: list[tuple[frozenset, int]] = []
        self.last_loop_kf: int = -(10 ** 9)
        self.n_closed = 0

    def _split(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _covis_group(self, m: MapState, kf: int) -> frozenset:
        one = jnp.zeros((m.kf_cap,), bool).at[kf].set(True)
        pts = m.points_seen_by(one)
        w = m.covisibility_with(pts)
        grp = np.nonzero(np.asarray(m.kf_valid & (w >= self.covis_th)))[0]
        return frozenset(grp.tolist()) | {kf}

    def process_keyframe(self, m: MapState, query_kf: int):
        """Run detection for the new keyframe `query_kf`; if a candidate
        passes the consistency chain and Sim3 verification, returns the
        corrected map. Returns (map, status dict)."""
        status = {"loop": False, "candidates": 0}
        if query_kf - self.last_loop_kf < self.min_gap:
            return m, status

        ms = min_covisible_score(m, query_kf, self.covis_th)
        idx, _ = detect_loop_candidates(
            m, query_kf, min_gap=self.min_gap, min_score=ms)
        status["candidates"] = len(idx)

        # --- covisibility-consistency chaining ---
        new_groups: list[tuple[frozenset, int]] = []
        accepted: list[int] = []
        for c in idx:
            grp = self._covis_group(m, int(c))
            chain = 0
            for prev_grp, prev_len in self.consistent_groups:
                if grp & prev_grp:
                    chain = max(chain, prev_len + 1)
            new_groups.append((grp, chain))
            if chain >= self.consistency_th:
                accepted.append(int(c))
        self.consistent_groups = new_groups
        if not accepted:
            return m, status

        # --- Sim3 verification on accepted candidates ---
        for c in accepted:
            ok, s, R, t, n_in = compute_loop_sim3(
                m, query_kf, c, self._split(),
                self.fx, self.fy, self.cx, self.cy,
                min_inliers=self.min_sim3_inliers,
            )
            if not ok:
                continue
            # --- correct: pose graph + landmark sweep + post-loop fuse
            m = close_loop(m, query_kf, c, s, R, t)
            from uvipslam_tpu.mapstate.hygiene import fuse_duplicates
            m = fuse_duplicates(m)
            # polish with a full visual BA (reference: LoopClosing spawns
            # RunGlobalBundleAdjustment after CorrectLoop,
            # src/LoopClosing.cc:691) — the pose graph distributes the
            # loop error, the BA re-grounds it in the reprojections
            from uvipslam_tpu.solver.global_ba import global_ba_visual
            m = global_ba_visual(
                m, self.fx, self.fy, self.cx, self.cy,
                jnp.asarray([1.2 ** (2 * i) for i in range(8)], jnp.float32),
            )
            self.last_loop_kf = query_kf
            self.n_closed += 1
            self.consistent_groups = []
            status.update(loop=True, loop_kf=int(c), sim3_inliers=int(n_in),
                          scale=float(s))
            break
        return m, status
