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
from uvipslam_tpu.frontend.tracker import (
    _cam_pose_to_ns_ext,
    _ns_to_cam_pose,
    _ns_to_cam_pose_ext,
)
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


def kf_insertion_gap(m: MapState, query_kf):
    """Per-slot KF-insertion distance to `query_kf`: for each slot c, the
    number of valid keyframes inserted after c and up to (including) the
    query. Keyed on `kf_frame_id` (strictly increasing at insertion), NOT
    on slot index — once keyframe culling/compaction recycles slots, slot
    order no longer equals time order. Slots holding frames newer than
    the query get gap 0 (always excluded by any positive min_gap)."""
    f = m.kf_frame_id
    fq = f[query_kf]
    newer = m.kf_valid[None, :] & (f[None, :] > f[:, None]) & \
        (f[None, :] <= fq)
    return jnp.sum(newer, axis=1)


def detect_loop_candidates(m: MapState, query_kf: int, min_gap: int = 10,
                           top_k: int = 3, min_score: float | None = None):
    """BoW + haloc candidate retrieval for `query_kf`, excluding the
    recent window (reference: DetectLoop's covisible exclusion) and
    gating BoW candidates at `min_score` (reference: the min score vs
    covisible KFs, src/LoopClosing.cc:164-175). Uses the retrieval
    vectors stored at KF insertion — O(K) per query. The recency window
    is measured in KF insertions via `kf_insertion_gap`, robust to slot
    recycling. Returns (idx [<=2*top_k], scores [top_k]) — host-friendly
    numpy."""
    v_q = m.kf_bow[query_kf]
    scores = l1_score(v_q, m.kf_bow)

    exclude = (kf_insertion_gap(m, query_kf) < min_gap) | ~m.kf_valid
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


def max_covisible_haloc(m: MapState, query_kf: int, covis_th: int = 15):
    """Max haloc L1 distance between the query KF and its covisible KFs
    — the gate cluster-hash candidates must beat (reference:
    maxHalocScore, src/LoopClosing.cc:163,177-188; initialized to 1)."""
    one = jnp.zeros((m.kf_cap,), bool).at[query_kf].set(True)
    pts = m.points_seen_by(one)
    w = m.covisibility_with(pts)
    covis = m.kf_valid & (w >= covis_th)
    covis = covis.at[query_kf].set(False)
    d = haloc.hash_distance(m.kf_hash[query_kf], m.kf_hash)
    d = jnp.where(covis, d, -jnp.inf)
    mx = jnp.max(d)
    return float(jnp.where(jnp.isinf(mx), 1.0, jnp.maximum(mx, 1.0)))


def compute_loop_sim3(m: MapState, kf_a: int, kf_b: int, key,
                      fx, fy, cx, cy, min_inliers: int = 20,
                      min_total: int = 40, Rcb=None, tcb=None,
                      loop_group=None):
    """Match landmarks between two keyframes and solve the relative Sim3
    (reference: ComputeSim3 — SearchByBoW matches -> Sim3Solver RANSAC ->
    OptimizeSim3 inlier gate -> SearchByProjection(Scw) against the loop
    NEIGHBORHOOD's landmarks with a total-matches gate,
    src/LoopClosing.cc:437-537).

    Gate defaults — a DOCUMENTED DEVIATION from the reference: the
    reference as shipped accepts at 10 inliers / 10 total, having
    deliberately LOOSENED ORB-SLAM's 20/40 for low-texture underwater
    imagery (src/LoopClosing.cc:464 "originall it is 20 in here", :521
    "//Originally 40"). We default to ORB-SLAM's 20/40 because a
    diagnosed false closure on repetitive synthetic texture scored
    exactly 12 optimizer inliers — under 10/10 it fires, under 20/40 it
    never does. Both gates are config (Settings loop_min_sim3_inliers /
    loop_min_total_matches -> LoopCloser), so an underwater deployment
    can restore the reference's 10/10 where recall matters more than
    false-positive risk; tests/test_loop_closer.py measures the recall
    cost of 20/40 vs 10/10 on a revisit map.

    loop_group: optional iterable of KF slots forming kf_b's covisibility
    neighborhood (reference: mvpLoopMapPoints gathered from
    pLoopKF->GetVectorCovisibleKeyFrames, :495-505). Defaults to
    {kf_b} alone.

    Returns (ok, s, R, t, n_in, n_total) with (s, R, t) mapping
    kf_b-camera coords to kf_a-camera coords."""
    da, va = m.kf_feat_desc[kf_a], m.kf_feat_valid[kf_a] & (m.kf_feat_pt[kf_a] >= 0)
    db, vb = m.kf_feat_desc[kf_b], m.kf_feat_valid[kf_b] & (m.kf_feat_pt[kf_b] >= 0)
    # appearance matches feed RANSAC directly — no mutual cross-check and
    # no BoW-word constraint (measured on revisit pairs: the word gate
    # forces true partners that quantize across a word boundary onto
    # wrong same-word repetitive-texture matches — 0/15 geometrically
    # consistent vs 10/31 for the open ratio test; the Sim3 RANSAC is
    # the outlier filter, as in the reference where SearchByBoW feeds
    # Sim3Solver RANSAC unchecked)
    idx, dist, ok = hamming.match_best(da, db, va, vb,
                                       max_dist=hamming.TH_HIGH, ratio=0.9)
    # rotation-consistency gate (reference: SearchByBoW's orientation
    # histogram inside ComputeSim3's matching, src/ORBmatcher.cc:155)
    ok = hamming.rotation_consistency(
        m.kf_feat_angle[kf_a], m.kf_feat_angle[kf_b], idx, ok)

    pid_a = m.kf_feat_pt[kf_a]
    pid_b = m.kf_feat_pt[kf_b][jnp.clip(idx, 0, m.n_feat - 1)]
    good = ok & (pid_a >= 0) & (pid_b >= 0)

    # landmark positions in each keyframe's CAMERA frame (through the
    # body-camera extrinsics when the map stores body NavStates)
    if Rcb is None:
        Rcb = jnp.eye(3, dtype=jnp.float32)
    if tcb is None:
        tcb = jnp.zeros(3, jnp.float32)
    ns_a = jax.tree_util.tree_map(lambda x: x[kf_a], m.kf_ns)
    ns_b = jax.tree_util.tree_map(lambda x: x[kf_b], m.kf_ns)
    Ra, ta = _ns_to_cam_pose_ext(ns_a, Rcb, tcb)
    Rb, tb = _ns_to_cam_pose_ext(ns_b, Rcb, tcb)
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
    sup = inl & good
    if int(n2) > int(n_in):
        s, R, t, n_in = s2, R2, t2, n2
        sup = inl2 & good_u
    # scale sanity: a genuine metric-map loop has s near 1 (both sides of
    # the loop share the VIO/pressure scale); wildly scaled "solutions"
    # are repetitive-texture mirages (observed s up to 13 on spurious
    # candidates that still collect a few coincidental inliers)
    s_sane = bool(jnp.isfinite(s)) and 1.0 / 3.0 < float(s) < 3.0
    if not (int(n_in) >= min_inliers and s_sane):
        return False, s, R, t, int(n_in), 0

    # --- final acceptance: total support against the loop
    # neighborhood's landmarks (reference: SearchByProjection(Scw,
    # mvpLoopMapPoints, 10) fills the entries the Sim3 inlier set left
    # vacant; accept only if nTotalMatches >= 40, LoopClosing.cc:512-537).
    # Any world point X maps into kf_a's CORRECTED camera via kf_b:
    # X_a = s R (Rb X + tb) + t — so the search covers the whole group's
    # landmark set, not just kf_b's own observations.
    group = [int(kf_b)] if loop_group is None else [int(g) for g in loop_group]
    kf_mask = jnp.zeros((m.kf_cap,), bool).at[jnp.asarray(group, jnp.int32)].set(True)
    pt_mask = m.points_seen_by(kf_mask) & m.pt_valid
    Xg = s * mv(R, mv(Rb, m.pt_xyz) + tb) + t
    zg = Xg[:, 2]
    zgs = jnp.where(jnp.abs(zg) < 1e-6, 1e-6, zg)
    proj_g = jnp.stack([fx * Xg[:, 0] / zgs + cx,
                        fy * Xg[:, 1] / zgs + cy], -1)
    pair_g = hamming.window_mask(m.kf_feat_xy[kf_a], proj_g, 10.0) \
        & (zg > 0.1)[None, :] & pt_mask[None, :]
    _, _, ok_g = hamming.match_best(
        da, m.pt_desc, va, pt_mask, pair_mask=pair_g,
        max_dist=hamming.TH_LOW, ratio=1.0)
    n_total = int(jnp.sum(sup | ok_g))
    ok = n_total >= min_total
    return ok, s, R, t, int(n_in), n_total


COVIS_EDGE_W = 100    # covisibility-edge weight threshold (ref :2570 minFeat)
COVIS_EDGE_CAP = 128  # fixed capacity for covisibility edges


def close_loop(m: MapState, query_kf: int, loop_kf: int,
               s_rel, R_rel, t_rel, n_iters: int = 20,
               Rcb=None, tcb=None, Rbc=None, tbc=None) -> MapState:
    """Apply a verified loop: essential-graph optimization + landmark
    correction (reference: CorrectLoop + OptimizeEssentialGraph,
    src/Optimizer.cc:2409-2658).

    The pose graph state is each KF's world->camera Sim3 (scale 1). The
    edge set matches the reference's: the kf_prev spanning chain, strong
    covisibility edges (weight >= COVIS_EDGE_W, :2570), ALL past loop
    edges retained in the map (:2529-2545), plus the new measured loop
    edge. NavState velocities are re-expressed through each keyframe's
    correction so the VI pipeline stays consistent after the closure.
    """
    K = m.kf_cap
    if Rcb is None:
        Rcb = jnp.eye(3, dtype=jnp.float32)
        tcb = jnp.zeros(3, jnp.float32)
        Rbc = jnp.eye(3, dtype=jnp.float32)
        tbc = jnp.zeros(3, jnp.float32)
    kf_R, kf_t = jax.vmap(lambda i: _ns_to_cam_pose_ext(
        jax.tree_util.tree_map(lambda x: x[i], m.kf_ns), Rcb, tcb)
    )(jnp.arange(K))
    kf_s = jnp.ones((K,), jnp.float32)

    def rel_sim3(i, j):
        """Current relative Sim3 measurement S_j S_i^-1 (scale 1)."""
        S_i = (kf_s[i], kf_R[i], kf_t[i])
        S_j = (kf_s[j], kf_R[j], kf_t[j])
        return lie.sim3_compose(*S_j, *lie.sim3_inverse(*S_i))

    # 1. spanning chain: edge (k, prev(k)) with current relative pose
    e_i = jnp.arange(K, dtype=jnp.int32)
    e_j = jnp.clip(m.kf_prev, 0, K - 1)
    Sm = rel_sim3(e_i, e_j)
    e_mask = m.kf_valid & (m.kf_prev >= 0) & m.kf_valid[e_j]

    # 2. strong covisibility edges (weight >= COVIS_EDGE_W), excluding
    # pairs already linked by the chain; fixed-capacity top-K by weight
    W = m.covisibility_matrix()
    ii = jnp.arange(K)[:, None]
    jj = jnp.arange(K)[None, :]
    upper = jj > ii
    chain = (m.kf_prev[None, :] == ii) | (m.kf_prev[:, None] == jj)
    covis_ok = upper & ~chain & (W >= COVIS_EDGE_W)
    w_flat = jnp.where(covis_ok, W, 0.0).reshape(-1)
    topw, topidx = jax.lax.top_k(w_flat, min(COVIS_EDGE_CAP, K * K))
    c_i = (topidx // K).astype(jnp.int32)
    c_j = (topidx % K).astype(jnp.int32)
    c_mask = topw > 0
    Sc = rel_sim3(c_i, c_j)

    # 3. past loop edges with their STORED measurements
    l_i = jnp.clip(m.loop_i, 0, K - 1)
    l_j = jnp.clip(m.loop_j, 0, K - 1)
    l_mask = (jnp.arange(m.loop_i.shape[0]) < m.n_loop) & (m.loop_i >= 0)

    # 4. the new loop edge: the measured Sim3 maps loop-KF camera coords
    # into query-KF camera coords, i.e. S_query = S_rel S_loop; the factor
    # convention r = log(S_m S_i S_j^-1) = 0 with S_m = S_j S_i^-1 makes
    # that edge (i=loop, j=query) with measurement S_rel
    e_i = jnp.concatenate([e_i, c_i, l_i, jnp.asarray([loop_kf], jnp.int32)])
    e_j = jnp.concatenate([e_j, c_j, l_j, jnp.asarray([query_kf], jnp.int32)])
    m_s = jnp.concatenate([Sm[0], Sc[0], m.loop_s,
                           jnp.asarray([s_rel], jnp.float32)])
    m_R = jnp.concatenate([Sm[1], Sc[1], m.loop_R, R_rel[None]])
    m_t = jnp.concatenate([Sm[2], Sc[2], m.loop_t, t_rel[None]])
    e_mask = jnp.concatenate([e_mask, c_mask, l_mask, jnp.asarray([True])])

    fixed = jnp.zeros((K,), bool).at[loop_kf].set(True)
    s2, R2, t2 = optimize_essential_graph(
        kf_s, kf_R, kf_t, m.kf_valid, fixed,
        e_i, e_j, m_s, m_R, m_t, e_mask, n_iters=n_iters,
    )

    pts2 = correct_points_after_pose_graph(
        m.pt_xyz, m.pt_ref_kf, kf_s, kf_R, kf_t, s2, R2, t2, m.pt_valid,
    )

    # write corrected camera poses back as NavStates (scale folds into t);
    # velocity is a world-frame free vector: apply the linear part of the
    # per-KF world correction T_k = S_new^-1 S_old (a world->world Sim3)
    def to_ns(s, R, t, R_old, ns_old):
        Rcw = R
        tcw = t / jnp.maximum(s, 1e-9)
        ns_new = _cam_pose_to_ns_ext(Rcw, tcw, Rbc, tbc)
        Rwc = jnp.swapaxes(Rcw, -1, -2)
        L = (1.0 / jnp.maximum(s, 1e-9)) * mm(Rwc, R_old)
        return dataclasses.replace(ns_old, p=ns_new.p, R=ns_new.R,
                                   v=mv(L, ns_old.v))

    kf_ns2 = jax.vmap(to_ns)(s2, R2, t2, kf_R, m.kf_ns)
    m = dataclasses.replace(m, kf_ns=kf_ns2, pt_xyz=pts2)
    # retain the new loop edge for future closures
    return m.add_loop_edge(jnp.asarray(loop_kf), jnp.asarray(query_kf),
                           jnp.asarray(s_rel, jnp.float32), R_rel, t_rel)


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
                 min_sim3_inliers: int = 20,
                 min_total_matches: int | None = None, seed: int = 11):
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.consistency_th = consistency_th
        self.covis_th = covis_th
        self.min_gap = min_gap
        # gate defaults are ORB-SLAM's 20/40, a documented deviation from
        # the reference's shipped 10/10 (see compute_loop_sim3 docstring);
        # both are plumbed from Settings so deployments can choose
        self.min_sim3_inliers = min_sim3_inliers
        # None -> ORB-SLAM's operating ratio: 40 total matches at the
        # 400-feature Aqualoc budget (Settings_VI_Aqualoc_harbor.yaml:67)
        # = 10% of the per-frame feature budget, floored for tiny test
        # configs
        self.min_total_matches = min_total_matches
        self.key = jax.random.PRNGKey(seed)
        # body-camera extrinsics (identity unless the VIP tracker sets
        # them); used to express body NavStates as camera poses
        self.Rcb = jnp.eye(3, dtype=jnp.float32)
        self.tcb = jnp.zeros(3, jnp.float32)
        self.Rbc = jnp.eye(3, dtype=jnp.float32)
        self.tbc = jnp.zeros(3, jnp.float32)
        # list of (frozenset group, chain_length)
        self.consistent_groups: list[tuple[frozenset, int]] = []
        # last closure keyed by FRAME id, not KF slot: slot indices are
        # recycled once keyframe culling compacts the table
        self.last_loop_frame: int = -(10 ** 9)
        self.n_closed = 0
        # --- cluster channel state (the reference keeps these as
        # LoopClosing::hash_table_ and LocalMapping::
        # initial_cluster_pose_history_, NOT map state) ---
        self.cl_kf: list[int] = []          # owning KF slot per cluster id
        self.cl_hash: list[np.ndarray] = []  # per-cluster haloc hash
        self.cl_cent: list[np.ndarray] = []  # per-cluster world centroid
        self.kf_cluster_ids: dict[int, list[int]] = {}
        # accepted loop cluster pairs (reference: cluster_lc_found_,
        # excluded from future candidate searches, LoopClosing.cc:215-221)
        self.cluster_lc_found: list[tuple[int, int]] = []
        self.cluster_min_pts: int = 100     # reference: KeyFrame.cc:1036
        # post-correction polish BA (reference: RunGlobalBundleAdjustment
        # after CorrectLoop, src/LoopClosing.cc:691). Visual-only by
        # default; the VIP tracker swaps in the NavState form once VIO is
        # initialized (reference: GlobalBundleAdjustmentNavState).
        from uvipslam_tpu.solver.global_ba import global_ba_visual

        self.post_ba = lambda m: global_ba_visual(
            m, self.fx, self.fy, self.cx, self.cy,
            jnp.asarray([1.2 ** (2 * i) for i in range(8)], jnp.float32),
        )

    def _split(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _covis_group(self, m: MapState, kf: int) -> frozenset:
        one = jnp.zeros((m.kf_cap,), bool).at[kf].set(True)
        pts = m.points_seen_by(one)
        w = m.covisibility_with(pts)
        grp = np.nonzero(np.asarray(m.kf_valid & (w >= self.covis_th)))[0]
        return frozenset(grp.tolist()) | {kf}

    # --- cluster channel --------------------------------------------------

    def _add_clusters(self, m: MapState, kf: int) -> list[int]:
        """Cluster the new keyframe's mapped keypoints and append the
        per-cluster hashes/centroids to the global table (reference:
        regionClustering at KF processing + the hash_table_ push at the
        top of DetectLoop, src/LoopClosing.cc:131-139). Returns the new
        global cluster ids."""
        from uvipslam_tpu.loop.clusters import keyframe_clusters

        hashes, cents, cnt = keyframe_clusters(m, kf, min_pts=self.cluster_min_pts)
        hashes, cents, cnt = (np.asarray(hashes), np.asarray(cents),
                              np.asarray(cnt))
        ids = []
        for c in range(cnt.shape[0]):
            if cnt[c] <= 0:
                continue
            cid = len(self.cl_kf)
            self.cl_kf.append(kf)
            self.cl_hash.append(hashes[c])
            self.cl_cent.append(cents[c])
            ids.append(cid)
        self.kf_cluster_ids[kf] = ids
        return ids

    def _cluster_candidates(self, m: MapState, query_kf: int,
                            covis_group: frozenset,
                            max_haloc: float) -> list[int]:
        """Loop-candidate KFs from the two cluster channels: cluster-hash
        matching (reference: getCandidates_haloc,
        src/LoopClosing.cc:739-776 — temporal window of 10 cluster ids,
        best 5 under the covisible-haloc gate) and centroid 2D proximity
        (reference: getCandidates_Proximity,
        src/LocalMapping.cc:1475-1511 — id window 12, best 3). A matched
        cluster votes for its owning keyframe
        (searchKF_loop_closer, src/LoopClosing.cc:236-242)."""
        from uvipslam_tpu.loop.clusters import (
            HALOC_BEST_N, HALOC_ID_WINDOW, PROX_BEST_N, PROX_ID_WINDOW,
        )

        q_ids = self.kf_cluster_ids.get(query_kf, [])
        n = len(self.cl_kf)
        if not q_ids or n == 0:
            return []
        owners = np.asarray(self.cl_kf)
        table_h = np.stack(self.cl_hash)
        table_c = np.stack(self.cl_cent)
        # non-candidates: clusters owned by the covisible group (incl.
        # query), and clusters already paired by a past closure
        # (reference: no_candidates, src/LoopClosing.cc:204-221)
        non = np.isin(owners, np.fromiter(covis_group | {query_kf}, int))
        # stale owners: keyframes invalidated by culling must never be
        # re-proposed (the BoW/haloc KF channel applies the same mask in
        # detect_loop_candidates)
        non |= ~np.asarray(m.kf_valid)[owners]
        # every cluster ever paired with cid by a past closure is excluded
        # (reference pushes each matching pair into no_candidates,
        # src/LoopClosing.cc:215-221) — a dict would keep only the last
        # pairing per cluster id
        lc: dict[int, set] = {}
        for a, b in self.cluster_lc_found:
            lc.setdefault(a, set()).add(b)
            lc.setdefault(b, set()).add(a)
        cand_kfs: list[int] = []
        all_ids = np.arange(n)
        for cid in q_ids:
            excl = non.copy()
            excl |= np.abs(all_ids - cid) < HALOC_ID_WINDOW
            for other in lc.get(cid, ()):
                excl[other] = True
            d = np.abs(table_h - self.cl_hash[cid][None]).sum(1)
            d = np.where(excl, np.inf, d)
            order = np.argsort(d)[:HALOC_BEST_N]
            cand_kfs += owners[order[d[order] < max_haloc]].tolist()

            excl_p = non | (np.abs(all_ids - cid) < PROX_ID_WINDOW)
            for other in lc.get(cid, ()):
                excl_p[other] = True
            dxy = np.linalg.norm(
                (table_c - self.cl_cent[cid][None])[:, :2], axis=1)
            dxy = np.where(excl_p, np.inf, dxy)
            order = np.argsort(dxy)[:PROX_BEST_N]
            cand_kfs += owners[order[np.isfinite(dxy[order])]].tolist()
        return sorted(set(cand_kfs))

    def process_keyframe(self, m: MapState, query_kf: int):
        """Run detection for the new keyframe `query_kf`; if a candidate
        passes the consistency chain and Sim3 verification, returns the
        corrected map. Returns (map, status dict)."""
        status = {"loop": False, "candidates": 0}
        # cluster hashes are stored for EVERY processed keyframe, before
        # any early return (reference: the hash_table_ push at the top of
        # DetectLoop, src/LoopClosing.cc:131-139)
        self._add_clusters(m, query_kf)
        # all gap logic keyed on frame ids / insertion counts, never on
        # slot indices (slots recycle under keyframe culling)
        f_np = np.asarray(m.kf_frame_id)
        valid_np = np.asarray(m.kf_valid)
        fq = int(f_np[query_kf])
        kfs_since_loop = int(np.sum(valid_np & (f_np > self.last_loop_frame)
                                    & (f_np <= fq)))
        if kfs_since_loop < self.min_gap:
            return m, status

        ms = min_covisible_score(m, query_kf, self.covis_th)
        idx, _ = detect_loop_candidates(
            m, query_kf, min_gap=self.min_gap, min_score=ms)
        # third + fourth channels: cluster-hash and cluster-proximity
        # candidates (reference: KF_Candidates_Cluster/_Proximity merged
        # into vpCandidateKFs, src/LoopClosing.cc:195-248)
        covis_group = self._covis_group(m, query_kf)
        max_h = max_covisible_haloc(m, query_kf, self.covis_th)
        gap_np = np.asarray(kf_insertion_gap(m, query_kf))
        cl = [c for c in self._cluster_candidates(m, query_kf, covis_group, max_h)
              if gap_np[c] >= self.min_gap]
        idx = np.unique(np.concatenate([idx, np.asarray(cl, idx.dtype)])
                        ) if cl else idx
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
        mt = (self.min_total_matches if self.min_total_matches is not None
              else max(15, round(0.1 * m.n_feat)))
        for c in accepted:
            grp = sorted(self._covis_group(m, int(c)))
            ok, s, R, t, n_in, n_total = compute_loop_sim3(
                m, query_kf, c, self._split(),
                self.fx, self.fy, self.cx, self.cy,
                min_inliers=self.min_sim3_inliers, min_total=mt,
                Rcb=self.Rcb, tcb=self.tcb, loop_group=grp,
            )
            if not ok:
                continue
            # --- correct: pose graph + landmark sweep + post-loop fuse
            m = close_loop(m, query_kf, c, s, R, t,
                           Rcb=self.Rcb, tcb=self.tcb,
                           Rbc=self.Rbc, tbc=self.tbc)
            from uvipslam_tpu.mapstate.hygiene import fuse_duplicates
            m = fuse_duplicates(m)
            # polish (reference: LoopClosing spawns
            # RunGlobalBundleAdjustment after CorrectLoop,
            # src/LoopClosing.cc:691) — the pose graph distributes the
            # loop error, the BA re-grounds it in the reprojections
            m = self.post_ba(m)
            self.last_loop_frame = fq
            self.n_closed += 1
            self.consistent_groups = []
            # exclude this closure's cluster pairs from future searches
            # (reference: cluster_lc_found_, src/LoopClosing.cc:215-221)
            for qc in self.kf_cluster_ids.get(query_kf, []):
                for lc_ in self.kf_cluster_ids.get(int(c), []):
                    self.cluster_lc_found.append((qc, lc_))
            status.update(loop=True, loop_kf=int(c), sim3_inliers=int(n_in),
                          total_matches=int(n_total), scale=float(s))
            break
        return m, status
