"""Map maintenance: landmark culling and duplicate fusion.

TPU-native equivalents of LocalMapping::MapPointCulling
(reference: src/LocalMapping.cc:997-1025 — drop points with poor
found/visible ratio or too few observations shortly after creation) and
LocalMapping::SearchInNeighbors fusion (reference: :1204-1281 — merge
landmarks that project onto each other with matching descriptors).
Both are masked batched passes over the landmark table.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.mapstate.map import MapState
from uvipslam_tpu.ops.hamming import hamming_matrix


@jax.jit
def cull_points(m: MapState, frame_id: jax.Array,
                min_found_ratio: float = 0.25,
                min_obs_after: int = 2,
                probation_frames: int = 60) -> MapState:
    """Invalidate weak landmarks (reference: MapPointCulling — ratio
    < 0.25, or fewer than 3 observations 2+ KFs after creation; here the
    probation window is frame-based since KF ids are slots)."""
    n_obs = jnp.zeros((m.pt_cap,), jnp.int32).at[
        jnp.where((m.kf_feat_pt >= 0) & m.kf_feat_valid, m.kf_feat_pt, m.pt_cap - 1).reshape(-1)
    ].add(((m.kf_feat_pt >= 0) & m.kf_feat_valid).reshape(-1).astype(jnp.int32))

    ratio = m.pt_found / jnp.maximum(m.pt_visible, 1.0)
    age = frame_id - m.pt_first_frame
    weak = (ratio < min_found_ratio) | (
        (age > probation_frames) & (n_obs < min_obs_after)
    )
    keep = m.pt_valid & ~weak
    # detach culled points from keyframe feature tables
    detach = m.kf_feat_pt >= 0
    culled = ~keep[jnp.clip(m.kf_feat_pt, 0, m.pt_cap - 1)] & detach
    return dataclasses.replace(
        m,
        pt_valid=keep,
        kf_feat_pt=jnp.where(culled, -1, m.kf_feat_pt),
    )


@jax.jit
def cull_keyframes(m: MapState, redundancy: float = 0.9,
                   min_other_obs: int = 3, keep_last: int = 3) -> MapState:
    """Invalidate redundant keyframes (reference: KeyFrameCulling
    src/LocalMapping.cc:1357-1411 — a KF whose map points are >= 90%
    observed by at least 3 other keyframes is dropped; the reference
    ships this DISABLED (:815) because removing a KF breaks the IMU
    preintegration chain). Here it is available for visual-only maps:
    besides the reference's redundancy test we (a) never cull the first
    or the `keep_last` newest KFs, (b) splice the kf_prev chain across
    the culled slot, and (c) cull at most one KF per call so chain
    splices never cascade within a single pass.
    """
    K, F = m.kf_feat_pt.shape
    obs_ok = (m.kf_feat_pt >= 0) & m.kf_feat_valid & m.kf_valid[:, None]
    pid = jnp.clip(m.kf_feat_pt, 0, m.pt_cap - 1)
    obs_ok = obs_ok & m.pt_valid[pid]
    # observation count per landmark over the whole table
    n_obs = jnp.zeros((m.pt_cap,), jnp.int32).at[
        jnp.where(obs_ok, pid, m.pt_cap - 1).reshape(-1)
    ].add(obs_ok.reshape(-1).astype(jnp.int32))
    # a KF's observation is redundant if the point has >= min_other_obs
    # observations NOT counting this one
    redundant = obs_ok & (n_obs[pid] - 1 >= min_other_obs)
    n_own = jnp.sum(obs_ok, axis=1)
    frac = jnp.sum(redundant, axis=1) / jnp.maximum(n_own, 1)

    first = jnp.argmax(m.kf_valid)
    slot = jnp.arange(K)
    protect = (slot == first) | (slot >= m.n_kf - keep_last) | ~m.kf_valid
    cullable = ~protect & (frac > redundancy) & (n_own > 0)
    # pick the single most redundant KF (if any)
    score = jnp.where(cullable, frac, -1.0)
    k = jnp.argmax(score)
    do = score[k] > 0

    kf_valid2 = m.kf_valid.at[k].set(jnp.where(do, False, m.kf_valid[k]))
    # splice: any KF whose prev was k now points at k's prev
    spliced = jnp.where((m.kf_prev == k) & do, m.kf_prev[k], m.kf_prev)
    # detach its observations
    feat_valid2 = m.kf_feat_valid.at[k].set(
        jnp.where(do, jnp.zeros((F,), bool), m.kf_feat_valid[k]))
    return dataclasses.replace(
        m, kf_valid=kf_valid2, kf_prev=spliced, kf_feat_valid=feat_valid2,
    )


@jax.jit
def fuse_duplicates(m: MapState, radius: float = 0.05,
                    max_desc_dist: float = 50.0) -> MapState:
    """Merge landmark pairs that are spatially near-coincident with
    matching descriptors (reference: SearchInNeighbors / Fuse). The
    younger (higher-id) point of each pair is redirected to the older:
    observations rewritten, younger invalidated.

    O(P^2) distance matrix — fine at the configured capacities."""
    P = m.pt_cap
    d2 = jnp.sum((m.pt_xyz[:, None, :] - m.pt_xyz[None, :, :]) ** 2, -1)
    desc_d = hamming_matrix(m.pt_desc, m.pt_desc)
    ids = jnp.arange(P)
    dup = (
        (d2 < radius * radius) & (desc_d < max_desc_dist)
        & m.pt_valid[:, None] & m.pt_valid[None, :]
        & (ids[:, None] > ids[None, :])   # younger row i, older col j
    )
    # redirect each younger point to its OLDEST duplicate
    target = jnp.where(dup, ids[None, :], P)
    best_target = jnp.min(target, axis=1)          # [P], P = none
    has_dup = best_target < P

    # resolve chains (a->b, b->c) with a few iterations
    def chase(t, _):
        t2 = jnp.where(t < P, jnp.minimum(t, jnp.where(has_dup[jnp.clip(t, 0, P - 1)],
                       best_target[jnp.clip(t, 0, P - 1)], t)), t)
        return t2, None
    bt, _ = jax.lax.scan(chase, jnp.where(has_dup, best_target, ids), None, length=3)

    # rewrite observations
    old_pt = m.kf_feat_pt
    valid_obs = old_pt >= 0
    mapped = bt[jnp.clip(old_pt, 0, P - 1)]
    new_pt = jnp.where(valid_obs, mapped.astype(jnp.int32), old_pt)
    return dataclasses.replace(
        m,
        kf_feat_pt=new_pt,
        pt_valid=m.pt_valid & ~has_dup,
    )


@jax.jit
def compact_points(m: MapState) -> tuple[MapState, jax.Array]:
    """Recycle landmark slots: pack valid landmarks to the front of the
    table so the monotonic slot counter `n_pt` resets to the live count.
    The reference never needs this (MapPoints are heap objects freed by
    erase, src/MapPoint.cc); fixed-capacity tables do, or a long run
    silts the table with culled/fused slots until allocation wraps.

    Returns (compacted_map, remap) where remap[old_slot] = new_slot;
    callers must rewrite any live track associations:
    `new_id = where(old_id >= 0 & was_valid[old_id], remap[old_id], -1)`
    (keyframe observation tables are rewritten here)."""
    P = m.pt_cap
    order = jnp.argsort(~m.pt_valid, stable=True)   # valid slots first
    remap = jnp.argsort(order, stable=True).astype(jnp.int32)
    n_valid = jnp.sum(m.pt_valid).astype(jnp.int32)

    def perm(a):
        return a[order]

    pid = jnp.clip(m.kf_feat_pt, 0, P - 1)
    live = (m.kf_feat_pt >= 0) & m.pt_valid[pid]
    new_feat_pt = jnp.where(live, remap[pid], -1)
    m2 = dataclasses.replace(
        m,
        pt_xyz=perm(m.pt_xyz), pt_desc=perm(m.pt_desc),
        pt_normal=perm(m.pt_normal),
        pt_min_dist=perm(m.pt_min_dist), pt_max_dist=perm(m.pt_max_dist),
        pt_ref_kf=perm(m.pt_ref_kf), pt_found=perm(m.pt_found),
        pt_visible=perm(m.pt_visible),
        pt_first_frame=perm(m.pt_first_frame),
        pt_valid=perm(m.pt_valid),
        kf_feat_pt=new_feat_pt,
        n_pt=n_valid,
    )
    return m2, remap


@functools.partial(jax.jit, static_argnames=("cap",))
def fuse_duplicates_recent(m: MapState, frame_id: jax.Array,
                           Rcw: jax.Array, tcw: jax.Array,
                           fx, fy, cx, cy,
                           recent_frames: int = 40,
                           px_radius: float = 2.0,
                           max_desc_dist: float = 50.0,
                           rel_depth_tol: float = 0.15,
                           cap: int = 512) -> MapState:
    """Per-keyframe duplicate fusion restricted to RECENTLY created
    landmarks vs the whole table — the reference's mapper-cycle form
    (SearchInNeighbors fuses the new KF's points against its neighbors
    BY REPROJECTION, src/LocalMapping.cc:1204-1281 + ORBmatcher::Fuse
    src/ORBmatcher.cc:1016). Bounded cost: [cap, P] matrices instead of
    [P, P], so it can run every keyframe.

    Duplicate test is projection-based (pixel distance in the current
    keyframe's camera + relative depth agreement + descriptor match) —
    scale-invariant, unlike a metric 3D radius, so it survives the
    world rescale at VIO init. Each recent duplicate is redirected to
    the oldest coincident point: observations rewritten, the recent
    copy invalidated."""
    P = m.pt_cap
    ids = jnp.arange(P)
    recent = m.pt_valid & (m.pt_first_frame >= frame_id - recent_frames)
    # newest `cap` recent points
    score = jnp.where(recent, m.pt_first_frame, -1)
    val, rid = jax.lax.top_k(score, min(cap, P))
    rok = val >= 0

    # project everything into the current keyframe's camera
    pc_all = (m.pt_xyz @ Rcw.T) + tcw
    z_all = pc_all[:, 2]
    zs = jnp.where(jnp.abs(z_all) < 1e-6, 1e-6, z_all)
    uv_all = jnp.stack([fx * pc_all[:, 0] / zs + cx,
                        fy * pc_all[:, 1] / zs + cy], -1)
    infront = z_all > 0.05

    uv_r = uv_all[rid]
    z_r = z_all[rid]
    duv2 = jnp.sum((uv_r[:, None, :] - uv_all[None, :, :]) ** 2, -1)
    dz_ok = jnp.abs(z_r[:, None] - z_all[None, :]) < rel_depth_tol * jnp.maximum(
        jnp.abs(z_all[None, :]), 1e-3)
    desc_d = hamming_matrix(m.pt_desc[rid], m.pt_desc)
    older = (m.pt_first_frame[None, :] < m.pt_first_frame[rid][:, None]) | (
        (m.pt_first_frame[None, :] == m.pt_first_frame[rid][:, None])
        & (ids[None, :] < rid[:, None])
    )
    dup = (
        (duv2 < px_radius * px_radius) & dz_ok & (desc_d < max_desc_dist)
        & rok[:, None] & m.pt_valid[None, :] & older
        & infront[rid][:, None] & infront[None, :]
    )
    target = jnp.where(dup, ids[None, :], P)
    best_target = jnp.min(target, axis=1)     # [cap], P = none
    has_dup = best_target < P

    # full mapping: identity except fused recents
    bt = ids.at[rid].set(jnp.where(has_dup, best_target, rid))
    # resolve one level of chains (recent -> recent -> old)
    bt = bt[bt]

    old_pt = m.kf_feat_pt
    valid_obs = old_pt >= 0
    mapped = bt[jnp.clip(old_pt, 0, P - 1)]
    new_pt = jnp.where(valid_obs, mapped.astype(jnp.int32), old_pt)
    fused = jnp.zeros((P,), bool).at[rid].max(has_dup)
    return dataclasses.replace(
        m, kf_feat_pt=new_pt, pt_valid=m.pt_valid & ~fused,
    )
