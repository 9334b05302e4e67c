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
