"""Per-keyframe keypoint-cluster loop channel (DBSCAN + cluster haloc).

TPU-native equivalent of the reference's third loop-candidate source:
each keyframe's mapped keypoints are DBSCAN-clustered in pixel space
(reference: KeyFrame::regionClustering, src/KeyFrame.cc:1031-1194 —
eps=50 px, min_pts=100, small clusters folded into noise, noise refined
into adjacent clusters, and a single-cluster fallback holding ALL mapped
keypoints), each cluster gets a haloc hash of its member ORB descriptors
and a 3D centroid of its member landmarks (PCL compute3DCentroid,
src/KeyFrame.cc:1174-1193). LoopClosing then draws candidates from
  * cluster-hash matching vs every stored cluster hash
    (LoopClosing::getCandidates_haloc, src/LoopClosing.cc:739-776 —
    temporal discard window of 10 cluster ids, best 5 under the
    covisible-haloc gate), and
  * cluster-centroid 2D proximity
    (LocalMapping::getCandidates_Proximity, src/LocalMapping.cc:1475-1511
    — xy distance, id window 12, best 3).

Here the whole per-KF computation is ONE jitted fixed-shape pass:
dbscan labels by min-label propagation (loop/dbscan.py), member masks
for the top CLUSTERS_PER_KF clusters, per-cluster hashes as masked
matmuls, centroids as masked means. The cross-cluster matching is a
single [Cq, Ctable] L1 broadcast on the host-side table kept by
LoopCloser (the reference's hash_table_ / initial_cluster_pose_history_
are LoopClosing/LocalMapping members, not map state).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.loop.dbscan import dbscan_labels
from uvipslam_tpu.loop.haloc import compute_hash

CLUSTERS_PER_KF = 4
EPS_PX = 50.0          # reference: src/KeyFrame.cc:1035
MIN_PTS = 100          # reference: src/KeyFrame.cc:1036
HALOC_ID_WINDOW = 10   # reference: LC_DISCARD_WINDOW, src/LoopClosing.cc:743
PROX_ID_WINDOW = 12    # reference: src/LoopClosing.cc:229 (window=12)
HALOC_BEST_N = 5       # reference: src/LoopClosing.cc:772 (max_size=5)
PROX_BEST_N = 3        # reference: src/LoopClosing.cc:229 (best_n=3)


@functools.partial(jax.jit, static_argnames=("n_clusters", "min_pts"))
def _clusters_from_features(
    xy: jax.Array,        # [F, 2] keypoint pixels
    desc: jax.Array,      # [F, 256] i8
    pt_xyz: jax.Array,    # [F, 3] world position of the feature's landmark
    valid: jax.Array,     # [F] mapped-keypoint mask
    n_clusters: int = CLUSTERS_PER_KF,
    eps: float = EPS_PX,
    min_pts: int = MIN_PTS,
):
    F = xy.shape[0]
    labels, _ = dbscan_labels(xy, valid, eps=eps, min_pts=min_pts)

    # cluster sizes by label value (labels are min-member indices in [0,F))
    lab = jnp.where(labels >= 0, labels, F)
    counts = jnp.zeros((F + 1,), jnp.int32).at[lab].add(1)
    n_real = jnp.sum(counts[:F] > 0)

    # reference fallback: <= 1 cluster -> one cluster of ALL mapped
    # keypoints (src/KeyFrame.cc:1160-1171)
    labels = jnp.where(n_real <= 1, jnp.where(valid, 0, -1), labels)
    lab = jnp.where(labels >= 0, labels, F)
    counts = jnp.zeros((F + 1,), jnp.int32).at[lab].add(1)

    cnt, ids = jax.lax.top_k(counts[:F], n_clusters)

    member = (labels[None, :] == ids[:, None]) & (cnt[:, None] > 0) & valid[None, :]
    hashes = jax.vmap(lambda mk: compute_hash(desc, mk))(member)
    wsum = jnp.maximum(jnp.sum(member, axis=1), 1)
    cents = jnp.sum(jnp.where(member[:, :, None], pt_xyz[None], 0.0), axis=1) / wsum[:, None]
    return hashes, cents, cnt


def keyframe_clusters(m, kf_slot: int, min_pts: int = MIN_PTS):
    """Cluster keyframe `kf_slot`'s mapped keypoints. Returns
    (hashes [C, HASH_DIM], centroids [C, 3] world, counts [C]) with
    counts == 0 marking padding clusters."""
    pid = m.kf_feat_pt[kf_slot]
    valid = m.kf_feat_valid[kf_slot] & (pid >= 0)
    pt_xyz = m.pt_xyz[jnp.clip(pid, 0, m.pt_cap - 1)]
    return _clusters_from_features(
        m.kf_feat_xy[kf_slot], m.kf_feat_desc[kf_slot],
        jnp.where(valid[:, None], pt_xyz, 0.0), valid, min_pts=min_pts,
    )
