"""DBSCAN keypoint clustering as fixed-iteration label propagation.

TPU-native equivalent of KeyFrame::regionClustering
(reference: src/KeyFrame.cc:1031-1194 — DBSCAN over a keyframe's
keypoints with eps=50 px, used to build per-cluster haloc hashes and
cluster-level loop candidates; centroids via PCL compute3DCentroid).

Redesign: the classic queue-based region growing is replaced by
  1. dense adjacency A[i, j] = (|x_i - x_j| < eps) (one [N, N] op),
  2. core mask = degree >= min_pts,
  3. connected components by iterative min-label propagation across
     core points (log2(N) iterations of a masked min-matmul),
  4. border points adopt the label of any adjacent core point.
Everything is fixed-shape and runs in a handful of VPU passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_iters",))
def dbscan_labels(
    xy: jax.Array,        # [N, 2] keypoint positions
    valid: jax.Array,     # [N]
    eps: float = 50.0,
    min_pts: int = 20,
    n_iters: int = 12,
):
    """Returns (labels [N] i32, is_core [N] bool). labels: cluster id =
    min point index in the cluster; -1 for noise/invalid."""
    N = xy.shape[0]
    d2 = jnp.sum((xy[:, None, :] - xy[None, :, :]) ** 2, axis=-1)
    adj = (d2 <= eps * eps) & valid[:, None] & valid[None, :]
    degree = jnp.sum(adj, axis=1)
    core = valid & (degree >= min_pts)

    # min-label propagation over the core-core subgraph
    idx = jnp.arange(N, dtype=jnp.int32)
    INF = jnp.asarray(N + 1, jnp.int32)
    labels = jnp.where(core, idx, INF)
    core_adj = adj & core[:, None] & core[None, :]

    def body(_, lab):
        neigh = jnp.where(core_adj, lab[None, :], INF)
        best = jnp.min(neigh, axis=1)
        return jnp.where(core, jnp.minimum(lab, best), lab)

    labels = jax.lax.fori_loop(0, n_iters, body, labels)

    # border points: adopt any adjacent core label
    border_adj = adj & core[None, :]
    neigh = jnp.where(border_adj, labels[None, :], INF)
    border_lab = jnp.min(neigh, axis=1)
    out = jnp.where(core, labels, jnp.where(valid & (border_lab < INF), border_lab, INF))
    return jnp.where(out >= INF, -1, out).astype(jnp.int32), core


def cluster_centroids(
    xyz: jax.Array,       # [N, 3] 3D points per keypoint (or zeros)
    labels: jax.Array,    # [N] from dbscan_labels
    n_clusters_cap: int = 16,
):
    """Per-cluster 3D centroids (reference uses PCL compute3DCentroid,
    src/KeyFrame.cc:1174-1193). Returns (ids [C], centroids [C, 3],
    counts [C]); clusters ranked by size, mask-padded."""
    N = xyz.shape[0]
    # relabel to dense ids by sorting unique label reps
    has = labels >= 0
    # count per label via segment ops on label values (labels in [0, N))
    lab = jnp.where(has, labels, N)
    counts = jnp.zeros((N + 1,), jnp.int32).at[lab].add(1)
    sums = jnp.zeros((N + 1, 3), xyz.dtype).at[lab].add(jnp.where(has[:, None], xyz, 0.0))
    cnt, ids = jax.lax.top_k(counts[:N], n_clusters_cap)
    cents = sums[ids] / jnp.maximum(cnt[:, None], 1)
    return ids.astype(jnp.int32), cents, cnt
