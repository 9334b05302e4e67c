"""Fixed-capacity device-resident world model (keyframes + landmarks).

TPU-native equivalent of the reference's Map/KeyFrame/MapPoint object
graph (reference: src/Map.cc, src/KeyFrame.cc, src/MapPoint.cc). The
pointer-heavy mutex-guarded heap structure becomes one pytree of
structure-of-arrays tables with validity masks:

  * keyframe table   [KF_CAP]: NavState, timestamp, feature block
    (positions/descriptors/levels), per-feature landmark ids (this IS
    the observation incidence, replacing MapPoint::mObservations and
    KeyFrame::mvpMapPoints simultaneously), pressure depth, IMU
    preintegration from the previous keyframe;
  * landmark table   [PT_CAP]: position, distinctive descriptor, normal,
    scale-invariance band, found/visible counters, reference keyframe.

Covisibility weights (KeyFrame::UpdateConnections) are not stored: they
are recomputed on demand as one incidence matmul, which on TPU is
cheaper than maintaining mutable adjacency lists.

Allocation is monotonic slot counters + masks; culling clears masks
(slots are recycled only by capacity wrap, which the caps are sized to
avoid for the benchmark sequences).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.core.preintegration import PreintState
from uvipslam_tpu.core.state import NavState

N_BITS = 256
LOOP_CAP = 16


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MapState:
    # --- keyframes -----------------------------------------------------
    kf_ns: NavState            # [K] body (or camera, in MONO mode) state
    kf_time: jax.Array         # [K] f64-as-f32 pair avoided: store f32 rel time
    kf_valid: jax.Array        # [K] bool
    kf_frame_id: jax.Array     # [K] i32
    kf_prev: jax.Array         # [K] i32 previous-KF slot (-1 for first)
    kf_depth: jax.Array        # [K] pressure depth measurement
    kf_depth_valid: jax.Array  # [K] bool
    kf_preint: PreintState     # [K] preintegration from kf_prev to this KF
    # raw IMU window since kf_prev (for re-integration after bias updates,
    # like KeyFrame::ComputePreInt; reference: src/KeyFrame.cc:218-293)
    kf_imu_omg: jax.Array      # [K, S, 3]
    kf_imu_acc: jax.Array      # [K, S, 3]
    kf_imu_dt: jax.Array       # [K, S]
    kf_imu_mask: jax.Array     # [K, S]
    # per-KF feature block
    kf_feat_xy: jax.Array      # [K, F, 2] undistorted pixel coords
    kf_feat_desc: jax.Array    # [K, F, 256] i8
    kf_feat_level: jax.Array   # [K, F] i32
    kf_feat_angle: jax.Array   # [K, F] f32
    kf_feat_valid: jax.Array   # [K, F] bool
    kf_feat_pt: jax.Array      # [K, F] i32 landmark id (-1 = none)
    # retrieval vectors, stored incrementally at insertion (reference:
    # KeyFrame::ComputeBoW + ComputeHaloc, src/KeyFrame.cc:203-211,319-329
    # — the reference computes these once per KF, not per query)
    kf_bow: jax.Array          # [K, W] L1-normalized TF-IDF BoW vector
    kf_hash: jax.Array         # [K, D] haloc hash
    # --- landmarks -----------------------------------------------------
    pt_xyz: jax.Array          # [P, 3]
    pt_valid: jax.Array        # [P] bool
    pt_desc: jax.Array         # [P, 256] i8
    pt_normal: jax.Array       # [P, 3] mean viewing direction
    pt_min_dist: jax.Array     # [P] scale-invariance band
    pt_max_dist: jax.Array     # [P]
    pt_ref_kf: jax.Array       # [P] i32
    pt_found: jax.Array        # [P] f32 counters for found/visible ratio
    pt_visible: jax.Array      # [P] f32
    pt_first_frame: jax.Array  # [P] i32 frame id at creation (for culling)
    # --- retained loop edges (reference: KeyFrame::AddLoopEdge feeding
    # every later OptimizeEssentialGraph, src/KeyFrame.cc + Optimizer.cc:
    # 2529-2545 — past loop edges keep multi-loop trajectories consistent)
    loop_i: jax.Array          # [L] i32 loop-KF slot
    loop_j: jax.Array          # [L] i32 query-KF slot
    loop_s: jax.Array          # [L] measured relative Sim3 (j<-i, camera)
    loop_R: jax.Array          # [L, 3, 3]
    loop_t: jax.Array          # [L, 3]
    # --- counters ------------------------------------------------------
    n_kf: jax.Array            # i32 next free KF slot
    n_pt: jax.Array            # i32 next free landmark slot
    n_loop: jax.Array          # i32 number of stored loop edges

    # -------------------------------------------------------------------

    @property
    def kf_cap(self) -> int:
        return self.kf_valid.shape[0]

    @property
    def pt_cap(self) -> int:
        return self.pt_valid.shape[0]

    @property
    def n_feat(self) -> int:
        return self.kf_feat_valid.shape[1]

    @property
    def imu_cap(self) -> int:
        return self.kf_imu_dt.shape[1]

    @staticmethod
    def empty(kf_cap: int = 256, pt_cap: int = 16384, n_feat: int = 400,
              imu_window: int = 256, dtype=jnp.float32) -> "MapState":
        from uvipslam_tpu.loop.haloc import HASH_DIM
        from uvipslam_tpu.loop.reloc import N_WORDS

        K, P, F = kf_cap, pt_cap, n_feat
        S = imu_window
        return MapState(
            kf_ns=NavState.identity((K,), dtype),
            kf_time=jnp.zeros((K,), dtype),
            kf_valid=jnp.zeros((K,), bool),
            kf_frame_id=jnp.full((K,), -1, jnp.int32),
            kf_prev=jnp.full((K,), -1, jnp.int32),
            kf_depth=jnp.zeros((K,), dtype),
            kf_depth_valid=jnp.zeros((K,), bool),
            kf_preint=PreintState.zero((K,), dtype),
            kf_imu_omg=jnp.zeros((K, S, 3), dtype),
            kf_imu_acc=jnp.zeros((K, S, 3), dtype),
            kf_imu_dt=jnp.zeros((K, S), dtype),
            kf_imu_mask=jnp.zeros((K, S), dtype),
            kf_feat_xy=jnp.zeros((K, F, 2), dtype),
            kf_feat_desc=jnp.zeros((K, F, N_BITS), jnp.int8),
            kf_feat_level=jnp.zeros((K, F), jnp.int32),
            kf_feat_angle=jnp.zeros((K, F), dtype),
            kf_feat_valid=jnp.zeros((K, F), bool),
            kf_feat_pt=jnp.full((K, F), -1, jnp.int32),
            kf_bow=jnp.zeros((K, N_WORDS), dtype),
            kf_hash=jnp.zeros((K, HASH_DIM), dtype),
            pt_xyz=jnp.zeros((P, 3), dtype),
            pt_valid=jnp.zeros((P,), bool),
            pt_desc=jnp.zeros((P, N_BITS), jnp.int8),
            pt_normal=jnp.zeros((P, 3), dtype),
            pt_min_dist=jnp.zeros((P,), dtype),
            pt_max_dist=jnp.zeros((P,), dtype),
            pt_ref_kf=jnp.full((P,), -1, jnp.int32),
            pt_found=jnp.ones((P,), dtype),
            pt_visible=jnp.ones((P,), dtype),
            pt_first_frame=jnp.full((P,), -1, jnp.int32),
            loop_i=jnp.full((LOOP_CAP,), -1, jnp.int32),
            loop_j=jnp.full((LOOP_CAP,), -1, jnp.int32),
            loop_s=jnp.ones((LOOP_CAP,), dtype),
            loop_R=jnp.tile(jnp.eye(3, dtype=dtype)[None], (LOOP_CAP, 1, 1)),
            loop_t=jnp.zeros((LOOP_CAP, 3), dtype),
            n_kf=jnp.asarray(0, jnp.int32),
            n_pt=jnp.asarray(0, jnp.int32),
            n_loop=jnp.asarray(0, jnp.int32),
        )

    def add_loop_edge(self, kf_i, kf_j, s, R, t) -> "MapState":
        """Record an accepted loop closure's measured relative Sim3
        (camera frame, j<-i) for reuse by every later essential-graph
        pass (reference: KeyFrame::AddLoopEdge)."""
        k = jnp.minimum(self.n_loop, self.loop_i.shape[0] - 1)
        return dataclasses.replace(
            self,
            loop_i=self.loop_i.at[k].set(jnp.asarray(kf_i, jnp.int32)),
            loop_j=self.loop_j.at[k].set(jnp.asarray(kf_j, jnp.int32)),
            loop_s=self.loop_s.at[k].set(
                jnp.asarray(s, self.loop_s.dtype)),
            loop_R=self.loop_R.at[k].set(
                jnp.asarray(R, self.loop_R.dtype)),
            loop_t=self.loop_t.at[k].set(
                jnp.asarray(t, self.loop_t.dtype)),
            n_loop=jnp.minimum(self.n_loop + 1,
                               jnp.asarray(self.loop_i.shape[0], jnp.int32)),
        )

    # -------------------------------------------------------------------
    # keyframe insertion
    # -------------------------------------------------------------------

    def add_keyframe(
        self,
        ns: NavState,
        time: jax.Array,
        frame_id: jax.Array,
        feat_xy: jax.Array,
        feat_desc: jax.Array,
        feat_level: jax.Array,
        feat_angle: jax.Array,
        feat_valid: jax.Array,
        feat_pt: jax.Array,
        depth: jax.Array,
        depth_valid: jax.Array,
        preint: PreintState,
        prev_kf: jax.Array,
        imu_omg: jax.Array | None = None,   # [S, 3]
        imu_acc: jax.Array | None = None,
        imu_dt: jax.Array | None = None,
        imu_mask: jax.Array | None = None,
    ) -> tuple["MapState", jax.Array]:
        """Functionally insert a keyframe at the next slot; returns
        (new_map, kf_slot). Equivalent to the KeyFrame ctor +
        Map::AddKeyFrame (reference: src/KeyFrame.cc:52-..., src/Map.cc).

        BoW and haloc retrieval vectors are computed here ONCE per
        keyframe (reference: ComputeBoW/ComputeHaloc at insertion) so
        loop/reloc queries are O(K) scoring, never O(K·F·W) recompute."""
        from uvipslam_tpu.loop.haloc import compute_hash
        from uvipslam_tpu.loop.reloc import _codebook, _idf
        from uvipslam_tpu.loop.vocab import bow_vector

        cb = _codebook()
        bow = bow_vector(feat_desc, feat_valid, cb, _idf())
        hsh = compute_hash(feat_desc, feat_valid)

        k = self.n_kf
        m = self
        new = dataclasses.replace(
            m,
            kf_ns=jax.tree_util.tree_map(
                lambda tbl, v: tbl.at[k].set(v), m.kf_ns, ns
            ),
            kf_time=m.kf_time.at[k].set(time),
            kf_valid=m.kf_valid.at[k].set(True),
            kf_frame_id=m.kf_frame_id.at[k].set(frame_id),
            kf_prev=m.kf_prev.at[k].set(prev_kf),
            kf_depth=m.kf_depth.at[k].set(depth),
            kf_depth_valid=m.kf_depth_valid.at[k].set(depth_valid),
            kf_preint=jax.tree_util.tree_map(
                lambda tbl, v: tbl.at[k].set(v), m.kf_preint, preint
            ),
            kf_feat_xy=m.kf_feat_xy.at[k].set(feat_xy),
            kf_feat_desc=m.kf_feat_desc.at[k].set(feat_desc),
            kf_feat_level=m.kf_feat_level.at[k].set(feat_level),
            kf_feat_angle=m.kf_feat_angle.at[k].set(feat_angle),
            kf_feat_valid=m.kf_feat_valid.at[k].set(feat_valid),
            kf_feat_pt=m.kf_feat_pt.at[k].set(jnp.where(feat_valid, feat_pt, -1)),
            kf_bow=m.kf_bow.at[k].set(bow),
            kf_hash=m.kf_hash.at[k].set(hsh),
            # refresh observed landmarks' descriptors to this newest
            # observation (the reference maintains a distinctive descriptor
            # over observations, MapPoint::ComputeDistinctiveDescriptors —
            # the newest-observation approximation keeps projection
            # matching viable as appearance evolves)
            pt_desc=m.pt_desc.at[
                jnp.where(feat_valid & (feat_pt >= 0), feat_pt, self.pt_cap - 1)
            ].set(
                jnp.where((feat_valid & (feat_pt >= 0))[:, None], feat_desc,
                          m.pt_desc[jnp.where(feat_valid & (feat_pt >= 0),
                                              feat_pt, self.pt_cap - 1)])
            ),
            kf_imu_omg=(m.kf_imu_omg if imu_omg is None
                        else m.kf_imu_omg.at[k].set(imu_omg)),
            kf_imu_acc=(m.kf_imu_acc if imu_acc is None
                        else m.kf_imu_acc.at[k].set(imu_acc)),
            kf_imu_dt=(m.kf_imu_dt if imu_dt is None
                       else m.kf_imu_dt.at[k].set(imu_dt)),
            kf_imu_mask=(m.kf_imu_mask if imu_mask is None
                         else m.kf_imu_mask.at[k].set(imu_mask)),
            n_kf=k + 1,
        )
        return new, k

    # -------------------------------------------------------------------
    # landmark insertion (batched)
    # -------------------------------------------------------------------

    def add_points(
        self,
        xyz: jax.Array,        # [M, 3]
        desc: jax.Array,       # [M, 256]
        normal: jax.Array,     # [M, 3]
        min_dist: jax.Array,   # [M]
        max_dist: jax.Array,   # [M]
        ref_kf: jax.Array,     # scalar or [M]
        frame_id: jax.Array,
        valid: jax.Array,      # [M] which of the M candidates are real
    ) -> tuple["MapState", jax.Array]:
        """Append up to M landmarks; invalid candidates are packed out by
        a stable mask-sort so slots stay dense. Returns (new_map,
        pt_ids [M] with -1 for rejected candidates)."""
        M = xyz.shape[0]
        # pack valid candidates to the front (stable)
        order = jnp.argsort(~valid, stable=True)
        inv_order = jnp.argsort(order, stable=True)
        n_new = jnp.sum(valid).astype(jnp.int32)
        slots_packed = self.n_pt + jnp.arange(M, dtype=jnp.int32)
        # id for each original candidate
        ids = jnp.where(valid, slots_packed[inv_order], -1)

        xyz_p = xyz[order]
        desc_p = desc[order]
        normal_p = normal[order]
        mind_p = min_dist[order]
        maxd_p = max_dist[order]
        val_p = valid[order]
        refk = jnp.broadcast_to(jnp.asarray(ref_kf, jnp.int32), (M,))[order]

        idx = jnp.where(val_p, slots_packed, self.pt_cap - 1)  # dump row
        safe = val_p  # only write where valid
        m = self
        new = dataclasses.replace(
            m,
            pt_xyz=m.pt_xyz.at[idx].set(jnp.where(safe[:, None], xyz_p, m.pt_xyz[idx])),
            pt_desc=m.pt_desc.at[idx].set(jnp.where(safe[:, None], desc_p, m.pt_desc[idx])),
            pt_normal=m.pt_normal.at[idx].set(jnp.where(safe[:, None], normal_p, m.pt_normal[idx])),
            pt_min_dist=m.pt_min_dist.at[idx].set(jnp.where(safe, mind_p, m.pt_min_dist[idx])),
            pt_max_dist=m.pt_max_dist.at[idx].set(jnp.where(safe, maxd_p, m.pt_max_dist[idx])),
            pt_ref_kf=m.pt_ref_kf.at[idx].set(jnp.where(safe, refk, m.pt_ref_kf[idx])),
            pt_valid=m.pt_valid.at[idx].set(jnp.where(safe, True, m.pt_valid[idx])),
            pt_first_frame=m.pt_first_frame.at[idx].set(
                jnp.where(safe, jnp.asarray(frame_id, jnp.int32), m.pt_first_frame[idx])
            ),
            pt_found=m.pt_found.at[idx].set(jnp.where(safe, 1.0, m.pt_found[idx])),
            pt_visible=m.pt_visible.at[idx].set(jnp.where(safe, 1.0, m.pt_visible[idx])),
            n_pt=m.n_pt + n_new,
        )
        return new, ids

    # -------------------------------------------------------------------
    # covisibility / local map queries
    # -------------------------------------------------------------------

    def covisibility_with(self, pt_mask: jax.Array) -> jax.Array:
        """[K] number of landmarks from `pt_mask` [P] observed by each KF
        (one gather+segment reduce; replaces UpdateConnections queries)."""
        obs_pt = jnp.where(self.kf_feat_pt >= 0, self.kf_feat_pt, 0)
        seen = pt_mask[obs_pt] & (self.kf_feat_pt >= 0) & self.kf_feat_valid
        return jnp.sum(seen, axis=1)

    def covisibility_matrix(self) -> jax.Array:
        """[K, K] shared-landmark counts via incidence matmul."""
        inc = jnp.zeros((self.kf_cap, self.pt_cap), jnp.bfloat16)
        obs_pt = jnp.clip(self.kf_feat_pt, 0, self.pt_cap - 1)
        has = (self.kf_feat_pt >= 0) & self.kf_feat_valid
        kidx = jnp.broadcast_to(
            jnp.arange(self.kf_cap)[:, None], self.kf_feat_pt.shape
        )
        inc = inc.at[kidx, obs_pt].max(jnp.where(has, 1.0, 0.0).astype(jnp.bfloat16))
        W = jax.lax.dot_general(
            inc, inc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        W = W * self.kf_valid[:, None] * self.kf_valid[None, :]
        return W - jnp.diag(jnp.diag(W))

    def points_seen_by(self, kf_mask: jax.Array) -> jax.Array:
        """[P] bool: landmarks observed by any KF in `kf_mask` [K]."""
        has = (self.kf_feat_pt >= 0) & self.kf_feat_valid & kf_mask[:, None]
        pts = jnp.where(has, self.kf_feat_pt, self.pt_cap - 1)
        out = jnp.zeros((self.pt_cap,), bool)
        out = out.at[pts.reshape(-1)].max(has.reshape(-1))
        # the dump row may be polluted; clear it unless genuinely observed
        genuinely = jnp.any((self.kf_feat_pt == self.pt_cap - 1) & has)
        out = out.at[self.pt_cap - 1].set(genuinely)
        return out & self.pt_valid

    def observations_of(self, pt_ids_mask: jax.Array):
        """Return dense observation arrays (kf, feat, pt) for all
        observations of masked landmarks — consumed by local BA. Shapes
        stay [K*F] with a mask (no compaction; BA accepts masked obs)."""
        K, F = self.kf_feat_pt.shape
        obs_kf = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, F)).reshape(-1)
        obs_pt = self.kf_feat_pt.reshape(-1)
        ok = (obs_pt >= 0) & self.kf_feat_valid.reshape(-1)
        ok = ok & pt_ids_mask[jnp.clip(obs_pt, 0, self.pt_cap - 1)]
        obs_uv = self.kf_feat_xy.reshape(K * F, 2)
        obs_level = self.kf_feat_level.reshape(-1)
        return obs_kf, jnp.clip(obs_pt, 0, self.pt_cap - 1), obs_uv, obs_level, ok
