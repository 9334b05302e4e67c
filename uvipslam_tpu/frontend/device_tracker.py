"""Fully device-resident mono tracker: ONE jitted step per frame.

The host-orchestrated MonoTracker (tracker.py) dispatches ~10 jitted
calls + several scalar syncs per frame; through the TPU tunnel that is
>1 s/frame of pure round-trip latency. This module is the production
form the SURVEY's north star calls for: the complete per-frame pipeline
— state machine included — as a single `track_step(state, frame)`
function with `lax.switch`/`lax.cond` control flow. The host either
streams frames one call at a time or `lax.scan`s a whole sequence in a
single device program (the bench path).

Functional equivalence to MonoTracker is enforced by test
(tests/test_device_tracker.py compares trajectories).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.lie import mm, mv
from uvipslam_tpu.frontend import tracker as HT
from uvipslam_tpu.frontend.frame import Tracks, propagate_tracks, refill_tracks, refresh_descriptors
from uvipslam_tpu.frontend.tracker import (
    INITIALIZING,
    LOST,
    NOT_INITIALIZED,
    WORKING,
    TrackerConfig,
    _cam_pose_to_ns,
    _local_ba_jit,
    _motion_guess_jit,
    _ns_to_cam_pose,
    _pose_and_localmap_jit,
    _triangulate_new_jit,
)
from uvipslam_tpu.mapstate.map import MapState
from uvipslam_tpu.models.camera import CameraModel
from uvipslam_tpu.ops.clahe import clahe
from uvipslam_tpu.ops.klt import build_flow_pyramid
from uvipslam_tpu.ops.twoview import initialize_two_view

RING = 64


def device_hygiene(m: MapState, t: Tracks, frame_id, Rcw, tcw,
                   fx, fy, cx, cy, compact_frac: float = 0.9):
    """Per-KF map hygiene for the device trackers (reference: the mapper
    cycle culls + fuses every keyframe, src/LocalMapping.cc:791-798).
    Culls weak landmarks, fuses duplicates against the new KF's camera,
    severs dead track associations, and recycles landmark slots when the
    table approaches capacity so long scans stay bounded."""
    from uvipslam_tpu.mapstate.hygiene import (
        compact_points,
        cull_points,
        fuse_duplicates_recent,
    )

    m = cull_points(m, frame_id)
    m = fuse_duplicates_recent(m, frame_id, Rcw, tcw, fx, fy, cx, cy)
    pid = jnp.clip(t.pt_id, 0, m.pt_cap - 1)
    alive = (t.pt_id >= 0) & m.pt_valid[pid]
    t = dataclasses.replace(t, pt_id=jnp.where(alive, t.pt_id, -1))

    def do_compact(op):
        m, t = op
        m2, remap = compact_points(m)
        pid = jnp.clip(t.pt_id, 0, m.pt_cap - 1)
        live = (t.pt_id >= 0) & m.pt_valid[pid]
        t2 = dataclasses.replace(
            t, pt_id=jnp.where(live, remap[pid], -1))
        return m2, t2

    near_full = m.n_pt > int(compact_frac * m.pt_cap)
    m, t = jax.lax.cond(near_full, do_compact, lambda op: op, (m, t))
    return m, t


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrackerState:
    tracks: Tracks
    map: MapState
    pyr_prev: tuple          # tuple of [h_l, w_l] images (static structure)
    state: jax.Array         # i32 state machine
    frame_id: jax.Array      # i32
    Rcw: jax.Array
    tcw: jax.Array
    R_vel: jax.Array
    t_vel: jax.Array
    ring_R: jax.Array        # [RING, 3, 3]
    ring_t: jax.Array        # [RING, 3]
    ring_frame: jax.Array    # [RING] i32
    init_frame_id: jax.Array
    last_kf_slot: jax.Array
    last_kf_frame: jax.Array
    n_ref_tracked: jax.Array
    key: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepOut:
    Rcw: jax.Array
    tcw: jax.Array
    state: jax.Array
    n_inliers: jax.Array
    # slot of a keyframe created THIS frame, -1 otherwise — the hook the
    # streaming host uses to run loop closing at KF boundaries
    # (reference: LocalMapping feeds LoopClosing on every keyframe,
    # src/LocalMapping.cc:850-852)
    new_kf: jax.Array


def init_state(cfg: TrackerConfig, kf_cap: int, pt_cap: int,
               height: int, width: int, seed: int = 0) -> TrackerState:
    zero_img = jnp.zeros((height, width), jnp.float32)
    pyr = tuple(build_flow_pyramid(zero_img, cfg.n_levels_klt))
    return TrackerState(
        tracks=Tracks.empty(cfg.n_tracks),
        map=MapState.empty(kf_cap, pt_cap, cfg.n_tracks),
        pyr_prev=pyr,
        state=jnp.asarray(NOT_INITIALIZED, jnp.int32),
        frame_id=jnp.asarray(-1, jnp.int32),
        Rcw=jnp.eye(3, dtype=jnp.float32), tcw=jnp.zeros(3, jnp.float32),
        R_vel=jnp.eye(3, dtype=jnp.float32), t_vel=jnp.zeros(3, jnp.float32),
        ring_R=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (RING, 1, 1)),
        ring_t=jnp.zeros((RING, 3), jnp.float32),
        ring_frame=jnp.full((RING,), -1, jnp.int32),
        init_frame_id=jnp.asarray(-1, jnp.int32),
        last_kf_slot=jnp.asarray(-1, jnp.int32),
        last_kf_frame=jnp.asarray(-1, jnp.int32),
        n_ref_tracked=jnp.asarray(0, jnp.int32),
        key=jax.random.PRNGKey(seed),
    )


def build_tracker(cam: CameraModel, cfg: TrackerConfig, kf_cap: int, pt_cap: int):
    """Returns (state0, step) with step = jit((state, img) -> (state, out))."""
    # numpy, not device array: closure constants embed free at
    # lowering (device-resident constants cost a tunnel fetch)
    scale_sigmas = np.asarray(cfg.scale_sigmas, np.float32)

    # ------------------------------------------------------------------
    def undistort(tracks: Tracks) -> Tracks:
        return dataclasses.replace(tracks, xy_und=cam.undistort_pixels(tracks.xy))

    def refresh_birth(tracks: Tracks, frame_id) -> Tracks:
        newborn = tracks.birth_frame == frame_id
        return dataclasses.replace(
            tracks,
            birth_xy_und=jnp.where(newborn[:, None], tracks.xy_und, tracks.birth_xy_und),
        )

    def run_local_ba(m: MapState) -> MapState:
        kf_idx = jnp.arange(m.kf_cap)
        in_window = (kf_idx >= m.n_kf - cfg.local_window) & (kf_idx < m.n_kf)
        fixed = m.kf_valid & ~in_window
        fixed = fixed.at[0].set(True)
        fixed = fixed.at[1].set(m.kf_valid[1])
        return _local_ba_jit(m, fixed, cam.fx, cam.fy, cam.cx, cam.cy, scale_sigmas)

    # ------------------------------------------------------------------
    def branch_not_initialized(st: TrackerState, img) -> TrackerState:
        tracks = refill_tracks(st.tracks, img, st.frame_id,
                               n_features=cfg.n_tracks, px_distance=cfg.px_distance)
        tracks = undistort(tracks)
        n = jnp.sum(tracks.valid)
        go = n >= cfg.min_init_tracks
        tracks = dataclasses.replace(
            tracks,
            birth_frame=jnp.where(go, jnp.full_like(tracks.birth_frame, st.frame_id),
                                  tracks.birth_frame),
            birth_xy_und=jnp.where(go, tracks.xy_und, tracks.birth_xy_und),
        )
        return dataclasses.replace(
            st, tracks=tracks,
            state=jnp.where(go, INITIALIZING, NOT_INITIALIZED).astype(jnp.int32),
            init_frame_id=jnp.where(go, st.frame_id, st.init_frame_id),
        )

    # ------------------------------------------------------------------
    def branch_initializing(st: TrackerState, img) -> TrackerState:
        t = undistort(st.tracks)
        key, sub = jax.random.split(st.key)
        cand = t.valid & (t.birth_frame == st.init_frame_id)
        # parallel H/F model selection (reference: Initializer::Initialize)
        rec = initialize_two_view(sub, t.birth_xy_und, t.xy_und, cand, cam.K,
                                  sigma=1.0)
        enough = jnp.sum(cand) >= cfg.min_init_tracks // 2
        ok = rec["ok"] & enough

        def commit(op):
            st, t, rec = op
            good = rec["good"]
            z = rec["points"][:, 2]
            med = jnp.nan_to_num(jnp.nanmedian(jnp.where(good, z, jnp.nan)), nan=1.0)
            scale = 1.0 / jnp.maximum(med, 1e-6)
            pts3 = rec["points"] * scale
            R, tvec = rec["R"], rec["t"] * scale

            m = st.map
            ns0 = _cam_pose_to_ns(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
            ns1 = _cam_pose_to_ns(R, tvec)
            normals = pts3 / jnp.maximum(jnp.linalg.norm(pts3, axis=-1, keepdims=True), 1e-9)
            dist = jnp.linalg.norm(pts3, axis=-1)
            m, ids = m.add_points(pts3, t.desc, normals, dist / 2.0, dist * 2.0,
                                  jnp.asarray(0), st.frame_id, good)
            feat_pt = jnp.where(good, ids, -1)
            zp = jax.tree_util.tree_map(lambda a: a[0], MapState.empty(1, 1, 1).kf_preint)
            m, k0 = m.add_keyframe(
                ns0, jnp.asarray(0.0), st.init_frame_id,
                t.birth_xy_und, t.desc, t.level, t.angle, cand, feat_pt,
                jnp.asarray(0.0), jnp.asarray(False), zp, jnp.asarray(-1),
            )
            m, k1 = m.add_keyframe(
                ns1, jnp.asarray(0.0), st.frame_id,
                t.xy_und, t.desc, t.level, t.angle, cand, feat_pt,
                jnp.asarray(0.0), jnp.asarray(False), zp, k0,
            )
            m = run_local_ba(m)
            t2 = dataclasses.replace(t, pt_id=jnp.where(good, feat_pt, -1))
            ns1n = jax.tree_util.tree_map(lambda a: a[1], m.kf_ns)
            Rcw, tcw = _ns_to_cam_pose(ns1n)
            ring_R = st.ring_R.at[st.init_frame_id % RING].set(jnp.eye(3, dtype=jnp.float32))
            ring_t = st.ring_t.at[st.init_frame_id % RING].set(jnp.zeros(3, jnp.float32))
            ring_f = st.ring_frame.at[st.init_frame_id % RING].set(st.init_frame_id)
            return dataclasses.replace(
                st, tracks=t2, map=m, Rcw=Rcw, tcw=tcw,
                R_vel=jnp.eye(3, dtype=jnp.float32),
                t_vel=jnp.zeros(3, jnp.float32),
                ring_R=ring_R, ring_t=ring_t, ring_frame=ring_f,
                last_kf_slot=k1.astype(jnp.int32), last_kf_frame=st.frame_id,
                n_ref_tracked=jnp.sum(good).astype(jnp.int32),
                state=jnp.asarray(WORKING, jnp.int32),
            )

        def keep(op):
            st, t, rec = op
            # restart if the init set decayed or took too long
            n = jnp.sum(t.valid & (t.birth_frame == st.init_frame_id))
            stale = (n < cfg.min_init_tracks // 2) | (st.frame_id - st.init_frame_id > 30)
            return dataclasses.replace(
                st, tracks=t,
                state=jnp.where(stale, NOT_INITIALIZED, INITIALIZING).astype(jnp.int32),
            )

        st2 = jax.lax.cond(ok, commit, keep, (st, t, rec))
        return dataclasses.replace(st2, key=key)

    # ------------------------------------------------------------------
    def branch_working(st: TrackerState, img) -> TrackerState:
        t = undistort(st.tracks)
        Rp = mm(st.R_vel, st.Rcw)
        tp = mv(st.R_vel, st.tcw) + st.t_vel
        R1, t1, inlier1, n_in, t2 = _pose_and_localmap_jit(
            t, st.map, Rp, tp, cam.fx, cam.fy, cam.cx, cam.cy, scale_sigmas,
        )

        def lost(op):
            st, *_ = op
            return dataclasses.replace(st, state=jnp.asarray(LOST, jnp.int32))

        def keep_working(op):
            st, t2, R1, t1, n_in, img = op
            R_prev, t_prev = st.Rcw, st.tcw
            Rcw = lie.normalize_rotation(R1)
            Rinv, tinv = lie.se3_inverse(R_prev, t_prev)
            R_vel, t_vel = lie.se3_compose(R1, t1, Rinv, tinv)
            R_vel = lie.normalize_rotation(R_vel)

            tracks = refill_tracks(t2, img, st.frame_id,
                                   n_features=cfg.n_tracks, px_distance=cfg.px_distance)
            tracks = refresh_descriptors(tracks, img)
            tracks = undistort(tracks)
            tracks = refresh_birth(tracks, st.frame_id)
            st = dataclasses.replace(st, tracks=tracks, Rcw=Rcw, tcw=t1,
                                     R_vel=R_vel, t_vel=t_vel)

            since = st.frame_id - st.last_kf_frame
            need_kf = (since >= cfg.kf_min_interval) & (
                (since >= cfg.kf_max_interval)
                | (n_in < cfg.kf_track_ratio * jnp.maximum(st.n_ref_tracked, 1))
            )

            def create_kf(st):
                t = st.tracks
                m, t = _triangulate_new_jit(
                    st.map, t, st.ring_R, st.ring_t, st.ring_frame,
                    st.Rcw, st.tcw, cam.fx, cam.fy, cam.cx, cam.cy,
                    st.frame_id, st.last_kf_slot,
                )
                ns = _cam_pose_to_ns(st.Rcw, st.tcw)
                zp = jax.tree_util.tree_map(lambda a: a[0], MapState.empty(1, 1, 1).kf_preint)
                m, k = m.add_keyframe(
                    ns, st.frame_id.astype(jnp.float32), st.frame_id,
                    t.xy_und, t.desc, t.level, t.angle, t.valid, t.pt_id,
                    jnp.asarray(0.0), jnp.asarray(False), zp, st.last_kf_slot,
                )
                m = run_local_ba(m)
                ns_k = jax.tree_util.tree_map(lambda a: a[k], m.kf_ns)
                Rcw, tcw = _ns_to_cam_pose(ns_k)
                if cfg.map_hygiene:
                    m, t = device_hygiene(m, t, st.frame_id, Rcw, tcw,
                                          cam.fx, cam.fy, cam.cx, cam.cy)
                return dataclasses.replace(
                    st, tracks=t, map=m, Rcw=Rcw, tcw=tcw,
                    last_kf_slot=k.astype(jnp.int32), last_kf_frame=st.frame_id,
                    n_ref_tracked=jnp.sum(t.valid & (t.pt_id >= 0)).astype(jnp.int32),
                )

            st = jax.lax.cond(need_kf, create_kf, lambda s: s, st)
            return st

        st2 = jax.lax.cond(
            n_in < cfg.min_tracked, lost, keep_working,
            (st, t2, R1, t1, n_in, img),
        )
        return st2

    # ------------------------------------------------------------------
    def branch_lost(st: TrackerState, img) -> TrackerState:
        """Device-resident relocalization (reference:
        Tracking::Relocalisation, src/Tracking.cc:2373-2534 — BoW
        candidates -> PnP RANSAC -> projection re-association -> accept
        on inlier count). Fresh detection, retrieval against the stored
        per-KF BoW vectors, PnP seed + best-candidate-KF seed, both
        refined by the pose+local-map solve; the better one wins."""
        from uvipslam_tpu.frontend.frame import refill_tracks as _refill
        from uvipslam_tpu.loop.reloc import relocalize_frame

        key, sub = jax.random.split(st.key)
        fresh = _refill(Tracks.empty(cfg.n_tracks), img, st.frame_id,
                        n_features=cfg.n_tracks, px_distance=cfg.px_distance)
        fresh = refresh_descriptors(fresh, img)
        fresh = undistort(fresh)

        R0, t0, pt_id, n_pnp, top_kfs = relocalize_frame(
            fresh, st.map, sub, cam.fx, cam.fy, cam.cx, cam.cy)
        fresh = dataclasses.replace(
            fresh, pt_id=pt_id,
            birth_frame=jnp.full_like(fresh.birth_frame, st.frame_id),
            birth_xy_und=fresh.xy_und,
        )

        # seed A: the PnP consensus pose; seed B: the best candidate
        # keyframe's own pose (recall comes from the projection search).
        # Both seeds refine through ONE vmapped solve instantiation (two
        # separate calls double the compile footprint of this branch)
        ns_k = jax.tree_util.tree_map(lambda a: a[top_kfs[0]], st.map.kf_ns)
        Rk, tk = _ns_to_cam_pose(ns_k)
        use_pnp = n_pnp >= 6
        Ra = jnp.where(use_pnp, lie.normalize_rotation(R0), Rk)
        ta = jnp.where(use_pnp, t0, tk)

        Rb2, tb2, _, n2_, tr2_ = jax.vmap(
            lambda R0_, t0_: _pose_and_localmap_jit(
                fresh, st.map, R0_, t0_, cam.fx, cam.fy, cam.cx, cam.cy,
                scale_sigmas)
        )(jnp.stack([Ra, Rk]), jnp.stack([ta, tk]))
        pick = jnp.argmax(n2_)          # ties -> seed A, as before
        Rb = Rb2[pick]
        tb = tb2[pick]
        nb = n2_[pick]
        trb = jax.tree_util.tree_map(lambda a: a[pick], tr2_)

        ok = nb >= max(cfg.min_tracked, 15)

        def accept(op):
            st, trb, Rb, tb = op
            return dataclasses.replace(
                st, tracks=trb,
                Rcw=lie.normalize_rotation(Rb), tcw=tb,
                R_vel=jnp.eye(3, dtype=jnp.float32),
                t_vel=jnp.zeros(3, jnp.float32),
                state=jnp.asarray(WORKING, jnp.int32),
            )

        st2 = jax.lax.cond(ok, accept, lambda op: op[0], (st, trb, Rb, tb))
        return dataclasses.replace(st2, key=key)

    # ------------------------------------------------------------------
    def step(st: TrackerState, img) -> tuple[TrackerState, StepOut]:
        img = img.astype(jnp.float32)
        frame_id = st.frame_id + 1
        if cfg.enhance:
            img = clahe(img)
        pyr = tuple(build_flow_pyramid(img, cfg.n_levels_klt))
        key, sub = jax.random.split(st.key)
        st = dataclasses.replace(st, frame_id=frame_id, key=key)

        # propagate tracks (no-op when nothing valid / first frame)
        do_prop = (st.state == INITIALIZING) | (st.state == WORKING)

        def prop(tracks):
            guess, guess_ok = _motion_guess_jit(
                tracks, st.map, mm(st.R_vel, st.Rcw),
                mv(st.R_vel, st.tcw) + st.t_vel,
                cam.fx, cam.fy, cam.cx, cam.cy,
            )
            return propagate_tracks(
                tracks, st.pyr_prev, pyr, guess, guess_ok, sub,
                win=cfg.klt_win, iters=cfg.klt_iters, levels=cfg.n_levels_klt,
            )

        tracks = jax.lax.cond(do_prop, prop, lambda t: t, st.tracks)
        st = dataclasses.replace(st, tracks=tracks)

        st = jax.lax.switch(
            st.state,
            [branch_not_initialized, branch_initializing, branch_working, branch_lost],
            st, img,
        )

        # pose ring update when WORKING
        working = st.state == WORKING
        slot = frame_id % RING
        st = dataclasses.replace(
            st,
            pyr_prev=pyr,
            ring_R=jnp.where(working, st.ring_R.at[slot].set(st.Rcw), st.ring_R),
            ring_t=jnp.where(working, st.ring_t.at[slot].set(st.tcw), st.ring_t),
            ring_frame=jnp.where(
                working, st.ring_frame.at[slot].set(frame_id), st.ring_frame
            ),
        )
        out = StepOut(Rcw=st.Rcw, tcw=st.tcw, state=st.state,
                      n_inliers=jnp.asarray(0, jnp.int32),
                      new_kf=jnp.where(st.last_kf_frame == frame_id,
                                       st.last_kf_slot,
                                       jnp.asarray(-1, jnp.int32)))
        return st, out

    H, W = cam.height, cam.width
    st0 = init_state(cfg, kf_cap, pt_cap, H, W)
    return st0, jax.jit(step)


def run_sequence(cam: CameraModel, cfg: TrackerConfig, images,
                 kf_cap: int = 64, pt_cap: int = 8192):
    """Replay a whole sequence in ONE device program via lax.scan.
    Returns (final_state, StepOut with leading time dim)."""
    st0, _ = build_tracker(cam, cfg, kf_cap, pt_cap)
    # rebuild step un-jitted for scan embedding
    _, step = build_tracker(cam, cfg, kf_cap, pt_cap)

    @jax.jit
    def scan_all(st, imgs):
        return jax.lax.scan(step, st, imgs)

    return scan_all(st0, images)
