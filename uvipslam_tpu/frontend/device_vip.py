"""Fully device-resident VIP tracker: ONE jitted step per frame bundle.

The VIP analog of device_tracker.py — the complete per-frame
visual-inertial-pressure pipeline (reference: src/Tracking.cc:404-860 +
the LocalMapping VIO-init/BA stages it depends on) as a single
`step(state, bundle)` with `lax.switch`/`lax.cond` control flow:

  * mono bootstrap (NOT_INITIALIZED -> INITIALIZING -> WORKING) with
    parallel H/F model selection, while accumulating IMU/pressure;
  * on-device TryInitVIO trigger after enough keyframes/time: gyro-bias
    GN, re-preintegration of all KF IMU windows, gravity from the
    accelerometer average, metric scale from pressure (the paper's
    method, Init_mode 2), world Sim3 re-anchor + velocity recovery
    (reference: src/LocalMapping.cc:89-709);
  * VI(P) tracking: IMU NavState prediction, two-state marginalized
    pose solve with the depth-projected pressure factor, VI window BA
    at keyframes (reference: src/Tracking.cc:1081-1197,
    src/Optimizer.cc:319-777,1105-1732);
  * sustained-failure recovery: IMU dead-reckoning with pressure-z
    override + fresh two-view sub-map re-anchor (reference:
    src/Tracking.cc:594-613,1529-1834).

Host streams bundles one call at a time or `lax.scan`s whole sequences
(the bench path). Equivalence with the host-orchestrated VipTracker is
enforced by test (tests/test_device_vip.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.lie import mm, mv
from uvipslam_tpu.core.preintegration import (
    PreintState,
    bias_correct,
    preintegrate,
    preintegrate_continue,
)
from uvipslam_tpu.core.state import NavState
from uvipslam_tpu.frontend import tracker as HT
from uvipslam_tpu.frontend.device_tracker import device_hygiene
from uvipslam_tpu.frontend.frame import (
    Tracks,
    propagate_tracks,
    refill_tracks,
    refresh_descriptors,
)
from uvipslam_tpu.frontend.tracker import (
    INITIALIZING,
    IMU_RELOC,
    LOST,
    NOT_INITIALIZED,
    WORKING,
    _cam_pose_to_ns,
    _cam_pose_to_ns_ext,
    _local_ba_jit,
    _motion_guess_jit,
    _ns_to_cam_pose,
    _ns_to_cam_pose_ext,
    _pose_and_localmap_jit,
    _triangulate_new_jit,
)
from uvipslam_tpu.frontend.vip_tracker import VipConfig, _vi_ba_jit, _vi_track_jit
from uvipslam_tpu.mapstate.map import MapState
from uvipslam_tpu.models.camera import CameraModel
from uvipslam_tpu.ops.clahe import clahe
from uvipslam_tpu.ops.klt import build_flow_pyramid
from uvipslam_tpu.ops.twoview import initialize_two_view
from uvipslam_tpu.vio import init as vio_init

RING = 64


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VipTrackerState:
    # --- visual core (mirrors device_tracker.TrackerState) --------------
    tracks: Tracks
    map: MapState
    pyr_prev: tuple
    state: jax.Array
    frame_id: jax.Array
    Rcw: jax.Array
    tcw: jax.Array
    R_vel: jax.Array
    t_vel: jax.Array
    ring_R: jax.Array
    ring_t: jax.Array
    ring_frame: jax.Array
    init_frame_id: jax.Array
    init_time: jax.Array         # f32 timestamp of the init anchor frame
    last_kf_slot: jax.Array
    last_kf_frame: jax.Array
    n_ref_tracked: jax.Array
    key: jax.Array
    # --- inertial/pressure layers ---------------------------------------
    vio_ok: jax.Array            # bool
    ns: NavState                 # current body posterior
    H_prior: jax.Array           # [15, 15] frame-to-frame marginal info
    preint_kf: PreintState       # accumulated since last KF (zero bias)
    kf_omg: jax.Array            # [S, 3] raw IMU window since last KF
    kf_acc: jax.Array            # [S, 3]
    kf_dt: jax.Array             # [S]
    kf_mask: jax.Array           # [S]
    kf_n: jax.Array              # i32 fill level
    accw_sum: jax.Array          # [3] world-frame specific-force sum
    frame_time: jax.Array        # f32
    # --- recovery anchor -------------------------------------------------
    rec_ns: NavState
    rec_frame: jax.Array         # i32 (-1 = none)
    rec_time: jax.Array
    rec_depth: jax.Array
    rec_depth_valid: jax.Array
    rec_preint: PreintState
    rec_omg: jax.Array
    rec_acc: jax.Array
    rec_dt: jax.Array
    rec_mask: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrameBundle:
    """One frame's sensor bundle (fixed IMU window size, mask-padded)."""
    img: jax.Array          # [H, W]
    imu_omg: jax.Array      # [Simu, 3]
    imu_acc: jax.Array      # [Simu, 3]
    imu_dt: jax.Array       # [Simu]
    imu_mask: jax.Array     # [Simu]
    depth: jax.Array        # scalar
    depth_valid: jax.Array  # scalar bool
    timestamp: jax.Array    # scalar f32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VipStepOut:
    Rcw: jax.Array
    tcw: jax.Array
    p_w: jax.Array
    state: jax.Array
    vio_ok: jax.Array
    # slot of a keyframe created THIS frame, -1 otherwise — the hook the
    # streaming host uses to run loop closing at KF boundaries
    # (reference: src/LocalMapping.cc:850-852)
    new_kf: jax.Array


def init_vip_state(cfg: VipConfig, kf_cap: int, pt_cap: int,
                   height: int, width: int, seed: int = 0) -> VipTrackerState:
    zero_img = jnp.zeros((height, width), jnp.float32)
    pyr = tuple(build_flow_pyramid(zero_img, cfg.n_levels_klt))
    S = cfg.imu_cap_per_kf
    zp = PreintState.zero(dtype=jnp.float32)
    return VipTrackerState(
        tracks=Tracks.empty(cfg.n_tracks),
        map=MapState.empty(kf_cap, pt_cap, cfg.n_tracks, imu_window=S),
        pyr_prev=pyr,
        state=jnp.asarray(NOT_INITIALIZED, jnp.int32),
        frame_id=jnp.asarray(-1, jnp.int32),
        Rcw=jnp.eye(3, dtype=jnp.float32), tcw=jnp.zeros(3, jnp.float32),
        R_vel=jnp.eye(3, dtype=jnp.float32), t_vel=jnp.zeros(3, jnp.float32),
        ring_R=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (RING, 1, 1)),
        ring_t=jnp.zeros((RING, 3), jnp.float32),
        ring_frame=jnp.full((RING,), -1, jnp.int32),
        init_frame_id=jnp.asarray(-1, jnp.int32),
        init_time=jnp.asarray(0.0, jnp.float32),
        last_kf_slot=jnp.asarray(-1, jnp.int32),
        last_kf_frame=jnp.asarray(-1, jnp.int32),
        n_ref_tracked=jnp.asarray(0, jnp.int32),
        key=jax.random.PRNGKey(seed),
        vio_ok=jnp.asarray(False),
        ns=NavState.identity(dtype=jnp.float32),
        H_prior=jnp.eye(15, dtype=jnp.float32) * 1e2,
        preint_kf=zp,
        kf_omg=jnp.zeros((S, 3), jnp.float32),
        kf_acc=jnp.zeros((S, 3), jnp.float32),
        kf_dt=jnp.zeros((S,), jnp.float32),
        kf_mask=jnp.zeros((S,), jnp.float32),
        kf_n=jnp.asarray(0, jnp.int32),
        accw_sum=jnp.zeros(3, jnp.float32),
        frame_time=jnp.asarray(0.0, jnp.float32),
        rec_ns=NavState.identity(dtype=jnp.float32),
        rec_frame=jnp.asarray(-1, jnp.int32),
        rec_time=jnp.asarray(0.0, jnp.float32),
        rec_depth=jnp.asarray(0.0, jnp.float32),
        rec_depth_valid=jnp.asarray(False),
        rec_preint=zp,
        rec_omg=jnp.zeros((S, 3), jnp.float32),
        rec_acc=jnp.zeros((S, 3), jnp.float32),
        rec_dt=jnp.zeros((S,), jnp.float32),
        rec_mask=jnp.zeros((S,), jnp.float32),
    )


def _zero_kf_accumulators(st: VipTrackerState) -> VipTrackerState:
    S = st.kf_dt.shape[0]
    return dataclasses.replace(
        st,
        preint_kf=PreintState.zero(dtype=jnp.float32),
        kf_omg=jnp.zeros((S, 3), jnp.float32),
        kf_acc=jnp.zeros((S, 3), jnp.float32),
        kf_dt=jnp.zeros((S,), jnp.float32),
        kf_mask=jnp.zeros((S,), jnp.float32),
        kf_n=jnp.asarray(0, jnp.int32),
    )


def build_vip_tracker(cam: CameraModel, cfg: VipConfig,
                      kf_cap: int, pt_cap: int):
    """Returns (state0, step) with step = jit((state, bundle) ->
    (state, VipStepOut)).

    Closure constants are NUMPY on purpose: MLIR lowering must fetch a
    device-resident constant's value back through the (slow remote)
    device tunnel to embed it — numpy constants embed for free (this was
    300+ s of the round-4 VIP "compile" time)."""
    scale_sigmas = np.asarray(cfg.scale_sigmas, np.float32)
    gravity_w = np.asarray(cfg.gravity, np.float32)
    depth_info_cfg = np.asarray(1.0 / cfg.depth_noise_sd ** 2, np.float32)
    # camera-in-body extrinsics (reference: Camera.Tbc,
    # src/IMU/configparam.cpp:41-69)
    _Tbc = np.asarray(cfg.Tbc, np.float32)
    Rbc = _Tbc[:3, :3]
    tbc = _Tbc[:3, 3]
    Rcb = np.ascontiguousarray(_Tbc[:3, :3].T)
    tcb = -(_Tbc[:3, :3].T @ _Tbc[:3, 3])

    def undistort(tracks: Tracks) -> Tracks:
        return dataclasses.replace(tracks, xy_und=cam.undistort_pixels(tracks.xy))

    def refresh_birth(tracks: Tracks, frame_id) -> Tracks:
        newborn = tracks.birth_frame == frame_id
        return dataclasses.replace(
            tracks,
            birth_xy_und=jnp.where(newborn[:, None], tracks.xy_und,
                                   tracks.birth_xy_und),
        )

    def run_mono_ba(m: MapState) -> MapState:
        kf_idx = jnp.arange(m.kf_cap)
        in_window = (kf_idx >= m.n_kf - cfg.local_window) & (kf_idx < m.n_kf)
        fixed = m.kf_valid & ~in_window
        fixed = fixed.at[0].set(True)
        fixed = fixed.at[1].set(m.kf_valid[1])
        return _local_ba_jit(m, fixed, cam.fx, cam.fy, cam.cx, cam.cy,
                             scale_sigmas)

    def run_vi_ba(m: MapState) -> MapState:
        return _vi_ba_jit(m, gravity_w, cam.fx, cam.fy, cam.cx, cam.cy,
                          scale_sigmas, cfg.gyr_bias_rw2, cfg.acc_bias_rw2,
                          depth_info_cfg, Rcb, tcb)

    # ==================================================================
    # STAGED per-frame step.
    #
    # The heavy subgraphs — ORB refill + descriptor refresh, two-view
    # RANSAC, the mono pose+local-map solve, triangulation, the two
    # windowed BAs, map hygiene — are instantiated exactly ONCE each,
    # hoisted OUT of the state switch behind flags. lax.switch/cond
    # branches compile as separate XLA computations, so the previous
    # design (every branch inlining its own copy) duplicated the
    # largest kernels up to 6x in the compiled module; module size is
    # compile time. The per-state branches below only decide and do
    # cheap algebra; control flows to the shared stages through a small
    # dict of scalar flags (`ctl`).
    # ==================================================================

    # ------------------------------------------------------------------
    # on-device TryInitVIO (reference: src/LocalMapping.cc:89-709;
    # Init_mode 2 — the paper's pressure-scale method)
    # ------------------------------------------------------------------
    def try_init_vio(st: VipTrackerState) -> VipTrackerState:
        from uvipslam_tpu.solver.global_ba import global_ba_visual

        # 0. full-map visual BA first: windowed BA lets mono scale drift
        # across the init window, breaking the init solves (see
        # vip_tracker._maybe_init_vio)
        # init happens on a young map (slots fill in insertion order), so
        # the dense pose block is bounded at 24 slots instead of kf_cap
        m = global_ba_visual(st.map, cam.fx, cam.fy, cam.cx, cam.cy,
                             scale_sigmas, kf_window=min(24, kf_cap),
                             n_iters=5, p_active=2048)
        # 1. gyro bias over consecutive KF pairs (BODY rotations:
        # pre-init the table stores camera poses, Rwb = Rwc Rcb)
        pair_mask = m.kf_valid & (m.kf_prev >= 0)
        bg = vio_init.estimate_gyro_bias(
            mm(m.kf_ns.R, Rcb), m.kf_preint.dR, m.kf_preint.J_R_bg,
            pair_mask)

        # 2. re-integrate all KF windows with the bias
        z3 = jnp.zeros(3, jnp.float32)
        pre2 = jax.vmap(
            lambda o, a, d, msk: preintegrate(
                o, a, d, msk, bg, z3, cfg.gyr_noise_sd, cfg.acc_noise_sd)
        )(m.kf_imu_omg, m.kf_imu_acc, m.kf_imu_dt, m.kf_imu_mask)

        has_depth = m.kf_valid & m.kf_depth_valid
        g_cfg_dir = gravity_w / jnp.maximum(jnp.linalg.norm(gravity_w), 1e-9)

        # 3. gravity direction from the accelerometer average (world frame)
        ghat = st.accw_sum / jnp.maximum(jnp.linalg.norm(st.accw_sum), 1e-9)
        g_dir_vision = -ghat

        def align_from(g_dir):
            v = jnp.cross(g_dir, g_cfg_dir)
            sn = jnp.linalg.norm(v)
            cs = jnp.dot(g_dir, g_cfg_dir)
            axis = v / jnp.where(sn < 1e-9, 1.0, sn)
            return lie.so3_exp(axis * jnp.arctan2(sn, cs))

        def pressure_scale(Ra):
            z_aligned = mv(Ra, m.kf_ns.p)[:, 2]
            s_gn, _ = vio_init.estimate_scale_from_pressure(
                z_aligned, m.kf_depth, has_depth)
            return s_gn

        # 4. metric scale from pressure on gravity-aligned z
        s0 = pressure_scale(align_from(g_dir_vision))
        ok0 = jnp.isfinite(s0) & (s0 > 1e-3) & (jnp.sum(has_depth) >= 3)
        s0 = jnp.where(ok0, s0, 1.0)

        # 4b. refine [dtheta_xy, ba] with the scale fixed (reference:
        # the Init_mode 2/3 second SVD, src/LocalMapping.cc:411-509 —
        # the raw accelerometer average is tilt-biased under sustained
        # proper acceleration); strided virtual keyframes as in the
        # host path (see vio_init.build_strided_inertial)
        sel, vvalid, s_omg, s_acc, s_dt, s_mask = \
            vio_init.build_strided_inertial(
                m.kf_valid, m.kf_imu_omg, m.kf_imu_acc,
                m.kf_imu_dt, m.kf_imu_mask, 4)
        pv = m.kf_ns.p[sel]
        Rv = mm(m.kf_ns.R[sel], Rcb)
        prev_ = jax.vmap(
            lambda o, a, d, msk: preintegrate(
                o, a, d, msk, bg, z3, cfg.gyr_noise_sd, cfg.acc_noise_sd)
        )(s_omg, s_acc, s_dt, s_mask)
        vk = jnp.arange(sel.shape[0])
        triple = (vvalid & jnp.roll(vvalid, 1) & jnp.roll(vvalid, 2)
                  & (vk >= 2) & (prev_.dt > 1e-6)
                  & (jnp.roll(prev_.dt, 1) > 1e-6))
        g_ref, ba_ref = vio_init.refine_gravity_accbias_fixed_scale(
            pv, Rv, prev_.dP, prev_.dV, prev_.dt,
            prev_.J_P_ba, prev_.J_V_ba, g_dir_vision * 9.81, tbc, s0,
            triple)
        g_ref_dir = g_ref / jnp.maximum(jnp.linalg.norm(g_ref), 1e-9)
        tilt_ok = (jnp.sum(triple) >= 2) \
            & jnp.all(jnp.isfinite(g_ref_dir)) \
            & (jnp.dot(g_ref_dir, g_dir_vision) > jnp.cos(jnp.deg2rad(15.0)))
        g_dir_vision = jnp.where(tilt_ok, g_ref_dir, g_dir_vision)
        ba_est = jnp.where(tilt_ok, ba_ref, jnp.zeros(3, jnp.float32))

        R_align = align_from(g_dir_vision)
        s_gn = pressure_scale(R_align)
        ok = jnp.isfinite(s_gn) & (s_gn > 1e-3) & (jnp.sum(has_depth) >= 3)
        s = jnp.where(ok, s_gn, 1.0)
        # re-integrate the KF windows at both biases (velocity recovery)
        pre2 = jax.vmap(
            lambda o, a, d, msk: preintegrate(
                o, a, d, msk, bg, ba_est, cfg.gyr_noise_sd, cfg.acc_noise_sd)
        )(m.kf_imu_omg, m.kf_imu_acc, m.kf_imu_dt, m.kf_imu_mask)

        # 5. world Sim3: x' = s R_align x on every world-frame quantity
        kf_ns = dataclasses.replace(
            m.kf_ns,
            p=s * mv(R_align, m.kf_ns.p),
            v=s * mv(R_align, m.kf_ns.v),
            R=mm(jnp.broadcast_to(R_align, m.kf_ns.R.shape), m.kf_ns.R),
        )
        pt_xyz = s * mv(R_align, m.pt_xyz)

        # 5b. convert the KF table from camera-as-body storage to BODY
        # NavStates through Tbc (metric after the rescale, so the lever
        # arm applies cleanly; see vip_tracker._maybe_init_vio)
        kf_Rcw, kf_tcw = jax.vmap(_ns_to_cam_pose)(kf_ns)
        ns_b = jax.vmap(
            lambda R_, t_: _cam_pose_to_ns_ext(R_, t_, Rbc, tbc)
        )(kf_Rcw, kf_tcw)
        kf_ns = dataclasses.replace(kf_ns, p=ns_b.p, R=ns_b.R)

        # depth-anchor offset: world z == pressure depth
        z_now = kf_ns.p[:, 2]
        n_dep = jnp.sum(has_depth)
        off = jnp.sum(jnp.where(has_depth, m.kf_depth - z_now, 0.0)) / \
            jnp.maximum(n_dep, 1)
        p_shift = kf_ns.p.at[:, 2].add(jnp.where(m.kf_valid, off, 0.0))
        pts_shift = pt_xyz.at[:, 2].add(jnp.where(m.pt_valid, off, 0.0))

        # 6. velocities + biases
        kf_ns = dataclasses.replace(
            kf_ns, p=p_shift,
            bg=jnp.broadcast_to(bg, kf_ns.bg.shape),
            ba=jnp.broadcast_to(ba_est, kf_ns.ba.shape),
        )
        vel = vio_init.velocities_from_positions(
            kf_ns.p, kf_ns.R, pre2.dP, pre2.dt, gravity_w, m.kf_valid)
        k_last = jnp.maximum(m.n_kf - 1, 0)
        k_prev = jnp.maximum(k_last - 1, 0)
        vel = vel.at[k_last].set(vel[k_prev])
        kf_ns = dataclasses.replace(kf_ns, v=vel)
        m2 = dataclasses.replace(m, kf_ns=kf_ns, pt_xyz=pts_shift,
                                 kf_preint=pre2)

        ns_new = jax.tree_util.tree_map(lambda a: a[k_last], m2.kf_ns)
        Rcw2, tcw2 = _ns_to_cam_pose_ext(ns_new, Rcb, tcb)
        ring_R2 = mm(st.ring_R, jnp.swapaxes(R_align, -1, -2)[None])
        ring_t2 = s * st.ring_t  # ring z-offset skipped: ring is only a
        # triangulation seed and re-fills within a few frames

        st_ok = dataclasses.replace(
            st, map=m2, ns=ns_new, Rcw=Rcw2, tcw=tcw2,
            R_vel=jnp.eye(3, dtype=jnp.float32),
            t_vel=jnp.zeros(3, jnp.float32),
            ring_R=ring_R2, ring_t=ring_t2,
            vio_ok=jnp.asarray(True),
            H_prior=jnp.eye(15, dtype=jnp.float32) * 1e2,
        )
        return jax.tree_util.tree_map(
            lambda a, b_: jnp.where(ok, a, b_), st_ok, st)

    # ------------------------------------------------------------------
    # per-state branches: decide + cheap algebra only (heavy stages are
    # hoisted into `step` below and run once, gated by flags)
    # ------------------------------------------------------------------
    ZB = np.asarray(False)
    ZI = np.asarray(0, np.int32)

    def no_ctl():
        return dict(want_kf=ZB, want_ba=ZB, adopt=ZI, want_hyg=ZB,
                    want_trigger=ZB)

    H_PRIOR0 = np.eye(15, dtype=np.float32) * np.float32(1e2)

    def step(st: VipTrackerState, b: FrameBundle):
        img = b.img.astype(jnp.float32)
        if cfg.enhance:
            img = clahe(img)
        b = dataclasses.replace(b, img=img)
        frame_id = st.frame_id + 1
        pyr = tuple(build_flow_pyramid(img, cfg.n_levels_klt))
        key, sub_klt, sub_tv, sub_reloc = jax.random.split(st.key, 4)

        # ---- inertial accumulation (every frame, every state) ----
        # one batched scan for BOTH running integrals (frame-to-frame at
        # the posterior bias, since-last-KF at zero bias): the per-sample
        # scan is latency-bound, so the two integrations ride the same
        # loop as a batch of two
        z3 = jnp.zeros(3, jnp.float32)
        init2 = jax.tree_util.tree_map(
            lambda a, b_: jnp.stack([a, b_]),
            PreintState.zero(dtype=jnp.float32), st.preint_kf)
        pre2 = jax.vmap(
            preintegrate_continue,
            in_axes=(0, None, None, None, None, 0, 0, None, None),
        )(init2, b.imu_omg, b.imu_acc, b.imu_dt, b.imu_mask,
          jnp.stack([st.ns.bg_total, z3]), jnp.stack([st.ns.ba_total, z3]),
          cfg.gyr_noise_sd, cfg.acc_noise_sd)
        pre_frame = jax.tree_util.tree_map(lambda a: a[0], pre2)
        preint_kf = jax.tree_util.tree_map(lambda a: a[1], pre2)
        # stash raw samples at offset kf_n (masked scatter)
        Simu = b.imu_dt.shape[0]
        S = st.kf_dt.shape[0]
        pos = st.kf_n + jnp.arange(Simu, dtype=jnp.int32)
        take = (b.imu_mask > 0) & (pos < S)
        # inactive lanes go to the out-of-range sentinel S and are dropped
        # (duplicate-index .at[].set with differing values has unspecified
        # order in XLA, so never park them on a live slot)
        dst = jnp.where(take, pos, S)
        kf_omg = st.kf_omg.at[dst].set(b.imu_omg, mode="drop")
        kf_acc = st.kf_acc.at[dst].set(b.imu_acc, mode="drop")
        kf_dt = st.kf_dt.at[dst].set(b.imu_dt, mode="drop")
        kf_mask = st.kf_mask.at[dst].set(b.imu_mask, mode="drop")
        kf_n = st.kf_n + jnp.sum(take).astype(jnp.int32)

        # world-frame specific force for gravity estimation (pre-init)
        Rwb = mm(jnp.swapaxes(st.Rcw, -1, -2), Rcb)
        msum = jnp.maximum(jnp.sum(b.imu_mask), 1.0)
        mean_acc = jnp.sum(b.imu_acc * b.imu_mask[:, None], 0) / msum
        do_acc = (~st.vio_ok) & (st.state == WORKING)
        accw_sum = st.accw_sum + jnp.where(do_acc, mv(Rwb, mean_acc), 0.0)

        st = dataclasses.replace(
            st, frame_id=frame_id, key=key, frame_time=b.timestamp,
            preint_kf=preint_kf, kf_omg=kf_omg, kf_acc=kf_acc,
            kf_dt=kf_dt, kf_mask=kf_mask, kf_n=kf_n, accw_sum=accw_sum,
        )

        # ---- shared IMU prediction (reference: PredictNavStateByIMU) ----
        # consumed by track propagation, the VI solve, the first-try
        # relocalization search, and recovery dead-reckoning — ONE copy
        g_ = gravity_w
        dt_ = pre_frame.dt
        ns_pred = dataclasses.replace(
            st.ns,
            p=st.ns.p + st.ns.v * dt_ + 0.5 * g_ * dt_ * dt_ +
            mv(st.ns.R, pre_frame.dP),
            v=st.ns.v + g_ * dt_ + mv(st.ns.R, pre_frame.dV),
            R=lie.normalize_rotation(mm(st.ns.R, pre_frame.dR)),
        )
        Rcw_pred, tcw_pred = _ns_to_cam_pose_ext(ns_pred, Rcb, tcb)

        # ---- track propagation ----
        s = st.state
        do_prop = (s == INITIALIZING) | (s == WORKING) | (s == IMU_RELOC)

        def prop(tracks):
            # motion-model pose: IMU prediction post-init, velocity model
            # pre-init (reference: PredictNavStateByIMU vs motion model)
            Rp = jnp.where(st.vio_ok, Rcw_pred, mm(st.R_vel, st.Rcw))
            tp = jnp.where(st.vio_ok, tcw_pred,
                           mv(st.R_vel, st.tcw) + st.t_vel)
            guess, guess_ok = _motion_guess_jit(
                tracks, st.map, Rp, tp, cam.fx, cam.fy, cam.cx, cam.cy)
            return propagate_tracks(
                tracks, st.pyr_prev, pyr, guess, guess_ok, sub_klt,
                win=cfg.klt_win, iters=cfg.klt_iters, levels=cfg.n_levels_klt,
            )

        tracks = jax.lax.cond(do_prop, prop, lambda t: t, st.tracks)

        # ---- SHARED detection stage: refill + descriptor refresh ----
        # LOST and the recovery-anchor frame restart from an empty table;
        # NOT_INITIALIZED and WORKING top up dead slots. One ORB+BRIEF
        # instantiation for all of them.
        need_fresh = (s == LOST) | ((s == IMU_RELOC) & (st.rec_frame < 0))
        need_refill = need_fresh | (s == NOT_INITIALIZED) | (s == WORKING)
        empty = Tracks.empty(cfg.n_tracks)
        base = jax.tree_util.tree_map(
            lambda x, y: jnp.where(need_fresh, x, y), empty, tracks)

        def do_refill(tk):
            tk = refill_tracks(tk, b.img, st.frame_id,
                               n_features=cfg.n_tracks,
                               px_distance=cfg.px_distance)
            return refresh_descriptors(tk, b.img)

        tracks = jax.lax.cond(need_refill, do_refill, lambda tk: tk, base)
        tracks = undistort(tracks)
        tracks = refresh_birth(tracks, st.frame_id)
        st = dataclasses.replace(st, tracks=tracks)

        # ---- SHARED first-try relocalization associations (reference:
        # IMU_Relocalisation, src/Tracking.cc:3012-3060): projection
        # re-association of the LAST keyframe's landmarks at the IMU
        # predicted pose. Cheap (one windowed 400x400 Hamming match), so
        # computed unconditionally; consumed by the VI stage's second
        # solve lane only when the first solve fails.
        from uvipslam_tpu.loop.reloc import first_try_associations
        ft_slot = jnp.clip(st.last_kf_slot, 0, kf_cap - 1)
        ft_pid, ft_nm = first_try_associations(
            tracks, st.map, ft_slot, Rcw_pred, tcw_pred,
            cam.fx, cam.fy, cam.cx, cam.cy,
            min_matches=max(20, round(0.15 * cfg.n_tracks)))
        # pre-gate (reference: >= 60 matches at the 400 budget)
        ft_gate = (ft_nm >= max(20, round(0.15 * cfg.n_tracks))) \
            & (st.last_kf_slot >= 0) & cfg.reloc_first_try
        tracks_ft = dataclasses.replace(
            tracks, pt_id=jnp.where(ft_gate, ft_pid, -1))

        # ---- SHARED two-view reconstruction (init + recovery re-anchor) --
        do_tv = (s == INITIALIZING) | ((s == IMU_RELOC) & (st.rec_frame >= 0))
        anchor_f = jnp.where(s == IMU_RELOC, st.rec_frame, st.init_frame_id)
        cand_tv = tracks.valid & (tracks.birth_frame == anchor_f)

        def tv_fn():
            return initialize_two_view(sub_tv, tracks.birth_xy_und,
                                       tracks.xy_und, cand_tv, cam.K,
                                       sigma=1.0)

        rec = jax.lax.cond(
            do_tv, tv_fn,
            lambda: jax.tree_util.tree_map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype),
                jax.eval_shape(tv_fn)))

        # ---- SHARED mono pose+local-map solve (mono WORKING + reloc) ----
        # both consumers run the same 2-seed vmapped instantiation: the
        # mono motion-model frame duplicates its seed (identical rows,
        # latency-bound so the duplicate lane is free), relocalization
        # feeds (PnP seed, best-retrieved-KF seed)
        run_ml = ((s == WORKING) & ~st.vio_ok) | (s == LOST)
        Rp_m = mm(st.R_vel, st.Rcw)
        tp_m = mv(st.R_vel, st.tcw) + st.t_vel

        def reloc_seeds():
            from uvipslam_tpu.loop.reloc import relocalize_frame
            R0, t0, pt_id, n_pnp, top_kfs = relocalize_frame(
                tracks, st.map, sub_reloc, cam.fx, cam.fy, cam.cx, cam.cy)
            ns_k = jax.tree_util.tree_map(
                lambda a: a[top_kfs[0]], st.map.kf_ns)
            Rk, tk = _ns_to_cam_pose(ns_k)
            use_pnp = n_pnp >= 6
            Ra_ = jnp.where(use_pnp, lie.normalize_rotation(R0), Rk)
            ta_ = jnp.where(use_pnp, t0, tk)
            return Ra_, ta_, Rk, tk, pt_id

        Ra_ml, ta_ml, Rb_ml, tb_ml, ptid_ml = jax.lax.cond(
            s == LOST, reloc_seeds,
            lambda: (Rp_m, tp_m, Rp_m, tp_m, tracks.pt_id))
        tracks_ml = dataclasses.replace(tracks, pt_id=ptid_ml)

        def ml_fn():
            return jax.vmap(
                lambda R0_, t0_: _pose_and_localmap_jit(
                    tracks_ml, st.map, R0_, t0_, cam.fx, cam.fy, cam.cx,
                    cam.cy, scale_sigmas)
            )(jnp.stack([Ra_ml, Rb_ml]), jnp.stack([ta_ml, tb_ml]))

        ml = jax.lax.cond(
            run_ml, ml_fn,
            lambda: jax.tree_util.tree_map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype),
                jax.eval_shape(ml_fn)))
        R_ml2, t_ml2, _, n_ml2, tr_ml2 = ml
        pick = jnp.argmax(n_ml2)
        R_ml = R_ml2[pick]
        t_ml = t_ml2[pick]
        n_ml = n_ml2[pick]
        tr_ml = jax.tree_util.tree_map(lambda a: a[pick], tr_ml2)

        # --------------------------------------------------------------
        # state branches (cheap): return (st, ctl flags)
        # --------------------------------------------------------------
        def branch_not_initialized(st):
            t = st.tracks
            n = jnp.sum(t.valid)
            go = n >= cfg.min_init_tracks
            t = dataclasses.replace(
                t,
                birth_frame=jnp.where(
                    go, jnp.full_like(t.birth_frame, st.frame_id),
                    t.birth_frame),
                birth_xy_und=jnp.where(go, t.xy_und, t.birth_xy_und),
            )
            st = dataclasses.replace(
                st, tracks=t,
                state=jnp.where(go, INITIALIZING,
                                NOT_INITIALIZED).astype(jnp.int32),
                init_frame_id=jnp.where(go, st.frame_id, st.init_frame_id),
                init_time=jnp.where(go, st.frame_time, st.init_time),
            )
            return _zero_kf_accumulators(st), no_ctl()

        def branch_initializing(st):
            t = st.tracks
            enough = jnp.sum(cand_tv) >= cfg.min_init_tracks // 2
            ok = rec["ok"] & enough

            def commit(st):
                good = rec["good"]
                z = rec["points"][:, 2]
                med = jnp.nan_to_num(
                    jnp.nanmedian(jnp.where(good, z, jnp.nan)), nan=1.0)
                scale = 1.0 / jnp.maximum(med, 1e-6)
                pts3 = rec["points"] * scale
                R, tvec = rec["R"], rec["t"] * scale

                m = st.map
                ns0 = _cam_pose_to_ns(jnp.eye(3, dtype=jnp.float32),
                                      jnp.zeros(3, jnp.float32))
                ns1 = _cam_pose_to_ns(R, tvec)
                normals = pts3 / jnp.maximum(
                    jnp.linalg.norm(pts3, axis=-1, keepdims=True), 1e-9)
                dist = jnp.linalg.norm(pts3, axis=-1)
                m, ids = m.add_points(pts3, t.desc, normals, dist / 2.0,
                                      dist * 2.0, jnp.asarray(0),
                                      st.frame_id, good)
                feat_pt = jnp.where(good, ids, -1)
                zp = PreintState.zero(dtype=jnp.float32)
                m, k0 = m.add_keyframe(
                    ns0, st.init_time, st.init_frame_id,
                    t.birth_xy_und, t.desc, t.level, t.angle, cand_tv,
                    feat_pt, jnp.asarray(0.0), jnp.asarray(False), zp,
                    jnp.asarray(-1),
                )
                m, k1 = m.add_keyframe(
                    ns1, st.frame_time, st.frame_id,
                    t.xy_und, t.desc, t.level, t.angle, cand_tv, feat_pt,
                    b.depth, b.depth_valid, zp, k0,
                )
                t2 = dataclasses.replace(t, pt_id=jnp.where(good, feat_pt, -1))
                ring_R = st.ring_R.at[st.init_frame_id % RING].set(
                    jnp.eye(3, dtype=jnp.float32))
                ring_t = st.ring_t.at[st.init_frame_id % RING].set(
                    jnp.zeros(3, jnp.float32))
                ring_f = st.ring_frame.at[st.init_frame_id % RING].set(
                    st.init_frame_id)
                st = dataclasses.replace(
                    st, tracks=t2, map=m,
                    R_vel=jnp.eye(3, dtype=jnp.float32),
                    t_vel=jnp.zeros(3, jnp.float32),
                    ring_R=ring_R, ring_t=ring_t, ring_frame=ring_f,
                )
                # pose adoption, mono BA, WORKING transition: stage D
                return st, dict(want_kf=ZB, want_ba=jnp.asarray(True),
                                adopt=k1.astype(jnp.int32), want_hyg=ZB,
                                want_trigger=ZB)

            def keep(st):
                n = jnp.sum(cand_tv)
                stale = (n < cfg.min_init_tracks // 2) | (
                    st.frame_id - st.init_frame_id > 30)
                return dataclasses.replace(
                    st, state=jnp.where(stale, NOT_INITIALIZED,
                                        INITIALIZING).astype(jnp.int32),
                ), no_ctl()

            return jax.lax.cond(ok, commit, keep, st)

        # ---- WORKING branch, mono form (pre-VIO-init) ----
        def mono_working(st):
            def lost(st):
                return dataclasses.replace(
                    st, state=jnp.asarray(LOST, jnp.int32)), no_ctl()

            def keep_working(st):
                R_prev, t_prev = st.Rcw, st.tcw
                Rcw = lie.normalize_rotation(R_ml)
                Rinv, tinv = lie.se3_inverse(R_prev, t_prev)
                R_vel, t_vel = lie.se3_compose(R_ml, t_ml, Rinv, tinv)
                R_vel = lie.normalize_rotation(R_vel)
                st = dataclasses.replace(st, tracks=tr_ml, Rcw=Rcw, tcw=t_ml,
                                         R_vel=R_vel, t_vel=t_vel)
                since = st.frame_id - st.last_kf_frame
                need_kf = (since >= cfg.kf_min_interval) & (
                    (since >= cfg.kf_max_interval)
                    | (n_ml < cfg.kf_track_ratio *
                       jnp.maximum(st.n_ref_tracked, 1))
                )
                return st, dict(
                    want_kf=need_kf, want_ba=need_kf, adopt=ZI,
                    want_hyg=need_kf if cfg.map_hygiene else ZB,
                    want_trigger=need_kf)

            return jax.lax.cond(n_ml < cfg.min_tracked, lost, keep_working, st)

        # ---- WORKING branch, VI(P) form (post-init) ----
        def vi_working(st):
            depth_info = jnp.where(b.depth_valid, depth_info_cfg, 0.0)

            # two-lane solve under ONE compiled _vi_track instance:
            # lane 0 = the normal associations; lane 1 = the first-try
            # relocalization associations (reference: IMU_Relocalisation
            # after a failed TrackWithIMU, src/Tracking.cc:679-692). The
            # lax.scan body holds the single copy; the cond inside skips
            # lane 1's solve at RUNTIME whenever lane 0 succeeded, so the
            # common path still costs one solve.
            min_tr = jnp.asarray(cfg.min_tracked, jnp.int32)
            reloc_min = jnp.asarray(max(10, round(0.0625 * cfg.n_tracks)),
                                    jnp.int32)  # ref: >= 25/400 inliers

            def solve(tk):
                return _vi_track_jit(
                    tk, st.map, ns_pred, st.ns, pre_frame, gravity_w,
                    cam.fx, cam.fy, cam.cx, cam.cy, scale_sigmas,
                    cfg.gyr_bias_rw2, cfg.acc_bias_rw2,
                    b.depth, depth_info, st.H_prior, Rcb, tcb,
                )

            zeros_out = jax.tree_util.tree_map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype),
                jax.eval_shape(solve, st.tracks))

            def lane(done, x):
                tk, th = x
                out = jax.lax.cond(done, lambda _: zeros_out, lambda _:
                                   solve(tk), None)
                ok = (out[2] >= th) & ~done
                return done | ok, (out, ok)

            lanes = jax.tree_util.tree_map(
                lambda a_, b_: jnp.stack([a_, b_]), st.tracks, tracks_ft)
            _, (outs, oks) = jax.lax.scan(
                lane, jnp.asarray(False),
                (lanes, jnp.stack([min_tr, reloc_min])))
            ok0, ok1 = oks[0], oks[1]
            pick = jnp.where(ok0, 0, 1).astype(jnp.int32)
            ns_opt, inlier, n_in, tracks2, H_post = jax.tree_util.tree_map(
                lambda a: a[pick], outs)
            solved = ok0 | ok1
            # first-try reloc forces a keyframe (reference:
            # mbCreateNewKFAfterReloc, src/Tracking.cc:3053)
            forced_kf = ok1

            def to_recovery(st):
                # pressure-z override on the dead-reckoned state; the
                # recovery anchor (fresh detection + stash) is captured on
                # the NEXT frame by branch_recovery (rec_frame = -1
                # sentinel), so the heavy detection stage stays shared
                p_over = jnp.where(
                    b.depth_valid, ns_pred.p.at[2].set(b.depth), ns_pred.p)
                ns_dr = dataclasses.replace(ns_pred, p=p_over)
                Rcw, tcw = _ns_to_cam_pose_ext(ns_dr, Rcb, tcb)
                st = dataclasses.replace(
                    st, ns=ns_dr, Rcw=Rcw, tcw=tcw,
                    state=jnp.asarray(IMU_RELOC, jnp.int32),
                    rec_frame=jnp.asarray(-1, jnp.int32),
                    H_prior=H_PRIOR0,
                )
                return st, no_ctl()

            def keep_working(st):
                tr = H_post.trace() / 15.0
                H_new = (H_post + jnp.eye(15, dtype=jnp.float32) * 1e-3) * \
                    jnp.minimum(1.0, 1e6 / jnp.maximum(tr, 1e-6))
                Rcw, tcw = _ns_to_cam_pose_ext(ns_opt, Rcb, tcb)
                st = dataclasses.replace(st, tracks=tracks2, ns=ns_opt,
                                         Rcw=Rcw, tcw=tcw, H_prior=H_new)
                since = st.frame_id - st.last_kf_frame
                need_kf = forced_kf | ((since >= cfg.kf_min_interval) & (
                    (since >= cfg.kf_max_interval)
                    | (n_in < cfg.kf_track_ratio *
                       jnp.maximum(st.n_ref_tracked, 1))
                ))
                return st, dict(
                    want_kf=need_kf, want_ba=need_kf, adopt=ZI,
                    want_hyg=need_kf if cfg.map_hygiene else ZB,
                    want_trigger=ZB)

            return jax.lax.cond(solved, keep_working, to_recovery, st)

        def branch_working(st):
            return jax.lax.cond(st.vio_ok, vi_working, mono_working, st)

        # ---- LOST: device relocalization for a pre-VIO-init loss ----
        # (reference: Tracking::Relocalisation, src/Tracking.cc:2373-2534;
        # post-init losses go through branch_recovery instead). Fresh
        # detection came from the shared stage; BoW retrieval + PnP seed +
        # best-candidate-KF seed were computed by reloc_seeds; both seeds
        # were refined by the shared 2-seed pose+local-map solve.
        def branch_lost(st):
            ok = n_ml >= max(cfg.min_tracked, 15)

            def accept(st):
                Rcw = lie.normalize_rotation(R_ml)
                ns = _cam_pose_to_ns(Rcw, t_ml)
                st = dataclasses.replace(
                    st, tracks=tr_ml, Rcw=Rcw, tcw=t_ml,
                    ns=dataclasses.replace(
                        st.ns, p=ns.p, R=ns.R, v=jnp.zeros(3, jnp.float32)),
                    R_vel=jnp.eye(3, dtype=jnp.float32),
                    t_vel=jnp.zeros(3, jnp.float32),
                    H_prior=H_PRIOR0,
                    state=jnp.asarray(WORKING, jnp.int32),
                )
                return _zero_kf_accumulators(st)

            return jax.lax.cond(ok, accept, lambda x: x, st), no_ctl()

        # ---- sustained-failure recovery (reference: src/Tracking.cc:
        # 594-613, 1529-1834 — IMU dead-reckoning + fresh sub-map
        # re-anchor) ----
        def branch_recovery(st):
            # dead-reckon + pressure-z override (every recovery frame)
            g = gravity_w
            dt = pre_frame.dt
            ns_pred = dataclasses.replace(
                st.ns,
                p=st.ns.p + st.ns.v * dt + 0.5 * g * dt * dt +
                mv(st.ns.R, pre_frame.dP),
                v=st.ns.v + g * dt + mv(st.ns.R, pre_frame.dV),
                R=lie.normalize_rotation(mm(st.ns.R, pre_frame.dR)),
            )
            p_over = jnp.where(b.depth_valid, ns_pred.p.at[2].set(b.depth),
                               ns_pred.p)
            ns_dr = dataclasses.replace(ns_pred, p=p_over)
            Rcw, tcw = _ns_to_cam_pose_ext(ns_dr, Rcb, tcb)
            st = dataclasses.replace(st, ns=ns_dr, Rcw=Rcw, tcw=tcw)
            t = st.tracks

            def capture(st):
                # first recovery frame: adopt the fresh detection (made by
                # the shared stage) as the re-anchor
                t2 = dataclasses.replace(
                    t,
                    birth_frame=jnp.full_like(t.birth_frame, st.frame_id),
                    birth_xy_und=t.xy_und,
                )
                st = dataclasses.replace(
                    st, tracks=t2,
                    rec_ns=st.ns, rec_frame=st.frame_id,
                    rec_time=st.frame_time,
                    rec_depth=b.depth, rec_depth_valid=b.depth_valid,
                    rec_preint=st.preint_kf,
                    rec_omg=st.kf_omg, rec_acc=st.kf_acc,
                    rec_dt=st.kf_dt, rec_mask=st.kf_mask,
                    H_prior=H_PRIOR0,
                )
                return _zero_kf_accumulators(st), no_ctl()

            def attempt(st):
                since = st.frame_id - st.rec_frame
                n_live = jnp.sum(t.valid)
                stale = (since >= cfg.recovery_max_frames) | (
                    n_live < cfg.min_init_tracks // 2)

                Ra = _ns_to_cam_pose_ext(st.rec_ns, Rcb, tcb)
                Ra, ta = Ra
                R_rel_imu = mm(st.Rcw, jnp.swapaxes(Ra, -1, -2))
                t_rel_imu = st.tcw - mv(R_rel_imu, ta)
                baseline = jnp.linalg.norm(t_rel_imu)
                try_ok = (~stale & (since >= cfg.recovery_min_frames)
                          & (baseline >= cfg.recovery_min_baseline)
                          & rec["ok"])

                def commit(st):
                    good = rec["good"]
                    s_ = baseline
                    pts_c = rec["points"] * s_
                    Raw = jnp.swapaxes(Ra, -1, -2)
                    pts_w = mv(Raw, pts_c - ta)
                    R1 = mm(rec["R"], Ra)
                    t1 = rec["t"] * s_ + mv(rec["R"], ta)

                    m = st.map
                    k0_slot = m.n_kf
                    normals = pts_w - mv(Raw, -ta)
                    dist = jnp.linalg.norm(normals, axis=-1)
                    normals = normals / jnp.maximum(dist[:, None], 1e-9)
                    m, ids = m.add_points(pts_w, t.desc, normals, dist / 2.0,
                                          dist * 2.0, k0_slot, st.frame_id,
                                          good)
                    feat_pt = jnp.where(good, ids, -1)
                    # re-integrate BOTH stored windows at the current bias
                    # linearization point — one batched scan
                    pre_2 = jax.vmap(
                        preintegrate,
                        in_axes=(0, 0, 0, 0, None, None, None, None),
                    )(jnp.stack([st.rec_omg, st.kf_omg]),
                      jnp.stack([st.rec_acc, st.kf_acc]),
                      jnp.stack([st.rec_dt, st.kf_dt]),
                      jnp.stack([st.rec_mask, st.kf_mask]),
                      st.ns.bg, st.ns.ba,
                      cfg.gyr_noise_sd, cfg.acc_noise_sd)
                    pre_anchor = jax.tree_util.tree_map(
                        lambda a: a[0], pre_2)
                    pre_cur = jax.tree_util.tree_map(lambda a: a[1], pre_2)
                    m, k0 = m.add_keyframe(
                        st.rec_ns, st.rec_time, st.rec_frame,
                        t.birth_xy_und, t.desc, t.level, t.angle, cand_tv,
                        feat_pt, st.rec_depth, st.rec_depth_valid,
                        pre_anchor, st.last_kf_slot,
                        imu_omg=st.rec_omg, imu_acc=st.rec_acc,
                        imu_dt=st.rec_dt, imu_mask=st.rec_mask,
                    )
                    ns_cur = dataclasses.replace(
                        _cam_pose_to_ns_ext(R1, t1, Rbc, tbc),
                        v=st.ns.v, bg=st.ns.bg,
                        ba=st.ns.ba, dbg=st.ns.dbg, dba=st.ns.dba,
                    )
                    m, k1 = m.add_keyframe(
                        ns_cur, st.frame_time, st.frame_id,
                        t.xy_und, t.desc, t.level, t.angle, cand_tv,
                        feat_pt, b.depth, b.depth_valid, pre_cur, k0,
                        imu_omg=st.kf_omg, imu_acc=st.kf_acc,
                        imu_dt=st.kf_dt, imu_mask=st.kf_mask,
                    )
                    ring_R = st.ring_R.at[st.rec_frame % RING].set(Ra)
                    ring_t = st.ring_t.at[st.rec_frame % RING].set(ta)
                    ring_f = st.ring_frame.at[st.rec_frame % RING].set(
                        st.rec_frame)
                    st = dataclasses.replace(
                        st, map=m,
                        tracks=dataclasses.replace(t, pt_id=feat_pt),
                        ring_R=ring_R, ring_t=ring_t, ring_frame=ring_f,
                    )
                    # VI BA + k1 adoption + WORKING transition: stage D
                    return st, dict(want_kf=ZB, want_ba=jnp.asarray(True),
                                    adopt=k1.astype(jnp.int32), want_hyg=ZB,
                                    want_trigger=ZB)

                def no_commit(st):
                    # stale: re-anchor on the next frame (fresh detection
                    # via the shared stage)
                    st = dataclasses.replace(
                        st, rec_frame=jnp.where(
                            stale, jnp.asarray(-1, jnp.int32), st.rec_frame))
                    return st, no_ctl()

                return jax.lax.cond(try_ok, commit, no_commit, st)

            return jax.lax.cond(st.rec_frame < 0, capture, attempt, st)

        st, ctl = jax.lax.switch(
            s,
            [branch_not_initialized, branch_initializing, branch_working,
             branch_lost, branch_recovery],
            st,
        )

        # ---- stage C: unified keyframe creation (mono + VI forms) ----
        def create_kf(op):
            st, ctl = op
            t = st.tracks
            m, t = _triangulate_new_jit(
                st.map, t, st.ring_R, st.ring_t, st.ring_frame,
                st.Rcw, st.tcw, cam.fx, cam.fy, cam.cx, cam.cy,
                st.frame_id, st.last_kf_slot,
            )
            # VI keyframes store the window re-linearized at the current
            # bias (see vip_tracker._create_keyframe). The running
            # integral is at zero bias, so shift it with the carried
            # bias Jacobians — the reference's own convention
            # (g2otypes.cpp:8-213) and O(1) versus the 256-step
            # re-integration scan this replaces (measured ~10 ms/KF)
            # (linearize at the BASE bias bg/ba — the solver edges apply
            # the remaining dbg/dba correction themselves, factors.py:150)
            pre_vi = bias_correct(st.preint_kf, st.ns.bg, st.ns.ba)
            pre_store = jax.tree_util.tree_map(
                lambda a_, b_: jnp.where(st.vio_ok, a_, b_),
                pre_vi, st.preint_kf)
            ns_store = jax.tree_util.tree_map(
                lambda a_, b_: jnp.where(st.vio_ok, a_, b_),
                st.ns, _cam_pose_to_ns(st.Rcw, st.tcw))
            m, k = m.add_keyframe(
                ns_store, st.frame_time, st.frame_id,
                t.xy_und, t.desc, t.level, t.angle, t.valid, t.pt_id,
                b.depth, b.depth_valid, pre_store, st.last_kf_slot,
                imu_omg=st.kf_omg, imu_acc=st.kf_acc,
                imu_dt=st.kf_dt, imu_mask=st.kf_mask,
            )
            st = dataclasses.replace(st, tracks=t, map=m)
            return st, dict(ctl, adopt=k.astype(jnp.int32))

        st, ctl = jax.lax.cond(ctl["want_kf"], create_kf, lambda op: op,
                               (st, ctl))

        # ---- stage D: ONE windowed BA (mono xor VI) + pose adoption +
        # hygiene + WORKING transition + VIO-init trigger ----
        def do_ba(op):
            st, ctl = op
            m = jax.lax.cond(st.vio_ok, run_vi_ba, run_mono_ba, st.map)
            k = ctl["adopt"]
            ns_k = jax.tree_util.tree_map(lambda a: a[k], m.kf_ns)
            Rcw_v, tcw_v = _ns_to_cam_pose_ext(ns_k, Rcb, tcb)
            Rcw_m, tcw_m = _ns_to_cam_pose(ns_k)
            Rcw = jnp.where(st.vio_ok, Rcw_v, Rcw_m)
            tcw = jnp.where(st.vio_ok, tcw_v, tcw_m)

            t = st.tracks

            def hyg(op2):
                m2, t2 = op2
                return device_hygiene(m2, t2, st.frame_id, Rcw, tcw,
                                      cam.fx, cam.fy, cam.cx, cam.cy)

            if cfg.map_hygiene:
                m, t = jax.lax.cond(ctl["want_hyg"], hyg, lambda o: o, (m, t))
            ns_new = jax.tree_util.tree_map(
                lambda a_, b_: jnp.where(st.vio_ok, a_, b_), ns_k, st.ns)
            st = dataclasses.replace(
                st, tracks=t, map=m, ns=ns_new, Rcw=Rcw, tcw=tcw,
                last_kf_slot=k.astype(jnp.int32),
                last_kf_frame=st.frame_id,
                n_ref_tracked=jnp.sum(
                    t.valid & (t.pt_id >= 0)).astype(jnp.int32),
                H_prior=H_PRIOR0,
                state=jnp.asarray(WORKING, jnp.int32),
            )
            st = _zero_kf_accumulators(st)
            # VIO init trigger (reference: TryInitVIO every mapper cycle
            # until success, src/LocalMapping.cc:819-842)
            lo = jnp.maximum(m.n_kf - 1, 0)
            t_span = m.kf_time[lo] - m.kf_time[0]
            trigger = (ctl["want_trigger"] & ~st.vio_ok
                       & (m.n_kf >= cfg.vio_init_min_kfs)
                       & (t_span >= cfg.vio_init_min_time))
            return jax.lax.cond(trigger, try_init_vio, lambda x: x, st)

        st = jax.lax.cond(ctl["want_ba"], do_ba, lambda op: op[0], (st, ctl))

        # pose ring update when WORKING
        working = st.state == WORKING
        slot = frame_id % RING
        st = dataclasses.replace(
            st,
            pyr_prev=pyr,
            ring_R=jnp.where(working, st.ring_R.at[slot].set(st.Rcw),
                             st.ring_R),
            ring_t=jnp.where(working, st.ring_t.at[slot].set(st.tcw),
                             st.ring_t),
            ring_frame=jnp.where(
                working, st.ring_frame.at[slot].set(frame_id),
                st.ring_frame),
        )
        out = VipStepOut(Rcw=st.Rcw, tcw=st.tcw, p_w=st.ns.p,
                         state=st.state, vio_ok=st.vio_ok,
                         new_kf=jnp.where(st.last_kf_frame == frame_id,
                                          st.last_kf_slot,
                                          jnp.asarray(-1, jnp.int32)))
        return st, out

    H, W = cam.height, cam.width
    st0 = init_vip_state(cfg, kf_cap, pt_cap, H, W)
    return st0, jax.jit(step)
