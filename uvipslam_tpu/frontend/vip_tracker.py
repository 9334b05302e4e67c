"""Visual-Inertial-Pressure tracking (the reference's Mode=2 VIP).

Extends the monocular pipeline with the reference's inertial layers
(reference: src/Tracking.cc TrackWithIMU/PredictNavStateByIMU,
LocalMapping::TryInitVIO, Optimizer VI graphs):

  * per-frame IMU preintegration (frame-to-frame for prediction +
    accumulated since the last keyframe for the KF graph);
  * monocular bootstrap exactly as MONO mode, while accumulating the
    quantities VIO init needs;
  * TryInitVIO after enough keyframes/time: gyro bias (GN), gravity
    direction (accelerometer average), metric SCALE from the pressure
    channel (the paper's method), world re-scale + gravity alignment +
    velocity recovery + preintegration re-run with the estimated bias;
  * after init: NavState tracking — IMU prediction, 15-dof pose
    optimization with preintegration/bias/pressure factors, VI window BA.

Camera-in-body extrinsics (the reference's Camera.Tbc,
src/IMU/configparam.cpp:41-69) are threaded through every VI stage:
prediction, the two-state marginalized solve, window/global BA, VIO
init (body rotations + lever arm in the linear solves, camera->body
table conversion at acceptance), recovery, and loop closing. The mono
bootstrap phase stores camera-as-body states, converted at VIO init.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.lie import mm, mv
from uvipslam_tpu.core.preintegration import (
    PreintState,
    preintegrate,
    preintegrate_continue,
)
from uvipslam_tpu.core.state import NavState
from uvipslam_tpu.frontend.tracker import (
    LOST,
    WORKING,
    IMU_RELOC,
    MonoTracker,
    TrackerConfig,
    _cam_pose_to_ns,
    _cam_pose_to_ns_ext,
    _ns_to_cam_pose,
    _ns_to_cam_pose_ext,
)
from uvipslam_tpu.mapstate.map import MapState
from uvipslam_tpu.solver.local_ba import local_ba_navstate
from uvipslam_tpu.solver.pose_opt import pose_optimization_vi
from uvipslam_tpu.vio import init as vio_init


@dataclasses.dataclass
class VipConfig(TrackerConfig):
    gyr_noise_sd: float = 0.01414
    acc_noise_sd: float = 0.28284
    gyr_bias_rw2: float = 2.5e-9     # (5e-5)^2
    acc_bias_rw2: float = 1e-6       # (1e-3)^2
    depth_noise_sd: float = 0.5
    gravity: tuple = (0.0, 0.0, -9.81)
    vio_init_min_kfs: int = 5
    vio_init_min_time: float = 3.0   # seconds of KF span (22 s on Aqualoc)
    imu_cap_per_kf: int = 256
    # 1 = VI (linear [s, g_w] SVD, VI-ORB map-reuse method);
    # 2/3 = VIP (gravity from accel average + scale from pressure — the
    # paper's method; reference: ConfigParam Init_mode, LocalMapping.cc:182)
    init_mode: int = 2
    # target virtual-KF spacing for the mode-1 linear solves (seconds);
    # see build_strided_inertial for why short spacing biases the scale
    vio_init_baseline_s: float = 0.6
    # cheap FIRST relocalization tier: one projection-search attempt
    # against the last KF at the IMU-predicted pose before entering
    # sustained recovery (reference: IMU_Relocalisation on the first bad
    # frame, src/Tracking.cc:679-692, :3012-3060 — >= 60/400 matches to
    # try, >= 25 pose-solve inliers to accept, then force a keyframe)
    reloc_first_try: bool = True
    # sustained-failure recovery (reference: IMU_RELOCALIZATION tier —
    # RecoveryInitialization/CreateRecoveryMap, src/Tracking.cc:1529-1834)
    recovery_min_baseline: float = 0.04   # metres of IMU translation
    recovery_min_frames: int = 3
    recovery_max_frames: int = 45         # re-anchor after this many
    # camera-in-body extrinsics, the reference's Camera.Tbc 4x4
    # (x_body = Rbc x_cam + tbc; reference: ConfigParam,
    # src/IMU/configparam.cpp:41-69). Identity = body==camera.
    Tbc: tuple = ((1.0, 0.0, 0.0, 0.0),
                  (0.0, 1.0, 0.0, 0.0),
                  (0.0, 0.0, 1.0, 0.0),
                  (0.0, 0.0, 0.0, 1.0))


class VipTracker(MonoTracker):
    """Host-orchestrated VIP pipeline (jitted phases, like MonoTracker)."""

    def __init__(self, cam, cfg: VipConfig | None = None,
                 kf_cap: int = 128, pt_cap: int = 8192, seed: int = 0):
        cfg = cfg or VipConfig()
        super().__init__(cam, cfg, kf_cap, pt_cap, seed)
        S = cfg.imu_cap_per_kf
        self.vio_ok = False
        self.gravity_w = jnp.asarray(cfg.gravity, jnp.float32)
        # camera-in-body extrinsics (reference: Tbc -> Tcb,
        # src/IMU/configparam.cpp:41-69)
        Tbc = np.asarray(cfg.Tbc, np.float32)
        self.Rbc = jnp.asarray(Tbc[:3, :3])
        self.tbc = jnp.asarray(Tbc[:3, 3])
        self.Rcb = jnp.asarray(Tbc[:3, :3].T)
        self.tcb = jnp.asarray(-Tbc[:3, :3].T @ Tbc[:3, 3])
        self.has_extrinsics = not np.allclose(Tbc, np.eye(4))
        self.ns = NavState.identity(dtype=jnp.float32)       # current body state
        self.ns_prev = NavState.identity(dtype=jnp.float32)  # previous frame
        # preintegration accumulated since last KF + its raw window
        self.preint_kf = PreintState.zero(dtype=jnp.float32)
        self.kf_imu = dict(
            omg=jnp.zeros((S, 3), jnp.float32), acc=jnp.zeros((S, 3), jnp.float32),
            dt=jnp.zeros((S,), jnp.float32), mask=jnp.zeros((S,), jnp.float32),
            n=0,
        )
        # accelerometer average in the vision world frame (gravity est.)
        self.accw_sum = jnp.zeros(3, jnp.float32)
        self.accw_n = 0.0
        self.cur_depth = jnp.asarray(0.0, jnp.float32)
        self.cur_depth_valid = False
        self.frame_time = 0.0
        self.dt_frame = 0.05
        # frame-to-frame 15-dof marginal prior (reference: the
        # EdgeNavStatePriorPVRBias carried between frames,
        # src/Optimizer.cc:319-777 + computeMarginals :743-762)
        self._reset_marginal_prior()

    def _reset_marginal_prior(self):
        self.H_prior = jnp.eye(15, dtype=jnp.float32) * 1e2

    # ------------------------------------------------------------------
    def process_frame_vip(self, img, imu_omg, imu_acc, imu_dt, imu_mask,
                          depth=0.0, depth_valid=False, timestamp=None):
        """Feed one frame bundle (grayscale image + IMU window since the
        previous frame + optional pressure depth)."""
        imu_omg = jnp.asarray(imu_omg, jnp.float32)
        imu_acc = jnp.asarray(imu_acc, jnp.float32)
        imu_dt = jnp.asarray(imu_dt, jnp.float32)
        imu_mask = jnp.asarray(imu_mask, jnp.float32)
        self.cur_depth = jnp.asarray(float(depth), jnp.float32)
        self.cur_depth_valid = bool(depth_valid)
        if timestamp is not None:
            self.frame_time = float(timestamp)
        else:
            self.frame_time += self.dt_frame

        # frame-to-frame preintegration with current bias estimates
        pre_frame = preintegrate(
            imu_omg, imu_acc, imu_dt, imu_mask,
            self.ns.bg_total, self.ns.ba_total,
            self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd,
        )
        self.pre_frame = pre_frame

        # accumulate since-KF preintegration (bias 0: re-run at VIO init)
        z3 = jnp.zeros(3, jnp.float32)
        self.preint_kf = preintegrate_continue(
            self.preint_kf, imu_omg, imu_acc, imu_dt, imu_mask, z3, z3,
            self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd,
        )
        # stash raw samples into the per-KF window
        n0 = self.kf_imu["n"]
        nsamp = int(np.asarray(jnp.sum(imu_mask)))
        S = self.kf_imu["dt"].shape[0]
        take = min(nsamp, S - n0)
        if take > 0:
            sl = slice(n0, n0 + take)
            self.kf_imu["omg"] = self.kf_imu["omg"].at[sl].set(imu_omg[:take])
            self.kf_imu["acc"] = self.kf_imu["acc"].at[sl].set(imu_acc[:take])
            self.kf_imu["dt"] = self.kf_imu["dt"].at[sl].set(imu_dt[:take])
            self.kf_imu["mask"] = self.kf_imu["mask"].at[sl].set(imu_mask[:take])
            self.kf_imu["n"] = n0 + take

        # accumulate world-frame specific force for gravity estimation
        if not self.vio_ok and self.state == WORKING:
            # Rwb = Rwc Rcb (body==camera pre-init only when Tbc == I)
            Rwb = mm(jnp.swapaxes(self.Rcw, -1, -2), self.Rcb)
            mean_acc = jnp.sum(imu_acc * imu_mask[:, None], 0) / jnp.maximum(jnp.sum(imu_mask), 1.0)
            self.accw_sum = self.accw_sum + mv(Rwb, mean_acc)
            self.accw_n += 1.0

        if self.vio_ok and self.state == IMU_RELOC:
            return self._process_frame_recovery(img, pre_frame)

        if not self.vio_ok:
            was_state = self.state
            status = super().process_frame(img)
            # keep the since-KF accumulators aligned with keyframe intervals:
            # restart them when the mono init window (re)starts and when the
            # two bootstrap keyframes are created (their preints stay zero —
            # zero-dt edges are masked out everywhere)
            if status.get("state") == "NOT_INITIALIZED" or status.get("initialized"):
                self._reset_kf_accumulators()
            return status

        # ---------------- VI(P) tracking path --------------------------
        return self._process_frame_vi(img, pre_frame)

    # ------------------------------------------------------------------
    def _process_frame_vi(self, img, pre_frame):
        import uvipslam_tpu.frontend.tracker as HT
        from uvipslam_tpu.frontend.frame import propagate_tracks, refill_tracks, refresh_descriptors
        from uvipslam_tpu.ops.klt import build_flow_pyramid

        self.frame_id += 1
        img = jnp.asarray(img, jnp.float32)
        pyr = tuple(build_flow_pyramid(img, self.cfg.n_levels_klt))

        # predict NavState by IMU (reference: PredictNavStateByIMU)
        g = self.gravity_w
        dt = pre_frame.dt
        ns_pred = dataclasses.replace(
            self.ns,
            p=self.ns.p + self.ns.v * dt + 0.5 * g * dt * dt + mv(self.ns.R, pre_frame.dP),
            v=self.ns.v + g * dt + mv(self.ns.R, pre_frame.dV),
            R=lie.normalize_rotation(mm(self.ns.R, pre_frame.dR)),
        )
        from uvipslam_tpu.frontend.tracker import _ns_to_cam_pose_ext
        Rcw_pred, tcw_pred = _ns_to_cam_pose_ext(ns_pred, self.Rcb, self.tcb)

        if self.pyr_prev is not None:
            guess, guess_ok = HT._motion_guess_jit(
                self.tracks, self.map, Rcw_pred, tcw_pred,
                self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
            )
            self.tracks = propagate_tracks(
                self.tracks, self.pyr_prev, pyr, guess, guess_ok, self._split(),
                win=self.cfg.klt_win, iters=self.cfg.klt_iters,
                levels=self.cfg.n_levels_klt,
            )
        self.tracks = self._undistort(self.tracks)

        ns_opt, inlier, n_in, tracks2, H_post = _vi_track_jit(
            self.tracks, self.map, ns_pred, self.ns, pre_frame,
            self.gravity_w, self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
            jnp.asarray(self.cfg.scale_sigmas, jnp.float32),
            self.cfg.gyr_bias_rw2, self.cfg.acc_bias_rw2,
            self.cur_depth, jnp.asarray(
                (1.0 / self.cfg.depth_noise_sd**2) if self.cur_depth_valid else 0.0,
                jnp.float32),
            self.H_prior, self.Rcb, self.tcb,
        )
        n_in = int(n_in)
        status = {}
        first_try_ok = False
        if n_in < self.cfg.min_tracked and self.cfg.reloc_first_try \
                and self.last_kf_slot >= 0:
            # FIRST relocalization tier (reference: IMU_Relocalisation,
            # src/Tracking.cc:679-692): one projection search of the last
            # KF's landmarks at the IMU-predicted pose; a 1-2 frame
            # occlusion/association loss must NOT cost a full re-anchor
            from uvipslam_tpu.loop.reloc import first_try_associations
            N = self.cfg.n_tracks
            pid_ft, n_m = first_try_associations(
                self.tracks, self.map, jnp.asarray(self.last_kf_slot),
                Rcw_pred, tcw_pred, self.cam.fx, self.cam.fy,
                self.cam.cx, self.cam.cy,
                min_matches=max(20, round(0.15 * N)))
            if int(n_m) >= max(20, round(0.15 * N)):  # ref: >= 60/400
                tracks_ft = dataclasses.replace(self.tracks, pt_id=pid_ft)
                ns2, inl2, n2, tracks2b, H2 = _vi_track_jit(
                    tracks_ft, self.map, ns_pred, self.ns, pre_frame,
                    self.gravity_w, self.cam.fx, self.cam.fy, self.cam.cx,
                    self.cam.cy,
                    jnp.asarray(self.cfg.scale_sigmas, jnp.float32),
                    self.cfg.gyr_bias_rw2, self.cfg.acc_bias_rw2,
                    self.cur_depth, jnp.asarray(
                        (1.0 / self.cfg.depth_noise_sd**2)
                        if self.cur_depth_valid else 0.0, jnp.float32),
                    self.H_prior, self.Rcb, self.tcb,
                )
                if int(n2) >= max(10, round(0.0625 * N)):  # ref: >= 25/400
                    n_in = int(n2)
                    ns_opt, inlier, tracks2, H_post = ns2, inl2, tracks2b, H2
                    first_try_ok = True  # ref: mbCreateNewKFAfterReloc
        if n_in < self.cfg.min_tracked and not first_try_ok:
            # sustained-failure tier: keep dead-reckoning on the IMU and
            # bootstrap a fresh recovery sub-map (reference: the
            # IMU_RELOCALIZATION state, src/Tracking.cc:594-613,1529-)
            self.ns_prev = self.ns
            self.ns = self._depth_override(ns_pred)
            self.Rcw, self.tcw = _ns_to_cam_pose_ext(self.ns, self.Rcb, self.tcb)
            self._enter_recovery(img, pyr)
            self._reset_marginal_prior()
            status.update(state="IMU_RELOC", n_inliers=n_in)
        else:
            self.tracks = tracks2
            self.ns_prev = self.ns
            self.ns = ns_opt
            self.Rcw, self.tcw = _ns_to_cam_pose_ext(ns_opt, self.Rcb, self.tcb)
            # carry the Schur marginal as next frame's prior; cap the
            # information so the f32 filter can't run away over long runs
            tr = jnp.trace(H_post) / 15.0
            self.H_prior = (H_post + jnp.eye(15, dtype=jnp.float32) * 1e-3) \
                * jnp.minimum(1.0, 1e6 / jnp.maximum(tr, 1e-6))
            self.tracks = refill_tracks(
                self.tracks, img, self.frame_id,
                n_features=self.cfg.n_tracks, px_distance=self.cfg.px_distance,
            )
            self.tracks = refresh_descriptors(self.tracks, img)
            self.tracks = self._undistort(self.tracks)
            newborn = self.tracks.birth_frame == self.frame_id
            self.tracks = dataclasses.replace(
                self.tracks,
                birth_xy_und=jnp.where(newborn[:, None], self.tracks.xy_und,
                                       self.tracks.birth_xy_und),
            )
            if first_try_ok or self._need_keyframe(n_in):
                # first-try reloc forces a keyframe (reference:
                # mbCreateNewKFAfterReloc, src/Tracking.cc:3053)
                self._create_keyframe()
            status.update(state="WORKING", n_inliers=n_in, vio=True,
                          **({"first_try_reloc": True} if first_try_ok
                             else {}))

        self.pyr_prev = pyr
        if self.state == WORKING:
            slot = self.frame_id % self.RING
            self.ring_R = self.ring_R.at[slot].set(self.Rcw)
            self.ring_t = self.ring_t.at[slot].set(self.tcw)
            self.ring_frame = self.ring_frame.at[slot].set(self.frame_id)
            self.trajectory.append(
                (self.frame_id, np.asarray(self.Rcw), np.asarray(self.tcw))
            )
        return status

    # ------------------------------------------------------------------
    # keyframe handling: store inertial data, run the right BA, try VIO init
    # ------------------------------------------------------------------
    def _create_keyframe(self):
        import uvipslam_tpu.frontend.tracker as HT

        t = self.tracks
        m = self.map
        ns = self.ns if self.vio_ok else _cam_pose_to_ns(self.Rcw, self.tcw)
        # post-init: re-integrate the since-KF window at the CURRENT bias
        # linearization point (bg, ba) — the accumulator runs at zero
        # bias, but the BA preint factor corrects only by the small dbg,
        # so the stored preint must be linearized at ns.bg/ns.ba
        # (reference: KeyFrame::ComputePreInt re-integrates at the KF's
        # bias, src/KeyFrame.cc:218-293)
        if self.vio_ok:
            self.preint_kf = preintegrate(
                self.kf_imu["omg"], self.kf_imu["acc"],
                self.kf_imu["dt"], self.kf_imu["mask"],
                self.ns.bg, self.ns.ba,
                self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd,
            )
        m, t = HT._triangulate_new_jit(
            m, t, self.ring_R, self.ring_t, self.ring_frame,
            self.Rcw, self.tcw,
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
            jnp.asarray(self.frame_id, jnp.int32),
            jnp.asarray(self.last_kf_slot, jnp.int32),
        )
        m, k = m.add_keyframe(
            ns, jnp.asarray(self.frame_time, jnp.float32),
            jnp.asarray(self.frame_id, jnp.int32),
            t.xy_und, t.desc, t.level, t.angle, t.valid, t.pt_id,
            self.cur_depth, jnp.asarray(self.cur_depth_valid),
            self.preint_kf, jnp.asarray(self.last_kf_slot, jnp.int32),
            imu_omg=self.kf_imu["omg"], imu_acc=self.kf_imu["acc"],
            imu_dt=self.kf_imu["dt"], imu_mask=self.kf_imu["mask"],
        )
        m, t = self._run_hygiene(m, t)
        if self.vio_ok:
            m = self._run_vi_ba(m)
        else:
            m = self._run_local_ba(m)
        self.map = m
        self.tracks = t
        k_int = int(k)
        ns_k = jax.tree_util.tree_map(lambda a: a[k_int], m.kf_ns)
        if self.vio_ok:
            from uvipslam_tpu.frontend.tracker import _ns_to_cam_pose_ext
            self.ns = ns_k
            self.Rcw, self.tcw = _ns_to_cam_pose_ext(ns_k, self.Rcb, self.tcb)
        else:
            self.Rcw, self.tcw = _ns_to_cam_pose(ns_k)
        self.last_kf_slot = k_int
        self.last_kf_frame = self.frame_id
        self.last_kf_tracks = self.tracks
        self.n_ref_tracked = int(jnp.sum(t.valid & (t.pt_id >= 0)))
        # reset the since-KF accumulators
        self._reset_kf_accumulators()
        # the window BA re-anchors the state: restart the frame-to-frame
        # marginal there (the reference likewise switches the tracking
        # reference to the new KF on map update, src/Tracking.cc:1099)
        if self.vio_ok:
            self._reset_marginal_prior()
            pending = getattr(self, "_reloc_bias_after_kf", None)
            if pending is not None and int(self.map.n_kf) >= pending:
                self._recompute_bias_after_recovery()
                self._reloc_bias_after_kf = None
        else:
            self._maybe_init_vio()
        # loop-closing pass on EVERY keyframe, VIP mode included
        # (reference: LocalMapping feeds LoopClosing per keyframe in
        # every mode, src/LocalMapping.cc:850-852)
        self._maybe_close_loop(k_int)

    # ------------------------------------------------------------------
    def _maybe_close_loop(self, kf_slot: int):
        """VIP-mode loop closing: same detection/verification as the mono
        hook, but the post-loop polish is the NavState global BA and the
        corrected state is adopted into the VI filter (ns + marginal
        prior restart). Reference: LoopClosing::CorrectLoop +
        GlobalBundleAdjustmentNavState (src/LoopClosing.cc:539-691,
        src/Optimizer.cc:50)."""
        if self.loop_closer is None:
            return
        from uvipslam_tpu.solver.global_ba import (
            global_ba_navstate,
            global_ba_visual,
        )

        if self.vio_ok:
            # post-init the map stores BODY NavStates: the closer must
            # project them through the camera-in-body extrinsics
            self.loop_closer.Rcb, self.loop_closer.tcb = self.Rcb, self.tcb
            self.loop_closer.Rbc, self.loop_closer.tbc = self.Rbc, self.tbc
            self.loop_closer.post_ba = lambda m: global_ba_navstate(
                m, self.gravity_w, self.Rcb, self.tcb,
                self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd,
                self.cfg.gyr_bias_rw2, self.cfg.acc_bias_rw2,
                jnp.asarray(1.0 / self.cfg.depth_noise_sd**2, jnp.float32),
                jnp.asarray(self.cfg.scale_sigmas, jnp.float32),
            )
        else:
            # pre-init the map stores camera-as-body states: identity
            eye3, z3 = jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)
            self.loop_closer.Rcb, self.loop_closer.tcb = eye3, z3
            self.loop_closer.Rbc, self.loop_closer.tbc = eye3, z3
            self.loop_closer.post_ba = lambda m: global_ba_visual(
                m, self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                jnp.asarray(self.cfg.scale_sigmas, jnp.float32),
            )
        self.map, st = self.loop_closer.process_keyframe(self.map, kf_slot)
        if st.get("loop"):
            ns_k = jax.tree_util.tree_map(lambda a: a[kf_slot],
                                          self.map.kf_ns)
            if self.vio_ok:
                self.Rcw, self.tcw = _ns_to_cam_pose_ext(
                    ns_k, self.Rcb, self.tcb)
            else:
                self.Rcw, self.tcw = _ns_to_cam_pose(ns_k)
            self.R_vel = jnp.eye(3, dtype=jnp.float32)
            self.t_vel = jnp.zeros(3, jnp.float32)
            if self.vio_ok:
                self.ns = ns_k
                self.ns_prev = ns_k
                self._reset_marginal_prior()
            self.loop_events.append((self.frame_id, st["loop_kf"]))

    # ------------------------------------------------------------------
    def _recompute_bias_after_recovery(self, window: int = 6):
        """Post-recovery gyro-bias re-estimation over the fresh keyframe
        chain (reference: RecomputeIMUBiasAndCurrentNavstate,
        src/Tracking.cc:2843-3011 — after relocalization the reference
        collects a 10-frame window and re-solves the biases; here the
        recovery sub-map's keyframes provide the window). The
        accelerometer bias is left at its random-walk estimate (the VI
        window BA's bias edges keep refining it)."""
        m = self.map
        z3 = jnp.zeros(3, jnp.float32)
        pre0 = jax.vmap(
            lambda o, a, d, msk: preintegrate(
                o, a, d, msk, z3, z3,
                self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd)
        )(m.kf_imu_omg, m.kf_imu_acc, m.kf_imu_dt, m.kf_imu_mask)
        ks = jnp.arange(m.kf_cap)
        pair = (m.kf_valid & (m.kf_prev >= 0) & (ks >= m.n_kf - window)
                & (ks < m.n_kf) & (pre0.dt > 1e-6))
        if int(jnp.sum(pair)) < 2:
            return
        bg = vio_init.estimate_gyro_bias(m.kf_ns.R, pre0.dR, pre0.J_R_bg, pair)
        if not bool(jnp.all(jnp.isfinite(bg))) or float(jnp.linalg.norm(bg)) > 0.5:
            return
        # adopt as the new linearization point (zero delta) and
        # re-integrate the stored keyframe preints at it
        pre2 = jax.vmap(
            lambda o, a, d, msk: preintegrate(
                o, a, d, msk, bg, self.ns.ba,
                self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd)
        )(m.kf_imu_omg, m.kf_imu_acc, m.kf_imu_dt, m.kf_imu_mask)
        kf_ns = dataclasses.replace(
            m.kf_ns,
            bg=jnp.broadcast_to(bg, m.kf_ns.bg.shape),
            dbg=jnp.zeros_like(m.kf_ns.dbg),
        )
        self.map = dataclasses.replace(m, kf_ns=kf_ns, kf_preint=pre2)
        self.ns = dataclasses.replace(self.ns, bg=bg, dbg=z3)

    def _reset_kf_accumulators(self):
        S = self.kf_imu["dt"].shape[0]
        self.preint_kf = PreintState.zero(dtype=jnp.float32)
        self.kf_imu = dict(
            omg=jnp.zeros((S, 3), jnp.float32), acc=jnp.zeros((S, 3), jnp.float32),
            dt=jnp.zeros((S,), jnp.float32), mask=jnp.zeros((S,), jnp.float32), n=0,
        )

    # ------------------------------------------------------------------
    # sustained-failure recovery: IMU dead-reckoning + fresh sub-map
    # (reference: Tracking.cc — IMU_RELOCALIZATION branch :594-613,
    # RecoveryInitialization/Recovery_Initialize/CreateRecoveryMap
    # :1529-1834, RecoveryBundleAdjustemnt src/Optimizer.cc:1886)
    # ------------------------------------------------------------------
    def _depth_override(self, ns: NavState) -> NavState:
        """Clamp the dead-reckoned z to the pressure depth (world z ==
        depth after VIO init anchoring; reference: :605-613)."""
        if not self.cur_depth_valid:
            return ns
        return dataclasses.replace(ns, p=ns.p.at[2].set(self.cur_depth))

    def _enter_recovery(self, img, pyr):
        from uvipslam_tpu.frontend.frame import Tracks, refill_tracks

        self.state = IMU_RELOC
        # anchor: current IMU pose; its preint chain back to the last KF
        self.rec_anchor_ns = self.ns
        self.rec_anchor_frame = self.frame_id
        self.rec_anchor_time = self.frame_time
        self.rec_anchor_depth = (self.cur_depth, self.cur_depth_valid)
        self.rec_anchor_preint = self.preint_kf
        self.rec_anchor_imu = {k: v for k, v in self.kf_imu.items()}
        self._reset_kf_accumulators()
        # fresh detection, all tracks born at the anchor
        t = refill_tracks(
            Tracks.empty(self.cfg.n_tracks), img, self.frame_id,
            n_features=self.cfg.n_tracks, px_distance=self.cfg.px_distance,
        )
        t = self._undistort(t)
        self.tracks = dataclasses.replace(
            t,
            birth_frame=jnp.full_like(t.birth_frame, self.frame_id),
            birth_xy_und=t.xy_und,
        )
        self.pyr_prev = pyr

    def _process_frame_recovery(self, img, pre_frame):
        from uvipslam_tpu.frontend.frame import propagate_tracks
        from uvipslam_tpu.ops.klt import build_flow_pyramid
        from uvipslam_tpu.ops.twoview import initialize_two_view

        self.frame_id += 1
        img = jnp.asarray(img, jnp.float32)
        pyr = tuple(build_flow_pyramid(img, self.cfg.n_levels_klt))

        # pure-IMU propagation with pressure z override
        g = self.gravity_w
        dt = pre_frame.dt
        ns_pred = dataclasses.replace(
            self.ns,
            p=self.ns.p + self.ns.v * dt + 0.5 * g * dt * dt + mv(self.ns.R, pre_frame.dP),
            v=self.ns.v + g * dt + mv(self.ns.R, pre_frame.dV),
            R=lie.normalize_rotation(mm(self.ns.R, pre_frame.dR)),
        )
        self.ns_prev = self.ns
        self.ns = self._depth_override(ns_pred)
        from uvipslam_tpu.frontend.tracker import _ns_to_cam_pose_ext
        self.Rcw, self.tcw = _ns_to_cam_pose_ext(self.ns, self.Rcb, self.tcb)

        # propagate the recovery tracks (no landmark guesses — none exist)
        n0 = self.tracks.xy.shape[0]
        self.tracks = propagate_tracks(
            self.tracks, self.pyr_prev, pyr,
            self.tracks.xy, jnp.zeros((n0,), bool), self._split(),
            win=self.cfg.klt_win, iters=self.cfg.klt_iters,
            levels=self.cfg.n_levels_klt,
        )
        self.tracks = self._undistort(self.tracks)
        self.pyr_prev = pyr

        status = {"state": "IMU_RELOC"}
        since = self.frame_id - self.rec_anchor_frame
        if since >= self.cfg.recovery_max_frames or int(
                jnp.sum(self.tracks.valid)) < self.cfg.min_init_tracks // 2:
            self._enter_recovery(img, pyr)       # re-anchor and keep trying
            status["recovery"] = "re-anchored"
            return status

        Ra, ta = _ns_to_cam_pose_ext(self.rec_anchor_ns, self.Rcb, self.tcb)
        Rc, tc = self.Rcw, self.tcw
        R_rel_imu = mm(Rc, jnp.swapaxes(Ra, -1, -2))
        t_rel_imu = tc - mv(R_rel_imu, ta)
        baseline = float(jnp.linalg.norm(t_rel_imu))
        if since < self.cfg.recovery_min_frames or baseline < self.cfg.recovery_min_baseline:
            return status

        # two-view bootstrap between the anchor and this frame, with
        # parallel H/F model selection (reference: Re_CheckRT recovery
        # re-init reuses the same Initializer, include/Initializer.h:44)
        t = self.tracks
        cand = t.valid & (t.birth_frame == self.rec_anchor_frame)
        rec = initialize_two_view(
            self._split(), t.birth_xy_und, t.xy_und, cand, self.cam.K,
            sigma=1.0)
        if not bool(rec["ok"]):
            return status

        # metric scale from the IMU baseline (pressure-consistent via the
        # z overrides); vision gives the unit-norm relative translation
        good = rec["good"]
        s = baseline
        pts_c = rec["points"] * s                  # anchor-camera frame
        Raw = jnp.swapaxes(Ra, -1, -2)
        pts_w = mv(Raw, pts_c - ta)
        # current camera pose: vision relative rotation/translation
        # anchored at the IMU anchor pose
        R1 = mm(rec["R"], Ra)
        t1 = rec["t"] * s + mv(rec["R"], ta)

        m = self.map
        k0_slot = m.n_kf                            # anchor's future slot
        normals = pts_w - mv(Raw, -ta)
        dist = jnp.linalg.norm(normals, axis=-1)
        normals = normals / jnp.maximum(dist[:, None], 1e-9)
        m, ids = m.add_points(
            pts_w, t.desc, normals, dist / 2.0, dist * 2.0,
            k0_slot, jnp.asarray(self.frame_id, jnp.int32), good,
        )
        feat_pt = jnp.where(good, ids, -1)

        da, dv = self.rec_anchor_depth
        # re-integrate both stored windows at the current bias
        # linearization point (see _create_keyframe)
        pre_anchor = preintegrate(
            self.rec_anchor_imu["omg"], self.rec_anchor_imu["acc"],
            self.rec_anchor_imu["dt"], self.rec_anchor_imu["mask"],
            self.ns.bg, self.ns.ba,
            self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd,
        )
        pre_cur = preintegrate(
            self.kf_imu["omg"], self.kf_imu["acc"],
            self.kf_imu["dt"], self.kf_imu["mask"],
            self.ns.bg, self.ns.ba,
            self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd,
        )
        m, k0 = m.add_keyframe(
            self.rec_anchor_ns, jnp.asarray(self.rec_anchor_time, jnp.float32),
            jnp.asarray(self.rec_anchor_frame, jnp.int32),
            t.birth_xy_und, t.desc, t.level, t.angle, cand, feat_pt,
            da, jnp.asarray(dv),
            pre_anchor, jnp.asarray(self.last_kf_slot, jnp.int32),
            imu_omg=self.rec_anchor_imu["omg"], imu_acc=self.rec_anchor_imu["acc"],
            imu_dt=self.rec_anchor_imu["dt"], imu_mask=self.rec_anchor_imu["mask"],
        )
        from uvipslam_tpu.frontend.tracker import _cam_pose_to_ns_ext
        ns_cur = dataclasses.replace(
            _cam_pose_to_ns_ext(R1, t1, self.Rbc, self.tbc),
            v=self.ns.v, bg=self.ns.bg,
            ba=self.ns.ba, dbg=self.ns.dbg, dba=self.ns.dba,
        )
        m, k1 = m.add_keyframe(
            ns_cur, jnp.asarray(self.frame_time, jnp.float32),
            jnp.asarray(self.frame_id, jnp.int32),
            t.xy_und, t.desc, t.level, t.angle, cand, feat_pt,
            self.cur_depth, jnp.asarray(self.cur_depth_valid),
            pre_cur, k0,
            imu_omg=self.kf_imu["omg"], imu_acc=self.kf_imu["acc"],
            imu_dt=self.kf_imu["dt"], imu_mask=self.kf_imu["mask"],
        )
        m = self._run_vi_ba(m)                      # RecoveryBundleAdjustemnt
        self.map = m
        self.tracks = dataclasses.replace(t, pt_id=feat_pt)
        k1_int = int(k1)
        ns_k = jax.tree_util.tree_map(lambda a: a[k1_int], m.kf_ns)
        self.ns = ns_k
        self.Rcw, self.tcw = _ns_to_cam_pose_ext(ns_k, self.Rcb, self.tcb)
        self.last_kf_slot = k1_int
        self.last_kf_frame = self.frame_id
        self.n_ref_tracked = int(jnp.sum(good))
        self._reset_kf_accumulators()
        slot0 = self.rec_anchor_frame % self.RING
        self.ring_R = self.ring_R.at[slot0].set(Ra)
        self.ring_t = self.ring_t.at[slot0].set(ta)
        self.ring_frame = self.ring_frame.at[slot0].set(self.rec_anchor_frame)
        slot1 = self.frame_id % self.RING
        self.ring_R = self.ring_R.at[slot1].set(self.Rcw)
        self.ring_t = self.ring_t.at[slot1].set(self.tcw)
        self.ring_frame = self.ring_frame.at[slot1].set(self.frame_id)
        self.state = WORKING
        self._reset_marginal_prior()
        # schedule the post-recovery bias recompute once enough fresh
        # keyframes exist (reference: mbRelocBiasPrepare 10-frame window
        # + RecomputeIMUBiasAndCurrentNavstate, src/Tracking.cc:735-764,
        # 2843-3011)
        self._reloc_bias_after_kf = int(self.map.n_kf) + 3
        self.trajectory.append(
            (self.frame_id, np.asarray(self.Rcw), np.asarray(self.tcw)))
        status.update(state="WORKING", recovery="re-initialized",
                      n_inliers=int(jnp.sum(good)))
        return status

    # ------------------------------------------------------------------
    def _run_vi_ba(self, m: MapState) -> MapState:
        return _vi_ba_jit(
            m, self.gravity_w,
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
            jnp.asarray(self.cfg.scale_sigmas, jnp.float32),
            self.cfg.gyr_bias_rw2, self.cfg.acc_bias_rw2,
            jnp.asarray(1.0 / self.cfg.depth_noise_sd**2, jnp.float32),
            self.Rcb, self.tcb,
        )

    # ------------------------------------------------------------------
    def _maybe_init_vio(self):
        m = self.map
        n_kf = int(m.n_kf)
        if n_kf < self.cfg.vio_init_min_kfs:
            return
        t_span = float(m.kf_time[n_kf - 1] - m.kf_time[0])
        if t_span < self.cfg.vio_init_min_time:
            return

        # 0. full-map visual BA: the sliding-window BA lets the mono map's
        # scale drift across the init window (measured 40% over 3 s),
        # which breaks the triplet identities of the linear solve; a
        # global pass makes the map internally consistent first
        # (reference: the VI-ORB init operates on a map maintained by
        # map-wide covisibility BA; see also GlobalBundleAdjustemnt
        # at CreateInitialMap, src/Tracking.cc:1480)
        from uvipslam_tpu.solver.global_ba import global_ba_visual
        m = global_ba_visual(
            m, self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
            jnp.asarray(self.cfg.scale_sigmas, jnp.float32),
        )
        self.map = m

        # 1. gyro bias over consecutive KF pairs (vision rotations,
        # rotated into the BODY frame through the extrinsics: pre-init
        # the table stores camera poses, Rwb = Rwc Rcb)
        pair_mask = m.kf_valid & (m.kf_prev >= 0)
        Rwb_tbl = mm(m.kf_ns.R, self.Rcb)
        bg = vio_init.estimate_gyro_bias(
            Rwb_tbl, m.kf_preint.dR, m.kf_preint.J_R_bg, pair_mask,
        )

        # 2. re-integrate all KF preints with the bias (ComputePreInt)
        z3 = jnp.zeros(3, jnp.float32)
        pre2 = jax.vmap(
            lambda o, a, d, msk: preintegrate(
                o, a, d, msk, bg, z3,
                self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd)
        )(m.kf_imu_omg, m.kf_imu_acc, m.kf_imu_dt, m.kf_imu_mask)

        has_depth = m.kf_valid & m.kf_depth_valid
        g_cfg_dir = self.gravity_w / jnp.maximum(jnp.linalg.norm(self.gravity_w), 1e-9)
        ba_est = jnp.zeros(3, jnp.float32)

        if self.cfg.init_mode == 1:
            # 3/4 (Init_mode 1, VI): joint linear [s, g_w] solve — VI-ORB's
            # "map reuse" method (reference: src/LocalMapping.cc:182-379),
            # run over STRIDED virtual keyframes: at short KF spacing the
            # triplet position-second-differences are noise-dominated and
            # the errors-in-variables attenuation biases the scale LOW
            # (see vio_init.build_strided_inertial); the reference's 22 s
            # window with ~1 s KF spacing has the same effect
            dt_avg = t_span / max(n_kf - 1, 1)
            J = max(1, int(round(self.cfg.vio_init_baseline_s / max(dt_avg, 1e-3))))
            J = max(1, min(J, (n_kf - 2) // 4))
            sel, vvalid, s_omg, s_acc, s_dt, s_mask = \
                vio_init.build_strided_inertial(
                    m.kf_valid, m.kf_imu_omg, m.kf_imu_acc,
                    m.kf_imu_dt, m.kf_imu_mask, J)
            pv = m.kf_ns.p[sel]
            Rv = mm(m.kf_ns.R[sel], self.Rcb)
            z3v = jnp.zeros(3, jnp.float32)
            pre0v = jax.vmap(
                lambda o, a, d, msk: preintegrate(
                    o, a, d, msk, z3v, z3v,
                    self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd)
            )(s_omg, s_acc, s_dt, s_mask)
            vk = jnp.arange(sel.shape[0])
            vpair = vvalid & jnp.roll(vvalid, 1) & (vk >= 1) & (pre0v.dt > 1e-6)
            bg = vio_init.estimate_gyro_bias(Rv, pre0v.dR, pre0v.J_R_bg, vpair)
            prev_ = jax.vmap(
                lambda o, a, d, msk: preintegrate(
                    o, a, d, msk, bg, z3v,
                    self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd)
            )(s_omg, s_acc, s_dt, s_mask)
            triple = (vvalid & jnp.roll(vvalid, 1) & jnp.roll(vvalid, 2)
                      & (vk >= 2) & (prev_.dt > 1e-6)
                      & (jnp.roll(prev_.dt, 1) > 1e-6))
            pcb = self.tbc
            s_lin, g_w = vio_init.estimate_scale_gravity_linear(
                pv, Rv, prev_.dP, prev_.dV, prev_.dt, pcb, triple,
            )
            # second solve: |g| = 9.81 constraint + accelerometer bias
            # (reference: src/LocalMapping.cc:262-379)
            s_lin, g_w, ba_est = vio_init.refine_scale_gravity_accbias(
                pv, Rv, prev_.dP, prev_.dV, prev_.dt,
                prev_.J_P_ba, prev_.J_V_ba, g_w, pcb, triple,
            )
            scale = float(s_lin)
            if not np.isfinite(scale) or scale <= 1e-3:
                return
            g_dir_vision = g_w / jnp.maximum(jnp.linalg.norm(g_w), 1e-9)
            # re-integrate the per-KF preints with both biases before
            # velocity recovery
            pre2 = jax.vmap(
                lambda o, a, d, msk: preintegrate(
                    o, a, d, msk, bg, ba_est,
                    self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd)
            )(m.kf_imu_omg, m.kf_imu_acc, m.kf_imu_dt, m.kf_imu_mask)
        else:
            # 3 (Init_mode 2/3, VIP — the paper's method): gravity
            # direction in the vision world from the accelerometer average
            ghat = self.accw_sum / jnp.maximum(jnp.linalg.norm(self.accw_sum), 1e-9)
            # measured mean specific force direction ~ -gravity direction
            g_dir_vision = -ghat

        # rotation taking the vision gravity direction onto the configured one
        def align_from(g_dir):
            v = jnp.cross(g_dir, g_cfg_dir)
            sn = jnp.linalg.norm(v)
            cs = jnp.dot(g_dir, g_cfg_dir)
            axis = v / jnp.where(sn < 1e-9, 1.0, sn)
            return lie.so3_exp(axis * jnp.arctan2(sn, cs))

        R_align = align_from(g_dir_vision)

        if self.cfg.init_mode != 1:
            # 4. metric scale from pressure on gravity-aligned z
            def pressure_scale(Ra):
                z_aligned = mv(Ra, m.kf_ns.p)[:, 2]
                s_gn, _ = vio_init.estimate_scale_from_pressure(
                    z_aligned, m.kf_depth, has_depth)
                return s_gn

            if int(jnp.sum(has_depth)) < 3:
                return
            scale = float(pressure_scale(R_align))
            if not np.isfinite(scale) or scale <= 1e-3:
                return

            # 4b. refine [dtheta_xy, ba] with the scale FIXED (reference:
            # the Init_mode 2/3 second SVD, src/LocalMapping.cc:411-509):
            # the raw accelerometer average is biased by sustained proper
            # acceleration; the vision triplet identities pin the tilt.
            # Strided virtual keyframes for the same noise reasons as the
            # mode-1 linear solve (build_strided_inertial docstring).
            dt_avg = t_span / max(n_kf - 1, 1)
            J = max(1, int(round(self.cfg.vio_init_baseline_s / max(dt_avg, 1e-3))))
            J = max(1, min(J, (n_kf - 2) // 4))
            sel, vvalid, s_omg, s_acc, s_dt, s_mask = \
                vio_init.build_strided_inertial(
                    m.kf_valid, m.kf_imu_omg, m.kf_imu_acc,
                    m.kf_imu_dt, m.kf_imu_mask, J)
            pv = m.kf_ns.p[sel]
            Rv = mm(m.kf_ns.R[sel], self.Rcb)
            prev_ = jax.vmap(
                lambda o, a, d, msk: preintegrate(
                    o, a, d, msk, bg, jnp.zeros(3, jnp.float32),
                    self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd)
            )(s_omg, s_acc, s_dt, s_mask)
            vk = jnp.arange(sel.shape[0])
            triple = (vvalid & jnp.roll(vvalid, 1) & jnp.roll(vvalid, 2)
                      & (vk >= 2) & (prev_.dt > 1e-6)
                      & (jnp.roll(prev_.dt, 1) > 1e-6))
            g0 = g_dir_vision * 9.81
            g_ref, ba_ref = vio_init.refine_gravity_accbias_fixed_scale(
                pv, Rv, prev_.dP, prev_.dV, prev_.dt,
                prev_.J_P_ba, prev_.J_V_ba, g0, self.tbc,
                jnp.asarray(scale, jnp.float32), triple,
            )
            g_ref_dir = g_ref / jnp.maximum(jnp.linalg.norm(g_ref), 1e-9)
            tilt = float(jnp.degrees(jnp.arccos(jnp.clip(
                jnp.dot(g_ref_dir, g_dir_vision), -1.0, 1.0))))
            if np.isfinite(tilt) and tilt < 15.0 and bool(
                    jnp.all(jnp.isfinite(g_ref_dir))):
                g_dir_vision = g_ref_dir
                ba_est = ba_ref
                R_align = align_from(g_dir_vision)
                s2 = float(pressure_scale(R_align))
                if np.isfinite(s2) and s2 > 1e-3:
                    scale = s2
                # re-integrate the per-KF preints at both biases before
                # velocity recovery (as the mode-1 path does)
                pre2 = jax.vmap(
                    lambda o, a, d, msk: preintegrate(
                        o, a, d, msk, bg, ba_est,
                        self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd)
                )(m.kf_imu_omg, m.kf_imu_acc, m.kf_imu_dt, m.kf_imu_mask)

        # 5. apply: rotate + rescale the whole world (Map::UpdateScale)
        self._apply_world_sim3(jnp.asarray(scale, jnp.float32), R_align)
        m = self.map

        # 5b. convert the KF table from camera-as-body storage to BODY
        # NavStates through Tbc (the map is metric now, so the lever arm
        # applies cleanly; reference: SetNavStatePos/Rot from Tcw * Tbc
        # in TryInitVIO's acceptance, src/LocalMapping.cc:650-698)
        if self.has_extrinsics:
            from uvipslam_tpu.frontend.tracker import _cam_pose_to_ns_ext
            kf_Rcw, kf_tcw = jax.vmap(_ns_to_cam_pose)(m.kf_ns)
            ns_b = jax.vmap(
                lambda R, t: _cam_pose_to_ns_ext(R, t, self.Rbc, self.tbc)
            )(kf_Rcw, kf_tcw)
            self.map = m = dataclasses.replace(
                m, kf_ns=dataclasses.replace(m.kf_ns, p=ns_b.p, R=ns_b.R))

        # depth-anchor offset: world z == pressure depth (skipped in pure
        # VI mode where no pressure channel exists)
        z_now = m.kf_ns.p[:, 2]
        n_dep = jnp.sum(has_depth)
        use_anchor = (self.cfg.init_mode != 1) & (int(n_dep) >= 3)
        off = jnp.where(
            use_anchor,
            jnp.sum(jnp.where(has_depth, m.kf_depth - z_now, 0.0))
            / jnp.maximum(n_dep, 1),
            0.0,
        )
        p_shift = m.kf_ns.p.at[:, 2].add(jnp.where(m.kf_valid, off, 0.0))
        pts_shift = m.pt_xyz.at[:, 2].add(jnp.where(m.pt_valid, off, 0.0))

        # 6. velocities + biases into the KF table
        kf_ns = dataclasses.replace(
            m.kf_ns, p=p_shift,
            bg=jnp.broadcast_to(bg, m.kf_ns.bg.shape),
            ba=jnp.broadcast_to(ba_est, m.kf_ns.ba.shape),
        )
        # velocities_from_positions expects slot k = preint (k-1)->k and
        # rolls internally; pre2 is already in that convention
        v = vio_init.velocities_from_positions(
            kf_ns.p, kf_ns.R, pre2.dP, pre2.dt,
            self.gravity_w, m.kf_valid,
        )
        # the newest KF has no following preint: adopt the previous KF's
        # velocity (the reference sets the last KF's velocity from the
        # current frame's finite difference the same way)
        k_last = int(m.n_kf) - 1
        if k_last >= 1:
            v = v.at[k_last].set(v[k_last - 1])
        kf_ns = dataclasses.replace(kf_ns, v=v)
        self.map = dataclasses.replace(
            m, kf_ns=kf_ns, pt_xyz=pts_shift,
            kf_preint=pre2,
        )

        # current-frame state: adopt last KF's state
        from uvipslam_tpu.frontend.tracker import _ns_to_cam_pose_ext
        k = int(self.map.n_kf) - 1
        self.ns = jax.tree_util.tree_map(lambda a: a[k], self.map.kf_ns)
        self.ns_prev = self.ns
        self.Rcw, self.tcw = _ns_to_cam_pose_ext(self.ns, self.Rcb, self.tcb)
        self.vio_ok = True
        self._reset_marginal_prior()

    # ------------------------------------------------------------------
    def _apply_world_sim3(self, s, R_align):
        """x' = s * R_align @ x on every world-frame quantity
        (reference: Map::UpdateScale + the NavState updates in
        TryInitVIO's acceptance block)."""
        m = self.map
        kf_ns = dataclasses.replace(
            m.kf_ns,
            p=s * mv(R_align, m.kf_ns.p),
            v=s * mv(R_align, m.kf_ns.v),
            R=mm(jnp.broadcast_to(R_align, m.kf_ns.R.shape), m.kf_ns.R),
        )
        self.map = dataclasses.replace(
            m, kf_ns=kf_ns,
            pt_xyz=s * mv(R_align, m.pt_xyz),
        )
        # current pose & motion model & ring
        self.Rcw = mm(self.Rcw, jnp.swapaxes(R_align, -1, -2))
        self.tcw = s * self.tcw
        self.t_vel = s * self.t_vel
        self.ring_R = mm(self.ring_R, jnp.swapaxes(R_align, -1, -2)[None])
        self.ring_t = s * self.ring_t


def _vi_track_jit(tracks, m, ns_pred, ns_ref, pre_frame, gravity,
                  fx, fy, cx, cy, scale_sigmas, gyr_rw2, acc_rw2,
                  depth, depth_info, H_prior,
                  Rcb=None, tcb=None):
    """VI pose solve + local-map re-association + marginalized two-state
    second solve (reference: TrackWithIMU + TrackLocalMapWithIMU with
    bComputeMarg=true, src/Tracking.cc:1081-1149,1955-2073). Rcb/tcb are
    the camera-in-body extrinsics (x_c = Rcb x_b + tcb)."""
    if Rcb is None:
        Rcb = jnp.eye(3, dtype=jnp.float32)
    if tcb is None:
        tcb = jnp.zeros(3, jnp.float32)
    return __vi_track_impl(tracks, m, ns_pred, ns_ref, pre_frame, gravity,
                           fx, fy, cx, cy, scale_sigmas, gyr_rw2, acc_rw2,
                           depth, depth_info, H_prior, Rcb, tcb)


@jax.jit
def __vi_track_impl(tracks, m, ns_pred, ns_ref, pre_frame, gravity,
                    fx, fy, cx, cy, scale_sigmas, gyr_rw2, acc_rw2,
                    depth, depth_info, H_prior, Rcb, tcb):
    import uvipslam_tpu.frontend.tracker as HT
    from uvipslam_tpu.frontend.tracker import _ns_to_cam_pose_ext
    from uvipslam_tpu.ops import hamming
    from uvipslam_tpu.solver.pose_opt import pose_optimization_vi2

    dtype = jnp.float32
    has_pt = tracks.valid & (tracks.pt_id >= 0)
    pid = jnp.clip(tracks.pt_id, 0, m.pt_cap - 1)
    pw = m.pt_xyz[pid]
    inv_sig = 1.0 / scale_sigmas[jnp.clip(tracks.level, 0, scale_sigmas.shape[0] - 1)]

    # seed solve: 2 rounds x 2 LM steps (robust round + chi2 re-gate +
    # clean round). Its main consumer is the re-association window below
    # (the joint vi2 solve re-estimates the state); the IMU-predicted
    # pose is already within a few px, so a short refine positions the
    # 9 px search window — but the robust round and inter-round gate must
    # stay: they are what keeps a mistracked association from skewing
    # the window. The serial LM chain is the VIP device-time bottleneck
    # (profiled: the while-loop category is ~80% of step time), so every
    # iteration here is ~2% of the frame budget.
    ns1, inl1, n1, _ = pose_optimization_vi(
        ns_pred, ns_ref, pre_frame, pw, tracks.xy_und,
        has_pt & m.pt_valid[pid], inv_sig, gravity, Rcb, tcb,
        fx, fy, cx, cy, gyr_rw2, acc_rw2,
        depth_meas=depth, depth_info=depth_info,
        use_depth=True, rounds=2, iters=2,
    )

    # local-map re-association at the refined pose
    Rcw, tcw = _ns_to_cam_pose_ext(ns1, Rcb, tcb)
    local_pts = m.pt_valid
    pc = mv(Rcw, m.pt_xyz) + tcw
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    proj = jnp.stack([fx * pc[:, 0] / zs + cx, fy * pc[:, 1] / zs + cy], -1)
    vis = local_pts & (z > 0.1)
    free = tracks.valid & (tracks.pt_id < 0)
    pair = hamming.window_mask(tracks.xy_und, proj, 9.0)
    idx, dist, ok = hamming.match_best(
        tracks.desc, m.pt_desc, free, vis, pair_mask=pair,
        max_dist=hamming.TH_HIGH, ratio=0.9,
    )
    INF = jnp.asarray(1e9, dtype)
    best_per_pt = jnp.full((m.pt_cap,), INF).at[jnp.where(ok, idx, m.pt_cap - 1)].min(
        jnp.where(ok, dist, INF))
    keep = ok & (dist <= best_per_pt[idx])
    tracks2 = dataclasses.replace(
        tracks, pt_id=jnp.where(keep, idx, tracks.pt_id).astype(jnp.int32))

    has2 = tracks2.valid & (tracks2.pt_id >= 0)
    pid2 = jnp.clip(tracks2.pt_id, 0, m.pt_cap - 1)
    pw2 = m.pt_xyz[pid2]
    # second solve: two-state marginalized VI(P) — optimizes the previous
    # frame under its 15-dof marginal prior jointly with the current one,
    # uses the paper's depth-projected ternary, and returns the Schur
    # marginal of the current state as the next frame's prior
    ns2, inl2, n2, H_post = pose_optimization_vi2(
        ns_ref, ns1, H_prior, pre_frame,
        pw2, tracks2.xy_und, has2 & m.pt_valid[pid2],
        1.0 / scale_sigmas[jnp.clip(tracks2.level, 0, scale_sigmas.shape[0] - 1)],
        gravity, Rcb, tcb, fx, fy, cx, cy, gyr_rw2, acc_rw2,
        depth_meas=depth, depth_info=depth_info, use_depth=True,
        rounds=2, iters=3,
    )

    # sever hopeless associations only
    Rcw2, tcw2 = _ns_to_cam_pose_ext(ns2, Rcb, tcb)
    pc2 = mv(Rcw2, pw2) + tcw2
    z2 = jnp.where(jnp.abs(pc2[..., 2]) < 1e-6, 1e-6, pc2[..., 2])
    uv2 = jnp.stack([fx * pc2[..., 0] / z2 + cx, fy * pc2[..., 1] / z2 + cy], -1)
    err2 = jnp.sum((uv2 - tracks2.xy_und) ** 2, -1)
    hopeless = has2 & ((err2 > 100.0) | (pc2[..., 2] <= 0))
    tracks3 = dataclasses.replace(
        tracks2, pt_id=jnp.where(hopeless, -1, tracks2.pt_id))
    return ns2, inl2, n2, tracks3, H_post


W_KF_BA = 12  # 10 KFs + boundary like the reference (yaml:62), rounded to 12
# slots; the dense pose block is W*15 so the window width is a direct
# device-time lever (measured ~21 ms/KF at W=16)


def _vi_ba_jit(m: MapState, gravity, fx, fy, cx, cy, scale_sigmas,
               gyr_rw2, acc_rw2, depth_inv_var, Rcb=None, tcb=None):
    if Rcb is None:
        Rcb = jnp.eye(3, dtype=jnp.float32)
    if tcb is None:
        tcb = jnp.zeros(3, jnp.float32)
    return __vi_ba_impl(m, gravity, fx, fy, cx, cy, scale_sigmas,
                        gyr_rw2, acc_rw2, depth_inv_var, Rcb, tcb)


@jax.jit
def __vi_ba_impl(m: MapState, gravity, fx, fy, cx, cy, scale_sigmas,
                 gyr_rw2, acc_rw2, depth_inv_var, Rcb, tcb):
    """Windowed VI(P) BA over the last `W_KF_BA` keyframe slots (see
    tracker._local_ba_jit for the windowing rationale). The first slot
    of the window is the fixed boundary keyframe (its preint edge points
    outside and is masked)."""
    W = min(W_KF_BA, m.kf_cap)
    lo = jnp.clip(m.n_kf - W, 0, m.kf_cap - W).astype(jnp.int32)

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, lo, W, axis=0)

    kf_ns_w = jax.tree_util.tree_map(sl, m.kf_ns)
    kf_valid_w = sl(m.kf_valid)
    pre_w = jax.tree_util.tree_map(sl, m.kf_preint)
    depth_w = sl(m.kf_depth)
    depth_ok_w = sl(m.kf_depth_valid)
    feat_pt_w = sl(m.kf_feat_pt)
    feat_valid_w = sl(m.kf_feat_valid)
    feat_xy_w = sl(m.kf_feat_xy)
    feat_level_w = sl(m.kf_feat_level)

    F = feat_pt_w.shape[1]
    # [W, F] grid layout (scatter-free solver assembly)
    obs_kf = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], (W, F))
    obs_pt = feat_pt_w
    obs_ok = (obs_pt >= 0) & feat_valid_w
    obs_ok = obs_ok & m.pt_valid[jnp.clip(obs_pt, 0, m.pt_cap - 1)]
    obs_pt = jnp.clip(obs_pt, 0, m.pt_cap - 1)
    obs_uv = feat_xy_w
    inv_sig = 1.0 / scale_sigmas[jnp.clip(feat_level_w, 0, scale_sigmas.shape[0] - 1)]

    # boundary (first window slot) fixed; consecutive preint edges within
    # the window, first one masked (it refers outside the window)
    idx = jnp.arange(W, dtype=jnp.int32)
    fixed = kf_valid_w & (idx == 0)
    pre_j = idx
    pre_i = jnp.clip(idx - 1, 0, W - 1)
    pre_mask = kf_valid_w & (idx > 0) & (pre_w.dt > 1e-6)

    depth_info = jnp.where(depth_ok_w & kf_valid_w, depth_inv_var, 0.0)

    kf2, pts2, obs_in = local_ba_navstate(
        kf_ns_w, fixed, kf_valid_w, m.pt_xyz, m.pt_valid,
        obs_kf, obs_pt, obs_uv, inv_sig, obs_ok,
        pre_i, pre_j, pre_w, pre_mask,
        gravity, Rcb, tcb,
        fx, fy, cx, cy, gyr_rw2, acc_rw2,
        depth_w, depth_info, n_iters=3, rounds=2,
    )
    kf_ns2 = jax.tree_util.tree_map(
        lambda tbl, w: jax.lax.dynamic_update_slice_in_dim(tbl, w, lo, axis=0),
        m.kf_ns, kf2,
    )
    inl_grid = obs_in | ~obs_ok
    feat_pt2 = jnp.where(inl_grid, feat_pt_w, -1)
    kf_feat_pt = jax.lax.dynamic_update_slice_in_dim(m.kf_feat_pt, feat_pt2, lo, axis=0)
    return dataclasses.replace(m, kf_ns=kf_ns2, pt_xyz=pts2, kf_feat_pt=kf_feat_pt)
