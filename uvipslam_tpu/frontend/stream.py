"""Streaming host wrapper for the device trackers with loop closing.

The device trackers (`device_tracker.build_tracker`,
`device_vip.build_vip_tracker`) are single jitted steps; in scan mode
(the bench path) the whole sequence runs in one device program with no
host involvement, so there is no place to hang the loop-closing pass.
When frames arrive ONE AT A TIME (online operation), the host is in the
loop anyway — this wrapper runs the existing LoopCloser at keyframe
boundaries, exactly where the reference's LocalMapping thread feeds its
LoopClosing thread (reference: src/LocalMapping.cc:850-852), and pushes
the corrected map back into the device state (the analog of
CorrectLoop + ForceRelocalisation, src/LoopClosing.cc:539-691).

The device step exposes the hook as `StepOut.new_kf` / `VipStepOut.new_kf`
(slot of a keyframe created this frame, -1 otherwise): the host reads ONE
scalar per frame and only touches the map on the (rare) keyframe frames.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.frontend.tracker import (
    _ns_to_cam_pose,
    _ns_to_cam_pose_ext,
)
from uvipslam_tpu.models.camera import CameraModel

MONO, VIP = "mono", "vip"


class DeviceStream:
    """Per-frame streaming around a device tracker + loop closing.

    >>> ds = DeviceStream(cam, cfg, mode="vip")
    >>> for bundle in bundles: out = ds.process(bundle)
    """

    def __init__(self, cam: CameraModel, cfg, kf_cap: int = 128,
                 pt_cap: int = 8192, mode: str = VIP):
        self.cam = cam
        self.cfg = cfg
        self.mode = mode
        if mode == VIP:
            from uvipslam_tpu.frontend.device_vip import build_vip_tracker
            self.st, self.step = build_vip_tracker(cam, cfg, kf_cap, pt_cap)
            Tbc = np.asarray(cfg.Tbc, np.float32)
            self.Rbc = jnp.asarray(Tbc[:3, :3])
            self.tbc = jnp.asarray(Tbc[:3, 3])
            self.Rcb = jnp.asarray(Tbc[:3, :3].T)
            self.tcb = jnp.asarray(-Tbc[:3, :3].T @ Tbc[:3, 3])
        else:
            from uvipslam_tpu.frontend.device_tracker import build_tracker
            self.st, self.step = build_tracker(cam, cfg, kf_cap, pt_cap)
            eye3 = jnp.eye(3, dtype=jnp.float32)
            z3 = jnp.zeros(3, jnp.float32)
            self.Rbc = self.Rcb = eye3
            self.tbc = self.tcb = z3
        self.loop_closer = None
        if getattr(cfg, "loop_closing", False):
            from uvipslam_tpu.loop.closer import LoopCloser
            mt = getattr(cfg, "loop_min_total_matches", -1)
            self.loop_closer = LoopCloser(
                cam.fx, cam.fy, cam.cx, cam.cy,
                min_sim3_inliers=getattr(cfg, "loop_min_sim3_inliers", 20),
                min_total_matches=None if mt < 0 else mt)
        self.loop_events: list[tuple[int, int]] = []
        self.frame_id = -1

    # ------------------------------------------------------------------
    def process(self, x):
        """Feed one frame (image for mono, FrameBundle for VIP).
        Returns the device StepOut/VipStepOut."""
        self.frame_id += 1
        self.st, out = self.step(self.st, x)
        k = int(out.new_kf)
        if self.loop_closer is not None and k >= 0:
            self._close_loop_at(k)
        return out

    # ------------------------------------------------------------------
    def _close_loop_at(self, kf_slot: int):
        """Host loop-closing pass at a keyframe boundary; on closure the
        corrected map AND the device pose/filter state are pushed back
        (reference: CorrectLoop stops the mapper, corrects, and forces
        tracking to re-anchor — src/LoopClosing.cc:539-691)."""
        from uvipslam_tpu.solver.global_ba import (
            global_ba_navstate,
            global_ba_visual,
        )

        lc = self.loop_closer
        st = self.st
        vio_ok = bool(getattr(st, "vio_ok", False))
        sigmas = jnp.asarray(self.cfg.scale_sigmas, jnp.float32)
        if vio_ok:
            lc.Rcb, lc.tcb, lc.Rbc, lc.tbc = (self.Rcb, self.tcb,
                                              self.Rbc, self.tbc)
            lc.post_ba = lambda m: global_ba_navstate(
                m, jnp.asarray(self.cfg.gravity, jnp.float32),
                self.Rcb, self.tcb,
                self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                self.cfg.gyr_noise_sd, self.cfg.acc_noise_sd,
                self.cfg.gyr_bias_rw2, self.cfg.acc_bias_rw2,
                jnp.asarray(1.0 / self.cfg.depth_noise_sd ** 2, jnp.float32),
                sigmas,
            )
        else:
            eye3 = jnp.eye(3, dtype=jnp.float32)
            z3 = jnp.zeros(3, jnp.float32)
            lc.Rcb, lc.tcb, lc.Rbc, lc.tbc = eye3, z3, eye3, z3
            lc.post_ba = lambda m: global_ba_visual(
                m, self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                sigmas)

        m2, stat = lc.process_keyframe(st.map, kf_slot)
        if not stat.get("loop"):
            return
        # push the corrected map back and re-anchor the device pose and
        # (post-init) the VI filter at the corrected keyframe
        ns_k = jax.tree_util.tree_map(lambda a: a[kf_slot], m2.kf_ns)
        if vio_ok:
            Rcw, tcw = _ns_to_cam_pose_ext(ns_k, self.Rcb, self.tcb)
        else:
            Rcw, tcw = _ns_to_cam_pose(ns_k)
        updates = dict(
            map=m2, Rcw=Rcw, tcw=tcw,
            R_vel=jnp.eye(3, dtype=jnp.float32),
            t_vel=jnp.zeros(3, jnp.float32),
        )
        if hasattr(st, "ns"):
            updates["ns"] = ns_k if vio_ok else st.ns
        if hasattr(st, "H_prior"):
            updates["H_prior"] = jnp.eye(15, dtype=jnp.float32) * 1e2
        self.st = dataclasses.replace(st, **updates)
        self.loop_events.append((self.frame_id, int(stat["loop_kf"])))
