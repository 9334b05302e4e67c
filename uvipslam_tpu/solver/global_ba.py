"""Global bundle adjustment over the whole keyframe table.

TPU-native equivalents of the reference's full-map solves
(reference: src/Optimizer.cc — GlobalBundleAdjustemnt :1879,
BundleAdjustment :1896, RecoveryBundleAdjustemnt :1886,
GlobalBundleAdjustmentNavState :50). The reference iterates g2o over
every keyframe and map point; here the same windowed-BA machinery
(`solver/local_ba.py`) is applied with the window = the full table —
the solvers are shape-polymorphic, so global BA is a gather + one call.

Re-integration: the NavState variant re-runs preintegration of each
keyframe's stored raw IMU window at that keyframe's CURRENT bias
estimate before solving (the reference instead keeps the insertion-time
linearization and relies on the J_*_bg/ba bias Jacobians; re-running the
`lax.scan` on device is cheap and strictly more accurate).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.core.preintegration import preintegrate
from uvipslam_tpu.frontend.tracker import _cam_pose_to_ns, _ns_to_cam_pose
from uvipslam_tpu.mapstate.map import MapState
from uvipslam_tpu.solver.local_ba import local_ba_navstate, local_ba_se3


def _all_observations(m: MapState, scale_sigmas):
    # [K, F] grid layout (scatter-free solver assembly)
    K, F = m.kf_feat_pt.shape
    obs_kf = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, F))
    obs_pt = m.kf_feat_pt
    ok = (obs_pt >= 0) & m.kf_feat_valid & m.kf_valid[:, None]
    obs_pt = jnp.clip(obs_pt, 0, m.pt_cap - 1)
    ok = ok & m.pt_valid[obs_pt]
    obs_uv = m.kf_feat_xy
    lvl = jnp.clip(m.kf_feat_level, 0, scale_sigmas.shape[0] - 1)
    inv_sig = 1.0 / scale_sigmas[lvl]
    return obs_kf, obs_pt, obs_uv, inv_sig, ok


def _writeback(m: MapState, kf_ns2, pts2, obs_in, obs_ok):
    keep = obs_in | ~obs_ok
    return dataclasses.replace(
        m,
        kf_ns=kf_ns2,
        pt_xyz=pts2,
        kf_feat_pt=jnp.where(keep, m.kf_feat_pt, -1),
    )


@functools.partial(
    jax.jit, static_argnames=("kf_window", "n_iters", "rounds", "p_active"))
def global_ba_visual(m: MapState, fx, fy, cx, cy, scale_sigmas,
                     kf_window: int | None = None, n_iters: int = 8,
                     rounds: int = 2, p_active: int = 4096) -> MapState:
    """Full-map visual-only BA with the first valid keyframe fixed as the
    gauge (reference: BundleAdjustment src/Optimizer.cc:1896 fixes KF id 0).
    Used after loop closing and for recovery re-initialization.

    kf_window: optional static cap — optimize only the FIRST `kf_window`
    keyframe slots. Keyframes fill slots in insertion order and slot
    recycling only happens long after VIO init, so the init-time caller
    (device_vip.try_init_vio) can bound the dense pose block at W*6
    instead of kf_cap*6 (measured: the full-table form cost 137 ms of a
    60-frame bench, paid once at init on a map that occupies ~10 slots)."""
    K_all = m.kf_feat_pt.shape[0]
    W = K_all if kf_window is None else min(kf_window, K_all)
    F = m.kf_feat_pt.shape[1]
    kf_valid_w = m.kf_valid[:W]
    obs_kf = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], (W, F))
    obs_pt = m.kf_feat_pt[:W]
    ok = (obs_pt >= 0) & m.kf_feat_valid[:W] & kf_valid_w[:, None]
    obs_pt = jnp.clip(obs_pt, 0, m.pt_cap - 1)
    ok = ok & m.pt_valid[obs_pt]
    obs_uv = m.kf_feat_xy[:W]
    lvl = jnp.clip(m.kf_feat_level[:W], 0, scale_sigmas.shape[0] - 1)
    inv_sig = 1.0 / scale_sigmas[lvl]

    kf_R, kf_t = jax.vmap(lambda i: _ns_to_cam_pose(
        jax.tree_util.tree_map(lambda x: x[i], m.kf_ns)))(jnp.arange(W))
    first = jnp.argmax(kf_valid_w)  # lowest valid slot
    fixed = jnp.arange(W) == first
    Rn, tn, pts, inl = local_ba_se3(
        kf_R, kf_t, fixed, kf_valid_w, m.pt_xyz, m.pt_valid,
        obs_kf, obs_pt, obs_uv, inv_sig, ok,
        fx, fy, cx, cy, n_iters=n_iters, rounds=rounds, p_active=p_active,
    )
    ns2_w = jax.vmap(_cam_pose_to_ns)(Rn, tn)
    # keep velocity/bias fields from the old states (visual BA only
    # touches pose); _cam_pose_to_ns zeroes them
    ns2 = dataclasses.replace(
        m.kf_ns,
        p=m.kf_ns.p.at[:W].set(ns2_w.p),
        R=m.kf_ns.R.at[:W].set(ns2_w.R),
    )
    keep = inl | ~ok
    return dataclasses.replace(
        m,
        kf_ns=ns2,
        pt_xyz=pts,
        kf_feat_pt=m.kf_feat_pt.at[:W].set(
            jnp.where(keep, m.kf_feat_pt[:W], -1)),
    )


@jax.jit
def global_ba_navstate(
    m: MapState, gravity, Rcb, tcb, fx, fy, cx, cy,
    gyr_noise_sd, acc_noise_sd,
    gyr_bias_rw2, acc_bias_rw2, depth_inv_var, scale_sigmas,
) -> MapState:
    """Full-map visual-inertial-pressure BA over NavStates
    (reference: GlobalBundleAdjustmentNavState src/Optimizer.cc:50 —
    PVR+Bias vertices for every KF, preintegration ternary edges along
    the kf_prev chain, bias random-walk edges, reprojection edges, and
    here additionally the pressure z-priors the reference applies in the
    local version)."""
    K = m.kf_cap
    obs_kf, obs_pt, obs_uv, inv_sig, ok = _all_observations(m, scale_sigmas)

    # re-integrate every KF's raw window at its own current gyro/acc bias
    def reint(omg, acc, dt, msk, bg, ba):
        return preintegrate(omg, acc, dt, msk, bg, ba,
                            gyr_noise_sd, acc_noise_sd)

    pre = jax.vmap(reint)(
        m.kf_imu_omg, m.kf_imu_acc, m.kf_imu_dt, m.kf_imu_mask,
        m.kf_ns.bg[jnp.clip(m.kf_prev, 0, K - 1)],
        m.kf_ns.ba[jnp.clip(m.kf_prev, 0, K - 1)],
    )
    pre_j = jnp.arange(K, dtype=jnp.int32)
    pre_i = m.kf_prev
    pre_mask = (pre_i >= 0) & m.kf_valid & (pre.dt > 1e-6)
    pre_i = jnp.clip(pre_i, 0, K - 1)
    pre_mask = pre_mask & m.kf_valid[pre_i]

    first = jnp.argmax(m.kf_valid)
    fixed = jnp.arange(K) == first
    depth_info = jnp.where(m.kf_depth_valid & m.kf_valid, depth_inv_var, 0.0)

    ns2, pts2, inl = local_ba_navstate(
        m.kf_ns, fixed, m.kf_valid, m.pt_xyz, m.pt_valid,
        obs_kf, obs_pt, obs_uv, inv_sig, ok,
        pre_i, pre_j, pre, pre_mask, gravity, Rcb, tcb,
        fx, fy, cx, cy, gyr_bias_rw2, acc_bias_rw2,
        m.kf_depth, depth_info, n_iters=8, rounds=2, p_active=4096,
    )
    return _writeback(m, ns2, pts2, inl, ok)
