"""Windowed bundle adjustment with Schur complement on landmarks.

TPU-native equivalents of:
  * Optimizer::LocalBundleAdjustment (visual-only SE3 window BA,
    reference: src/Optimizer.cc:2147-...);
  * Optimizer::LocalBundleAdjustmentNavState (the VI(P) window BA with
    preintegration/bias/depth edges and one fixed boundary KF,
    reference: src/Optimizer.cc:1105-1732);
  * Optimizer::GlobalBundleAdjustemnt / BundleAdjustment (same machinery
    at full-map capacity, reference: src/Optimizer.cc:1879-2010).

Design: the pose block is small (K slots x 6 or 15 dof; K <= ~20 locally)
so we keep a DENSE pose Hessian and Schur-eliminate the landmark blocks:

    S  = Hcc - W Hpp^-1 W^T         (one einsum -> MXU matmul)
    dc = solve(S, -(gc - W Hpp^-1 gp))
    dp = -Hpp^-1 (gp + W^T dc)

All edges live in fixed-capacity masked arrays; fixed vertices keep
their residual contributions but have their Jacobian columns zeroed
(classic gauge fixing), identical in effect to g2o's setFixed.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.lie import mm, mv
from uvipslam_tpu.core.state import NavState
from uvipslam_tpu.solver import factors
from uvipslam_tpu.solver.gn import (
    inv_spd_scaled, huber_cost, huber_weight, robust_weight as _rw,
    solve_spd)

_HI = jax.lax.Precision.HIGHEST
# 3-pass bf16 (~f32-equivalent mantissa coverage of already-f32 inputs)
# for the LARGE grouping GEMMs: half the MXU passes of HIGHEST at ~2e-5
# relative error — far below what Hessian assembly needs
_HIGH = jax.lax.Precision.HIGH
CHI2_MONO = 5.991
HUBER2_MONO = 5.991
HUBER2_PVR = 21.666
HUBER2_BIAS = 16.812
HUBER2_DEPTH = 16.812


def _schur_step(Hcc, gc, Hpp, gp, W, lam, pt_free):
    """One damped Schur-complement solve.

    Hcc [C, C], gc [C], Hpp [P, 3, 3], gp [P, 3], W [P, C, 3]
    (W_p = pose-point coupling block column for point p).
    pt_free [P] bool: points allowed to move.
    Returns (dc [C], dp [P, 3]).
    """
    dtype = gc.dtype
    C = gc.shape[0]
    # damp
    Hcc_d = Hcc + lam * jnp.eye(C, dtype=dtype) * jnp.maximum(jnp.diag(Hcc), 1e-6)
    dHpp = jnp.eye(3, dtype=dtype)[None] * (
        lam * jnp.maximum(jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6)[..., None]
    )
    Hpp_d = Hpp + dHpp + jnp.eye(3, dtype=dtype)[None] * 1e-8

    Hpp_inv = lie.inv3x3(Hpp_d)
    Hpp_inv = jnp.where(pt_free[:, None, None], Hpp_inv, 0.0)

    # contraction dim 3: VPU broadcast-sum (exact f32 FMA, no MXU passes)
    Y = jnp.sum(W[..., :, :, None] * Hpp_inv[..., None, :, :], axis=-2)
    # true GEMMs (contract over p [, k]): 3-pass HIGH precision
    S = Hcc_d - jnp.einsum("pck,pdk->cd", Y, W, precision=_HIGH)
    rhs = gc - jnp.einsum("pck,pk->c", Y, gp, precision=_HIGH)
    dc = solve_spd(S, -rhs)
    Wdc = jnp.sum(W * dc[None, :, None], axis=-2)               # [P, 3]
    dp = -jnp.sum(Hpp_inv * (gp + Wdc)[..., None, :], axis=-1)
    # note: W^T dc term: W [P, C, 3] -> contribution [P, 3]
    return dc, dp


def _reproj_blocks_navstate(kf_ns, pts_w, obs_kf, obs_pt, obs_uv, w, Rcb, tcb, fx, fy, cx, cy):
    """Per-observation residuals + Jacobians through gathered KF states."""
    p_wb = kf_ns.p[obs_kf]
    R_wb = kf_ns.R[obs_kf]
    pw = pts_w[obs_pt]
    r, J_pvr, J_pt = factors.reproj_navstate(p_wb, R_wb, pw, obs_uv, Rcb, tcb, fx, fy, cx, cy)
    return r, J_pvr, J_pt


# ---------------------------------------------------------------------------
# Scatter-free assembly. TPU scatters (`at[...].add` with data-dependent
# indices) serialize badly; every accumulation below is either a static
# reshape/reduction or a one-hot MATMUL that lands on the MXU.
# ---------------------------------------------------------------------------


def _compact_points(obs_pt, obs_mask, pts_w, pt_valid, p_active: int):
    """Shrink the landmark axis to the points actually observed.

    The one-hot assembly's HBM traffic scales with P; a 16-KF window
    touches only a few hundred of the thousands of landmark slots, so the
    solve runs in a compacted space of `p_active` slots and scatters back.
    Observations of points that overflow `p_active` (cannot happen at the
    configured sizes: p_active >= min(P, K*F)) drop out via their mask.

    Returns (ids_c [A] source slot per active slot, act_ok [A],
             obs_ptl local obs indices, keep_ok extra obs mask,
             pts_loc [A, 3], ptv_loc [A])."""
    P = pts_w.shape[0]
    flat = jnp.where(obs_mask, obs_pt, P).reshape(-1)
    ids = jnp.unique(flat, size=p_active, fill_value=P)      # sorted
    ids_c = jnp.clip(ids, 0, P - 1)
    act_ok = ids < P
    inv = jnp.full((P + 1,), p_active - 1, jnp.int32).at[ids].set(
        jnp.arange(p_active, dtype=jnp.int32))
    obs_ptl = inv[jnp.clip(obs_pt, 0, P)]
    # guard against aliasing if p_active ever overflows
    keep_ok = (ids_c[obs_ptl] == obs_pt) & act_ok[obs_ptl]
    pts_loc = pts_w[ids_c]
    ptv_loc = pt_valid[ids_c] & act_ok
    return ids_c, act_ok, obs_ptl, keep_ok, pts_loc, ptv_loc


def _assemble_reproj(J_pose, J_pt, r, w, obs_kf, obs_pt, K: int, P: int,
                     oh=None):
    """Assemble the reprojection normal-equation blocks.

    Two layouts:
      * grid  — J_pose [K, F, 2, D], obs_kf/obs_pt [K, F]; row k IS the
        observation set of keyframe slot k (how every tracker call site
        lays observations out). Per-KF reductions are plain sums; point
        groupings are K batched one-hot matmuls.
      * flat  — J_pose [O, 2, D], obs_kf/obs_pt [O]; fully general,
        one-hot matmuls over both axes.

    Invalid observations must carry w == 0 (they then contribute exactly
    nothing, as with the scatter formulation).
    Returns (Hk [K, D, D], gk [K, D], Hpp [P, 3, 3], gp [P, 3],
             Wp [P, K, D, 3]).
    """
    dtype = r.dtype
    JW = J_pose * w[..., None, None]
    JptW = J_pt * w[..., None, None]
    if obs_pt.ndim == 2:
        K_, F_ = obs_pt.shape
        D = J_pose.shape[-1]
        Hk = jnp.einsum("kfmi,kfmj->kij", JW, J_pose, precision=_HI)
        gk = jnp.einsum("kfmi,kfm->ki", JW, r, precision=_HI)
        if oh is None:
            oh = (obs_pt[..., None] == jnp.arange(P)).astype(dtype)  # [K,F,P]
        # contraction dim m=2: VPU broadcast-sum outer products (a 6-pass
        # HIGHEST matmul with contraction 2 wastes the whole MXU pipeline)
        Hpb = jnp.sum(JptW[..., :, :, None] * J_pt[..., :, None, :], axis=-3)
        gpb = jnp.sum(JptW * r[..., None], axis=-2)
        Wb = jnp.sum(JW[..., :, :, None] * J_pt[..., :, None, :], axis=-3)
        # single grouping GEMM: the one-hot is the bandwidth cost, so read
        # it ONCE — concatenate all per-observation blocks along a value
        # axis and split the [P, K, .] result
        vals = jnp.concatenate(
            [Hpb.reshape(K_, F_, 9), gpb, Wb.reshape(K_, F_, D * 3)], -1)
        out = jnp.einsum("kfp,kfc->pkc", oh, vals, precision=_HIGH)
        Hpp = out[..., :9].sum(1).reshape(P, 3, 3)
        gp = out[..., 9:12].sum(1)
        Wp = out[..., 12:].reshape(P, K_, D, 3)
    else:
        oh_k = (obs_kf[:, None] == jnp.arange(K)).astype(dtype)      # [O,K]
        oh_p = (obs_pt[:, None] == jnp.arange(P)).astype(dtype)      # [O,P]
        Hb = jnp.sum(JW[..., :, :, None] * J_pose[..., :, None, :], axis=-3)
        gb = jnp.sum(JW * r[..., None], axis=-2)
        Hpb = jnp.sum(JptW[..., :, :, None] * J_pt[..., :, None, :], axis=-3)
        gpb = jnp.sum(JptW * r[..., None], axis=-2)
        Wb = jnp.sum(JW[..., :, :, None] * J_pt[..., :, None, :], axis=-3)
        Hk = jnp.einsum("ok,oij->kij", oh_k, Hb, precision=_HIGH)
        gk = jnp.einsum("ok,oi->ki", oh_k, gb, precision=_HIGH)
        Hpp = jnp.einsum("op,oij->pij", oh_p, Hpb, precision=_HIGH)
        gp = jnp.einsum("op,oi->pi", oh_p, gpb, precision=_HIGH)
        Wk = jnp.einsum("ok,oij->okij", oh_k, Wb)
        Wp = jnp.einsum("op,okij->pkij", oh_p, Wk, precision=_HIGH)
    return Hk, gk, Hpp, gp, Wp


def _block_diag_embed(Hk, K: int, S: int, off: int = 0):
    """Per-KF blocks [K, D, D] -> [K*S, K*S] block diagonal at offset
    `off` inside each S-wide pose slot. Pure broadcast, no scatter."""
    D = Hk.shape[-1]
    eyeK = jnp.eye(K, dtype=Hk.dtype)
    H4 = Hk[:, :, None, :] * eyeK[:, None, :, None]                  # [K,D,K,D]
    H4 = jnp.pad(H4, ((0, 0), (off, S - D - off), (0, 0), (off, S - D - off)))
    return H4.reshape(K * S, K * S)


@functools.partial(jax.jit, static_argnames=("n_iters", "rounds", "p_active"))
def local_ba_navstate(
    kf_ns: NavState,          # [K] window + boundary + observer KFs
    kf_fixed: jax.Array,      # [K] bool: fixed poses (boundary/observers)
    kf_valid: jax.Array,      # [K] bool
    pts_w: jax.Array,         # [P, 3]
    pt_valid: jax.Array,      # [P] bool
    obs_kf: jax.Array,        # [O] int32
    obs_pt: jax.Array,        # [O] int32
    obs_uv: jax.Array,        # [O, 2]
    obs_inv_sigma2: jax.Array,# [O]
    obs_mask: jax.Array,      # [O] bool
    pre_i: jax.Array,         # [E] int32 preint edge i (prev KF)
    pre_j: jax.Array,         # [E] int32 preint edge j (next KF)
    pre,                      # PreintState [E]
    pre_mask: jax.Array,      # [E] bool
    gravity: jax.Array,
    Rcb: jax.Array, tcb: jax.Array,
    fx, fy, cx, cy,
    gyr_bias_rw2: float, acc_bias_rw2: float,
    depth_meas: jax.Array,    # [K] per-KF pressure depth (z prior)
    depth_info: jax.Array,    # [K] information (0 disables)
    n_iters: int = 5,
    rounds: int = 2,
    p_active: int = 2048,
):
    """VI(P) local window BA. Pose block: [K, 15] (PVR+bias). Returns
    (kf_ns', pts_w', obs_inlier [O])."""
    dtype = pts_w.dtype
    K = kf_ns.p.shape[0]
    P_full = pts_w.shape[0]
    C = K * 15

    free_kf = kf_valid & ~kf_fixed

    # compact the landmark axis to the observed set (see local_ba_se3)
    P = min(P_full, p_active if p_active else obs_pt.size)
    pts_full, ptv_full = pts_w, pt_valid
    ids_c, act_ok, obs_pt, keep_ok, pts_w, pt_valid = _compact_points(
        obs_pt, obs_mask, pts_w, pt_valid, P)
    obs_mask = obs_mask & keep_ok
    oh_grid = None
    if obs_pt.ndim == 2:
        oh_grid = (obs_pt[..., None] == jnp.arange(P)).astype(dtype)

    cov = pre.cov + jnp.eye(9, dtype=dtype)[None] * 1e-8
    info_pvr = inv_spd_scaled(cov)                     # [E, 9, 9]
    dT = pre.dt
    rw_diag = jnp.concatenate(
        [
            1.0 / jnp.maximum(gyr_bias_rw2 * dT[:, None], 1e-12).repeat(3, 1),
            1.0 / jnp.maximum(acc_bias_rw2 * dT[:, None], 1e-12).repeat(3, 1),
        ],
        axis=1,
    )  # [E, 6]

    obs_in = obs_mask

    eyeK = jnp.eye(K, dtype=dtype)
    oh_i = (pre_i[:, None] == jnp.arange(K)).astype(dtype)   # [E, K]
    oh_j = (pre_j[:, None] == jnp.arange(K)).astype(dtype)

    def _add_cross(Hcc4, oha, blk, ohb, offa, offb):
        """Hcc4 [K,15,K,15] += one-hot-scattered cross blocks (a matmul,
        not a scatter)."""
        da, db = blk.shape[-2], blk.shape[-1]
        upd = jnp.einsum("ea,eij,eb->aibj", oha, blk, ohb, precision=_HI)
        return Hcc4.at[:, offa:offa + da, :, offb:offb + db].add(upd)

    def _edge_terms(kf, robust):
        """Residuals/weights of the non-visual edges (shared between the
        full build and the cost-only evaluation)."""
        nsi = jax.tree_util.tree_map(lambda a: a[pre_i], kf)
        nsj = jax.tree_util.tree_map(lambda a: a[pre_j], kf)
        rp, J_i, J_j, J_b = factors.preint_pvr(
            nsi.p, nsi.v, nsi.R, nsj.p, nsj.v, nsj.R, nsi.dbg, nsi.dba,
            pre.dP, pre.dV, pre.dR, pre.J_P_bg, pre.J_P_ba,
            pre.J_V_bg, pre.J_V_ba, pre.J_R_bg, dT, gravity,
        )
        chi2p = jnp.einsum("ei,eij,ej->e", rp, info_pvr, rp, precision=_HI)
        wp = _rw(chi2p, HUBER2_PVR, robust)
        wp = wp * pre_mask.astype(dtype)

        rb, J_bi, J_bj = factors.bias_walk(
            nsi.dbg, nsi.dba, nsj.dbg, nsj.dba, nsi.bg, nsi.ba, nsj.bg, nsj.ba
        )
        chi2b = jnp.sum(rb * rb * rw_diag, axis=-1)
        wb = _rw(chi2b, HUBER2_BIAS, robust)
        wb = wb * pre_mask.astype(dtype)

        # depth-projected ternary edges along the preint pairs — the
        # paper's pressure factor (reference: EdgeNavStateDepthProjected,
        # src/IMU/g2otypes.cpp:292-392; wired per window pair like the
        # multi-depth edges of LocalBundleAdjustmentNavState,
        # src/Optimizer.cc:1371-1464). shi=1: the pressure sample is
        # taken at KF j's timestamp.
        rdp, Jdp_i, Jdp_j, Jdp_b = factors.depth_projected(
            nsi.p, nsi.v, nsi.R, nsj.p, nsi.dbg, nsi.dba,
            pre.dP, pre.J_P_bg, pre.J_P_ba, dT,
            depth_meas[pre_j], jnp.ones_like(dT), gravity_z=gravity[2],
        )
        dp_info = depth_info[pre_j]
        dp_mask = pre_mask & (dp_info > 0)
        chi2dp = rdp[:, 0] ** 2 * dp_info
        wdp = _rw(chi2dp, HUBER2_DEPTH, robust)
        wdp = wdp * dp_info * dp_mask.astype(dtype)

        # unary z prior only as a fallback for KFs not constrained by any
        # active ternary (same measurement never counted twice)
        covered = jnp.zeros((kf.p.shape[0],), bool).at[pre_j].max(dp_mask)
        rd, Jd = factors.depth_prior(kf.p, depth_meas)       # [K, 1], [K, 1, 9]
        chi2d = rd[:, 0] ** 2 * depth_info
        wd = _rw(chi2d, HUBER2_DEPTH, robust)
        wd = wd * depth_info * (free_kf & ~covered).astype(dtype)
        return ((rp, J_i, J_j, J_b, chi2p, wp),
                (rb, J_bi, J_bj, chi2b, wb),
                (rd, Jd, chi2d, wd),
                (rdp, Jdp_i, Jdp_j, Jdp_b, chi2dp, wdp, dp_mask))

    def _edge_cost(chi2p, chi2b, chi2d, chi2dp, dp_mask, wd):
        return (
            jnp.sum(jnp.where(pre_mask, huber_cost(chi2p, HUBER2_PVR), 0.0))
            + jnp.sum(jnp.where(pre_mask, huber_cost(chi2b, HUBER2_BIAS), 0.0))
            + jnp.sum(jnp.where((depth_info > 0) & (wd > 0),
                                huber_cost(chi2d, HUBER2_DEPTH), 0.0))
            + jnp.sum(jnp.where(dp_mask, huber_cost(chi2dp, HUBER2_DEPTH), 0.0))
        )

    def _reproj_chi2(kf, pts):
        r, _, _ = _reproj_blocks_navstate(
            kf, pts, obs_kf, obs_pt, obs_uv, None, Rcb, tcb, fx, fy, cx, cy
        )
        return jnp.sum(r * r, -1) * obs_inv_sigma2

    def build(state, obs_inlier, robust, pt_free):
        kf, pts = state

        # ---- reprojection edges (scatter-free assembly) ----
        r, J_pvr, J_pt = _reproj_blocks_navstate(
            kf, pts, obs_kf, obs_pt, obs_uv, None, Rcb, tcb, fx, fy, cx, cy
        )
        chi2 = jnp.sum(r * r, -1) * obs_inv_sigma2
        wo = _rw(chi2, HUBER2_MONO, robust)
        wo = wo * obs_inv_sigma2 * obs_inlier.astype(dtype)
        J_pvr = J_pvr * free_kf[obs_kf].astype(dtype)[..., None, None]
        J_pt = J_pt * pt_free[obs_pt].astype(dtype)[..., None, None]

        Hk, gk, Hpp, gp, Wp = _assemble_reproj(
            J_pvr, J_pt, r, wo, obs_kf, obs_pt, K, P, oh=oh_grid)
        Hcc4 = (jnp.pad(Hk, ((0, 0), (0, 6), (0, 6)))[:, :, None, :]
                * eyeK[:, None, :, None])                       # [K,15,K,15]
        gc4 = jnp.pad(gk, ((0, 0), (0, 6)))                     # [K, 15]
        W = jnp.pad(Wp, ((0, 0), (0, 0), (0, 6), (0, 0))).reshape(P, C, 3)
        total = jnp.sum(jnp.where(obs_inlier, huber_cost(chi2, HUBER2_MONO), 0.0))

        (rp, J_i, J_j, J_b, chi2p, wp), (rb, J_bi, J_bj, chi2b, wb), \
            (rd, Jd, chi2d, wd), \
            (rdp, Jdp_i, Jdp_j, Jdp_b, chi2dp, wdp, dp_mask) = \
            _edge_terms(kf, robust)

        # ---- preintegration ternary edges (PVR_i, PVR_j, Bias_i) ----
        J_i = J_i * free_kf[pre_i].astype(dtype)[:, None, None]
        J_j = J_j * free_kf[pre_j].astype(dtype)[:, None, None]
        J_b = J_b * free_kf[pre_i].astype(dtype)[:, None, None]
        WJ = jnp.einsum("eij,e->eij", info_pvr, wp, precision=_HI)
        blocks = ((J_i, oh_i, 0), (J_j, oh_j, 0), (J_b, oh_i, 9))
        for (Ja, oha, offa) in blocks:
            for (Jb_, ohb, offb) in blocks:
                blk = jnp.einsum("emi,emn,enj->eij", Ja, WJ, Jb_, precision=_HI)
                Hcc4 = _add_cross(Hcc4, oha, blk, ohb, offa, offb)
            gblk = jnp.einsum("emi,emn,en->ei", Ja, WJ, rp, precision=_HI)
            d = Ja.shape[-1]
            gc4 = gc4.at[:, offa:offa + d].add(
                jnp.einsum("ea,ei->ai", oha, gblk, precision=_HI))

        # ---- bias random-walk edges along the same (i, j) pairs ----
        J_bi = J_bi * free_kf[pre_i].astype(dtype)[:, None, None]
        J_bj = J_bj * free_kf[pre_j].astype(dtype)[:, None, None]
        WJb = rw_diag * wb[:, None]  # diagonal info [E, 6]
        bias_blocks = ((J_bi, oh_i), (J_bj, oh_j))
        for (Ja, oha) in bias_blocks:
            for (Jb_, ohb) in bias_blocks:
                blk = jnp.einsum("emi,em,emj->eij", Ja, WJb, Jb_, precision=_HI)
                Hcc4 = _add_cross(Hcc4, oha, blk, ohb, 9, 9)
            gblk = jnp.einsum("emi,em,em->ei", Ja, WJb, rb, precision=_HI)
            gc4 = gc4.at[:, 9:15].add(
                jnp.einsum("ea,ei->ai", oha, gblk, precision=_HI))

        # ---- depth-projected ternary edges (PVR_i, PVR_j, Bias_i) ----
        Jdp_i = Jdp_i * free_kf[pre_i].astype(dtype)[:, None, None]
        Jdp_j = Jdp_j * free_kf[pre_j].astype(dtype)[:, None, None]
        Jdp_b = Jdp_b * free_kf[pre_i].astype(dtype)[:, None, None]
        dp_blocks = ((Jdp_i, oh_i, 0), (Jdp_j, oh_j, 0), (Jdp_b, oh_i, 9))
        for (Ja, oha, offa) in dp_blocks:
            for (Jb_, ohb, offb) in dp_blocks:
                blk = jnp.einsum("emi,e,emj->eij", Ja, wdp, Jb_, precision=_HI)
                Hcc4 = _add_cross(Hcc4, oha, blk, ohb, offa, offb)
            gblk = jnp.einsum("emi,e,em->ei", Ja, wdp, rdp, precision=_HI)
            d = Ja.shape[-1]
            gc4 = gc4.at[:, offa:offa + d].add(
                jnp.einsum("ea,ei->ai", oha, gblk, precision=_HI))

        # ---- per-KF pressure depth priors (unary fallback -> diagonal) ----
        blk = jnp.einsum("kmi,k,kmj->kij", Jd, wd, Jd, precision=_HI)
        Hcc4 = Hcc4.at[:, :9, :, :9].add(blk[:, :, None, :] * eyeK[:, None, :, None])
        gc4 = gc4.at[:, :9].add(jnp.einsum("kmi,k,km->ki", Jd, wd, rd, precision=_HI))

        total = total + _edge_cost(chi2p, chi2b, chi2d, chi2dp, dp_mask, wd)

        # gauge: identity on fixed/invalid pose slots
        Hcc = Hcc4.reshape(C, C)
        gc = gc4.reshape(C)
        fixed_diag = jnp.repeat(~free_kf, 15).astype(dtype)
        Hcc = Hcc + jnp.diag(fixed_diag)
        Hpp = Hpp + jnp.eye(3, dtype=dtype)[None] * (~pt_free).astype(dtype)[:, None, None]

        return (Hcc, gc, Hpp, gp, W), total

    def retract(state, dc, dp):
        kf, pts = state
        d = dc.reshape(K, 15)
        kf2 = kf.inc_small_pvr(d[:, :9]).inc_small_bias(d[:, 9:15])
        pts2 = pts + dp
        return (kf2, pts2)

    def lm_rounds(state, obs_inlier, robust, iters, pt_free):
        # one normal-equation build per iteration: the accepted step's
        # equations are carried; rejected steps re-solve the carried
        # system at higher damping (see gn.lm_solve)
        def body(carry, _):
            st, eqs, lam, chi2 = carry
            dc, dp = _schur_step(*eqs, lam, pt_free)
            st_new = retract(st, dc, dp)
            eqs_new, chi2_new = build(st_new, obs_inlier, robust, pt_free)
            accept = chi2_new < chi2
            sel = lambda a, b: jnp.where(accept, b, a)
            st_out = jax.tree_util.tree_map(sel, st, st_new)
            eqs_out = jax.tree_util.tree_map(sel, eqs, eqs_new)
            lam_out = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            return (st_out, eqs_out, lam_out, jnp.where(accept, chi2_new, chi2)), None

        eqs0, chi2_0 = build(state, obs_inlier, robust, pt_free)
        (st, _, _, _), _ = jax.lax.scan(
            body, (state, eqs0, jnp.asarray(1e-4, dtype), chi2_0), None,
            length=iters,
        )
        return st

    # rounds as a lax.scan over the robust flag: one compiled copy of the
    # LM machinery instead of `rounds` unrolled copies (compile time)
    def round_body(carry, robust):
        state, obs_in = carry
        # a landmark moves only with >= 2 live observations — with one, its
        # 3x3 Hessian block is singular along the viewing ray and the Schur
        # inverse would inject garbage (g2o avoids this because such points
        # never enter the reference's BA graphs)
        n_obs = jnp.zeros((P,), jnp.int32).at[obs_pt].add(obs_in.astype(jnp.int32))
        pt_free = pt_valid & (n_obs >= 2)
        state = lm_rounds(state, obs_in, robust, n_iters, pt_free)
        # re-gate observations by chi2 + positive depth
        kf, pts = state
        chi2 = _reproj_chi2(kf, pts)
        Rbw = jnp.swapaxes(kf.R[obs_kf], -1, -2)
        pc_z = (mv(Rcb, mv(Rbw, pts[obs_pt] - kf.p[obs_kf])) + tcb)[..., 2]
        obs_in = obs_mask & (chi2 <= CHI2_MONO) & (pc_z > 0)
        return (state, obs_in), None

    robust_sched = jnp.asarray(
        [1.0 if r < rounds - 1 else 0.0 for r in range(rounds)], dtype)
    ((kf, pts), obs_in), _ = jax.lax.scan(
        round_body, ((kf_ns, pts_w), obs_in), robust_sched)
    pts_out = pts_full.at[ids_c].set(
        jnp.where(act_ok[:, None], pts, pts_full[ids_c]))
    return kf, pts_out, obs_in


@functools.partial(jax.jit, static_argnames=("n_iters", "rounds", "p_active"))
def local_ba_se3(
    kf_R: jax.Array,          # [K, 3, 3] Tcw rotations
    kf_t: jax.Array,          # [K, 3]    Tcw translations
    kf_fixed: jax.Array,      # [K] bool
    kf_valid: jax.Array,      # [K] bool
    pts_w: jax.Array,         # [P, 3]
    pt_valid: jax.Array,      # [P] bool
    obs_kf: jax.Array,        # [O]
    obs_pt: jax.Array,        # [O]
    obs_uv: jax.Array,        # [O, 2]
    obs_inv_sigma2: jax.Array,# [O]
    obs_mask: jax.Array,      # [O]
    fx, fy, cx, cy,
    n_iters: int = 5,
    rounds: int = 2,
    p_active: int = 2048,
):
    """Visual-only window/global BA over SE3 camera poses Tcw.
    Returns (kf_R', kf_t', pts_w', obs_inlier)."""
    dtype = pts_w.dtype
    K = kf_R.shape[0]
    P_full = pts_w.shape[0]
    C = K * 6
    free_kf = kf_valid & ~kf_fixed
    obs_in = obs_mask

    # compact the landmark axis to the observed set (one-hot assembly
    # traffic scales with the point-slot count)
    P = min(P_full, p_active if p_active else obs_pt.size)
    pts_full, ptv_full = pts_w, pt_valid
    ids_c, act_ok, obs_pt, keep_ok, pts_w, pt_valid = _compact_points(
        obs_pt, obs_mask, pts_w, pt_valid, P)
    obs_in = obs_in & keep_ok
    obs_mask = obs_mask & keep_ok
    oh_grid = None
    if obs_pt.ndim == 2:
        oh_grid = (obs_pt[..., None] == jnp.arange(P)).astype(dtype)

    def build(state, obs_inlier, robust, pt_free):
        (R, t, pts) = state
        r, J_pose, J_pt = factors.reproj_se3(
            R[obs_kf], t[obs_kf], pts[obs_pt], obs_uv, fx, fy, cx, cy
        )
        chi2 = jnp.sum(r * r, -1) * obs_inv_sigma2
        wo = _rw(chi2, HUBER2_MONO, robust)
        wo = wo * obs_inv_sigma2 * obs_inlier.astype(dtype)
        J_pose = J_pose * free_kf[obs_kf].astype(dtype)[..., None, None]
        J_pt = J_pt * pt_free[obs_pt].astype(dtype)[..., None, None]

        Hk, gk, Hpp, gp, Wp = _assemble_reproj(
            J_pose, J_pt, r, wo, obs_kf, obs_pt, K, P, oh=oh_grid)
        Hcc = _block_diag_embed(Hk, K, 6)
        gc = gk.reshape(C)
        W = Wp.reshape(P, C, 3)

        fixed_diag = jnp.repeat(~free_kf, 6).astype(dtype)
        Hcc = Hcc + jnp.diag(fixed_diag)
        Hpp = Hpp + jnp.eye(3, dtype=dtype)[None] * (~pt_free).astype(dtype)[:, None, None]
        total = jnp.sum(jnp.where(obs_inlier, huber_cost(chi2, HUBER2_MONO), 0.0))
        return (Hcc, gc, Hpp, gp, W), total

    def retract(state, dc, dp):
        (R, t, pts) = state
        d = dc.reshape(K, 6)
        dR, dt = lie.se3_exp(d)
        return (lie.normalize_rotation(mm(dR, R)), mv(dR, t) + dt, pts + dp)

    def lm_rounds(state, obs_inlier, robust, iters, pt_free):
        # carried normal equations, one build per iteration (see
        # local_ba_navstate.lm_rounds / gn.lm_solve)
        def body(carry, _):
            st, eqs, lam, chi2 = carry
            dc, dp = _schur_step(*eqs, lam, pt_free)
            st_new = retract(st, dc, dp)
            eqs_new, chi2_new = build(st_new, obs_inlier, robust, pt_free)
            accept = chi2_new < chi2
            sel = lambda a, b: jnp.where(accept, b, a)
            st_out = jax.tree_util.tree_map(sel, st, st_new)
            eqs_out = jax.tree_util.tree_map(sel, eqs, eqs_new)
            lam_out = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            return (st_out, eqs_out, lam_out, jnp.where(accept, chi2_new, chi2)), None

        eqs0, chi2_0 = build(state, obs_inlier, robust, pt_free)
        (st, _, _, _), _ = jax.lax.scan(
            body, (state, eqs0, jnp.asarray(1e-4, dtype), chi2_0), None,
            length=iters,
        )
        return st

    def round_body(carry, robust):
        state, obs_in = carry
        n_obs = jnp.zeros((P,), jnp.int32).at[obs_pt].add(obs_in.astype(jnp.int32))
        pt_free = pt_valid & (n_obs >= 2)  # see local_ba_navstate note
        state = lm_rounds(state, obs_in, robust, n_iters, pt_free)
        R, t, pts = state
        r, _, _ = factors.reproj_se3(R[obs_kf], t[obs_kf], pts[obs_pt], obs_uv, fx, fy, cx, cy)
        chi2 = jnp.sum(r * r, -1) * obs_inv_sigma2
        pc_z = (mv(R[obs_kf], pts[obs_pt]) + t[obs_kf])[..., 2]
        obs_in = obs_mask & (chi2 <= CHI2_MONO) & (pc_z > 0)
        return (state, obs_in), None

    robust_sched = jnp.asarray(
        [1.0 if r < rounds - 1 else 0.0 for r in range(rounds)], dtype)
    ((R, t, pts), obs_in), _ = jax.lax.scan(
        round_body, ((kf_R, kf_t, pts_w), obs_in), robust_sched)
    # scatter the optimized active points back into the full table
    pts_out = pts_full.at[ids_c].set(
        jnp.where(act_ok[:, None], pts, pts_full[ids_c]))
    return R, t, pts_out, obs_in
