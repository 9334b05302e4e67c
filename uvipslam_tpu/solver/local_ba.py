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
from uvipslam_tpu.solver.gn import huber_cost, huber_weight, solve_spd

_HI = jax.lax.Precision.HIGHEST
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

    Hpp_inv = jnp.linalg.inv(Hpp_d)
    Hpp_inv = jnp.where(pt_free[:, None, None], Hpp_inv, 0.0)

    Y = jnp.einsum("pcj,pjk->pck", W, Hpp_inv, precision=_HI)   # [P, C, 3]
    S = Hcc_d - jnp.einsum("pck,pdk->cd", Y, W, precision=_HI)
    rhs = gc - jnp.einsum("pck,pk->c", Y, gp, precision=_HI)
    dc = solve_spd(S, -rhs)
    dp = -jnp.einsum("pjk,pj->pk", Hpp_inv, gp + jnp.einsum("pcj,c->pj", W, dc, precision=_HI), precision=_HI)
    # note: W^T dc term: W [P, C, 3] -> contribution [P, 3]
    return dc, dp


def _reproj_blocks_navstate(kf_ns, pts_w, obs_kf, obs_pt, obs_uv, w, Rcb, tcb, fx, fy, cx, cy):
    """Per-observation residuals + Jacobians through gathered KF states."""
    p_wb = kf_ns.p[obs_kf]
    R_wb = kf_ns.R[obs_kf]
    pw = pts_w[obs_pt]
    r, J_pvr, J_pt = factors.reproj_navstate(p_wb, R_wb, pw, obs_uv, Rcb, tcb, fx, fy, cx, cy)
    return r, J_pvr, J_pt


@functools.partial(jax.jit, static_argnames=("n_iters", "rounds"))
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
):
    """VI(P) local window BA. Pose block: [K, 15] (PVR+bias). Returns
    (kf_ns', pts_w', obs_inlier [O])."""
    dtype = pts_w.dtype
    K = kf_ns.p.shape[0]
    P = pts_w.shape[0]
    C = K * 15

    free_kf = kf_valid & ~kf_fixed

    cov = pre.cov + jnp.eye(9, dtype=dtype)[None] * 1e-8
    info_pvr = jnp.linalg.inv(cov)                     # [E, 9, 9]
    dT = pre.dt
    rw_diag = jnp.concatenate(
        [
            1.0 / jnp.maximum(gyr_bias_rw2 * dT[:, None], 1e-12).repeat(3, 1),
            1.0 / jnp.maximum(acc_bias_rw2 * dT[:, None], 1e-12).repeat(3, 1),
        ],
        axis=1,
    )  # [E, 6]

    obs_in = obs_mask

    def build(state, obs_inlier, robust):
        kf, pts = state
        Hcc = jnp.zeros((C, C), dtype)
        gc = jnp.zeros((C,), dtype)
        Hpp = jnp.zeros((P, 3, 3), dtype)
        gp = jnp.zeros((P, 3), dtype)
        W = jnp.zeros((P, C, 3), dtype)
        total = jnp.asarray(0.0, dtype)

        # ---- reprojection edges ----
        r, J_pvr, J_pt = _reproj_blocks_navstate(
            kf, pts, obs_kf, obs_pt, obs_uv, None, Rcb, tcb, fx, fy, cx, cy
        )
        chi2 = jnp.sum(r * r, -1) * obs_inv_sigma2
        wo = huber_weight(chi2, HUBER2_MONO) if robust else jnp.ones_like(chi2)
        wo = wo * obs_inv_sigma2 * obs_inlier.astype(dtype)
        # zero Jacobians of fixed/invalid vertices
        pose_ok = (free_kf[obs_kf]).astype(dtype)[:, None, None]
        pt_ok = (pt_free[obs_pt]).astype(dtype)[:, None, None]
        J_pvr = J_pvr * pose_ok
        J_pt = J_pt * pt_ok

        JW_pvr = J_pvr * wo[:, None, None]
        Hb = jnp.einsum("omi,omj->oij", JW_pvr, J_pvr, precision=_HI)   # [O, 9, 9]
        gb = jnp.einsum("omi,om->oi", JW_pvr, r, precision=_HI)
        Hpb = jnp.einsum("omi,omj->oij", J_pt * wo[:, None, None], J_pt, precision=_HI)
        gpb = jnp.einsum("omi,om->oi", J_pt * wo[:, None, None], r, precision=_HI)
        Wb = jnp.einsum("omi,omj->oij", JW_pvr, J_pt, precision=_HI)    # [O, 9, 3]

        # scatter into dense blocks: pose block rows are obs_kf*15 .. +9
        base = obs_kf * 15
        ii = base[:, None, None] + jnp.arange(9)[None, :, None]
        jj = base[:, None, None] + jnp.arange(9)[None, None, :]
        Hcc = Hcc.at[ii, jj].add(Hb)
        gc = gc.at[base[:, None] + jnp.arange(9)[None, :]].add(gb)
        Hpp = Hpp.at[obs_pt].add(Hpb)
        gp = gp.at[obs_pt].add(gpb)
        W = W.at[obs_pt[:, None, None],
                 base[:, None, None] + jnp.arange(9)[None, :, None],
                 jnp.arange(3)[None, None, :]].add(Wb)
        total = total + jnp.sum(jnp.where(obs_inlier, huber_cost(chi2, HUBER2_MONO), 0.0))

        # ---- preintegration ternary edges (PVR_i, PVR_j, Bias_i) ----
        nsi = jax.tree_util.tree_map(lambda a: a[pre_i], kf)
        nsj = jax.tree_util.tree_map(lambda a: a[pre_j], kf)
        rp, J_i, J_j, J_b = factors.preint_pvr(
            nsi.p, nsi.v, nsi.R, nsj.p, nsj.v, nsj.R, nsi.dbg, nsi.dba,
            pre.dP, pre.dV, pre.dR, pre.J_P_bg, pre.J_P_ba,
            pre.J_V_bg, pre.J_V_ba, pre.J_R_bg, dT, gravity,
        )
        chi2p = jnp.einsum("ei,eij,ej->e", rp, info_pvr, rp, precision=_HI)
        wp = huber_weight(chi2p, HUBER2_PVR) if robust else jnp.ones_like(chi2p)
        wp = wp * pre_mask.astype(dtype)
        # assemble per-edge stacked jacobian over 3 blocks:
        # cols: [pvr_i(9) at pre_i*15, pvr_j(9) at pre_j*15, bias_i(6) at pre_i*15+9]
        J_i = J_i * free_kf[pre_i].astype(dtype)[:, None, None]
        J_j = J_j * free_kf[pre_j].astype(dtype)[:, None, None]
        J_b = J_b * free_kf[pre_i].astype(dtype)[:, None, None]
        WJ = jnp.einsum("eij,e->eij", info_pvr, wp, precision=_HI)

        def add_pair(Hcc, gc, Ja, base_a, Jb_, base_b):
            blk = jnp.einsum("emi,emn,enj->eij", Ja, WJ, Jb_, precision=_HI)
            ia = base_a[:, None, None] + jnp.arange(Ja.shape[-1])[None, :, None]
            jb = base_b[:, None, None] + jnp.arange(Jb_.shape[-1])[None, None, :]
            return Hcc.at[ia, jb].add(blk), gc

        bi = pre_i * 15
        bj = pre_j * 15
        bbi = pre_i * 15 + 9
        for (Ja, ba) in ((J_i, bi), (J_j, bj), (J_b, bbi)):
            for (Jb_, bb) in ((J_i, bi), (J_j, bj), (J_b, bbi)):
                Hcc, gc = add_pair(Hcc, gc, Ja, ba, Jb_, bb)
            gblk = jnp.einsum("emi,emn,en->ei", Ja, WJ, rp, precision=_HI)
            gc = gc.at[ba[:, None] + jnp.arange(Ja.shape[-1])[None, :]].add(gblk)
        total = total + jnp.sum(jnp.where(pre_mask, huber_cost(chi2p, HUBER2_PVR), 0.0))

        # ---- bias random-walk edges along the same (i, j) pairs ----
        rb, J_bi, J_bj = factors.bias_walk(
            nsi.dbg, nsi.dba, nsj.dbg, nsj.dba, nsi.bg, nsi.ba, nsj.bg, nsj.ba
        )
        chi2b = jnp.sum(rb * rb * rw_diag, axis=-1)
        wb = (huber_weight(chi2b, HUBER2_BIAS) if robust else jnp.ones_like(chi2b)) * pre_mask.astype(dtype)
        J_bi = J_bi * free_kf[pre_i].astype(dtype)[:, None, None]
        J_bj = J_bj * free_kf[pre_j].astype(dtype)[:, None, None]
        WJb = rw_diag * wb[:, None]  # diagonal info [E, 6]
        for (Ja, ba) in ((J_bi, bbi), (J_bj, pre_j * 15 + 9)):
            for (Jb_, bb) in ((J_bi, bbi), (J_bj, pre_j * 15 + 9)):
                blk = jnp.einsum("emi,em,emj->eij", Ja, WJb, Jb_, precision=_HI)
                ia = ba[:, None, None] + jnp.arange(6)[None, :, None]
                jb = bb[:, None, None] + jnp.arange(6)[None, None, :]
                Hcc = Hcc.at[ia, jb].add(blk)
            gblk = jnp.einsum("emi,em,em->ei", Ja, WJb, rb, precision=_HI)
            gc = gc.at[ba[:, None] + jnp.arange(6)[None, :]].add(gblk)
        total = total + jnp.sum(jnp.where(pre_mask, huber_cost(chi2b, HUBER2_BIAS), 0.0))

        # ---- per-KF pressure depth priors ----
        rd, Jd = factors.depth_prior(kf.p, depth_meas)        # [K, 1], [K, 1, 9]
        chi2d = rd[:, 0] ** 2 * depth_info
        wd = (huber_weight(chi2d, HUBER2_DEPTH) if robust else jnp.ones_like(chi2d))
        wd = wd * depth_info * free_kf.astype(dtype)
        bK = jnp.arange(K) * 15
        blk = jnp.einsum("kmi,k,kmj->kij", Jd, wd, Jd, precision=_HI)
        ia = bK[:, None, None] + jnp.arange(9)[None, :, None]
        jb = bK[:, None, None] + jnp.arange(9)[None, None, :]
        Hcc = Hcc.at[ia, jb].add(blk)
        gc = gc.at[bK[:, None] + jnp.arange(9)[None, :]].add(
            jnp.einsum("kmi,k,km->ki", Jd, wd, rd, precision=_HI)
        )
        total = total + jnp.sum(jnp.where(depth_info > 0, huber_cost(chi2d, HUBER2_DEPTH), 0.0))

        # gauge: identity on fixed/invalid pose slots
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

    def lm_rounds(state, obs_inlier, robust, iters):
        def body(carry, _):
            st, lam, chi2 = carry
            (Hcc, gc, Hpp, gp, W), _ = build(st, obs_inlier, robust)
            dc, dp = _schur_step(Hcc, gc, Hpp, gp, W, lam, pt_free)
            st_new = retract(st, dc, dp)
            _, chi2_new = build(st_new, obs_inlier, robust)
            accept = chi2_new < chi2
            st_out = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), st, st_new)
            lam_out = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            return (st_out, lam_out, jnp.where(accept, chi2_new, chi2)), None

        _, chi2_0 = build(state, obs_inlier, robust)
        (st, _, _), _ = jax.lax.scan(
            body, (state, jnp.asarray(1e-4, dtype), chi2_0), None, length=iters
        )
        return st

    state = (kf_ns, pts_w)
    for rnd in range(rounds):
        robust = rnd < rounds - 1
        # a landmark moves only with >= 2 live observations — with one, its
        # 3x3 Hessian block is singular along the viewing ray and the Schur
        # inverse would inject garbage (g2o avoids this because such points
        # never enter the reference's BA graphs)
        n_obs = jnp.zeros((P,), jnp.int32).at[obs_pt].add(obs_in.astype(jnp.int32))
        pt_free = pt_valid & (n_obs >= 2)
        state = lm_rounds(state, obs_in, robust, n_iters)
        # re-gate observations by chi2 + positive depth
        kf, pts = state
        r, _, _ = _reproj_blocks_navstate(
            kf, pts, obs_kf, obs_pt, obs_uv, None, Rcb, tcb, fx, fy, cx, cy
        )
        chi2 = jnp.sum(r * r, -1) * obs_inv_sigma2
        Rbw = jnp.swapaxes(kf.R[obs_kf], -1, -2)
        pc_z = (mv(Rcb, mv(Rbw, pts[obs_pt] - kf.p[obs_kf])) + tcb)[..., 2]
        obs_in = obs_mask & (chi2 <= CHI2_MONO) & (pc_z > 0)

    kf, pts = state
    return kf, pts, obs_in


@functools.partial(jax.jit, static_argnames=("n_iters", "rounds"))
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
):
    """Visual-only window/global BA over SE3 camera poses Tcw.
    Returns (kf_R', kf_t', pts_w', obs_inlier)."""
    dtype = pts_w.dtype
    K = kf_R.shape[0]
    P = pts_w.shape[0]
    C = K * 6
    free_kf = kf_valid & ~kf_fixed
    obs_in = obs_mask

    def build(state, obs_inlier, robust):
        (R, t, pts) = state
        r, J_pose, J_pt = factors.reproj_se3(
            R[obs_kf], t[obs_kf], pts[obs_pt], obs_uv, fx, fy, cx, cy
        )
        chi2 = jnp.sum(r * r, -1) * obs_inv_sigma2
        wo = huber_weight(chi2, HUBER2_MONO) if robust else jnp.ones_like(chi2)
        wo = wo * obs_inv_sigma2 * obs_inlier.astype(dtype)
        J_pose = J_pose * free_kf[obs_kf].astype(dtype)[:, None, None]
        J_pt = J_pt * pt_free[obs_pt].astype(dtype)[:, None, None]

        JW = J_pose * wo[:, None, None]
        Hb = jnp.einsum("omi,omj->oij", JW, J_pose, precision=_HI)
        gb = jnp.einsum("omi,om->oi", JW, r, precision=_HI)
        Hpb = jnp.einsum("omi,omj->oij", J_pt * wo[:, None, None], J_pt, precision=_HI)
        gpb = jnp.einsum("omi,om->oi", J_pt * wo[:, None, None], r, precision=_HI)
        Wb = jnp.einsum("omi,omj->oij", JW, J_pt, precision=_HI)

        Hcc = jnp.zeros((C, C), dtype)
        gc = jnp.zeros((C,), dtype)
        base = obs_kf * 6
        ii = base[:, None, None] + jnp.arange(6)[None, :, None]
        jj = base[:, None, None] + jnp.arange(6)[None, None, :]
        Hcc = Hcc.at[ii, jj].add(Hb)
        gc = gc.at[base[:, None] + jnp.arange(6)[None, :]].add(gb)
        Hpp = jnp.zeros((P, 3, 3), dtype).at[obs_pt].add(Hpb)
        gp = jnp.zeros((P, 3), dtype).at[obs_pt].add(gpb)
        W = jnp.zeros((P, C, 3), dtype).at[
            obs_pt[:, None, None],
            base[:, None, None] + jnp.arange(6)[None, :, None],
            jnp.arange(3)[None, None, :],
        ].add(Wb)

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

    def lm_rounds(state, obs_inlier, robust, iters):
        def body(carry, _):
            st, lam, chi2 = carry
            (Hcc, gc, Hpp, gp, W), _ = build(st, obs_inlier, robust)
            dc, dp = _schur_step(Hcc, gc, Hpp, gp, W, lam, pt_free)
            st_new = retract(st, dc, dp)
            _, chi2_new = build(st_new, obs_inlier, robust)
            accept = chi2_new < chi2
            st_out = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), st, st_new)
            lam_out = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            return (st_out, lam_out, jnp.where(accept, chi2_new, chi2)), None

        _, chi2_0 = build(state, obs_inlier, robust)
        (st, _, _), _ = jax.lax.scan(
            body, (state, jnp.asarray(1e-4, dtype), chi2_0), None, length=iters
        )
        return st

    state = (kf_R, kf_t, pts_w)
    for rnd in range(rounds):
        robust = rnd < rounds - 1
        n_obs = jnp.zeros((P,), jnp.int32).at[obs_pt].add(obs_in.astype(jnp.int32))
        pt_free = pt_valid & (n_obs >= 2)  # see local_ba_navstate note
        state = lm_rounds(state, obs_in, robust, n_iters)
        R, t, pts = state
        r, _, _ = factors.reproj_se3(R[obs_kf], t[obs_kf], pts[obs_pt], obs_uv, fx, fy, cx, cy)
        chi2 = jnp.sum(r * r, -1) * obs_inv_sigma2
        pc_z = (mv(R[obs_kf], pts[obs_pt]) + t[obs_kf])[..., 2]
        obs_in = obs_mask & (chi2 <= CHI2_MONO) & (pc_z > 0)

    R, t, pts = state
    return R, t, pts, obs_in
