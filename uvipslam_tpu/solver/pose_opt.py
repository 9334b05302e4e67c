"""Pose-only optimizations (visual and visual-inertial tracking solves).

TPU-native equivalents of:
  * Optimizer::PoseOptimization(Frame*) — motion-only BA: 4 rounds x 10
    LM iters, chi2(5.991) outlier gating between rounds, Huber kernel
    dropped in the final rounds (reference: src/Optimizer.cc:2012-2145);
  * Optimizer::PoseOptimization(F, lastKF/lastF, preint, gw, ...) — the
    15-dof VI solve with preintegration + bias + depth + marginal-prior
    factors and posterior covariance extraction
    (reference: src/Optimizer.cc:319-777 and :779-1103).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.lie import mm, mv
from uvipslam_tpu.core.state import NavState
from uvipslam_tpu.solver import factors
from uvipslam_tpu.solver.gn import (
    inv_spd_scaled, accumulate_normal_eqs, huber_cost, huber_weight,
    lm_solve, robust_weight as _rw, solve_spd)

_HI = jax.lax.Precision.HIGHEST
CHI2_MONO = 5.991
HUBER2_MONO = 5.991
HUBER2_PVR = 21.666
HUBER2_BIAS = 16.812
HUBER2_PRIOR = 30.5779
HUBER2_DEPTH = 16.812


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_optimization_se3(
    Rcw0: jax.Array,
    tcw0: jax.Array,
    pts_w: jax.Array,      # [N, 3] matched map points
    uvs: jax.Array,        # [N, 2] undistorted pixel observations
    valid: jax.Array,      # [N] bool
    inv_sigma2: jax.Array, # [N] per-obs information (1/sigma^2 by octave)
    fx, fy, cx, cy,
    rounds: int = 4,
    iters: int = 10,
):
    """Motion-only BA of one camera pose against fixed map points.

    Returns (Rcw, tcw, inlier [N] bool, n_inliers). Replicates the
    reference's alternating optimize/re-gate structure with fixed shapes:
    each round re-classifies ALL edges by chi2 (outliers can return, as
    in the reference's level-0/level-1 edge toggling).
    """
    dtype = tcw0.dtype
    inlier = valid

    def make_residual_fn(inlier_mask, delta2):
        def residual_fn(x):
            Rcw, tcw = x
            r, Jp, _ = factors.reproj_se3(Rcw, tcw, pts_w, uvs, fx, fy, cx, cy)
            chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
            w = huber_weight(chi2, delta2)
            w = w * inv_sigma2 * inlier_mask.astype(dtype)
            H, g = accumulate_normal_eqs(Jp, r, w)
            total = jnp.sum(jnp.where(inlier_mask, huber_cost(chi2, delta2), 0.0))
            return H, g, total
        return residual_fn

    def retract(x, dx):
        Rcw, tcw = x
        dR, dt = lie.se3_exp(dx)
        # re-orthonormalize: thousands of f32 compositions otherwise decay
        # the rotation (det drifts percent-level) and shear the projection
        return lie.normalize_rotation(mm(dR, Rcw)), mv(dR, tcw) + dt

    # Graduated non-convexity: the Huber kernel saturates mispredicted-but-
    # correct edges at the start, which can freeze the solve in a local
    # minimum even with ZERO true outliers (verified empirically). Anneal
    # the kernel width across rounds so early rounds see a near-quadratic
    # surface and later rounds tighten to the reference's delta. Gating
    # between rounds uses a loose 4x chi2 so saturated-but-consistent
    # edges survive until the pose is close; only the final gate is strict.
    # The final round ALWAYS tightens to the reference delta so a shortened
    # schedule (rounds=2) still ends at the true kernel.
    delta_scale = (16.0, 4.0, 1.0, 1.0)
    d2s = jnp.asarray(
        [HUBER2_MONO * (delta_scale[min(r, len(delta_scale) - 1)]
                        if r < rounds - 1 else 1.0) for r in range(rounds)],
        dtype)
    gates = jnp.asarray(
        [CHI2_MONO if r == rounds - 1 else 4.0 * CHI2_MONO
         for r in range(rounds)], dtype)

    # rounds as a lax.scan over (delta2, gate): ONE copy of the LM body in
    # the compiled module instead of `rounds` unrolled copies (the per-
    # frame solvers are instantiated many times across the tracker's
    # branches — module size is compile time)
    def round_body(carry, xs):
        x, inlier = carry
        d2, gate = xs
        x, _ = lm_solve(x, make_residual_fn(inlier, d2), retract, n_iters=iters)
        Rcw, tcw = x
        r, _, _ = factors.reproj_se3(Rcw, tcw, pts_w, uvs, fx, fy, cx, cy)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        # positive depth requirement as in the reference's isDepthPositive
        pc_z = (mv(Rcw, pts_w) + tcw)[..., 2]
        inlier = valid & (chi2 <= gate) & (pc_z > 0)
        return (x, inlier), None

    (x, inlier), _ = jax.lax.scan(
        round_body, ((Rcw0, tcw0), inlier), (d2s, gates))
    return x[0], x[1], inlier, jnp.sum(inlier)


@functools.partial(jax.jit, static_argnames=("rounds", "iters", "use_prior", "use_depth"))
def pose_optimization_vi(
    ns0: NavState,           # current-frame NavState initial guess
    ns_ref: NavState,        # reference state (last KF or last frame), FIXED
    preint,                  # PreintState between ref and current
    pts_w: jax.Array,        # [N, 3]
    uvs: jax.Array,          # [N, 2]
    valid: jax.Array,        # [N]
    inv_sigma2: jax.Array,   # [N]
    gravity: jax.Array,      # [3] world gravity vector
    Rcb: jax.Array, tcb: jax.Array,
    fx, fy, cx, cy,
    gyr_bias_rw2: float, acc_bias_rw2: float,
    prior_ns: NavState | None = None,
    prior_info: jax.Array | None = None,   # [15, 15]
    depth_meas: jax.Array | None = None,   # scalar
    depth_info: jax.Array | None = None,   # scalar 1/sigma^2
    rounds: int = 4,
    iters: int = 10,
    use_prior: bool = False,
    use_depth: bool = False,
):
    """15-dof VI(P) tracking solve for the current frame.

    Vertices: current PVR (9) + current Bias (6); the reference state is
    fixed. Edges: N reprojection (pose-only), 1 preintegration ternary
    (w/ fixed ref), 1 bias random walk, optional 15-dof marginal prior,
    optional pressure-depth unary
    (reference: src/Optimizer.cc:319-777 builds exactly this graph).

    Returns (ns_opt, inlier [N], n_inliers, H_post [15, 15]) where H_post
    is the posterior information of [PVR, Bias] — the marginal prior for
    the next frame (reference: computeMarginals at :743-762).
    """
    dtype = ns0.p.dtype
    dTij = preint.dt
    # preintegration information: inverse of 9x9 covariance
    cov = preint.cov + jnp.eye(9, dtype=dtype) * 1e-8
    info_pvr = inv_spd_scaled(cov)
    info_bias = jnp.diag(
        jnp.concatenate([
            jnp.full((3,), 1.0 / jnp.maximum(gyr_bias_rw2 * dTij, 1e-12), dtype),
            jnp.full((3,), 1.0 / jnp.maximum(acc_bias_rw2 * dTij, 1e-12), dtype),
        ])
    )

    inlier = valid

    def unpack(x):
        return NavState(
            p=x[0], v=x[1], R=x[2],
            bg=ns0.bg, ba=ns0.ba, dbg=x[3], dba=x[4],
        )

    def pack(ns):
        return (ns.p, ns.v, ns.R, ns.dbg, ns.dba)

    def residual_fn_builder(inlier_mask, robust):
        def residual_fn(x):
            ns = unpack(x)
            H = jnp.zeros((15, 15), dtype)
            g = jnp.zeros((15,), dtype)
            total = jnp.asarray(0.0, dtype)

            # --- reprojection edges (cols 0:9) ---
            r, Jp, _ = factors.reproj_navstate(
                ns.p, ns.R, pts_w, uvs, Rcb, tcb, fx, fy, cx, cy
            )
            chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
            w = _rw(chi2, HUBER2_MONO, robust)
            w = w * inv_sigma2 * inlier_mask.astype(dtype)
            Hv, gv = accumulate_normal_eqs(Jp, r, w)
            H = H.at[:9, :9].add(Hv)
            g = g.at[:9].add(gv)
            total = total + jnp.sum(jnp.where(inlier_mask, huber_cost(chi2, HUBER2_MONO), 0.0))

            # --- preintegration edge: connects (PVR_ref fixed, PVR_cur,
            #     Bias_ref fixed) exactly as the reference frame-to-frame
            #     graph (src/Optimizer.cc:319-777): the bias correction in
            #     the residual is the FIXED reference delta-bias, so only
            #     J_j (current PVR) enters the solve ---
            rp, J_i, J_j, J_b = factors.preint_pvr(
                ns_ref.p, ns_ref.v, ns_ref.R, ns.p, ns.v, ns.R,
                ns_ref.dbg, ns_ref.dba,
                preint.dP, preint.dV, preint.dR,
                preint.J_P_bg, preint.J_P_ba, preint.J_V_bg, preint.J_V_ba,
                preint.J_R_bg, dTij, gravity,
            )
            chi2_p = rp @ info_pvr @ rp
            wp = _rw(chi2_p, HUBER2_PVR, robust)
            Jfull = jnp.concatenate([J_j, jnp.zeros((9, 6), dtype)], axis=-1)  # [9, 15]
            JW = (Jfull.T * wp) @ info_pvr
            H = H + JW @ Jfull
            g = g + JW @ rp
            total = total + huber_cost(chi2_p, HUBER2_PVR)

            # --- bias random-walk edge vs reference bias ---
            rb, _, J_bj = factors.bias_walk(
                ns_ref.dbg, ns_ref.dba, ns.dbg, ns.dba,
                ns_ref.bg, ns_ref.ba, ns.bg, ns.ba,
            )
            chi2_b = rb @ info_bias @ rb
            wb = _rw(chi2_b, HUBER2_BIAS, robust)
            Jb_full = jnp.zeros((6, 15), dtype).at[:, 9:15].set(J_bj)
            JWb = (Jb_full.T * wb) @ info_bias
            H = H + JWb @ Jb_full
            g = g + JWb @ rb
            total = total + huber_cost(chi2_b, HUBER2_BIAS)

            # --- marginal prior ---
            if use_prior:
                rpr, J_pvr, J_bias = factors.prior_pvr_bias(
                    ns.p, ns.v, ns.R, ns.dbg, ns.dba,
                    prior_ns.p, prior_ns.v, prior_ns.R, prior_ns.dbg, prior_ns.dba,
                )
                chi2_pr = rpr @ prior_info @ rpr
                wpr = _rw(chi2_pr, HUBER2_PRIOR, robust)
                Jpr = jnp.concatenate([J_pvr, J_bias], axis=-1)  # [15, 15]
                JWpr = (Jpr.T * wpr) @ prior_info
                H = H + JWpr @ Jpr
                g = g + JWpr @ rpr
                total = total + huber_cost(chi2_pr, HUBER2_PRIOR)

            # --- pressure depth ---
            if use_depth:
                rd, Jd = factors.depth_prior(ns.p, depth_meas)
                chi2_d = (rd[0] ** 2) * depth_info
                wd = _rw(chi2_d, HUBER2_DEPTH, robust)
                Jd_full = jnp.zeros((1, 15), dtype).at[:, :9].set(Jd)
                H = H + (Jd_full.T * (wd * depth_info)) @ Jd_full
                g = g + (Jd_full.T * (wd * depth_info) @ rd)
                total = total + huber_cost(chi2_d, HUBER2_DEPTH)

            return H, g, total
        return residual_fn

    def retract(x, dx):
        ns = unpack(x)
        ns = ns.inc_small_pvr(dx[0:9]).inc_small_bias(dx[9:15])
        return pack(ns)

    def round_body(carry, robust):
        x, inlier = carry
        x, _ = lm_solve(x, residual_fn_builder(inlier, robust), retract, n_iters=iters)
        ns = unpack(x)
        r, _, _ = factors.reproj_navstate(ns.p, ns.R, pts_w, uvs, Rcb, tcb, fx, fy, cx, cy)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        Rbw = jnp.swapaxes(ns.R, -1, -2)
        pc_z = (mv(Rcb, mv(Rbw, pts_w - ns.p)) + tcb)[..., 2]
        inlier = valid & (chi2 <= CHI2_MONO) & (pc_z > 0)
        return (x, inlier), None

    robust_sched = jnp.asarray(
        [1.0 if r < rounds - 1 else 0.0 for r in range(rounds)], dtype)
    (x, inlier), _ = jax.lax.scan(round_body, (pack(ns0), inlier), robust_sched)

    ns_out = unpack(x)
    H_post, _, _ = residual_fn_builder(inlier, jnp.asarray(0.0, dtype))(x)
    return ns_out, inlier, jnp.sum(inlier), H_post


@functools.partial(jax.jit, static_argnames=("rounds", "iters", "use_depth"))
def pose_optimization_vi2(
    ns_prev: NavState,        # previous-frame posterior (prior mean)
    ns_cur: NavState,         # current-frame initial guess (IMU predict)
    prior_info: jax.Array,    # [15, 15] marginal information of ns_prev
    preint,                   # PreintState prev -> cur
    # current-frame reprojection set
    pts_w: jax.Array, uvs: jax.Array, valid: jax.Array, inv_sigma2: jax.Array,
    gravity: jax.Array,
    Rcb: jax.Array, tcb: jax.Array,
    fx, fy, cx, cy,
    gyr_bias_rw2: float, acc_bias_rw2: float,
    depth_meas: jax.Array | None = None,     # scalar (at frame j time)
    depth_info: jax.Array | None = None,     # scalar 1/sigma^2 (0 disables)
    depth_shi: jax.Array | None = None,      # interp factor in [0,1]
    rounds: int = 3,
    iters: int = 8,
    use_depth: bool = False,
):
    """Frame-to-frame marginalized VI(P) solve: optimizes BOTH the
    previous and current NavStates (30 dof) like the reference's
    PoseOptimization(F, lastF, ...) (reference: src/Optimizer.cc:319-777):

      vertices: PVR_prev, Bias_prev, PVR_cur, Bias_cur
      edges:    15-dof marginal prior on (PVR_prev, Bias_prev) — this is
                the ONLY vision information on the previous state: its
                own reprojection edges were already folded into the
                marginal when it was the current frame (re-adding them
                would double-count and over-smooth the filter)
                N reprojections on PVR_cur
                preintegration ternary (PVR_prev, PVR_cur, Bias_prev)
                bias random walk (Bias_prev, Bias_cur)
                depth-projected ternary (PVR_prev, PVR_cur, Bias_prev) —
                the paper's pressure factor
                (reference: EdgeNavStateDepthProjected,
                src/IMU/g2otypes.cpp:292-392)

    Returns (ns_cur_opt, inlier [N], n_inliers, H_marg [15, 15]) where
    H_marg is the Schur marginal information of the CURRENT state — the
    next frame's prior (reference: computeMarginals, :743-762).
    """
    dtype = ns_cur.p.dtype
    dTij = preint.dt
    cov = preint.cov + jnp.eye(9, dtype=dtype) * 1e-8
    info_pvr = inv_spd_scaled(cov)
    info_bias = jnp.diag(
        jnp.concatenate([
            jnp.full((3,), 1.0 / jnp.maximum(gyr_bias_rw2 * dTij, 1e-12), dtype),
            jnp.full((3,), 1.0 / jnp.maximum(acc_bias_rw2 * dTij, 1e-12), dtype),
        ])
    )
    shi = jnp.asarray(1.0, dtype) if depth_shi is None else depth_shi
    g_z = gravity[2]

    inlier = valid

    # state layout: [prev dP dV dPhi (0:9), prev dbg dba (9:15),
    #                cur  dP dV dPhi (15:24), cur dbg dba (24:30)]
    def unpack(x):
        pp, pv, pR, pdbg, pdba, cp, cv, cR, cdbg, cdba = x
        nsp = NavState(p=pp, v=pv, R=pR, bg=ns_prev.bg, ba=ns_prev.ba,
                       dbg=pdbg, dba=pdba)
        nsc = NavState(p=cp, v=cv, R=cR, bg=ns_cur.bg, ba=ns_cur.ba,
                       dbg=cdbg, dba=cdba)
        return nsp, nsc

    def pack(nsp, nsc):
        return (nsp.p, nsp.v, nsp.R, nsp.dbg, nsp.dba,
                nsc.p, nsc.v, nsc.R, nsc.dbg, nsc.dba)

    def residual_fn_builder(inl_cur, robust):
        def residual_fn(x):
            nsp, nsc = unpack(x)
            H = jnp.zeros((30, 30), dtype)
            g = jnp.zeros((30,), dtype)
            total = jnp.asarray(0.0, dtype)

            # --- reprojection on cur (cols 15:24) ---
            rc_, Jc_, _ = factors.reproj_navstate(
                nsc.p, nsc.R, pts_w, uvs, Rcb, tcb, fx, fy, cx, cy)
            chi2c = jnp.sum(rc_ * rc_, axis=-1) * inv_sigma2
            wc_ = _rw(chi2c, HUBER2_MONO, robust)
            wc_ = wc_ * inv_sigma2 * inl_cur.astype(dtype)
            Hv, gv = accumulate_normal_eqs(Jc_, rc_, wc_)
            H = H.at[15:24, 15:24].add(Hv)
            g = g.at[15:24].add(gv)
            total = total + jnp.sum(jnp.where(inl_cur, huber_cost(chi2c, HUBER2_MONO), 0.0))

            # --- preintegration ternary ---
            rpre, J_i, J_j, J_b = factors.preint_pvr(
                nsp.p, nsp.v, nsp.R, nsc.p, nsc.v, nsc.R,
                nsp.dbg, nsp.dba,
                preint.dP, preint.dV, preint.dR,
                preint.J_P_bg, preint.J_P_ba, preint.J_V_bg, preint.J_V_ba,
                preint.J_R_bg, dTij, gravity,
            )
            chi2_pre = rpre @ info_pvr @ rpre
            wpre = _rw(chi2_pre, HUBER2_PVR, robust)
            Jfull = jnp.zeros((9, 30), dtype)
            Jfull = Jfull.at[:, 0:9].set(J_i)
            Jfull = Jfull.at[:, 9:15].set(J_b)
            Jfull = Jfull.at[:, 15:24].set(J_j)
            JW = (Jfull.T * wpre) @ info_pvr
            H = H + JW @ Jfull
            g = g + JW @ rpre
            total = total + huber_cost(chi2_pre, HUBER2_PVR)

            # --- bias random walk ---
            rb, J_bi, J_bj = factors.bias_walk(
                nsp.dbg, nsp.dba, nsc.dbg, nsc.dba,
                nsp.bg, nsp.ba, nsc.bg, nsc.ba,
            )
            chi2_b = rb @ info_bias @ rb
            wb = _rw(chi2_b, HUBER2_BIAS, robust)
            Jbf = jnp.zeros((6, 30), dtype)
            Jbf = Jbf.at[:, 9:15].set(J_bi)
            Jbf = Jbf.at[:, 24:30].set(J_bj)
            JWb = (Jbf.T * wb) @ info_bias
            H = H + JWb @ Jbf
            g = g + JWb @ rb
            total = total + huber_cost(chi2_b, HUBER2_BIAS)

            # --- marginal prior on prev ---
            rpr, J_pvr, J_bias = factors.prior_pvr_bias(
                nsp.p, nsp.v, nsp.R, nsp.dbg, nsp.dba,
                ns_prev.p, ns_prev.v, ns_prev.R, ns_prev.dbg, ns_prev.dba,
            )
            chi2_pr = rpr @ prior_info @ rpr
            wpr = _rw(chi2_pr, HUBER2_PRIOR, robust)
            Jpr = jnp.zeros((15, 30), dtype)
            Jpr = Jpr.at[:, 0:9].set(J_pvr)
            Jpr = Jpr.at[:, 9:15].set(J_bias)
            JWpr = (Jpr.T * wpr) @ prior_info
            H = H + JWpr @ Jpr
            g = g + JWpr @ rpr
            total = total + huber_cost(chi2_pr, HUBER2_PRIOR)

            # --- depth-projected ternary (the paper's pressure factor) ---
            if use_depth:
                rd, Jd_i, Jd_j, Jd_b = factors.depth_projected(
                    nsp.p, nsp.v, nsp.R, nsc.p, nsp.dbg, nsp.dba,
                    preint.dP, preint.J_P_bg, preint.J_P_ba, dTij,
                    depth_meas, shi, gravity_z=g_z,
                )
                chi2_d = (rd[0] ** 2) * depth_info
                wd = _rw(chi2_d, HUBER2_DEPTH, robust)
                Jdf = jnp.zeros((1, 30), dtype)
                Jdf = Jdf.at[:, 0:9].set(Jd_i)
                Jdf = Jdf.at[:, 9:15].set(Jd_b)
                Jdf = Jdf.at[:, 15:24].set(Jd_j)
                H = H + (Jdf.T * (wd * depth_info)) @ Jdf
                g = g + (Jdf.T * (wd * depth_info) @ rd)
                total = total + huber_cost(chi2_d, HUBER2_DEPTH)

            return H, g, total
        return residual_fn

    def retract(x, dx):
        nsp, nsc = unpack(x)
        nsp = nsp.inc_small_pvr(dx[0:9]).inc_small_bias(dx[9:15])
        nsc = nsc.inc_small_pvr(dx[15:24]).inc_small_bias(dx[24:30])
        return pack(nsp, nsc)

    def round_body(carry, robust):
        x, inlier = carry
        x, _ = lm_solve(
            x, residual_fn_builder(inlier, robust), retract, n_iters=iters,
        )
        nsp, nsc = unpack(x)
        rc_, _, _ = factors.reproj_navstate(
            nsc.p, nsc.R, pts_w, uvs, Rcb, tcb, fx, fy, cx, cy)
        chi2 = jnp.sum(rc_ * rc_, axis=-1) * inv_sigma2
        Rbw = jnp.swapaxes(nsc.R, -1, -2)
        pc_z = (mv(Rcb, mv(Rbw, pts_w - nsc.p)) + tcb)[..., 2]
        inlier = valid & (chi2 <= CHI2_MONO) & (pc_z > 0)
        return (x, inlier), None

    robust_sched = jnp.asarray(
        [1.0 if r < rounds - 1 else 0.0 for r in range(rounds)], dtype)
    (x, inlier), _ = jax.lax.scan(
        round_body, (pack(ns_prev, ns_cur), inlier), robust_sched)

    nsp, nsc = unpack(x)
    # Schur marginalization of the previous block: the current state's
    # marginal information H_cc - H_cp H_pp^-1 H_pc
    H_full, _, _ = residual_fn_builder(inlier, jnp.asarray(0.0, dtype))(x)
    Hpp = H_full[0:15, 0:15] + jnp.eye(15, dtype=dtype) * 1e-6
    Hcc = H_full[15:30, 15:30]
    Hcp = H_full[15:30, 0:15]
    H_marg = Hcc - Hcp @ inv_spd_scaled(Hpp) @ Hcp.T
    # symmetrize against f32 drift
    H_marg = 0.5 * (H_marg + H_marg.T)
    return nsc, inlier, jnp.sum(inlier), H_marg
