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
from uvipslam_tpu.solver.gn import inv_spd_scaled, accumulate_normal_eqs, huber_cost, huber_weight, lm_solve, solve_spd

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
    delta_scale = (16.0, 4.0, 1.0, 1.0)
    x = (Rcw0, tcw0)
    for rnd in range(rounds):
        d2 = HUBER2_MONO * delta_scale[min(rnd, len(delta_scale) - 1)]
        x, _ = lm_solve(x, make_residual_fn(inlier, d2), retract, n_iters=iters)
        Rcw, tcw = x
        r, _, _ = factors.reproj_se3(Rcw, tcw, pts_w, uvs, fx, fy, cx, cy)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        # positive depth requirement as in the reference's isDepthPositive
        pc_z = (mv(Rcw, pts_w) + tcw)[..., 2]
        gate = CHI2_MONO if rnd == rounds - 1 else 4.0 * CHI2_MONO
        inlier = valid & (chi2 <= gate) & (pc_z > 0)

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
            w = huber_weight(chi2, HUBER2_MONO) if robust else jnp.ones_like(chi2)
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
            wp = huber_weight(chi2_p, HUBER2_PVR) if robust else jnp.asarray(1.0, dtype)
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
            wb = huber_weight(chi2_b, HUBER2_BIAS) if robust else jnp.asarray(1.0, dtype)
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
                wpr = huber_weight(chi2_pr, HUBER2_PRIOR) if robust else jnp.asarray(1.0, dtype)
                Jpr = jnp.concatenate([J_pvr, J_bias], axis=-1)  # [15, 15]
                JWpr = (Jpr.T * wpr) @ prior_info
                H = H + JWpr @ Jpr
                g = g + JWpr @ rpr
                total = total + huber_cost(chi2_pr, HUBER2_PRIOR)

            # --- pressure depth ---
            if use_depth:
                rd, Jd = factors.depth_prior(ns.p, depth_meas)
                chi2_d = (rd[0] ** 2) * depth_info
                wd = huber_weight(chi2_d, HUBER2_DEPTH) if robust else jnp.asarray(1.0, dtype)
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

    x = pack(ns0)
    for rnd in range(rounds):
        robust = rnd < rounds - 1
        x, _ = lm_solve(x, residual_fn_builder(inlier, robust), retract, n_iters=iters)
        ns = unpack(x)
        r, _, _ = factors.reproj_navstate(ns.p, ns.R, pts_w, uvs, Rcb, tcb, fx, fy, cx, cy)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        Rbw = jnp.swapaxes(ns.R, -1, -2)
        pc_z = (mv(Rcb, mv(Rbw, pts_w - ns.p)) + tcb)[..., 2]
        inlier = valid & (chi2 <= CHI2_MONO) & (pc_z > 0)

    ns_out = unpack(x)
    H_post, _, _ = residual_fn_builder(inlier, False)(x)
    return ns_out, inlier, jnp.sum(inlier), H_post
