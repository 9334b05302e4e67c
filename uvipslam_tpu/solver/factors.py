"""Residuals and analytic Jacobians for every factor type.

TPU-native equivalent of the reference's custom g2o types
(reference: src/IMU/g2otypes.{h,cpp}) and the stock SBA/Sim3 types it
uses from g2o. Each factor is a plain function returning residuals and
Jacobian blocks w.r.t. its vertices' local (manifold) increments; all
batch over a leading edge dimension and are vmap/jit-safe.

Conventions
-----------
* NavState PVR increment (Forster RSS'15 / reference VertexNavStatePVR):
  P <- P + R dP ; V <- V + dV ; R <- R Exp(dPhi).  Error order [rP, rV, rPhi].
* Bias increment: [d(dbg), d(dba)].
* SE3 camera pose Tcw increment (visual-only BA): left-multiplicative,
  Tcw <- Exp([rho, phi]) Tcw.
* Reprojection residual = observed_uv - projected_uv (undistorted pixel
  space, ideal pinhole with fx, fy, cx, cy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.lie import mm, mv


# ---------------------------------------------------------------------------
# reprojection factors
# ---------------------------------------------------------------------------


def reproj_se3(
    Rcw: jax.Array, tcw: jax.Array, pw: jax.Array, uv: jax.Array,
    fx, fy, cx, cy,
):
    """Visual reprojection w.r.t. an SE3 camera pose and a world point.

    Batched over leading dims of (pw, uv). Returns
    (r [.., 2], J_pose [.., 2, 6] for [rho, phi], J_point [.., 2, 3]).
    (reference: g2o EdgeSE3ProjectXYZ used by visual BA,
    src/Optimizer.cc:1896-2008.)
    """
    pc = mv(Rcw, pw) + tcw
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / zs
    iz2 = iz * iz

    u = fx * x * iz + cx
    v = fy * y * iz + cy
    r = uv - jnp.stack([u, v], axis=-1)

    # d(uv)/d(pc)
    zero = jnp.zeros_like(x)
    J_uv_pc = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )  # [.., 2, 3]

    # pc = Exp(phi) (Rcw pw + tcw) + rho  =>  d(pc)/d(rho) = I,
    # d(pc)/d(phi) = -hat(pc)
    J_pc_pose = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3)),
            -lie.hat(pc),
        ],
        axis=-1,
    )  # [.., 3, 6]

    # residual = obs - proj => J_r = -J_proj
    J_pose = -mm(J_uv_pc, J_pc_pose)
    J_point = -mm(J_uv_pc, jnp.broadcast_to(Rcw, pc.shape[:-1] + (3, 3)))
    return r, J_pose, J_point


def reproj_navstate(
    p_wb: jax.Array, R_wb: jax.Array, pw: jax.Array, uv: jax.Array,
    Rcb: jax.Array, tcb: jax.Array, fx, fy, cx, cy,
):
    """Visual reprojection through a NavState body pose with body-camera
    extrinsics: pc = Rcb Rwb^T (pw - pwb) + tcb
    (reference: EdgeNavStatePVRPointXYZ, src/IMU/g2otypes.h:207-358).

    Returns (r [.., 2], J_pvr [.., 2, 9], J_point [.., 2, 3]).
    PVR increment convention: P <- P + Rwb dP, R <- Rwb Exp(dphi).
    """
    Rbw = jnp.swapaxes(R_wb, -1, -2)
    pb = mv(Rbw, pw - p_wb)              # point in body frame
    pc = mv(Rcb, pb) + tcb
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / zs
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    r = uv - jnp.stack([u, v], axis=-1)

    zero = jnp.zeros_like(x)
    J_uv_pc = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )

    batch = pc.shape[:-1]
    Rcb_b = jnp.broadcast_to(Rcb, batch + (3, 3))
    # d(pc)/d(pw) = Rcb Rbw
    J_pc_pw = mm(Rcb_b, jnp.broadcast_to(Rbw, batch + (3, 3)))
    # d(pc)/d(dP): pwb <- pwb + Rwb dP => pb changes by -dP => J = -Rcb
    J_pc_dP = -Rcb_b
    # d(pc)/d(dphi): Rwb <- Rwb Exp(dphi) => pb = Exp(-dphi) Rbw (pw-pwb)
    # => d pb = hat(pb) dphi => J = Rcb hat(pb)
    J_pc_dphi = mm(Rcb_b, lie.hat(pb))
    J_pc_pvr = jnp.concatenate(
        [J_pc_dP, jnp.zeros(batch + (3, 3), pc.dtype), J_pc_dphi], axis=-1
    )  # [.., 3, 9]

    J_pvr = -mm(J_uv_pc, J_pc_pvr)
    J_point = -mm(J_uv_pc, J_pc_pw)
    return r, J_pvr, J_point


# ---------------------------------------------------------------------------
# inertial factors (Forster RSS'15, matching the reference exactly)
# ---------------------------------------------------------------------------


def preint_pvr(
    ns_i_p, ns_i_v, ns_i_R, ns_j_p, ns_j_v, ns_j_R, dbg_i, dba_i,
    M_dP, M_dV, M_dR, M_J_P_bg, M_J_P_ba, M_J_V_bg, M_J_V_ba, M_J_R_bg,
    dTij, gravity,
):
    """The 9-dof preintegration ternary edge between PVR_i, PVR_j, Bias_i
    (reference: EdgeNavStatePVR, src/IMU/g2otypes.cpp:8-213).

    Returns (r [.., 9], J_pvr_i [.., 9, 9], J_pvr_j [.., 9, 9],
    J_bias_i [.., 9, 6]). Batched over leading dims.
    """
    dtype = ns_i_p.dtype
    dT2 = dTij * dTij
    RiT = jnp.swapaxes(ns_i_R, -1, -2)

    dp_corr = M_dP + mv(M_J_P_bg, dbg_i) + mv(M_J_P_ba, dba_i)
    dv_corr = M_dV + mv(M_J_V_bg, dbg_i) + mv(M_J_V_ba, dba_i)

    pj_pi = ns_j_p - ns_i_p - ns_i_v * dTij[..., None] - 0.5 * gravity * dT2[..., None]
    rP = mv(RiT, pj_pi) - dp_corr
    vj_vi = ns_j_v - ns_i_v - gravity * dTij[..., None]
    rV = mv(RiT, vj_vi) - dv_corr

    dR_bg = lie.so3_exp(mv(M_J_R_bg, dbg_i))
    rR_mat = mm(jnp.swapaxes(mm(M_dR, dR_bg), -1, -2), mm(RiT, ns_j_R))
    rPhi = lie.so3_log(rR_mat)

    r = jnp.concatenate([rP, rV, rPhi], axis=-1)

    batch = rP.shape[:-1]
    O = jnp.zeros(batch + (3, 3), dtype)
    I = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    JrInv = lie.so3_right_jacobian_inv(rPhi)
    RjT_Ri = mm(jnp.swapaxes(ns_j_R, -1, -2), ns_i_R)

    # J wrt PVR_i  (order rows [rP, rV, rPhi], cols [dP, dV, dPhi])
    J_i = jnp.concatenate(
        [
            jnp.concatenate([-I, -RiT * dTij[..., None, None], lie.hat(mv(RiT, pj_pi))], axis=-1),
            jnp.concatenate([O, -RiT, lie.hat(mv(RiT, vj_vi))], axis=-1),
            jnp.concatenate([O, O, -mm(JrInv, RjT_Ri)], axis=-1),
        ],
        axis=-2,
    )

    # J wrt PVR_j
    J_j = jnp.concatenate(
        [
            jnp.concatenate([mm(RiT, ns_j_R), O, O], axis=-1),
            jnp.concatenate([O, RiT, O], axis=-1),
            jnp.concatenate([O, O, JrInv], axis=-1),
        ],
        axis=-2,
    )

    # J wrt Bias_i: [dbg, dba]
    ExpRPhiT = jnp.swapaxes(lie.so3_exp(rPhi), -1, -2)
    JrBiasCorr = lie.so3_right_jacobian(mv(M_J_R_bg, dbg_i))
    J_rPhi_dbg = -mm(mm(mm(JrInv, ExpRPhiT), JrBiasCorr), M_J_R_bg)
    J_b = jnp.concatenate(
        [
            jnp.concatenate([-M_J_P_bg, -M_J_P_ba], axis=-1),
            jnp.concatenate([-M_J_V_bg, -M_J_V_ba], axis=-1),
            jnp.concatenate([J_rPhi_dbg, O], axis=-1),
        ],
        axis=-2,
    )
    return r, J_i, J_j, J_b


def bias_walk(dbg_i, dba_i, dbg_j, dba_j, bg_i, ba_i, bg_j, ba_j):
    """Bias random-walk binary edge (reference: EdgeNavStateBias,
    src/IMU/g2otypes.cpp:215-263): r = (b_j + db_j) - (b_i + db_i).
    Returns (r [.., 6], J_i = -I6, J_j = I6)."""
    rG = (bg_j + dbg_j) - (bg_i + dbg_i)
    rA = (ba_j + dba_j) - (ba_i + dba_i)
    r = jnp.concatenate([rG, rA], axis=-1)
    batch = r.shape[:-1]
    I6 = jnp.broadcast_to(jnp.eye(6, dtype=r.dtype), batch + (6, 6))
    return r, -I6, I6


def depth_prior(ns_p, depth_meas):
    """Unary pressure-depth prior on the z coordinate
    (reference: EdgeNavStateDepth, src/IMU/g2otypes.cpp:265-290;
    note the reference uses r = |depth - z| with J = e_z — we keep the
    signed residual, which has the same chi2 and a consistent Jacobian).
    Returns (r [.., 1], J_pvr [.., 1, 9])."""
    r = (depth_meas - ns_p[..., 2])[..., None]
    batch = r.shape[:-1]
    J = jnp.zeros(batch + (1, 9), ns_p.dtype)
    # z changes by (R dP)_z; reference approximates J with e_z directly
    J = J.at[..., 0, 2].set(-1.0)
    return r, J


def depth_projected(
    ns_i_p, ns_i_v, ns_i_R, ns_j_p, dbg_i, dba_i,
    M_dP, M_J_P_bg, M_J_P_ba, dTij, depth_meas, shi, gravity_z: float = 9.81,
):
    """The paper's ternary pressure factor (reference:
    EdgeNavStateDepthProjected, src/IMU/g2otypes.cpp:292-392):
    time-interpolates the depth measurement between states i and j with
    factor `shi`, and penalizes disagreement both with state j's z and
    with the IMU-propagated z from state i.

      projected = shi*(d - z_i) + z_i
      r = (projected - z_j) + (projected - z_pred)      [summed, 1-dof]
      z_pred = (P_i + dT V_i + dT^2 * g_vec + R_i (dP + J db))_z

    Returns (r [.., 1], J_pvr_i [.., 1, 9], J_pvr_j [.., 1, 9],
    J_bias_i [.., 1, 6]). Matches the reference's analytic Jacobians.
    """
    dtype = ns_i_p.dtype
    dT2 = dTij * dTij
    z_i = ns_i_p[..., 2]
    projected = shi * (depth_meas - z_i) + z_i

    dp_corr = M_dP + mv(M_J_P_bg, dbg_i) + mv(M_J_P_ba, dba_i)
    gvec = jnp.zeros_like(ns_i_p).at[..., 2].set(gravity_z)
    p_pred = ns_i_p + ns_i_v * dTij[..., None] + gvec * dT2[..., None] + mv(ns_i_R, dp_corr)

    r1 = projected - ns_j_p[..., 2]
    r2 = projected - p_pred[..., 2]
    r = (r1 + r2)[..., None]

    batch = r.shape[:-1]
    e3 = jnp.zeros((3,), dtype).at[2].set(1.0)

    J_i = jnp.zeros(batch + (1, 9), dtype)
    J_i = J_i.at[..., 0, 2].set(2.0 * (1.0 - shi) - 1.0)
    J_i = J_i.at[..., 0, 5].set(-dTij)
    RJ = lie.hat(mv(ns_i_R, dp_corr))
    J_i = J_i.at[..., 0, 6:9].set(mv(jnp.swapaxes(RJ, -1, -2), jnp.broadcast_to(e3, batch + (3,))))

    J_j = jnp.zeros(batch + (1, 9), dtype)
    J_j = J_j.at[..., 0, 2].set(-1.0)

    Rig = -mm(ns_i_R, M_J_P_bg)
    Ria = -mm(ns_i_R, M_J_P_ba)
    J_b = jnp.concatenate(
        [
            mv(jnp.swapaxes(Rig, -1, -2), jnp.broadcast_to(e3, batch + (3,))),
            mv(jnp.swapaxes(Ria, -1, -2), jnp.broadcast_to(e3, batch + (3,))),
        ],
        axis=-1,
    )[..., None, :]
    return r, J_i, J_j, J_b


def prior_pvr_bias(
    ns_p, ns_v, ns_R, dbg, dba,
    prior_p, prior_v, prior_R, prior_dbg, prior_dba,
):
    """15-dof marginal prior edge on [PVR, Bias]
    (reference: EdgeNavStatePriorPVRBias, src/IMU/g2otypes.h:363-378):
    r = [Rp^T... ] — we use the same error convention as the increments:
      rP = Rp^T (p - p_prior) ... expressed in prior frame:
      rP = prior_R^T (p - prior_p), rV = v - prior_v,
      rPhi = Log(prior_R^T R), rbg/rba = db - prior_db.
    Returns (r [.., 15], J_pvr [.., 15, 9], J_bias [.., 15, 6])."""
    dtype = ns_p.dtype
    RpT = jnp.swapaxes(prior_R, -1, -2)
    rP = mv(RpT, ns_p - prior_p)
    rV = ns_v - prior_v
    rPhi = lie.so3_log(mm(RpT, ns_R))
    rbg = dbg - prior_dbg
    rba = dba - prior_dba
    r = jnp.concatenate([rP, rV, rPhi, rbg, rba], axis=-1)

    batch = rP.shape[:-1]
    O = jnp.zeros(batch + (3, 3), dtype)
    I = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    # dP: p <- p + R dP => drP = RpT R dP
    RpTR = mm(jnp.broadcast_to(RpT, batch + (3, 3)), ns_R)
    JrInv = lie.so3_right_jacobian_inv(rPhi)
    J_pvr = jnp.concatenate(
        [
            jnp.concatenate([RpTR, O, O], axis=-1),
            jnp.concatenate([O, I, O], axis=-1),
            jnp.concatenate([O, O, JrInv], axis=-1),
            jnp.concatenate([O, O, O], axis=-1),
            jnp.concatenate([O, O, O], axis=-1),
        ],
        axis=-2,
    )
    J_bias = jnp.concatenate(
        [
            jnp.zeros(batch + (9, 6), dtype),
            jnp.broadcast_to(jnp.eye(6, dtype=dtype), batch + (6, 6)),
        ],
        axis=-2,
    )
    return r, J_pvr, J_bias


def gyro_bias_edge(R_i, R_j, dR_meas, J_R_bg, bg):
    """Unary gyro-bias edge for VIO init (reference: EdgeGyrBias,
    src/IMU/g2otypes.h:657-698): r = Log((dR Exp(J dbg))^T R_i^T R_j).
    Returns (r [.., 3], J_bg [.., 3, 3])."""
    corr = lie.so3_exp(mv(J_R_bg, bg))
    target = mm(jnp.swapaxes(R_i, -1, -2), R_j)
    rmat = mm(jnp.swapaxes(mm(dR_meas, corr), -1, -2), target)
    r = lie.so3_log(rmat)
    JrInv = lie.so3_right_jacobian_inv(r)
    ExpT = jnp.swapaxes(lie.so3_exp(r), -1, -2)
    Jr_corr = lie.so3_right_jacobian(mv(J_R_bg, bg))
    J = -mm(mm(mm(JrInv, ExpT), Jr_corr), J_R_bg)
    return r, J


def scale_depth_edge(scale, dz_map, dz_meas):
    """1-dof scale-vs-depth edge for pressure-scale init
    (reference: EdgeScaleDepth, src/IMU/g2otypes.h:1418-1440 via
    Optimizer::OptimizeInitialScale): r = |dz_meas| - s * |dz_map|.
    Returns (r [.., 1], J_s [.., 1, 1])."""
    r = (jnp.abs(dz_meas) - scale * jnp.abs(dz_map))[..., None]
    J = (-jnp.abs(dz_map))[..., None, None]
    return r, J


# ---------------------------------------------------------------------------
# Sim3 factors (loop closure)
# ---------------------------------------------------------------------------


def sim3_reproj(
    s, R, t, pw: jax.Array, uv: jax.Array, fx, fy, cx, cy
):
    """Reprojection of a point through a Sim3 (s, R, t): pc = s R pw + t,
    projected ideal-pinhole. Increment: left-multiplicative sim3 exp,
    [rho, phi, sigma]. Used by OptimizeSim3's paired edges
    (reference: src/Optimizer.cc:2660-...).

    Returns (r [.., 2], J_sim3 [.., 2, 7], J_point [.., 2, 3])."""
    pc = s * mv(R, pw) + t
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / zs
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    r = uv - jnp.stack([u, v], axis=-1)

    zero = jnp.zeros_like(x)
    J_uv_pc = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )
    batch = pc.shape[:-1]
    I = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), batch + (3, 3))
    # left-mult sim3: pc' = e^sigma Exp(phi) pc + rho
    # d/drho = I ; d/dphi = -hat(pc) ; d/dsigma = pc
    J_pc_sim3 = jnp.concatenate([I, -lie.hat(pc), pc[..., None]], axis=-1)  # [.., 3, 7]
    J_sim3 = -mm(J_uv_pc, J_pc_sim3)
    s_arr = jnp.asarray(s)
    sR = s_arr[..., None, None] * jnp.broadcast_to(R, batch + (3, 3))
    J_point = -mm(J_uv_pc, sR)
    return r, J_sim3, J_point


def sim3_relative(s_i, R_i, t_i, s_j, R_j, t_j, s_m, R_m, t_m):
    """Sim3-Sim3 pose-graph edge for the essential graph
    (reference: OptimizeEssentialGraph edges, src/Optimizer.cc:2495-2600):
    r = log( S_m * S_i * S_j^{-1} ) where S_i, S_j are world->kf vertex
    estimates and S_m the measured relative Sim3 (S_j->S_i frame).

    Jacobians w.r.t. the left-multiplicative increments of S_i and S_j
    are computed with `jax.jacfwd` (a 7x14 block per edge; the essential
    graph is solved only at loop closures, so autodiff cost is
    irrelevant). Batched over a leading edge dim via vmap inside.
    Returns (r [.., 7], J_i [.., 7, 7], J_j [.., 7, 7])."""

    def r_of(xi, si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
        dsi, dRi, dti = lie.sim3_exp(xi[:7])
        dsj, dRj, dtj = lie.sim3_exp(xi[7:])
        Si = lie.sim3_compose(dsi, dRi, dti, si, Ri, ti)
        Sj = lie.sim3_compose(dsj, dRj, dtj, sj, Rj, tj)
        Sij = lie.sim3_compose(*Si, *lie.sim3_inverse(*Sj))
        E = lie.sim3_compose(sm, Rm, tm, *Sij)
        return lie.sim3_log(*E)

    def one(si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
        xi0 = jnp.zeros((14,), ti.dtype)
        r = r_of(xi0, si, Ri, ti, sj, Rj, tj, sm, Rm, tm)
        J = jax.jacfwd(r_of)(xi0, si, Ri, ti, sj, Rj, tj, sm, Rm, tm)
        return r, J[:, :7], J[:, 7:]

    if jnp.asarray(s_i).ndim == 0:
        return one(s_i, R_i, t_i, s_j, R_j, t_j, s_m, R_m, t_m)
    return jax.vmap(one)(s_i, R_i, t_i, s_j, R_j, t_j, s_m, R_m, t_m)
