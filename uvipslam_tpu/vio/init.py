"""Visual-inertial(-pressure) initialization.

TPU-native equivalent of LocalMapping::TryInitVIO
(reference: src/LocalMapping.cc:89-709) and its optimizer helpers
(OptimizeInitialGyroBias src/Optimizer.cc:1804, OptimizeInitialScale
:2858-3028):

  Step 1  gyro bias by Gauss-Newton over all KF pairs' preintegrated
          rotations (EdgeGyrBias).
  Step 2  (VI mode / Init_mode 1) linear solve for [scale, gravity_w]
          from the position-preintegration identities over KF triplets
          (VI-ORB "map reuse"), then refined [s, dtheta_xy, ba] with
          |g| = 9.81 constrained.
  Step 3  (VIP mode / Init_mode 2-3 — the paper's method) gravity
          direction from the accelerometer average, world-to-gravity
          rotation by SO3 exp, metric SCALE from the pressure depth
          channel (scale-depth edges over 1- and 2-hop KF pairs), then
          a reduced [dtheta_xy, ba] solve with the scale held fixed.

All solves are masked fixed-shape least squares on device; the KF table
batches straight in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.lie import mm, mv
from uvipslam_tpu.solver.factors import gyro_bias_edge

_HI = jax.lax.Precision.HIGHEST
GRAVITY = 9.810


def estimate_gyro_bias(
    kf_R_wb: jax.Array,     # [K, 3, 3] body rotations (vision, via Tbc)
    pre_dR: jax.Array,      # [K, 3, 3] preintegrated dR from prev KF to KF k
    pre_J_R_bg: jax.Array,  # [K, 3, 3]
    pair_mask: jax.Array,   # [K] bool: k valid AND k-1 valid (consecutive)
    n_iters: int = 5,
) -> jax.Array:
    """Gauss-Newton for the 3-dof gyro bias over all consecutive KF pairs
    (reference: Optimizer::OptimizeInitialGyroBias, EdgeGyrBias)."""
    R_i = jnp.roll(kf_R_wb, 1, axis=0)  # previous KF rotation per slot
    # zero-dt preints (e.g. the two bootstrap KFs) carry no information
    w = (pair_mask & (jnp.abs(jnp.trace(pre_dR, axis1=-2, axis2=-1) - 3.0) +
                      jnp.sum(jnp.abs(pre_J_R_bg), (-2, -1)) > 1e-9)).astype(kf_R_wb.dtype)

    def body(bg, _):
        r, J = gyro_bias_edge(R_i, kf_R_wb, pre_dR, pre_J_R_bg, bg)
        Jw = J * w[:, None, None]
        H = jnp.einsum("kmi,kmj->ij", Jw, J, precision=_HI)
        g = jnp.einsum("kmi,km->i", Jw, r, precision=_HI)
        dx = jnp.linalg.solve(H + 1e-8 * jnp.eye(3, dtype=bg.dtype), -g)
        return bg + dx, None

    bg0 = jnp.zeros((3,), kf_R_wb.dtype)
    bg, _ = jax.lax.scan(body, bg0, None, length=n_iters)
    return bg


def gravity_from_accel_average(
    acc_samples: jax.Array,   # [T, 3] raw accelerometer samples (body)
    mask: jax.Array,          # [T]
) -> jax.Array:
    """Gravity direction = mean specific force while quasi-static
    (reference: Tracking::calculate_G, src/Tracking.cc:3062-3071)."""
    w = mask.astype(acc_samples.dtype)[:, None]
    mean = jnp.sum(acc_samples * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    return mean / jnp.maximum(jnp.linalg.norm(mean), 1e-9)


def rotation_to_gravity(g_dir_w: jax.Array) -> jax.Array:
    """R_wi aligning the estimated gravity direction with the canonical
    -z (so world gravity becomes [0, 0, -9.81]; the reference aligns to
    its gI = [0, 0, 9.81] pressure-depth convention — sign handled by the
    caller). (reference: src/LocalMapping.cc:278-292, :383-407)."""
    gI = jnp.asarray([0.0, 0.0, 1.0], g_dir_w.dtype)
    v = jnp.cross(gI, g_dir_w)
    s = jnp.linalg.norm(v)
    c = jnp.dot(gI, g_dir_w)
    ang = jnp.arctan2(s, c)
    axis = v / jnp.where(s < 1e-9, 1.0, s)
    return lie.so3_exp(axis * ang)


def estimate_scale_from_pressure(
    kf_z_map: jax.Array,      # [K] map-frame z of each KF (vision scale)
    kf_depth: jax.Array,      # [K] pressure depth measurement
    kf_mask: jax.Array,       # [K] valid AND has depth
    n_gn_iters: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """The paper's pressure-scale solve (reference:
    Optimizer::OptimizeInitialScale, src/Optimizer.cc:2858-3028):
    1-dof GN over EdgeScaleDepth residuals |d_j - d_i| - s*|z_j - z_i|
    on consecutive (1-hop) and 2-hop KF pairs; also returns the naive
    averaged ratio the reference computes alongside.

    Returns (scale_gn, scale_naive)."""
    dtype = kf_z_map.dtype

    def pairs(hop):
        zi = jnp.roll(kf_z_map, hop)
        di = jnp.roll(kf_depth, hop)
        mi = jnp.roll(kf_mask, hop)
        dz = jnp.abs(kf_z_map - zi)
        dd = jnp.abs(kf_depth - di)
        m = (kf_mask & mi).astype(dtype)
        # roll wraps; kill wrapped pairs
        idx = jnp.arange(kf_z_map.shape[0])
        m = m * (idx >= hop)
        return dz, dd, m

    dz1, dd1, m1 = pairs(1)
    dz2, dd2, m2 = pairs(2)
    dz = jnp.concatenate([dz1, dz2])
    dd = jnp.concatenate([dd1, dd2])
    m = jnp.concatenate([m1, m2])

    # closed-form weighted LS for r = dd - s*dz (equivalent to the
    # reference's 1-iteration GN with info 1/0.01^2)
    denom = jnp.sum(m * dz * dz)
    s_gn = jnp.sum(m * dd * dz) / jnp.maximum(denom, 1e-12)

    # naive average of per-pair ratios over pairs with meaningful dz
    good = m * (dz > 1e-6)
    ratios = jnp.where(dz > 1e-6, dd / jnp.maximum(dz, 1e-6), 0.0)
    s_naive = jnp.sum(good * ratios) / jnp.maximum(jnp.sum(good), 1.0)
    return s_gn, s_naive


def estimate_scale_gravity_linear(
    kf_p_c: jax.Array,     # [K, 3] camera centers in vision frame
    kf_R_wb: jax.Array,    # [K, 3, 3] body rotations (vision frame)
    pre_dP: jax.Array,     # [K, 3] preint dP (prev -> k)
    pre_dV: jax.Array,     # [K, 3] preint dV
    pre_dt: jax.Array,     # [K]
    pcb: jax.Array,        # [3] camera position in body frame
    triple_mask: jax.Array,  # [K] bool: k, k-1, k-2 all valid consecutive
):
    """VI-ORB's linear [scale, gravity] solve over KF triplets
    (reference: src/LocalMapping.cc:186-260). For each consecutive
    triplet (1, 2, 3):

      lambda(k) * s + beta(k) * g_w = gamma(k)

    with the standard elimination of velocities. Returns (s, g_w).
    """
    dtype = kf_p_c.dtype
    K = kf_p_c.shape[0]
    c1 = jnp.roll(kf_p_c, 2, 0)
    c2 = jnp.roll(kf_p_c, 1, 0)
    c3 = kf_p_c
    Rb1 = jnp.roll(kf_R_wb, 2, 0)
    Rb2 = jnp.roll(kf_R_wb, 1, 0)
    Rb3 = kf_R_wb
    dp12 = jnp.roll(pre_dP, 1, 0)
    dv12 = jnp.roll(pre_dV, 1, 0)
    dp23 = pre_dP
    T12 = jnp.roll(pre_dt, 1, 0)[:, None]
    T23 = pre_dt[:, None]

    # With p_wb = s * p_wc + R_wb q  (q = body origin offset via Tbc),
    # eliminating v1, v2 from the two preintegration position identities
    # and the velocity identity gives, per triplet:
    #   lam * s + beta @ g_w = gamma
    # lam   = (c3 - c2) T12 - (c2 - c1) T23
    # beta  = -0.5 (T12^2 T23 + T12 T23^2) I
    # gamma = Rb2 dp23 T12 - Rb1 dp12 T23 + Rb1 dv12 T12 T23
    #         - [(Rb3 - Rb2) T12 - (Rb2 - Rb1) T23] q
    lam = (c3 - c2) * T12 - (c2 - c1) * T23
    beta_coef = -0.5 * (T12 * T12 * T23 + T12 * T23 * T23)
    beta = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (K, 3, 3)) * beta_coef[..., None]
    gamma = (
        mv(Rb2, dp23) * T12
        - mv(Rb1, dp12) * T23
        + mv(Rb1, dv12) * (T12 * T23)
        - (mv(Rb3 - Rb2, pcb) * T12 - mv(Rb2 - Rb1, pcb) * T23)
    )

    idx = jnp.arange(K)
    w = (triple_mask & (idx >= 2)).astype(dtype)
    A = jnp.concatenate([lam[..., None], beta], axis=-1) * w[:, None, None]  # [K, 3, 4]
    b = gamma * w[:, None]

    A2 = A.reshape(-1, 4)
    b2 = b.reshape(-1)
    H = A2.T @ A2 + 1e-9 * jnp.eye(4, dtype=dtype)
    x = jnp.linalg.solve(H, A2.T @ b2)
    return x[0], x[1:4]


def refine_scale_gravity_accbias(
    kf_p_c: jax.Array,     # [K, 3] camera centers (vision frame)
    kf_R_wb: jax.Array,    # [K, 3, 3]
    pre_dP: jax.Array,     # [K, 3] preint dP (prev -> k), gyro-bias corrected
    pre_dV: jax.Array,     # [K, 3]
    pre_dt: jax.Array,     # [K]
    J_P_ba: jax.Array,     # [K, 3, 3] d dP / d ba
    J_V_ba: jax.Array,     # [K, 3, 3] d dV / d ba
    g0: jax.Array,         # [3] gravity estimate from the 4x1 solve
    pcb: jax.Array,        # [3]
    triple_mask: jax.Array,
    g_mag: float = 9.810,
    sigma_dth: float = 0.3,
    sigma_ba: float = 0.2,
):
    """VI-ORB's second linear solve: [s, dtheta_xy, ba] (6x1 SVD) with the
    gravity MAGNITUDE fixed at 9.81 (reference: src/LocalMapping.cc:262-379
    — the |g|=G constraint removes the weakly-observable gravity norm and
    adds the accelerometer-bias columns via the preint bias Jacobians).

    Parameterization: g_w = Rwi Exp([dthx, dthy, 0]) gI with gI = (0,0,-G)
    and Rwi the rotation taking gI onto g0's direction.
    Returns (s, g_w_refined, ba)."""
    dtype = kf_p_c.dtype
    K = kf_p_c.shape[0]
    c1 = jnp.roll(kf_p_c, 2, 0)
    c2 = jnp.roll(kf_p_c, 1, 0)
    c3 = kf_p_c
    Rb1 = jnp.roll(kf_R_wb, 2, 0)
    Rb2 = jnp.roll(kf_R_wb, 1, 0)
    Rb3 = kf_R_wb
    dp12 = jnp.roll(pre_dP, 1, 0)
    dv12 = jnp.roll(pre_dV, 1, 0)
    dp23 = pre_dP
    Jp12 = jnp.roll(J_P_ba, 1, 0)
    Jv12 = jnp.roll(J_V_ba, 1, 0)
    Jp23 = J_P_ba
    T12 = jnp.roll(pre_dt, 1, 0)[:, None]
    T23 = pre_dt[:, None]

    gI = jnp.asarray([0.0, 0.0, -g_mag], dtype)
    # Rwi (0,0,-1) = g0_dir  <=>  Rwi (0,0,1) = -g0_dir
    g0_dir = g0 / jnp.maximum(jnp.linalg.norm(g0), 1e-9)
    Rwi = rotation_to_gravity(-g0_dir)
    gw0 = mv(Rwi, gI)

    lam = (c3 - c2) * T12 - (c2 - c1) * T23                       # [K, 3]
    beta_coef = -0.5 * (T12 * T12 * T23 + T12 * T23 * T23)        # [K, 1]
    # d g_w / d dtheta (left perturbation on Rwi): -Rwi hat(gI), xy cols
    dG = -mm(Rwi, _hat(gI))[:, :2]                                # [3, 2]
    beta_th = beta_coef[..., None] * jnp.broadcast_to(dG, (K, 3, 2))
    # accel-bias columns: gamma(ba) = gamma0 + psi @ ba
    psi = (
        mm(Rb2, Jp23) * T12[..., None]
        - mm(Rb1, Jp12) * T23[..., None]
        + mm(Rb1, Jv12) * (T12 * T23)[..., None]
    )                                                             # [K, 3, 3]
    gamma0 = (
        mv(Rb2, dp23) * T12
        - mv(Rb1, dp12) * T23
        + mv(Rb1, dv12) * (T12 * T23)
        - (mv(Rb3 - Rb2, pcb) * T12 - mv(Rb2 - Rb1, pcb) * T23)
    )
    b = gamma0 - beta_coef * gw0

    idx = jnp.arange(K)
    w = (triple_mask & (idx >= 2)).astype(dtype)
    A = jnp.concatenate([lam[..., None], beta_th, -psi], axis=-1)  # [K, 3, 6]
    A = A * w[:, None, None]
    bb = (b * w[:, None]).reshape(-1)
    A2 = A.reshape(-1, 6)
    # zero-mean priors on [dtheta_xy, ba] regularize the weakly-excited
    # case (short windows / gentle motion make the gravity-tilt and
    # accel-bias columns nearly collinear; the reference compensates by
    # demanding a 22 s window before accepting — time.Init)
    prior = jnp.asarray(
        [0.0, 1.0 / sigma_dth**2, 1.0 / sigma_dth**2,
         1.0 / sigma_ba**2, 1.0 / sigma_ba**2, 1.0 / sigma_ba**2], dtype)
    H = A2.T @ A2 + jnp.diag(prior) + 1e-9 * jnp.eye(6, dtype=dtype)
    x = jnp.linalg.solve(H, A2.T @ bb)
    s, dth, ba = x[0], x[1:3], x[3:6]
    g_w = mv(mm(Rwi, lie.so3_exp(jnp.asarray([dth[0], dth[1], 0.0], dtype))), gI)
    return s, g_w, ba


def refine_gravity_accbias_fixed_scale(
    kf_p_c: jax.Array,     # [K, 3] camera centers (vision frame)
    kf_R_wb: jax.Array,    # [K, 3, 3]
    pre_dP: jax.Array,     # [K, 3] preint dP (prev -> k), gyro-bias corrected
    pre_dV: jax.Array,     # [K, 3]
    pre_dt: jax.Array,     # [K]
    J_P_ba: jax.Array,     # [K, 3, 3]
    J_V_ba: jax.Array,     # [K, 3, 3]
    g0: jax.Array,         # [3] gravity estimate (vision frame, |g0|~9.81)
    pcb: jax.Array,        # [3]
    s_fixed: jax.Array,    # scalar metric scale (from pressure)
    triple_mask: jax.Array,
    g_mag: float = 9.810,
    sigma_dth: float = 0.3,
    sigma_ba: float = 0.2,
):
    """The reference's Init_mode 2/3 SECOND solve: [dtheta_xy, ba] (5x1
    SVD) with the SCALE FIXED from the pressure channel (reference:
    src/LocalMapping.cc:411-509 — after OptimizeInitialScale the gravity
    direction from the raw accelerometer average is refined against the
    vision triplet identities; the raw average is biased by sustained
    proper acceleration, e.g. an AUV accelerating along a survey leg).
    Returns (g_w_refined, ba)."""
    dtype = kf_p_c.dtype
    K = kf_p_c.shape[0]
    c1 = jnp.roll(kf_p_c, 2, 0)
    c2 = jnp.roll(kf_p_c, 1, 0)
    c3 = kf_p_c
    Rb1 = jnp.roll(kf_R_wb, 2, 0)
    Rb2 = jnp.roll(kf_R_wb, 1, 0)
    Rb3 = kf_R_wb
    dp12 = jnp.roll(pre_dP, 1, 0)
    dv12 = jnp.roll(pre_dV, 1, 0)
    dp23 = pre_dP
    Jp12 = jnp.roll(J_P_ba, 1, 0)
    Jv12 = jnp.roll(J_V_ba, 1, 0)
    Jp23 = J_P_ba
    T12 = jnp.roll(pre_dt, 1, 0)[:, None]
    T23 = pre_dt[:, None]

    gI = jnp.asarray([0.0, 0.0, -g_mag], dtype)
    g0_dir = g0 / jnp.maximum(jnp.linalg.norm(g0), 1e-9)
    Rwi = rotation_to_gravity(-g0_dir)
    gw0 = mv(Rwi, gI)

    lam = (c3 - c2) * T12 - (c2 - c1) * T23
    beta_coef = -0.5 * (T12 * T12 * T23 + T12 * T23 * T23)
    dG = -mm(Rwi, _hat(gI))[:, :2]
    beta_th = beta_coef[..., None] * jnp.broadcast_to(dG, (K, 3, 2))
    psi = (
        mm(Rb2, Jp23) * T12[..., None]
        - mm(Rb1, Jp12) * T23[..., None]
        + mm(Rb1, Jv12) * (T12 * T23)[..., None]
    )
    gamma0 = (
        mv(Rb2, dp23) * T12
        - mv(Rb1, dp12) * T23
        + mv(Rb1, dv12) * (T12 * T23)
        - (mv(Rb3 - Rb2, pcb) * T12 - mv(Rb2 - Rb1, pcb) * T23)
    )
    # scale column moves to the right-hand side
    b = gamma0 - beta_coef * gw0 - lam * s_fixed

    idx = jnp.arange(K)
    w = (triple_mask & (idx >= 2)).astype(dtype)
    A = jnp.concatenate([beta_th, -psi], axis=-1)  # [K, 3, 5]
    A = A * w[:, None, None]
    bb = (b * w[:, None]).reshape(-1)
    A2 = A.reshape(-1, 5)
    prior = jnp.asarray(
        [1.0 / sigma_dth**2, 1.0 / sigma_dth**2,
         1.0 / sigma_ba**2, 1.0 / sigma_ba**2, 1.0 / sigma_ba**2], dtype)
    H = A2.T @ A2 + jnp.diag(prior) + 1e-9 * jnp.eye(5, dtype=dtype)
    x = jnp.linalg.solve(H, A2.T @ bb)
    dth, ba = x[0:2], x[2:5]
    g_w = mv(mm(Rwi, lie.so3_exp(jnp.asarray([dth[0], dth[1], 0.0], dtype))), gI)
    return g_w, ba


def _hat(v):
    return jnp.asarray([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ], v.dtype)


def velocities_from_positions(
    kf_p_wb: jax.Array,    # [K, 3] body positions (metric, gravity frame)
    kf_R_wb: jax.Array,    # [K, 3, 3]
    pre_dP: jax.Array,     # [K, 3]
    pre_dt: jax.Array,     # [K]
    gravity_w: jax.Array,  # [3]
    pair_mask: jax.Array,  # [K]
) -> jax.Array:
    """Per-KF velocities from the preintegration identity
    p_j = p_i + v_i dt + 0.5 g dt^2 + R_i dP  =>  v_i
    (reference: src/LocalMapping.cc:650-698 finite differencing)."""
    p_j = jnp.roll(kf_p_wb, -1, 0)
    dt = jnp.roll(pre_dt, -1, 0)[:, None]
    dP = jnp.roll(pre_dP, -1, 0)
    R_i = kf_R_wb
    v = (p_j - kf_p_wb - 0.5 * gravity_w * dt * dt - mv(R_i, dP)) / jnp.maximum(dt, 1e-6)
    nxt_ok = jnp.roll(pair_mask, -1, 0) & (dt[:, 0] > 1e-6)
    return jnp.where(nxt_ok[:, None], v, 0.0)


def build_strided_inertial(
    kf_valid: jax.Array,     # [K]
    imu_omg: jax.Array,      # [K, S, 3] raw window covering (KF k-1, KF k]
    imu_acc: jax.Array,      # [K, S, 3]
    imu_dt: jax.Array,       # [K, S]
    imu_mask: jax.Array,     # [K, S]
    stride: int,
    base: int = 1,
):
    """Virtual keyframes at slots base, base+J, base+2J, ... with the raw
    IMU windows of the intervening slots CONCATENATED, for the VI init
    solves.

    Why: the triplet identities behind the [s, g] linear solve compare
    second differences of KF positions against dt^2-scaled preintegration
    terms. At short KF spacing the position-noise term rivals the signal
    and, because the noise sits in the REGRESSOR (lam multiplies s), the
    least squares suffers classic errors-in-variables attenuation — the
    scale estimate biases LOW (measured 0.46x at 0.15 s spacing). The
    reference sidesteps this with ~1 s KF spacing over a 22 s window
    (reference: src/LocalMapping.cc:89-709, time.Init). Striding restores
    the long-baseline identities: signal grows with dt^2, noise doesn't.

    Returns (sel [KV] i32 slot of each virtual KF, vvalid [KV],
    omg/acc/dt/mask [KV, J*S, ...] concatenated windows where row v
    covers (virtual v-1, virtual v]).
    """
    K, S = imu_dt.shape
    J = stride
    KV = max((K - base) // J, 2)
    v = jnp.arange(KV, dtype=jnp.int32)
    sel = base + v * J                          # [KV] anchor slots
    sel_ok = sel < K
    sel_c = jnp.clip(sel, 0, K - 1)

    # interval v (v >= 1) = slots sel[v-1]+1 .. sel[v]
    rows = (base + (v[:, None] - 1) * J) + 1 + jnp.arange(J)[None, :]
    rows_ok = (v[:, None] >= 1) & (rows >= 0) & (rows < K)
    rows_c = jnp.clip(rows, 0, K - 1)

    omg = imu_omg[rows_c].reshape(KV, J * S, 3)
    acc = imu_acc[rows_c].reshape(KV, J * S, 3)
    dt = (imu_dt[rows_c] * rows_ok[..., None]).reshape(KV, J * S)
    mask = (imu_mask[rows_c] * rows_ok[..., None]).reshape(KV, J * S)

    # virtual KF valid: its anchor and all interval slots valid
    interval_valid = jnp.all(
        jnp.where(rows_ok, kf_valid[rows_c], v[:, None] >= 1), axis=1)
    vvalid = sel_ok & kf_valid[sel_c] & (
        (v == 0) | interval_valid)
    return sel_c, vvalid, omg, acc, dt, mask
