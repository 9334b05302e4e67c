"""On-manifold IMU preintegration as a `lax.scan`.

TPU-native equivalent of the reference IMUPreintegrator
(reference: src/IMU/IMUPreintegrator.cpp:81-140): given a fixed-length,
mask-padded window of bias-corrected IMU samples, accumulate the
Forster RSS'15 delta measurements (dP, dV, dR), the five bias Jacobians
and the 9x9 [P, V, Phi] noise covariance.

TPU-first design notes:
  * the per-sample recurrence is a `lax.scan` over static-length arrays;
    padded steps carry dt = 0, which is an exact algebraic no-op of the
    recurrence (dR = I, Jr*dt = 0, all increments 0) — no branching.
  * the whole function `vmap`s over windows, so a keyframe table's
    preintegrations recompute in one batched call after a bias update
    (the reference re-runs ComputePreInt per keyframe on one core,
    src/KeyFrame.cc:218-293).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.lie import mm, mv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreintState:
    """Accumulated preintegrated measurement between two states."""

    dP: jax.Array        # [..., 3]
    dV: jax.Array        # [..., 3]
    dR: jax.Array        # [..., 3, 3]
    J_P_bg: jax.Array    # [..., 3, 3]
    J_P_ba: jax.Array    # [..., 3, 3]
    J_V_bg: jax.Array    # [..., 3, 3]
    J_V_ba: jax.Array    # [..., 3, 3]
    J_R_bg: jax.Array    # [..., 3, 3]
    cov: jax.Array       # [..., 9, 9]  order: P, V, Phi
    dt: jax.Array        # [...]

    @staticmethod
    def zero(batch_shape: tuple = (), dtype=jnp.float32) -> "PreintState":
        z33 = jnp.zeros(batch_shape + (3, 3), dtype)
        return PreintState(
            dP=jnp.zeros(batch_shape + (3,), dtype),
            dV=jnp.zeros(batch_shape + (3,), dtype),
            dR=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
            J_P_bg=z33, J_P_ba=z33, J_V_bg=z33, J_V_ba=z33, J_R_bg=z33,
            cov=jnp.zeros(batch_shape + (9, 9), dtype),
            dt=jnp.zeros(batch_shape, dtype),
        )


def preint_step(
    st: PreintState,
    omega: jax.Array,
    acc: jax.Array,
    dt: jax.Array,
    gyr_cov: jax.Array,
    acc_cov: jax.Array,
) -> PreintState:
    """One preintegration update with bias-corrected (omega, acc) over dt.

    Mirrors the reference update order exactly — covariance first (uses
    the *previous* dR), then bias Jacobians (P before V before R), then
    delta measurements (P before V before R)
    (reference: src/IMU/IMUPreintegrator.cpp:81-140).
    """
    dtype = st.dP.dtype
    dt = dt.astype(dtype)
    dt2 = dt * dt

    w_dt = omega * dt[..., None]
    dR_inc = lie.so3_exp(w_dt)
    Jr = lie.so3_right_jacobian(w_dt)

    skew_a = lie.hat(acc)
    R_skew_a = mm(st.dR, skew_a)

    # --- covariance propagation: err' = A err + Bg n_g + Ca n_a -----------
    eye3 = jnp.eye(3, dtype=dtype)
    z = jnp.zeros_like(eye3)
    b = dt.shape  # batch shape
    bc = lambda m: jnp.broadcast_to(m, b + (3, 3))
    dt_b = dt[..., None, None]
    A = jnp.concatenate(
        [
            jnp.concatenate([bc(eye3), bc(eye3) * dt_b, -0.5 * R_skew_a * dt_b * dt_b], axis=-1),
            jnp.concatenate([bc(z), bc(eye3), -R_skew_a * dt_b], axis=-1),
            jnp.concatenate([bc(z), bc(z), jnp.swapaxes(dR_inc, -1, -2)], axis=-1),
        ],
        axis=-2,
    )
    Bg_blk = Jr * dt_b                      # rows 6:9, cols of gyro noise
    Ca_v = st.dR * dt_b                     # rows 3:6
    Ca_p = 0.5 * st.dR * dt_b * dt_b        # rows 0:3

    cov = mm(mm(A, st.cov), jnp.swapaxes(A, -1, -2))
    # Add Bg * gyr_cov * Bg^T into the Phi block and cross terms (Bg only
    # has rows 6:9 nonzero, so contribution is limited to the Phi block).
    gyr_term = mm(mm(Bg_blk, gyr_cov), jnp.swapaxes(Bg_blk, -1, -2))
    cov = cov.at[..., 6:9, 6:9].add(gyr_term)
    # Ca has rows 0:3 (Ca_p) and 3:6 (Ca_v) nonzero.
    app = mm(mm(Ca_p, acc_cov), jnp.swapaxes(Ca_p, -1, -2))
    avv = mm(mm(Ca_v, acc_cov), jnp.swapaxes(Ca_v, -1, -2))
    apv = mm(mm(Ca_p, acc_cov), jnp.swapaxes(Ca_v, -1, -2))
    cov = cov.at[..., 0:3, 0:3].add(app)
    cov = cov.at[..., 3:6, 3:6].add(avv)
    cov = cov.at[..., 0:3, 3:6].add(apv)
    cov = cov.at[..., 3:6, 0:3].add(jnp.swapaxes(apv, -1, -2))

    # --- bias jacobians (P, then V, then R) --------------------------------
    J_P_ba = st.J_P_ba + st.J_V_ba * dt_b - 0.5 * st.dR * dt_b * dt_b
    J_P_bg = st.J_P_bg + st.J_V_bg * dt_b - 0.5 * mm(R_skew_a, st.J_R_bg) * dt_b * dt_b
    J_V_ba = st.J_V_ba - st.dR * dt_b
    J_V_bg = st.J_V_bg - mm(R_skew_a, st.J_R_bg) * dt_b
    J_R_bg = mm(jnp.swapaxes(dR_inc, -1, -2), st.J_R_bg) - Jr * dt_b

    # --- delta measurements (P, then V, then R) ----------------------------
    Ra = mv(st.dR, acc)
    dP = st.dP + st.dV * dt[..., None] + 0.5 * Ra * dt2[..., None]
    dV = st.dV + Ra * dt[..., None]
    dR = lie.normalize_rotation(mm(st.dR, dR_inc))

    return PreintState(
        dP=dP, dV=dV, dR=dR,
        J_P_bg=J_P_bg, J_P_ba=J_P_ba, J_V_bg=J_V_bg, J_V_ba=J_V_ba,
        J_R_bg=J_R_bg, cov=cov, dt=st.dt + dt,
    )


def preintegrate(
    omegas: jax.Array,     # [T, 3] raw gyro samples
    accs: jax.Array,       # [T, 3] raw accel samples
    dts: jax.Array,        # [T]    per-sample integration intervals
    mask: jax.Array,       # [T]    1 for valid samples, 0 for padding
    bg: jax.Array,         # [3]    gyro bias to subtract
    ba: jax.Array,         # [3]    acc bias to subtract
    gyr_noise_sd: jax.Array | float,
    acc_noise_sd: jax.Array | float,
) -> PreintState:
    """Preintegrate a padded IMU window with `lax.scan`.

    Noise covariances follow the reference convention: the YAML gives
    discrete *standard deviations* ("SD = ND*sqrt(Hz)") and the per-step
    measurement covariance is diag(sd^2), constant per sample
    (reference: src/IMU/configparam.cpp:83-84 sets
    _gyrMeasCov = I * gyr.noise^2, _accMeasCov = I * acc.noise^2).
    """
    dtype = omegas.dtype
    gyr_sd = jnp.asarray(gyr_noise_sd, dtype)
    acc_sd = jnp.asarray(acc_noise_sd, dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    gyr_cov = eye3 * (gyr_sd * gyr_sd)
    acc_cov = eye3 * (acc_sd * acc_sd)
    # pin every operand to the sample dtype: a stray f64 bias (possible
    # under x64 test mode) would otherwise promote part of the scan carry
    # and fail the carry-type check
    bg = jnp.asarray(bg, dtype)
    ba = jnp.asarray(ba, dtype)

    def body(st: PreintState, inp):
        w, a, dt, m = inp
        dt = dt * m  # masked steps are exact no-ops (dt = 0)
        st2 = preint_step(st, w - bg, a - ba, dt, gyr_cov, acc_cov)
        return st2, None

    init = PreintState.zero(dtype=dtype)
    out, _ = jax.lax.scan(
        body, init, (omegas, accs.astype(dtype),
                     dts.astype(dtype), mask.astype(dtype)))
    return out


def preintegrate_continue(
    state: PreintState,
    omegas: jax.Array,
    accs: jax.Array,
    dts: jax.Array,
    mask: jax.Array,
    bg: jax.Array,
    ba: jax.Array,
    gyr_noise_sd,
    acc_noise_sd,
) -> PreintState:
    """Extend an existing preintegration with more samples — used to
    accumulate the measurement from the last keyframe across frames
    (reference: mvIMUSinceLastKF growing per frame, src/Tracking.cc;
    KeyFrame::ComputePreInt then re-integrates — here we never re-run,
    we extend incrementally)."""
    dtype = state.dP.dtype
    gyr_sd = jnp.asarray(gyr_noise_sd, dtype)
    acc_sd = jnp.asarray(acc_noise_sd, dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    gyr_cov = eye3 * (gyr_sd * gyr_sd)
    acc_cov = eye3 * (acc_sd * acc_sd)
    bg = jnp.asarray(bg, dtype)
    ba = jnp.asarray(ba, dtype)

    def body(st, inp):
        w, a, dt, m = inp
        dt = dt * m
        return preint_step(st, w - bg, a - ba, dt, gyr_cov, acc_cov), None

    out, _ = jax.lax.scan(
        body, state, (omegas.astype(dtype), accs.astype(dtype),
                      dts.astype(dtype), mask.astype(dtype))
    )
    return out


def bias_correct(st: PreintState, dbg: jax.Array, dba: jax.Array) -> PreintState:
    """Re-linearize a preintegrated state at a shifted bias using the
    carried bias Jacobians — first-order in (dbg, dba), O(1) instead of
    re-running the T-step integration scan.

    This is the reference's own convention: the g2o edges never
    re-integrate on bias updates, they evaluate residuals through the
    J_*_bg/ba Jacobians (reference: src/IMU/g2otypes.cpp:8-213,
    IMUPreintegrator.h bias-Jacobian accessors; Forster RSS'15 eq. 44).
    dbg/dba = (new bias) - (bias the window was integrated at). The
    Jacobians and covariance are bias-independent to first order and are
    kept, so downstream solvers can keep correcting around the new
    linearization point."""
    dR = mm(st.dR, lie.so3_exp(mv(st.J_R_bg, dbg)))
    dV = st.dV + mv(st.J_V_bg, dbg) + mv(st.J_V_ba, dba)
    dP = st.dP + mv(st.J_P_bg, dbg) + mv(st.J_P_ba, dba)
    return dataclasses.replace(st, dR=dR, dV=dV, dP=dP)
