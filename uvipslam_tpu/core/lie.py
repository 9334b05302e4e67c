"""Lie-group math for SO(3), SE(3) and Sim(3).

TPU-first equivalent of the reference's vendored Sophus SO3
(reference: src/IMU/so3.h:36-70, src/IMU/so3.cpp) plus the SE3/Sim3
manifold math that g2o's types provide implicitly
(reference: Thirdparty/g2o/g2o/types/{se3quat.h,sim3.h}).

Everything here is written to batch: all functions accept arrays with
arbitrary leading batch dimensions ([..., 3], [..., 3, 3]) and are safe
under `vmap`/`jit`. Rotations are stored as 3x3 matrices (cheap to batch
on the MXU); quaternions are used internally where they make `log` and
re-normalization numerically robust. All small-angle branches are
implemented with `jnp.where` on Taylor expansions — no data-dependent
control flow, so everything traces to straight-line XLA.

Dtype policy: functions preserve input dtype (f32 on TPU; tests run f64
on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Angle^2 below which Taylor expansions replace the closed forms.
_EPS2 = 1e-12

# All geometry matmuls are tiny (3x3) and accuracy-critical; on TPU the
# default matmul precision routes f32 through bf16 MXU passes, which costs
# ~1e-3 relative error per op and visibly corrupts integrated rotations.
# Force full f32 precision here — these ops are never the throughput
# bottleneck (the MXU-bound kernels request low precision explicitly).
_HI = jax.lax.Precision.HIGHEST


_SMALL_MM = 12


def mm(a: "jax.Array", b: "jax.Array") -> "jax.Array":
    """Small-matrix matmul at full precision (TPU-safe for geometry).

    For tiny static shapes (all dims <= 12) the product is expanded as a
    broadcast multiply + sum on the VPU: exact f32 FMA arithmetic, and —
    unlike `matmul` at Precision.HIGHEST, which burns SIX MXU passes per
    badly-padded tiny matrix — it fuses into the surrounding elementwise
    work (measured ~1.5 ms/BA-call of MXU time on the [6400, 2, 3] x
    [6400, 3, 6] Jacobian compositions alone)."""
    if (a.shape[-1] <= _SMALL_MM and a.shape[-2] <= _SMALL_MM
            and b.shape[-1] <= _SMALL_MM):
        return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)
    return jnp.matmul(a, b, precision=_HI)


def mv(a: "jax.Array", x: "jax.Array") -> "jax.Array":
    """Matrix-vector product [..., i, j] @ [..., j] at full precision
    (VPU broadcast-sum for tiny shapes, see `mm`)."""
    if a.shape[-1] <= _SMALL_MM and a.shape[-2] <= _SMALL_MM:
        return jnp.sum(a * x[..., None, :], axis=-1)
    return jnp.einsum("...ij,...j->...i", a, x, precision=_HI)


def _stack_last(*cols):
    return jnp.stack(cols, axis=-1)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    row0 = _stack_last(z, -wz, wy)
    row1 = _stack_last(wz, z, -wx)
    row2 = _stack_last(-wy, wx, z)
    return jnp.stack([row0, row1, row2], axis=-2)


def vee(W: jax.Array) -> jax.Array:
    """Inverse of `hat`: [..., 3, 3] -> [..., 3]."""
    return _stack_last(W[..., 2, 1], W[..., 0, 2], W[..., 1, 0])


def _safe_sqrt(x2: jax.Array, small: jax.Array) -> jax.Array:
    """sqrt that is differentiable when x2 ~ 0: the guarded branch feeds
    sqrt a positive constant so jacfwd never sees d/dx sqrt(0) = inf
    (inf * 0 = NaN would otherwise poison every downstream Jacobian)."""
    return jnp.sqrt(jnp.where(small, 1.0, x2))


def _sin_over_x(x2: jax.Array) -> jax.Array:
    """sin(x)/x as a function of x^2 (even function; stable at 0)."""
    small = x2 < _EPS2
    x = _safe_sqrt(x2, small)
    taylor = 1.0 - x2 / 6.0 + x2 * x2 / 120.0
    closed = jnp.sin(x) / x
    return jnp.where(small, taylor, closed)


def _one_minus_cos_over_x2(x2: jax.Array) -> jax.Array:
    """(1 - cos(x)) / x^2 as a function of x^2 (stable at 0)."""
    small = x2 < _EPS2
    x = _safe_sqrt(x2, small)
    taylor = 0.5 - x2 / 24.0 + x2 * x2 / 720.0
    closed = (1.0 - jnp.cos(x)) / jnp.where(small, 1.0, x2)
    return jnp.where(small, taylor, closed)


def _x_minus_sin_over_x3(x2: jax.Array) -> jax.Array:
    """(x - sin(x)) / x^3 as a function of x^2 (stable at 0)."""
    small = x2 < _EPS2
    x = _safe_sqrt(x2, small)
    taylor = 1.0 / 6.0 - x2 / 120.0 + x2 * x2 / 5040.0
    closed = (x - jnp.sin(x)) / jnp.where(small, 1.0, x2 * x)
    return jnp.where(small, taylor, closed)


def so3_exp(w: jax.Array) -> jax.Array:
    """Exponential map so(3) -> SO(3). [..., 3] -> [..., 3, 3].

    Rodrigues formula R = I + A*hat(w) + B*hat(w)^2 with
    A = sin|w|/|w|, B = (1-cos|w|)/|w|^2, Taylor-guarded at 0.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    A = _sin_over_x(theta2)[..., None, None]
    B = _one_minus_cos_over_x2(theta2)[..., None, None]
    W = hat(w)
    W2 = mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * W2


def quat_from_rotmat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (w, x, y, z), w >= 0.

    Branch-free Shepperd construction: compute all four candidate columns
    and select the best-conditioned one with `where` — robust for any
    rotation including theta ~ pi.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each proportional to the true quaternion, scaled by
    # 4*q_k for k in {w, x, y, z}. Pick the one with the largest pivot.
    qw0 = _stack_last(1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    qx0 = _stack_last(m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
    qy0 = _stack_last(m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21)
    qz0 = _stack_last(m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw0, qx0, qy0, qz0], axis=-2)  # [..., 4, 4]
    onehot = jax.nn.one_hot(best, 4, dtype=R.dtype)
    q = jnp.einsum("...k,...kj->...j", onehot, cands, precision=_HI)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0.
    sign = jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q * sign


def rotmat_from_quat(q: jax.Array) -> jax.Array:
    """Unit quaternion (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = _stack_last(1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy))
    row1 = _stack_last(2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx))
    row2 = _stack_last(2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return _stack_last(
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def so3_log(R: jax.Array) -> jax.Array:
    """Log map SO(3) -> so(3) via quaternion (uniformly stable incl. pi)."""
    q = quat_from_rotmat(R)
    w, v = q[..., 0], q[..., 1:]
    v2 = jnp.sum(v * v, axis=-1)
    small = v2 < 1e-14
    safe_vnorm = _safe_sqrt(v2, small)
    # angle = 2*atan2(|v|, w); axis = v/|v|. Stable factor 2*atan2(|v|,w)/|v|.
    angle = 2.0 * jnp.arctan2(jnp.where(small, 0.0, safe_vnorm), w)
    # For tiny |v|: angle/|v| -> 2/w (w ~ 1).
    factor = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), angle / safe_vnorm)
    return v * factor[..., None]


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3): Jl = I + B*hat(w) + C*hat(w)^2
    with B = (1-cos)/t^2, C = (t-sin)/t^3  (reference math: src/IMU/so3.cpp JacobianL)."""
    theta2 = jnp.sum(w * w, axis=-1)
    B = _one_minus_cos_over_x2(theta2)[..., None, None]
    C = _x_minus_sin_over_x3(theta2)[..., None, None]
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B * W + C * mm(W, W)


def so3_right_jacobian(w: jax.Array) -> jax.Array:
    """Right Jacobian J_r(w) = J_l(-w)."""
    return so3_left_jacobian(-w)


def _half_x_cot_half_x_combo(x2: jax.Array) -> jax.Array:
    """Coefficient of hat(w)^2 in Jl^{-1}: (1/x^2) - (1+cos)/(2 x sin),
    Taylor 1/12 + x^2/720 + ... at 0. As a function of x^2."""
    small = x2 < 1e-8
    x = _safe_sqrt(x2, small)
    taylor = 1.0 / 12.0 + x2 / 720.0 + x2 * x2 / 30240.0
    sx = jnp.where(small, 1.0, jnp.sin(x))
    closed = 1.0 / jnp.where(small, 1.0, x2) - (1.0 + jnp.cos(x)) / (2.0 * jnp.where(small, 1.0, x) * sx)
    return jnp.where(small, taylor, closed)


def so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse left Jacobian: Jl^{-1} = I - 0.5*hat(w) + c*hat(w)^2."""
    theta2 = jnp.sum(w * w, axis=-1)
    c = _half_x_cot_half_x_combo(theta2)[..., None, None]
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + c * mm(W, W)


def so3_right_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse right Jacobian: Jr^{-1}(w) = Jl^{-1}(-w)."""
    return so3_left_jacobian_inv(-w)


def normalize_rotation(R: jax.Array) -> jax.Array:
    """Re-orthonormalize a near-rotation matrix via its quaternion
    (reference behavior: IMUPreintegrator normalizeRotationM,
    src/IMU/IMUPreintegrator.cpp:117)."""
    return rotmat_from_quat(quat_from_rotmat(R))


# ---------------------------------------------------------------------------
# SE(3): stored as (R [..., 3, 3], t [..., 3])
# ---------------------------------------------------------------------------


def se3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Exp map se(3) -> SE(3). xi = [rho(3), phi(3)] -> (R, t = Jl(phi) rho)."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3_exp(phi)
    t = mv(so3_left_jacobian(phi), rho)
    return R, t


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    """Log map SE(3) -> se(3): [rho, phi]."""
    phi = so3_log(R)
    rho = mv(so3_left_jacobian_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inverse(R: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -mv(Rt, t)


def se3_compose(Ra, ta, Rb, tb) -> tuple[jax.Array, jax.Array]:
    """(Ra, ta) * (Rb, tb): x -> Ra (Rb x + tb) + ta."""
    return mm(Ra, Rb), mv(Ra, tb) + ta


def se3_apply(R, t, x) -> jax.Array:
    return mv(R, x) + t


def se3_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R, t) -> 4x4 homogeneous matrix."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


# ---------------------------------------------------------------------------
# Sim(3): stored as (s [...], R [..., 3, 3], t [..., 3]); x -> s R x + t
# ---------------------------------------------------------------------------


def sim3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exp map sim(3) -> Sim(3). xi = [rho(3), phi(3), sigma(1)].

    Follows Strasdat's Sim3 parameterization (t = W rho with the scaled
    left-Jacobian W); coefficients Taylor-guarded for small sigma/theta.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = _safe_sqrt(theta2, theta2 < 1e-14) * (theta2 >= 1e-14)
    W = _sim3_W(sigma, s, theta, phi.dtype, hat(phi))
    t = mv(W, rho)
    return s, R, t


def _sim3_W(sigma, s, theta, dtype, Phi):
    """The Sim(3) 'W' matrix: W = A I + B Phi + C Phi^2 with the
    Strasdat coefficients, all small-value-guarded."""
    sigma2 = sigma * sigma
    theta2 = theta * theta
    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta < 1e-5

    safe_sigma = jnp.where(small_sigma, 1.0, sigma)
    safe_theta = jnp.where(small_theta, 1.0, theta)
    safe_theta2 = safe_theta * safe_theta

    # A = (s - 1)/sigma  -> 1 + sigma/2 + sigma^2/6 for small sigma
    A = jnp.where(small_sigma, 1.0 + sigma / 2.0 + sigma2 / 6.0, (s - 1.0) / safe_sigma)

    # For B and C we need combinations of (sigma, theta).
    # closed forms (sigma != 0, theta != 0):
    #   a = s * sin(theta), b = s * cos(theta), c = theta^2 + sigma^2
    a = s * jnp.sin(safe_theta)
    b = s * jnp.cos(safe_theta)
    c = safe_theta2 + sigma2

    # B = (a*sigma + (1-b)*theta) / (theta * c)
    B_closed = (a * safe_sigma + (1.0 - b) * safe_theta) / (safe_theta * jnp.where(small_sigma, c, c))
    # sigma -> 0 limit: B = (1 - cos(theta))/theta^2
    B_sig0 = _one_minus_cos_over_x2(theta2)
    # theta -> 0 limit: B = ((sigma - 1)*s + 1)/sigma^2
    B_th0 = jnp.where(
        small_sigma,
        0.5 + sigma / 3.0,  # Taylor of ((sigma-1)e^sigma + 1)/sigma^2
        ((safe_sigma - 1.0) * s + 1.0) / (safe_sigma * safe_sigma),
    )
    B = jnp.where(small_sigma, B_sig0, jnp.where(small_theta, B_th0, B_closed))

    # C = (A - ((b - 1)*sigma + a*theta)/c) / theta^2  [closed]
    C_closed = (A - ((b - 1.0) * safe_sigma + a * safe_theta) / c) / safe_theta2
    # sigma -> 0: C = (theta - sin theta)/theta^3
    C_sig0 = _x_minus_sin_over_x3(theta2)
    # theta -> 0: C = (s*(0.5*sigma^2 - sigma + 1) - 1)/sigma^3
    C_th0 = jnp.where(
        small_sigma,
        1.0 / 6.0 + sigma / 8.0,  # Taylor
        (s * (0.5 * sigma2 - safe_sigma + 1.0) - 1.0) / (safe_sigma * safe_sigma * safe_sigma),
    )
    C = jnp.where(small_sigma, C_sig0, jnp.where(small_theta, C_th0, C_closed))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Phi.shape)
    return A[..., None, None] * eye + B[..., None, None] * Phi + C[..., None, None] * mm(Phi, Phi)


def sim3_log(s: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Log map Sim(3) -> sim(3): [rho, phi, sigma]. Inverts `sim3_exp`."""
    sigma = jnp.log(s)
    phi = so3_log(R)
    phi2 = jnp.sum(phi * phi, axis=-1)
    theta = _safe_sqrt(phi2, phi2 < 1e-14) * (phi2 >= 1e-14)
    W = _sim3_W(sigma, s, theta, R.dtype, hat(phi))
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * mv(Rt, t)


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta)*(sb,Rb,tb): x -> sa Ra (sb Rb x + tb) + ta."""
    return sa * sb, mm(Ra, Rb), sa[..., None] * mv(Ra, tb) + ta


def sim3_apply(s, R, t, x):
    return s[..., None] * mv(R, x) + t


def inv3x3(A):
    """Closed-form batched 3x3 inverse (adjugate / det). `jnp.linalg.inv`
    lowers to batched LU — serial and ~100x slower on TPU; this is pure
    elementwise VPU work."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], -1),
        jnp.stack([A21, A22, A23], -1),
        jnp.stack([A31, A32, A33], -1),
    ], -2)
    return adj / det[..., None, None]
