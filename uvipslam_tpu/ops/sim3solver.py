"""Closed-form Sim3 alignment (Horn) + batched RANSAC.

TPU-native equivalent of the reference Sim3Solver
(reference: src/Sim3Solver.cc, include/Sim3Solver.h:33-131 — Horn's
closed-form 3-point similarity between matched keyframe point clouds,
inside an adaptive RANSAC with reprojection gating, feeding
Optimizer::OptimizeSim3).

Redesign: fixed-iteration batch RANSAC — all minimal 3-point samples
solved at once via the batched Horn closed form (quaternion from the
largest eigenvector of the 4x4 N matrix), scored densely by symmetric
reprojection error.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.core.lie import mm, mv

_HI = jax.lax.Precision.HIGHEST


def horn_sim3(p1: jax.Array, p2: jax.Array, w: jax.Array | None = None,
              fix_scale: bool = False):
    """Closed-form similarity aligning p1 -> p2 (batched over leading
    dims): returns (s, R, t) with p2 ~ s R p1 + t. Horn 1987 quaternion
    method; scale by the symmetric ratio of centered norms.

    p1, p2: [..., N, 3]; w: optional weights [..., N].
    """
    dtype = p1.dtype
    if w is None:
        w = jnp.ones(p1.shape[:-1], dtype)
    wn = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    c1 = jnp.sum(p1 * wn[..., None], axis=-2, keepdims=True)
    c2 = jnp.sum(p2 * wn[..., None], axis=-2, keepdims=True)
    q1 = p1 - c1
    q2 = p2 - c2

    # cross-covariance S = sum w q1 q2^T (Horn's M aligning p1 into p2)
    M = jnp.einsum("...ni,...nj,...n->...ij", q1, q2, wn, precision=_HI)
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[..., :, -1]  # largest eigenvalue's eigenvector (w, x, y, z)
    from uvipslam_tpu.core.lie import rotmat_from_quat

    R = rotmat_from_quat(q)

    if fix_scale:
        s = jnp.ones(p1.shape[:-2], dtype)
    else:
        # symmetric scale (Horn): sqrt(sum|q2|^2 / sum|q1|^2)
        n2 = jnp.sum(jnp.sum(q2 * q2, -1) * wn, -1)
        n1 = jnp.sum(jnp.sum(q1 * q1, -1) * wn, -1)
        s = jnp.sqrt(n2 / jnp.maximum(n1, 1e-12))

    t = c2[..., 0, :] - s[..., None] * mv(R, c1[..., 0, :])
    return s, R, t


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def sim3_ransac(
    key,
    p1: jax.Array,        # [N, 3] points in KF1 camera frame
    p2: jax.Array,        # [N, 3] matched points in KF2 camera frame
    valid: jax.Array,     # [N]
    fx, fy, cx, cy,
    max_err2: float = 9.21,   # chi2 99% 2-dof, like the reference th
    n_iters: int = 128,
    fix_scale: bool = False,
):
    """RANSAC Horn alignment with symmetric reprojection gating
    (reference: Sim3Solver::iterate). Returns (s, R, t, inliers, n_in).
    """
    from uvipslam_tpu.ops.twoview import _sample_minimal

    idx = _sample_minimal(key, n_iters, 3, valid)
    s_c, R_c, t_c = horn_sim3(p1[idx], p2[idx], fix_scale=fix_scale)

    def proj(p):
        z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
        return jnp.stack([fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], -1)

    # symmetric errors for every hypothesis x point
    p1in2 = s_c[:, None, None] * jnp.einsum("hij,nj->hni", R_c, p1, precision=_HI) + t_c[:, None, :]
    s_inv = 1.0 / jnp.maximum(s_c, 1e-12)
    RT = jnp.swapaxes(R_c, -1, -2)
    p2in1 = s_inv[:, None, None] * jnp.einsum("hij,hnj->hni", RT, p2 - t_c[:, None, :], precision=_HI)
    e1 = jnp.sum((proj(p1in2) - proj(p2[None])) ** 2, -1)
    e2 = jnp.sum((proj(p2in1) - proj(p1[None])) ** 2, -1)
    inl = (e1 < max_err2) & (e2 < max_err2) & valid[None]
    score = jnp.sum(inl, axis=1)
    best = jnp.argmax(score)

    # refine on the best hypothesis's inliers with weighted Horn
    w = inl[best].astype(p1.dtype)
    s_r, R_r, t_r = horn_sim3(p1, p2, w, fix_scale=fix_scale)
    p1in2 = s_r * mv(R_r, p1) + t_r
    p2in1 = (1.0 / jnp.maximum(s_r, 1e-12)) * mv(R_r.T, p2 - t_r)
    e1 = jnp.sum((proj(p1in2) - proj(p2)) ** 2, -1)
    e2 = jnp.sum((proj(p2in1) - proj(p1)) ** 2, -1)
    inl_r = (e1 < max_err2) & (e2 < max_err2) & valid
    better = jnp.sum(inl_r) >= score[best]
    s_o = jnp.where(better, s_r, s_c[best])
    R_o = jnp.where(better, R_r, R_c[best])
    t_o = jnp.where(better, t_r, t_c[best])
    inl_o = jnp.where(better, inl_r, inl[best])
    return s_o, R_o, t_o, inl_o, jnp.sum(inl_o)


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_sim3(s, R, t, p1, p2, uv1, uv2, valid,
                  fx, fy, cx, cy, max_err2: float = 9.21,
                  iters: int = 10):
    """GN refinement of a relative Sim3 from paired reprojection edges
    (reference: Optimizer::OptimizeSim3, src/Optimizer.cc:2660 — for each
    3D-3D match, one edge projects p1 (frame-1 camera coords) through S
    against uv2, the mirror edge projects p2 through S^-1 against uv1;
    Huber delta^2 = 10, outliers re-gated between rounds).

    The 7-dof Jacobian is `jax.jacfwd` through the left-multiplicative
    sim3 increment — loop-rate code, autodiff cost is irrelevant.
    Returns (s, R, t, inlier_mask, n_inliers)."""
    from uvipslam_tpu.core import lie

    dtype = p1.dtype
    huber2 = jnp.asarray(10.0, dtype)

    def project(pc):
        z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
        return jnp.stack([fx * pc[..., 0] / z + cx,
                          fy * pc[..., 1] / z + cy], -1)

    def residuals(xi, s, R, t):
        ds, dR, dt = lie.sim3_exp(xi)
        s2, R2, t2 = lie.sim3_compose(ds, dR, dt, s, R, t)
        p1in2 = s2 * mv(R2, p1) + t2
        si, Ri, ti = lie.sim3_inverse(s2, R2, t2)
        p2in1 = si * mv(Ri, p2) + ti
        r = jnp.concatenate([project(p1in2) - uv2, project(p2in1) - uv1], 0)
        return r.reshape(-1)

    def body(carry, _):
        s, R, t, w = carry
        z7 = jnp.zeros((7,), dtype)
        r = residuals(z7, s, R, t).reshape(-1, 2)
        J = jax.jacfwd(lambda xi: residuals(xi, s, R, t))(z7).reshape(-1, 2, 7)
        chi2 = jnp.sum(r * r, -1)
        wh = jnp.where(chi2 > huber2, jnp.sqrt(huber2 / jnp.maximum(chi2, 1e-12)), 1.0)
        ww = w * wh
        JW = J * ww[:, None, None]
        H = jnp.einsum("eri,erj->ij", JW, J) + jnp.eye(7, dtype=dtype) * 1e-6
        g = jnp.einsum("eri,er->i", JW, r)
        dx = -jnp.linalg.solve(H, g)
        ds, dR, dt = lie.sim3_exp(dx)
        s2, R2, t2 = lie.sim3_compose(ds, dR, dt, s, R, t)
        R2 = lie.normalize_rotation(R2)
        # accept only if total robust cost decreases
        c_old = jnp.sum(ww * chi2)
        r_new = residuals(z7, s2, R2, t2).reshape(-1, 2)
        c_new = jnp.sum(ww * jnp.sum(r_new * r_new, -1))
        ok = c_new < c_old
        return (jnp.where(ok, s2, s), jnp.where(ok, R2, R),
                jnp.where(ok, t2, t), w), None

    w0 = jnp.tile(valid.astype(dtype), 2)
    (s, R, t, _), _ = jax.lax.scan(body, (s, R, t, w0), None, length=iters)

    # final inlier gate on both directions
    p1in2 = s * mv(R, p1) + t
    si, Ri, ti = lie.sim3_inverse(s, R, t)
    p2in1 = si * mv(Ri, p2) + ti
    e1 = jnp.sum((project(p1in2) - uv2) ** 2, -1)
    e2 = jnp.sum((project(p2in1) - uv1) ** 2, -1)
    inl = (e1 < max_err2) & (e2 < max_err2) & valid
    return s, R, t, inl, jnp.sum(inl)
