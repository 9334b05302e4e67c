"""Batched PnP RANSAC for relocalization.

TPU-native equivalent of the reference's PnPsolver (EPnP inside custom
RANSAC, include/PnPsolver.h:61-198) and its per-frame
cv::solvePnPRansac(SOLVEPNP_EPNP) call (reference: src/Tracking.cc:1864).

Redesign: the minimal solver is a 6-point DLT (batched null vector of a
[2n, 12] system via one SVD per hypothesis, R extracted by quaternion
orthonormalization) — on the MXU, solving 128 DLT hypotheses at once is
faster than EPnP's control-point machinery, and the subsequent
`pose_optimization_se3` refine (the reference also refines with
motion-only BA) recovers identical accuracy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.lie import mm, mv

_HI = jax.lax.Precision.HIGHEST


def _dlt_pnp(pts_w: jax.Array, xn: jax.Array):
    """Batched DLT: pts_w [B, n, 3], xn [B, n, 2] normalized image coords
    -> (R [B, 3, 3], t [B, 3]). Minimal n >= 6.

    3D points are Hartley-normalized (centroid + unit RMS) before the
    null-space solve — without it the [2n, 12] system mixes scales and
    the f32 SVD on TPU loses the solution."""
    B, n, _ = pts_w.shape
    c3 = jnp.mean(pts_w, axis=-2, keepdims=True)
    scale = jnp.sqrt(jnp.mean(jnp.sum((pts_w - c3) ** 2, -1), -1, keepdims=True))
    s3 = 1.0 / jnp.maximum(scale, 1e-9)
    pts_n = (pts_w - c3) * s3[..., None]
    R_n, t_n = _dlt_pnp_core(pts_n, xn)
    # un-normalize: X_n = s (X - c)  =>  pc = R_n s (X - c) + t_n
    # = (s R_n) X + (t_n - s R_n c); rotation unchanged, t adjusted, and
    # the projective scale folds out since we re-extract R by polar form.
    t = t_n - s3 * mv(R_n, c3[..., 0, :])
    # overall metric scale: pc_n = s * pc  => divide translation by s
    t = t / s3
    return R_n, t


def _dlt_pnp_core(pts_w: jax.Array, xn: jax.Array):
    B, n, _ = pts_w.shape
    X, Y, Z = pts_w[..., 0], pts_w[..., 1], pts_w[..., 2]
    u, v = xn[..., 0], xn[..., 1]
    one = jnp.ones_like(X)
    zr = jnp.zeros_like(X)
    r1 = jnp.stack([X, Y, Z, one, zr, zr, zr, zr, -u * X, -u * Y, -u * Z, -u], -1)
    r2 = jnp.stack([zr, zr, zr, zr, X, Y, Z, one, -v * X, -v * Y, -v * Z, -v], -1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [B, 2n, 12]
    from uvipslam_tpu.ops.twoview import _solve_dlt
    p = _solve_dlt(A).reshape(B, 3, 4)

    # fix sign: points must have positive depth (check centroid)
    c = jnp.mean(pts_w, axis=-2)
    zc = jnp.einsum("bj,bj->b", p[:, 2, :3], c, precision=_HI) + p[:, 2, 3]
    p = p * jnp.where(zc < 0, -1.0, 1.0)[:, None, None]

    M = p[:, :, :3]
    # scale so R is a rotation: ||M||_F = sqrt(3) * s
    s = jnp.exp(jnp.mean(jnp.log(jnp.maximum(
        jnp.linalg.norm(M, axis=-1), 1e-12)), axis=-1))  # geo-mean row norm
    R = lie.normalize_rotation(M / s[:, None, None])
    t = p[:, :, 3] / s[:, None]
    return R, t


@functools.partial(jax.jit, static_argnames=("n_iters", "min_set"))
def pnp_ransac(
    key,
    pts_w: jax.Array,      # [N, 3] candidate 3D points
    uvs: jax.Array,        # [N, 2] undistorted pixel observations
    valid: jax.Array,      # [N]
    fx, fy, cx, cy,
    max_err2: float = 5.991,
    n_iters: int = 128,
    min_set: int = 6,
):
    """Returns (Rcw, tcw, inliers [N], n_inliers). Refine afterwards with
    pose_optimization_se3 (as the reference refines its EPnP result)."""
    from uvipslam_tpu.ops.twoview import _sample_minimal

    xn = jnp.stack([(uvs[:, 0] - cx) / fx, (uvs[:, 1] - cy) / fy], -1)
    idx = _sample_minimal(key, n_iters, min_set, valid)
    R_c, t_c = _dlt_pnp(pts_w[idx], xn[idx])

    pc = jnp.einsum("hij,nj->hni", R_c, pts_w, precision=_HI) + t_c[:, None, :]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    uvp = jnp.stack([fx * pc[..., 0] / z + cx, fy * pc[..., 1] / z + cy], -1)
    err = jnp.sum((uvp - uvs[None]) ** 2, -1)
    inl = (err < max_err2) & (pc[..., 2] > 0) & valid[None]
    score = jnp.sum(inl, axis=1)
    best = jnp.argmax(score)
    R_b, t_b, inl_b, n_b = R_c[best], t_c[best], inl[best], score[best]

    # all-inlier DLT refinement, iterated (the minimal-sample pose is
    # rough under noise; the reference also refines with motion-only BA)
    def refine(carry, _):
        R_b, t_b, inl_b, n_b = carry
        w = inl_b.astype(pts_w.dtype)
        # Hartley-normalize over the inlier set (f32 conditioning on TPU)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        c3 = jnp.sum(pts_w * w[:, None], 0) / wsum
        scale = jnp.sqrt(jnp.sum(jnp.sum((pts_w - c3) ** 2, -1) * w) / wsum)
        s3 = 1.0 / jnp.maximum(scale, 1e-9)
        pts_n = (pts_w - c3) * s3
        # weighted DLT: zero out outlier rows
        X, Y, Z = pts_n[:, 0], pts_n[:, 1], pts_n[:, 2]
        u, v = xn[:, 0], xn[:, 1]
        one = jnp.ones_like(X)
        zr = jnp.zeros_like(X)
        r1 = jnp.stack([X, Y, Z, one, zr, zr, zr, zr, -u * X, -u * Y, -u * Z, -u], -1) * w[:, None]
        r2 = jnp.stack([zr, zr, zr, zr, X, Y, Z, one, -v * X, -v * Y, -v * Z, -v], -1) * w[:, None]
        A = jnp.concatenate([r1, r2], axis=0)
        from uvipslam_tpu.ops.twoview import _solve_dlt
        p = _solve_dlt(A[None])[0].reshape(3, 4)
        cn = jnp.sum(pts_n * w[:, None], 0) / wsum
        zc = p[2, :3] @ cn + p[2, 3]
        p = p * jnp.where(zc < 0, -1.0, 1.0)
        M = p[:, :3]
        sc = jnp.exp(jnp.mean(jnp.log(jnp.maximum(jnp.linalg.norm(M, axis=-1), 1e-12))))
        R_r = lie.normalize_rotation(M / sc)
        t_r = (p[:, 3] / sc) / s3 - mv(R_r, c3)
        pc = mv(R_r, pts_w) + t_r
        zz = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        uvp = jnp.stack([fx * pc[:, 0] / zz + cx, fy * pc[:, 1] / zz + cy], -1)
        err = jnp.sum((uvp - uvs) ** 2, -1)
        inl_r = (err < max_err2) & (pc[:, 2] > 0) & valid
        n_r = jnp.sum(inl_r)
        # evolve unconditionally (the first refine can transiently drop
        # below the sample's count before expanding); report best-so-far
        return (R_r, t_r, inl_r, n_r), (R_r, t_r, inl_r, n_r)

    (_, _, _, _), hist = jax.lax.scan(refine, (R_b, t_b, inl_b, n_b), None, length=4)
    hist_R = jnp.concatenate([R_b[None], hist[0]])
    hist_t = jnp.concatenate([t_b[None], hist[1]])
    hist_inl = jnp.concatenate([inl_b[None], hist[2]])
    hist_n = jnp.concatenate([n_b[None], hist[3]])
    k = jnp.argmax(hist_n)
    return hist_R[k], hist_t[k], hist_inl[k], hist_n[k]
