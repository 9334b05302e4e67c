"""Two-view geometry: batched RANSAC for F/H, triangulation, motion
recovery.

TPU-native equivalent of the reference Initializer
(reference: src/Initializer.cc — FindHomography/FindFundamental parallel
RANSAC, score-ratio model selection, ReconstructF/ReconstructH with
CheckRT, 8-motion-hypothesis disambiguation) and of the per-frame
cv::findFundamentalMat RANSAC outlier gate (reference:
src/Tracking.cc:1062).

Redesign for XLA: RANSAC is a *fixed-iteration batch* — all `n_iters`
minimal samples are drawn up front, all hypotheses solved by one batched
SVD, all scored densely against all correspondences, and the argmax
taken. No early exit, no adaptive trials: 200 hypotheses of 8x9 SVDs are
microseconds of MXU/VPU work, so exhaustive beats adaptive on this
hardware. Degenerate samples score 0 and lose the argmax naturally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.lie import mm, mv

_HI = jax.lax.Precision.HIGHEST

# chi-square thresholds at 95% for 1/2 dof (ORB-SLAM's constants)
TH_F = 3.841
TH_H = 5.991
SCORE_TH = 5.991


def normalize_points(x: jax.Array, valid: jax.Array):
    """Hartley normalization: zero-mean, unit mean abs deviation
    (the reference Initializer::Normalize). Returns (xn, T [3,3])."""
    w = valid.astype(x.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w[:, None], axis=0) / n
    d = (x - mean) * w[:, None]
    mdev = jnp.sum(jnp.abs(d), axis=0) / n
    s = 1.0 / jnp.maximum(mdev, 1e-8)
    xn = (x - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]],
         [0.0, s[1], -mean[1] * s[1]],
         [0.0, 0.0, 1.0]], dtype=x.dtype
    )
    return xn, T


def _sample_minimal(key, n_iters: int, k: int, valid: jax.Array) -> jax.Array:
    """[n_iters, k] random indices of valid correspondences.

    Gumbel-top-k per iteration gives k distinct valid indices without
    replacement — one batched op, no rejection loops.
    """
    n = valid.shape[0]
    g = jax.random.gumbel(key, (n_iters, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx


def _solve_dlt(A: jax.Array) -> jax.Array:
    """Null vector of each [B, m, n] system (batched-matmul inverse power
    iteration + Newton polish — `jnp.linalg.svd` lowers to a serial TPU
    custom call that was the hottest per-frame op of the tracker)."""
    from uvipslam_tpu.solver.gn import nullvec_ls

    return nullvec_ls(A)


def _project_rank2(F: jax.Array) -> jax.Array:
    """Rank-2 projection without SVD: deflate the smallest right singular
    direction, F2 = F - (F v3) v3^T where v3 = argmin_v |F v|.
    Exactly U diag(s1, s2, 0) V^T."""
    from uvipslam_tpu.solver.gn import nullvec_ls

    v3 = nullvec_ls(F)
    Fv = jnp.einsum("...ij,...j->...i", F, v3, precision=_HI)
    return F - Fv[..., :, None] * v3[..., None, :]


def fundamental_from_8pt(xa: jax.Array, xb: jax.Array) -> jax.Array:
    """Batched 8-point: xa, xb [B, 8, 2] -> F [B, 3, 3] with rank-2
    enforcement (reference: Initializer::ComputeF21)."""
    x1, y1 = xa[..., 0], xa[..., 1]
    x2, y2 = xb[..., 0], xb[..., 1]
    one = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )  # [B, 8, 9]
    f = _solve_dlt(A)
    F = f.reshape(f.shape[:-1] + (3, 3))
    return _project_rank2(F)


def homography_from_4pt(xa: jax.Array, xb: jax.Array) -> jax.Array:
    """Batched DLT: xa, xb [B, 4, 2] -> H [B, 3, 3] (b = H a)."""
    x1, y1 = xa[..., 0], xa[..., 1]
    x2, y2 = xb[..., 0], xb[..., 1]
    z = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -one, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, one, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [B, 8, 9]
    h = _solve_dlt(A)
    return h.reshape(h.shape[:-1] + (3, 3))


def _epipolar_errors(F: jax.Array, xa: jax.Array, xb: jax.Array):
    """Squared point-to-epiline distances, both directions.
    F maps a -> line in b (l = F @ [xa, 1])."""
    ah = jnp.concatenate([xa, jnp.ones_like(xa[..., :1])], axis=-1)
    bh = jnp.concatenate([xb, jnp.ones_like(xb[..., :1])], axis=-1)
    la = jnp.einsum("...ij,nj->...ni", F, ah, precision=_HI)      # lines in b
    lb = jnp.einsum("...ji,nj->...ni", F, bh, precision=_HI)      # lines in a
    num_b = jnp.einsum("...ni,ni->...n", la, bh, precision=_HI) ** 2
    num_a = jnp.einsum("...ni,ni->...n", lb, ah, precision=_HI) ** 2
    den_b = la[..., 0] ** 2 + la[..., 1] ** 2
    den_a = lb[..., 0] ** 2 + lb[..., 1] ** 2
    # A (near-)zero F gives zero epilines: clamping the denominator would
    # award 0 error to every point, letting a degenerate hypothesis win
    # the argmax with a perfect score. Mark those points as gross errors
    # instead so the hypothesis loses.
    bad = 1e12
    d_b = jnp.where(den_b > 1e-12, num_b / jnp.maximum(den_b, 1e-12), bad)
    d_a = jnp.where(den_a > 1e-12, num_a / jnp.maximum(den_a, 1e-12), bad)
    return d_a, d_b


def _homography_errors(H: jax.Array, xa: jax.Array, xb: jax.Array):
    """Squared symmetric transfer errors for H (and H^{-1})."""
    Hinv = lie.inv3x3(H)
    ah = jnp.concatenate([xa, jnp.ones_like(xa[..., :1])], axis=-1)
    bh = jnp.concatenate([xb, jnp.ones_like(xb[..., :1])], axis=-1)
    pb = jnp.einsum("...ij,nj->...ni", H, ah, precision=_HI)
    pa = jnp.einsum("...ij,nj->...ni", Hinv, bh, precision=_HI)
    pb = pb[..., :2] / jnp.where(jnp.abs(pb[..., 2:]) < 1e-12, 1e-12, pb[..., 2:])
    pa = pa[..., :2] / jnp.where(jnp.abs(pa[..., 2:]) < 1e-12, 1e-12, pa[..., 2:])
    d_b = jnp.sum((pb - xb[None]) ** 2, axis=-1)
    d_a = jnp.sum((pa - xa[None]) ** 2, axis=-1)
    return d_a, d_b


def _ransac_score(d_a, d_b, valid, th, sigma2):
    """ORB-SLAM scoring: sum over inliers of (SCORE_TH - d/sigma2) in both
    directions; inlier iff both directions under threshold."""
    # NaNs (from a degenerate minimal sample) must reject, not poison the
    # argmax: nan_to_num maps them to +big so the comparisons below fail.
    ca = jnp.nan_to_num(d_a / sigma2, nan=1e12, posinf=1e12, neginf=1e12)
    cb = jnp.nan_to_num(d_b / sigma2, nan=1e12, posinf=1e12, neginf=1e12)
    in_a = ca < th
    in_b = cb < th
    sc = jnp.where(in_a & valid[None], SCORE_TH - ca, 0.0) + jnp.where(
        in_b & valid[None], SCORE_TH - cb, 0.0
    )
    inlier = in_a & in_b & valid[None]
    return jnp.sum(sc, axis=-1), inlier


@functools.partial(jax.jit, static_argnames=("n_iters",))
def find_fundamental(
    key, xa: jax.Array, xb: jax.Array, valid: jax.Array,
    sigma: float = 1.0, n_iters: int = 200,
):
    """RANSAC fundamental matrix. Returns (F, score, inliers [N] bool)."""
    xan, Ta = normalize_points(xa, valid)
    xbn, Tb = normalize_points(xb, valid)
    idx = _sample_minimal(key, n_iters, 8, valid)
    Fs = fundamental_from_8pt(xan[idx], xbn[idx])
    F_full = mm(jnp.swapaxes(Tb, -1, -2)[None], mm(Fs, Ta[None]))
    d_a, d_b = _epipolar_errors(F_full, xa, xb)
    score, inlier = _ransac_score(d_a, d_b, valid, TH_F, sigma * sigma)
    best = jnp.argmax(score)

    # refinement: re-solve on ALL inliers of the best hypothesis (masked
    # rows drop out of the least-squares null space), then re-score.
    w = inlier[best].astype(xa.dtype)[:, None]
    x1, y1 = xan[:, 0], xan[:, 1]
    x2, y2 = xbn[:, 0], xbn[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=-1,
    ) * w
    f = _solve_dlt(A[None])[0]
    Fr = _project_rank2(f.reshape(3, 3))
    Fr_full = mm(Tb.T, mm(Fr, Ta))
    d_a2, d_b2 = _epipolar_errors(Fr_full[None], xa, xb)
    score2, inlier2 = _ransac_score(d_a2, d_b2, valid, TH_F, sigma * sigma)
    use_ref = score2[0] >= score[best]
    F_out = jnp.where(use_ref, Fr_full, F_full[best])
    return (
        F_out,
        jnp.where(use_ref, score2[0], score[best]),
        jnp.where(use_ref, inlier2[0], inlier[best]),
    )


@functools.partial(jax.jit, static_argnames=("n_iters",))
def find_homography(
    key, xa: jax.Array, xb: jax.Array, valid: jax.Array,
    sigma: float = 1.0, n_iters: int = 200,
):
    """RANSAC homography. Returns (H, score, inliers [N] bool)."""
    xan, Ta = normalize_points(xa, valid)
    xbn, Tb = normalize_points(xb, valid)
    idx = _sample_minimal(key, n_iters, 4, valid)
    Hs = homography_from_4pt(xan[idx], xbn[idx])
    H_full = mm(lie.inv3x3(Tb)[None], mm(Hs, Ta[None]))
    d_a, d_b = _homography_errors(H_full, xa, xb)
    score, inlier = _ransac_score(d_a, d_b, valid, TH_H, sigma * sigma)
    best = jnp.argmax(score)

    # all-inlier DLT refinement, re-scored (see find_fundamental)
    w = inlier[best].astype(xa.dtype)[:, None]
    x1, y1 = xan[:, 0], xan[:, 1]
    x2, y2 = xbn[:, 0], xbn[:, 1]
    z = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -one, y2 * x1, y2 * y1, y2], axis=-1) * w
    r2 = jnp.stack([x1, y1, one, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1) * w
    A = jnp.concatenate([r1, r2], axis=0)
    h = _solve_dlt(A[None])[0]
    Hr_full = mm(lie.inv3x3(Tb), mm(h.reshape(3, 3), Ta))
    d_a2, d_b2 = _homography_errors(Hr_full[None], xa, xb)
    score2, inlier2 = _ransac_score(d_a2, d_b2, valid, TH_H, sigma * sigma)
    use_ref = score2[0] >= score[best]
    return (
        jnp.where(use_ref, Hr_full, H_full[best]),
        jnp.where(use_ref, score2[0], score[best]),
        jnp.where(use_ref, inlier2[0], inlier[best]),
    )


# ---------------------------------------------------------------------------
# triangulation + motion recovery
# ---------------------------------------------------------------------------


def triangulate_linear(
    P1: jax.Array, P2: jax.Array, x1: jax.Array, x2: jax.Array
) -> jax.Array:
    """Linear (DLT) triangulation. P1, P2: [3, 4] or per-point [N, 3, 4]
    projections; x1, x2: [N, 2] (in the projection's input units).
    Returns [N, 3] (reference: Initializer::Triangulate, SVD 4x4)."""
    def prows(P, x):
        if P.ndim == 2:
            return (
                x[..., 0:1] * P[2][None] - P[0][None],
                x[..., 1:2] * P[2][None] - P[1][None],
            )
        return (
            x[..., 0:1] * P[..., 2, :] - P[..., 0, :],
            x[..., 1:2] * P[..., 2, :] - P[..., 1, :],
        )

    r1a, r1b = prows(P1, x1)
    r2a, r2b = prows(P2, x2)
    A = jnp.stack([r1a, r1b, r2a, r2b], axis=-2)  # [N, 4, 4]
    # Inhomogeneous closed-form solve (X = [x y z 1]): batched 4x4 SVD
    # lowers to a serial one-sided-Jacobi while-loop on TPU (~22 ms for
    # 400 points, the whole keyframe budget); the 3x3 normal-equation
    # solve with the closed-form inverse is pure batched VPU work.
    # Points near infinity (homogeneous w ~ 0) come out huge and are
    # rejected by the callers' cheirality/reprojection/parallax gates —
    # the same fate the SVD solution met.
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    B = A[..., :3]
    c = A[..., 3]
    H = jnp.einsum("...ri,...rj->...ij", B, B,
                   precision=jax.lax.Precision.HIGHEST)
    g = -jnp.einsum("...ri,...r->...i", B, c,
                    precision=jax.lax.Precision.HIGHEST)
    eye = jnp.eye(3, dtype=A.dtype)
    return mv(lie.inv3x3(H + 1e-10 * eye), g)


def decompose_essential(E: jax.Array):
    """E -> (R1, R2, t): the 4 candidate motions are (R1,t),(R1,-t),
    (R2,t),(R2,-t) (reference: Initializer::DecomposeE)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    d = jnp.linalg.det(mm(U, Vt))
    Vt = Vt * jnp.where(d < 0, -1.0, 1.0)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = mm(mm(U, W), Vt)
    R2 = mm(mm(U, W.T), Vt)
    t = U[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return R1, R2, t


def check_rt(
    R: jax.Array, t: jax.Array, x1: jax.Array, x2: jax.Array,
    inlier: jax.Array, K: jax.Array, sigma: float = 1.0,
):
    """Score one motion hypothesis by triangulating all inlier matches:
    counts cheirality+reprojection+parallax-passing points
    (reference: Initializer::CheckRT). x1, x2 are *undistorted pixels*.

    Returns (n_good, points3d [N, 3], good_mask [N], parallax_deg50).
    """
    dtype = x1.dtype
    th2 = 4.0 * sigma * sigma
    P1 = jnp.concatenate([K, jnp.zeros((3, 1), dtype)], axis=1)
    Rt = jnp.concatenate([R, t[:, None]], axis=1)
    P2 = mm(K, Rt)

    X = triangulate_linear(P1, P2, x1, x2)

    finite = jnp.all(jnp.isfinite(X), axis=-1)
    z1 = X[:, 2]
    Xc2 = mv(R, X) + t
    z2 = Xc2[:, 2]

    # parallax between the two viewing rays
    C2 = -mv(R.T, t)
    r1 = X
    r2 = X - C2
    cosp = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )

    # reprojection errors
    u1 = mv(K, X / jnp.where(jnp.abs(z1[:, None]) < 1e-12, 1e-12, z1[:, None]))[:, :2]
    u2 = mv(K, Xc2 / jnp.where(jnp.abs(z2[:, None]) < 1e-12, 1e-12, z2[:, None]))[:, :2]
    e1 = jnp.sum((u1 - x1) ** 2, axis=-1)
    e2 = jnp.sum((u2 - x2) ** 2, axis=-1)

    good = (
        inlier & finite & (z1 > 0) & (z2 > 0)
        & (cosp < 0.99998) & (e1 < th2) & (e2 < th2)
    )
    n_good = jnp.sum(good)

    # 50th-best parallax angle like the reference's vCosParallax[idx]
    par = jnp.degrees(jnp.arccos(jnp.clip(cosp, -1.0, 1.0)))
    par = jnp.where(good, par, 0.0)
    k = min(50, cosp.shape[-1])
    topk_par, _ = jax.lax.top_k(-jnp.where(good, cosp, 1.0), k)
    # parallax of min(50, n_good)-th point
    j = jnp.minimum(n_good - 1, k - 1).astype(jnp.int32)
    cos_sel = -topk_par[jnp.clip(j, 0, k - 1)]
    parallax = jnp.degrees(jnp.arccos(jnp.clip(cos_sel, -1.0, 1.0)))
    parallax = jnp.where(n_good > 0, parallax, 0.0)
    return n_good, X, good, parallax


def reconstruct_from_fundamental(
    F: jax.Array, K: jax.Array, x1: jax.Array, x2: jax.Array,
    inlier: jax.Array, sigma: float = 1.0,
):
    """Pick the best of the 4 E-decomposition motions by CheckRT
    (reference: Initializer::ReconstructF). Returns dict with R, t,
    points, good mask, n_good, parallax, and an `ok` flag replicating the
    reference's acceptance tests (clear winner, enough points, parallax).
    """
    E = mm(mm(K.T, F), K)
    R1, R2, t = decompose_essential(E)
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t, -t, t, -t])

    def chk(R_, t_):
        return check_rt(R_, t_, x1, x2, inlier, K, sigma)

    n_good, X, good, par = jax.vmap(chk)(cands_R, cands_t)
    best = jnp.argmax(n_good)
    n_best = n_good[best]
    n_sorted = jnp.sort(n_good)
    second = n_sorted[-2]
    n_inliers = jnp.sum(inlier)
    min_good = jnp.maximum(0.9 * n_inliers, 50.0)
    ok = (
        (n_best > second * 1.7)
        & (n_best.astype(x1.dtype) >= min_good)
        & (par[best] > 1.0)
    )
    return dict(
        R=cands_R[best], t=cands_t[best], points=X[best], good=good[best],
        n_good=n_best, parallax=par[best], ok=ok,
    )


def decompose_homography(H: jax.Array, K: jax.Array):
    """Faugeras-Lustman decomposition of a calibrated homography into the
    8 candidate (R, t, n) motions (reference: Initializer::ReconstructH —
    SVD of A = K^-1 H K, cases d' = d2 and d' = -d2, 4 sign combinations
    each). Returns (Rs [8, 3, 3], ts [8, 3], ns [8, 3])."""
    dtype = H.dtype
    A = mm(lie.inv3x3(K), mm(H, K))
    U, d, Vt = jnp.linalg.svd(A)
    V = jnp.swapaxes(Vt, -1, -2)
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = d[0], d[1], d[2]

    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / denom)
    aux3 = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / denom)
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0], dtype) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0], dtype) * aux3

    d2s = jnp.where(jnp.abs(d2) < 1e-12, 1e-12, d2)

    # case d' = d2
    sin_t = (d1 - d3) * x1s * x3s / d2s
    cos_t = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2s)

    def rot_a(ct, st):
        return jnp.array([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]], dtype)

    Rp_a = jax.vmap(rot_a)(jnp.broadcast_to(cos_t, (4,)), sin_t)
    tp_a = (d1 - d3) * jnp.stack(
        [x1s, jnp.zeros(4, dtype), -x3s], axis=-1)
    np_a = jnp.stack([x1s, jnp.zeros(4, dtype), x3s], axis=-1)

    # case d' = -d2
    sin_p = (d1 + d3) * x1s * x3s / d2s
    cos_p = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2s)

    def rot_b(cp, sp):
        return jnp.array([[cp, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cp]], dtype)

    Rp_b = jax.vmap(rot_b)(jnp.broadcast_to(cos_p, (4,)), sin_p)
    tp_b = (d1 + d3) * jnp.stack([x1s, jnp.zeros(4, dtype), x3s], axis=-1)
    np_b = np_a

    Rp = jnp.concatenate([Rp_a, Rp_b])     # [8, 3, 3]
    tp = jnp.concatenate([tp_a, tp_b])     # [8, 3]
    np_ = jnp.concatenate([np_a, np_b])

    Rs = s * jnp.einsum("ij,bjk,lk->bil", U, Rp, V, precision=_HI)
    ts = jnp.einsum("ij,bj->bi", U, tp, precision=_HI)
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    ns = jnp.einsum("ij,bj->bi", V, np_, precision=_HI)
    return Rs, ts, ns


def reconstruct_from_homography(
    H: jax.Array, K: jax.Array, x1: jax.Array, x2: jax.Array,
    inlier: jax.Array, sigma: float = 1.0,
):
    """Pick the best of the 8 homography motions by CheckRT (reference:
    Initializer::ReconstructH acceptance: clear winner at ratio 0.75,
    >= 90% of inliers triangulated, parallax gate). Same output dict as
    reconstruct_from_fundamental."""
    Rs, ts, _ = decompose_homography(H, K)

    def chk(R_, t_):
        return check_rt(R_, t_, x1, x2, inlier, K, sigma)

    n_good, X, good, par = jax.vmap(chk)(Rs, ts)
    best = jnp.argmax(n_good)
    n_best = n_good[best]
    n_sorted = jnp.sort(n_good)
    second = n_sorted[-2]
    n_inliers = jnp.sum(inlier)
    min_good = jnp.maximum(0.9 * n_inliers, 50.0)
    ok = (
        (second.astype(x1.dtype) < 0.75 * n_best.astype(x1.dtype))
        & (n_best.astype(x1.dtype) >= min_good)
        & (par[best] > 1.0)
    )
    return dict(
        R=Rs[best], t=ts[best], points=X[best], good=good[best],
        n_good=n_best, parallax=par[best], ok=ok,
    )


def initialize_two_view(
    key, xa: jax.Array, xb: jax.Array, valid: jax.Array, K: jax.Array,
    sigma: float = 1.0, n_iters: int = 200,
):
    """Parallel H/F model selection + motion recovery — the full
    reference initializer (reference: Initializer::Initialize — compute
    BOTH models, choose by RH = SH/(SH+SF) > 0.40, then ReconstructH or
    ReconstructF). Jittable: both reconstructions share output structure
    and are selected with lax.cond. Returns the rec dict + model flag."""
    kf_, kh_ = jax.random.split(key)
    F, sf, inl_f = find_fundamental(kf_, xa, xb, valid, sigma, n_iters)
    Hm, sh, inl_h = find_homography(kh_, xa, xb, valid, sigma, n_iters)
    rh = sh / jnp.maximum(sh + sf, 1e-9)
    use_h = rh > 0.40

    def do_h(_):
        return reconstruct_from_homography(Hm, K, xa, xb, inl_h, sigma)

    def do_f(_):
        return reconstruct_from_fundamental(F, K, xa, xb, inl_f, sigma)

    rec = jax.lax.cond(use_h, do_h, do_f, None)
    rec["used_homography"] = use_h
    rec["inliers"] = jnp.where(use_h, inl_h, inl_f)
    return rec
