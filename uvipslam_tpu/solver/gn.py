"""Core Gauss-Newton / Levenberg-Marquardt machinery.

Replaces g2o's SparseOptimizer/BlockSolver/LM algorithm
(reference: Thirdparty/g2o/g2o/core) with fixed-shape dense solves:
every graph the reference builds is either tiny (pose-only: 6-15 dof),
window-sized (local BA: ~165 pose dof + Schur-eliminated points), or
pose-graph-sized (essential graph: 7*KF dof, dense-solvable on TPU for
the capacities we run). LM accept/reject is data-parallel `where`, not
control flow — iterations run lock-step under `lax.scan`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def huber_weight(chi2: jax.Array, delta2: float) -> jax.Array:
    """IRLS weight of the Huber kernel: 1 inside, delta/|r| outside.
    chi2 is the squared weighted residual norm; delta2 = delta^2."""
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))


def robust_weight(chi2: jax.Array, delta2: float, robust) -> jax.Array:
    """Huber IRLS weight, identity when `robust` (traced 0/1) is 0 — a
    traced flag instead of a Python bool lets solver rounds compile as
    ONE lax.scan body rather than `rounds` unrolled copies."""
    return jnp.where(robust > 0, huber_weight(chi2, delta2),
                     jnp.ones_like(chi2))


def huber_cost(chi2: jax.Array, delta2: float) -> jax.Array:
    """The actual Huber objective rho(chi2): chi2 inside the kernel,
    2*delta*sqrt(chi2) - delta^2 outside.

    LM accept/reject MUST use this (not a hard cap): a capped total is
    blind to progress on saturated edges while the IRLS gradient still
    pushes on them, which manufactures false stationary points where
    every step is 'rejected'."""
    safe = jnp.maximum(chi2, 0.0)
    return jnp.where(
        chi2 <= delta2, safe, 2.0 * jnp.sqrt(delta2 * safe) - delta2
    )


def inv_spd(H: jax.Array) -> jax.Array:
    """Batched SPD inverse by recursive 2x2 block Schur elimination down
    to closed-form 1/2/3-dim bases.

    `jnp.linalg.inv`/`solve` lower to batched LU on TPU — a SERIAL
    routine (~ms even for [2048, 3, 3]); this recursion is nothing but
    parallel (batched) matmuls and elementwise arithmetic. Recursion
    depth is log2(n); intended for the solver's small dense systems
    (6/9/15-dof pose blocks, <=16-KF window Schur complements). Inputs
    should be Jacobi-scaled/damped for f32 conditioning (solve_spd does)."""
    n = H.shape[-1]
    if n == 1:
        return 1.0 / jnp.where(jnp.abs(H) < 1e-20, 1e-20, H)
    if n == 2:
        a, b = H[..., 0, 0], H[..., 0, 1]
        c, d = H[..., 1, 0], H[..., 1, 1]
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
        row0 = jnp.stack([d, -b], -1)
        row1 = jnp.stack([-c, a], -1)
        return jnp.stack([row0, row1], -2) / det[..., None, None]
    if n == 3:
        from uvipslam_tpu.core.lie import inv3x3
        return inv3x3(H)
    m = (n // 2 + 2) // 3 * 3 if n % 3 == 0 else n // 2   # keep 3-aligned splits
    m = min(max(m, 1), n - 1)
    A = H[..., :m, :m]
    B = H[..., :m, m:]
    Cb = H[..., m:, m:]
    Ai = inv_spd(A)
    AiB = jnp.einsum("...ij,...jk->...ik", Ai, B, precision=_HI)
    S = Cb - jnp.einsum("...ji,...jk->...ik", B, AiB, precision=_HI)
    Si = inv_spd(S)
    TR = -jnp.einsum("...ij,...jk->...ik", AiB, Si, precision=_HI)
    TL = Ai - jnp.einsum("...ij,...kj->...ik", TR, AiB, precision=_HI)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(TR, -1, -2), Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inv_spd_scaled(H: jax.Array, refine: int = 2) -> jax.Array:
    """Jacobi-scaled `inv_spd` with Newton iterative refinement
    (X <- X (2I - H X)) to recover the digits the f32 block recursion
    loses on ill-conditioned systems. Still pure batched matmuls."""
    s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12))
    Hs = H * s[..., :, None] * s[..., None, :]
    X = inv_spd(Hs)
    I2 = 2.0 * jnp.eye(H.shape[-1], dtype=H.dtype)
    for _ in range(refine):
        HX = jnp.einsum("...ij,...jk->...ik", Hs, X, precision=_HI)
        X = jnp.einsum("...ij,...jk->...ik", X, I2 - HX, precision=_HI)
    return X * s[..., :, None] * s[..., None, :]


def nullvec_ls(A: jax.Array, eps_rel: float = 3e-6, squarings: int = 3,
               newton: int = 2) -> jax.Array:
    """Batched least-squares null vector of [.., m, n] systems
    (argmin_{|v|=1} |A v|) — batched matmuls only, no LAPACK.

    `jnp.linalg.svd` on TPU lowers to a SERIAL custom call that costs
    tens of ms for the [200, 8, 9] RANSAC hypothesis batches (measured:
    the single hottest per-frame op of the round-2 tracker).

    Algorithm: (1) SEED by inverse power iteration on the Gram matrix —
    the regularized inverse (M/tr + eps I)^-1 is a spectral filter
    concentrating on the null direction; each squaring squares the
    eigen-ratio; the largest-norm column is the amplified null
    direction. (2) POLISH by deflated Newton steps whose residual is
    evaluated THROUGH A (g = A^T (A v)): forming the Gram costs kappa^2
    in f32, but the matvec residual stays relatively accurate as Av -> 0,
    so the fixed point reaches SVD-grade accuracy (validated ~5e-7
    median error vs f64 SVD on real epipolar systems).

    Near-degenerate samples (lam2 within f32 noise of lam1) return an
    arbitrary vector of the ambiguous subspace — exactly the RANSAC
    hypotheses the consensus scoring rejects."""
    n = A.shape[-1]
    dtype = A.dtype
    M = jnp.einsum("...mi,...mj->...ij", A, A, precision=_HI)
    tr = jnp.trace(M, axis1=-2, axis2=-1)
    scale = jnp.maximum(tr, jnp.asarray(1e-30, dtype))
    Mn = M / scale[..., None, None]
    An = A / jnp.sqrt(scale)[..., None, None]
    P = inv_spd_scaled(Mn + eps_rel * jnp.eye(n, dtype=dtype))
    for _ in range(squarings):
        P = P / jnp.maximum(
            jnp.max(jnp.abs(P), axis=(-2, -1), keepdims=True), 1e-30)
        P = jnp.einsum("...ij,...jk->...ik", P, P, precision=_HI)
    cn = jnp.sum(P * P, axis=-2)
    j = jnp.argmax(cn, axis=-1)
    v = jnp.take_along_axis(
        P, jnp.broadcast_to(j[..., None, None], P.shape[:-2] + (n, 1)),
        axis=-1)[..., 0]
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    if newton:
        # deflation lifts the null direction to ~1 so the solve is
        # well-conditioned; the tangent projection keeps |v| = 1
        Mdefl = Mn + jnp.einsum("...i,...j->...ij", v, v)
        X = inv_spd_scaled(Mdefl)
        for _ in range(newton):
            Av = jnp.einsum("...mi,...i->...m", An, v, precision=_HI)
            g = jnp.einsum("...mi,...m->...i", An, Av, precision=_HI)
            d = -jnp.einsum("...ij,...j->...i", X, g, precision=_HI)
            d = d - v * jnp.einsum("...i,...i->...", v, d)[..., None]
            v = v + d
            v = v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def solve_spd(H: jax.Array, b: jax.Array, damping: jax.Array | float = 0.0) -> jax.Array:
    """Solve (H + damping*diag(H)) x = b with Jacobi pre-scaling for f32
    conditioning. H: [.., n, n] SPD-ish, b: [.., n].

    Solves through `inv_spd` (block-recursive batched matmuls) with two
    Newton refinement steps: `jnp.linalg.solve` lowers to a SERIAL LU
    custom call on TPU — measured ~0.3-0.5 ms even for a single 96x96
    system, which multiplied across the LM iterations of every frame was
    a top-3 cost of the round-2 tracker. The matmul recursion runs on
    the MXU at every size this solver sees (6..448 dof)."""
    d = jnp.diagonal(H, axis1=-2, axis2=-1)
    H = H + jnp.asarray(damping) * jnp.eye(H.shape[-1], dtype=H.dtype) * jnp.maximum(d, 1e-8)
    s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12))
    Hs = H * s[..., :, None] * s[..., None, :]
    bs = b * s
    X = inv_spd(Hs)
    y = jnp.einsum("...ij,...j->...i", X, bs, precision=_HI)
    # two Newton/iterative-refinement steps on the SOLUTION (cheaper than
    # refining the inverse: matvecs, not matmuls)
    for _ in range(2):
        r = bs - jnp.einsum("...ij,...j->...i", Hs, y, precision=_HI)
        y = y + jnp.einsum("...ij,...j->...i", X, r, precision=_HI)
    return y * s


def accumulate_normal_eqs(J: jax.Array, r: jax.Array, w: jax.Array):
    """Sum_e w_e * J_e^T J_e and Sum_e w_e * J_e^T r_e over the edge axis.

    J: [E, m, n], r: [E, m], w: [E] (>=0; masked edges get w=0).
    Returns (H [n, n], g [n]).
    """
    Jw = J * w[:, None, None]
    H = jnp.einsum("emi,emj->ij", Jw, J, precision=_HI)
    g = jnp.einsum("emi,em->i", Jw, r, precision=_HI)
    return H, g


def lm_solve(
    x0,
    residual_fn,
    retract_fn,
    n_iters: int = 10,
    lambda0: float = 1e-4,
):
    """Generic dense LM over a manifold point `x0` (any pytree).

    residual_fn(x) -> (H [n,n], g [n], chi2 scalar): the caller builds
    the (robustly weighted) normal equations for the current estimate.
    retract_fn(x, dx [n]) -> x'.

    Accept/reject without host control flow: candidate steps that do not
    decrease chi2 are discarded via tree-wise `where`, and lambda is
    scaled by 0.5 (accept) or 4.0 (reject), clamped to [1e-9, 1e6].
    """

    # One residual build per iteration: the accepted candidate's normal
    # equations are CARRIED into the next iteration instead of being
    # rebuilt (the naive accept/reject loop evaluates residual_fn twice
    # per step — residual assembly dominates LM cost for these graphs).
    def body(carry, _):
        x, H, g, lam, chi2 = carry
        dx = solve_spd(H, -g, damping=lam)
        x_new = retract_fn(x, dx)
        H_new, g_new, chi2_new = residual_fn(x_new)
        accept = chi2_new < chi2
        x_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), x, x_new
        )
        H_out = jnp.where(accept, H_new, H)
        g_out = jnp.where(accept, g_new, g)
        lam_out = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        chi2_out = jnp.where(accept, chi2_new, chi2)
        return (x_out, H_out, g_out, lam_out, chi2_out), None

    H0, g0, chi2_0 = residual_fn(x0)
    lam = jnp.asarray(lambda0, chi2_0.dtype)
    (x, _, _, lam, chi2), _ = jax.lax.scan(
        body, (x0, H0, g0, lam, chi2_0), None, length=n_iters)
    return x, chi2
