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


def solve_spd(H: jax.Array, b: jax.Array, damping: jax.Array | float = 0.0) -> jax.Array:
    """Solve (H + damping*diag(H)) x = b with Jacobi pre-scaling for f32
    conditioning. H: [n, n] SPD-ish, b: [n]."""
    d = jnp.diagonal(H, axis1=-2, axis2=-1)
    H = H + jnp.asarray(damping) * jnp.eye(H.shape[-1], dtype=H.dtype) * jnp.maximum(d, 1e-8)
    s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12))
    Hs = H * s[..., :, None] * s[..., None, :]
    bs = b * s
    # cho_factor on TPU: use jnp.linalg.solve (LU) — small systems
    y = jnp.linalg.solve(Hs, bs[..., None])[..., 0]
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

    def body(carry, _):
        x, lam, chi2 = carry
        H, g, _ = residual_fn(x)
        dx = solve_spd(H, -g, damping=lam)
        x_new = retract_fn(x, dx)
        _, _, chi2_new = residual_fn(x_new)
        accept = chi2_new < chi2
        x_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), x, x_new
        )
        lam_out = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        chi2_out = jnp.where(accept, chi2_new, chi2)
        return (x_out, lam_out, chi2_out), None

    _, _, chi2_0 = residual_fn(x0)
    lam = jnp.asarray(lambda0, chi2_0.dtype)
    (x, lam, chi2), _ = jax.lax.scan(body, (x0, lam, chi2_0), None, length=n_iters)
    return x, chi2
