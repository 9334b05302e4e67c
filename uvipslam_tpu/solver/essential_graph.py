"""Essential-graph optimization: Sim3 pose graph over all keyframes.

TPU-native equivalent of Optimizer::OptimizeEssentialGraph
(reference: src/Optimizer.cc:2409-2658 — after a loop closure, optimize
every keyframe's Sim3 over the spanning tree + covisibility + loop
edges with BlockSolver_7_3 LM, then rescale map points).

Redesign: fixed-capacity edge arrays (i, j, measurement Sim3, mask);
the state is [K, 7]-dof (stored as (s, R, t) world->kf); Jacobians per
edge come from `factors.sim3_relative` (autodiff, 7x14); the normal
equations are dense [7K x 7K], solved with Jacobi-scaled LU — at the
reference's keyframe counts (hundreds) this is a trivial MXU problem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.core import lie
from uvipslam_tpu.solver import factors
from uvipslam_tpu.solver.gn import huber_cost, huber_weight, solve_spd

_HI = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("n_iters",))
def optimize_essential_graph(
    kf_s: jax.Array,       # [K] world->kf scales
    kf_R: jax.Array,       # [K, 3, 3]
    kf_t: jax.Array,       # [K, 3]
    kf_valid: jax.Array,   # [K]
    kf_fixed: jax.Array,   # [K] (the loop KF is fixed, reference :2446)
    e_i: jax.Array,        # [E] i32 edge endpoints
    e_j: jax.Array,        # [E]
    m_s: jax.Array,        # [E] measured relative Sim3 (S_i * S_j^-1)
    m_R: jax.Array,        # [E, 3, 3]
    m_t: jax.Array,        # [E, 3]
    e_mask: jax.Array,     # [E]
    n_iters: int = 12,
):
    """Returns (kf_s', kf_R', kf_t'). Edge residual:
    r = log(S_m S_i S_j^{-1}) with left-mult increments on S_i, S_j."""
    dtype = kf_t.dtype
    K = kf_s.shape[0]
    C = K * 7
    free = kf_valid & ~kf_fixed

    def build(state):
        s, R, t = state
        r, J_i, J_j = factors.sim3_relative(
            s[e_i], R[e_i], t[e_i], s[e_j], R[e_j], t[e_j], m_s, m_R, m_t
        )
        w = e_mask.astype(dtype)
        J_i = J_i * free[e_i].astype(dtype)[:, None, None]
        J_j = J_j * free[e_j].astype(dtype)[:, None, None]

        H = jnp.zeros((C, C), dtype)
        g = jnp.zeros((C,), dtype)
        bi = e_i * 7
        bj = e_j * 7
        for (Ja, ba) in ((J_i, bi), (J_j, bj)):
            for (Jb, bb) in ((J_i, bi), (J_j, bj)):
                blk = jnp.einsum("emi,em,emj->eij", Ja, w[:, None] * jnp.ones((1, 7), dtype), Jb, precision=_HI)
                ii = ba[:, None, None] + jnp.arange(7)[None, :, None]
                jjj = bb[:, None, None] + jnp.arange(7)[None, None, :]
                H = H.at[ii, jjj].add(blk)
            gblk = jnp.einsum("emi,em->ei", Ja * w[:, None, None], r, precision=_HI)
            g = g.at[ba[:, None] + jnp.arange(7)[None, :]].add(gblk)

        fixed_diag = jnp.repeat(~free, 7).astype(dtype)
        H = H + jnp.diag(fixed_diag)
        total = jnp.sum(jnp.where(e_mask, jnp.sum(r * r, -1), 0.0))
        return H, g, total

    def retract(state, dc):
        s, R, t = state
        d = dc.reshape(K, 7)
        ds, dR, dt = lie.sim3_exp(d)
        s2, R2, t2 = lie.sim3_compose(ds, dR, dt, s, R, t)
        return (s2, lie.normalize_rotation(R2), t2)

    def body(carry, _):
        state, lam, chi2 = carry
        H, g, _ = build(state)
        dc = solve_spd(H, -g, damping=lam)
        state_new = retract(state, dc)
        _, _, chi2_new = build(state_new)
        accept = chi2_new < chi2
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), state, state_new
        )
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (state, lam, jnp.where(accept, chi2_new, chi2)), None

    _, _, chi2_0 = (None, None, build((kf_s, kf_R, kf_t))[2])
    (state, _, _), _ = jax.lax.scan(
        body, ((kf_s, kf_R, kf_t), jnp.asarray(1e-4, dtype), chi2_0),
        None, length=n_iters,
    )
    return state


def correct_points_after_pose_graph(
    pt_xyz: jax.Array,      # [P, 3]
    pt_ref_kf: jax.Array,   # [P] reference KF per point
    old_s, old_R, old_t,    # [K...] world->kf Sim3 before optimization
    new_s, new_R, new_t,    # [K...] after
    pt_valid: jax.Array,
):
    """Re-express each landmark through its reference KF's corrected Sim3
    (reference: the point-correction sweep in OptimizeEssentialGraph,
    src/Optimizer.cc:2604-2640): x' = S_new^{-1} (S_old x)."""
    k = jnp.clip(pt_ref_kf, 0, old_s.shape[0] - 1)
    cam = lie.sim3_apply(old_s[k], old_R[k], old_t[k], pt_xyz)
    inv = lie.sim3_inverse(new_s[k], new_R[k], new_t[k])
    out = lie.sim3_apply(*inv, cam)
    return jnp.where(pt_valid[:, None], out, pt_xyz)
