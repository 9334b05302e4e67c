import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.preintegration import preintegrate
from uvipslam_tpu.core.state import NavState
from uvipslam_tpu.solver import factors
from uvipslam_tpu.solver.pose_opt import pose_optimization_se3, pose_optimization_vi

FX, FY, CX, CY = 420.0, 420.0, 320.0, 240.0


def synth_scene(n=150, seed=0):
    rs = np.random.RandomState(seed)
    pts = np.stack([rs.uniform(-2, 2, n), rs.uniform(-1.5, 1.5, n), rs.uniform(3, 8, n)], -1)
    Rcw = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.08])))
    tcw = np.array([0.2, -0.1, 0.3])
    pc = pts @ Rcw.T + tcw
    uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1)
    return jnp.asarray(pts), jnp.asarray(Rcw), jnp.asarray(tcw), jnp.asarray(uv)


class TestJacobians:
    """Analytic Jacobians must match autodiff of the residuals."""

    def test_reproj_se3(self):
        pts, Rcw, tcw, uv = synth_scene(5)

        def r_of(dx, p):
            dR, dt = lie.se3_exp(dx)
            R2, t2 = lie.mm(dR, Rcw), lie.mv(dR, tcw) + dt
            r, _, _ = factors.reproj_se3(R2, t2, p, uv, FX, FY, CX, CY)
            return r

        r0, Jp, Jx = factors.reproj_se3(Rcw, tcw, pts, uv, FX, FY, CX, CY)
        J_auto = jax.jacfwd(r_of)(jnp.zeros(6, jnp.float64), pts)
        np.testing.assert_allclose(np.asarray(Jp), np.asarray(J_auto), atol=1e-6)
        J_pt = jax.jacfwd(lambda p: r_of(jnp.zeros(6, jnp.float64), p))(pts)
        # extract block-diagonal (each residual i depends only on point i)
        Jpt_diag = np.asarray(J_pt)[np.arange(5), :, np.arange(5), :]
        np.testing.assert_allclose(np.asarray(Jx), Jpt_diag, atol=1e-6)

    def test_reproj_navstate(self):
        pts, _, _, uv = synth_scene(4)
        R_wb = lie.so3_exp(jnp.asarray([0.1, 0.2, -0.1]))
        p_wb = jnp.asarray([0.3, -0.2, 0.1])
        Rcb = lie.so3_exp(jnp.asarray([0.01, 1.5, 0.0]))
        tcb = jnp.asarray([0.02, -0.15, 0.01])

        def r_of(d9):
            ns = NavState.identity(dtype=jnp.float64)
            ns = dataclasses.replace(ns, p=p_wb, R=R_wb).inc_small_pvr(d9)
            r, _, _ = factors.reproj_navstate(ns.p, ns.R, pts, uv, Rcb, tcb, FX, FY, CX, CY)
            return r

        r0, Jp, Jx = factors.reproj_navstate(p_wb, R_wb, pts, uv, Rcb, tcb, FX, FY, CX, CY)
        J_auto = jax.jacfwd(r_of)(jnp.zeros(9, jnp.float64))
        np.testing.assert_allclose(np.asarray(Jp), np.asarray(J_auto), atol=1e-6)

    def test_preint_pvr_jacobians(self):
        key = jax.random.PRNGKey(0)
        T = 40
        omg = 0.3 * jax.random.normal(key, (T, 3), jnp.float64)
        acc = jax.random.normal(jax.random.PRNGKey(1), (T, 3), jnp.float64) + jnp.array([0, 0, 9.81])
        dts = jnp.full((T,), 0.005, jnp.float64)
        z = jnp.zeros(3, jnp.float64)
        M = preintegrate(omg, acc, dts, jnp.ones(T), z, z, 0.01, 0.1)
        g = jnp.array([0.0, 0.0, -9.81], jnp.float64)

        ns_i = NavState.identity(dtype=jnp.float64)
        ns_i = dataclasses.replace(
            ns_i, p=jnp.asarray([1.0, 2.0, 0.5]), v=jnp.asarray([0.3, -0.1, 0.2]),
            R=lie.so3_exp(jnp.asarray([0.2, 0.1, -0.3])),
        )
        ns_j = dataclasses.replace(
            ns_i, p=jnp.asarray([1.2, 2.1, 0.4]), v=jnp.asarray([0.5, 0.0, 0.1]),
            R=lie.so3_exp(jnp.asarray([0.25, 0.05, -0.28])),
        )
        dbg = jnp.asarray([0.001, -0.002, 0.0015])
        dba = jnp.asarray([0.01, 0.02, -0.01])

        def r_of(di, dj, db):
            nsi = ns_i.inc_small_pvr(di)
            nsj = ns_j.inc_small_pvr(dj)
            r, *_ = factors.preint_pvr(
                nsi.p, nsi.v, nsi.R, nsj.p, nsj.v, nsj.R,
                dbg + db[:3], dba + db[3:],
                M.dP, M.dV, M.dR, M.J_P_bg, M.J_P_ba, M.J_V_bg, M.J_V_ba,
                M.J_R_bg, M.dt, g,
            )
            return r

        z9 = jnp.zeros(9, jnp.float64)
        z6 = jnp.zeros(6, jnp.float64)
        r0, J_i, J_j, J_b = factors.preint_pvr(
            ns_i.p, ns_i.v, ns_i.R, ns_j.p, ns_j.v, ns_j.R, dbg, dba,
            M.dP, M.dV, M.dR, M.J_P_bg, M.J_P_ba, M.J_V_bg, M.J_V_ba,
            M.J_R_bg, M.dt, g,
        )
        Ji_a = jax.jacfwd(r_of, argnums=0)(z9, z9, z6)
        Jj_a = jax.jacfwd(r_of, argnums=1)(z9, z9, z6)
        Jb_a = jax.jacfwd(r_of, argnums=2)(z9, z9, z6)
        np.testing.assert_allclose(np.asarray(J_i), np.asarray(Ji_a), atol=1e-7)
        np.testing.assert_allclose(np.asarray(J_j), np.asarray(Jj_a), atol=1e-7)
        np.testing.assert_allclose(np.asarray(J_b), np.asarray(Jb_a), atol=1e-7)

    def test_depth_projected_residual(self):
        """Residual formula sanity: perfectly consistent states give ~0."""
        ns_i = NavState.identity(dtype=jnp.float64)
        dT = jnp.asarray(0.5, jnp.float64)
        # stationary, no IMU displacement, measurement == z
        r, Ji, Jj, Jb = factors.depth_projected(
            ns_i.p, ns_i.v, ns_i.R, ns_i.p, ns_i.dbg, ns_i.dba,
            jnp.zeros(3, jnp.float64), jnp.zeros((3, 3), jnp.float64),
            jnp.zeros((3, 3), jnp.float64), dT, jnp.asarray(0.0), jnp.asarray(0.5),
            gravity_z=0.0,
        )
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)

    def test_sim3_relative_zero_at_consistency(self):
        xi = jax.random.normal(jax.random.PRNGKey(2), (7,), jnp.float64) * 0.3
        S_i = lie.sim3_exp(xi)
        xj = jax.random.normal(jax.random.PRNGKey(3), (7,), jnp.float64) * 0.3
        S_j = lie.sim3_exp(xj)
        S_m = lie.sim3_compose(*S_j, *lie.sim3_inverse(*S_i))  # measurement = Sj * Si^-1
        # r = log(Sm * Si * Sj^-1) = 0
        r, Ji, Jj = factors.sim3_relative(*S_i, *S_j, *S_m)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)
        assert Ji.shape == (7, 7) and Jj.shape == (7, 7)


class TestPoseOptimizationSE3:
    def test_recovers_pose_with_outliers(self):
        pts, Rcw, tcw, uv = synth_scene(150)
        rs = np.random.RandomState(1)
        uv_noisy = np.asarray(uv) + rs.randn(150, 2) * 0.5
        out = rs.choice(150, 30, replace=False)
        uv_noisy[out] += rs.uniform(20, 80, (30, 2))
        # perturbed initial pose
        dR, dt = lie.se3_exp(jnp.asarray([0.05, -0.03, 0.04, 0.03, -0.05, 0.02], jnp.float64))
        R0 = lie.mm(dR, Rcw)
        t0 = lie.mv(dR, tcw) + dt

        R_opt, t_opt, inlier, n_in = pose_optimization_se3(
            R0, t0, pts, jnp.asarray(uv_noisy), jnp.ones(150, bool),
            jnp.ones(150, jnp.float64), FX, FY, CX, CY,
        )
        ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(lie.mm(jnp.swapaxes(R_opt, -1, -2), Rcw)))))
        terr = np.linalg.norm(np.asarray(t_opt - tcw))
        assert ang < 0.1, ang
        assert terr < 0.01, terr
        inl = np.asarray(inlier)
        assert inl[out].mean() < 0.1          # outliers rejected
        mask = np.ones(150, bool); mask[out] = False
        assert inl[mask].mean() > 0.95        # inliers kept


class TestPoseOptimizationVI:
    def test_tracks_with_imu_and_depth(self):
        """Body moves with constant velocity; solve for current NavState
        given ref state + preint + reprojections + depth."""
        rs = np.random.RandomState(2)
        g_w = jnp.asarray([0.0, 0.0, -9.81], jnp.float64)
        dt_img = 0.25
        T = 50
        dts = jnp.full((T,), dt_img / T, jnp.float64)
        v0 = jnp.asarray([0.4, 0.0, -0.2], jnp.float64)
        # IMU: stationary rotation, specific force = -g in body (R=I), plus 0
        omg = jnp.zeros((T, 3), jnp.float64)
        acc = jnp.broadcast_to(-np.asarray(g_w), (T, 3)).astype(jnp.float64)
        z3 = jnp.zeros(3, jnp.float64)
        M = preintegrate(omg, acc, dts, jnp.ones(T), z3, z3, 0.01, 0.1)

        ns_ref = NavState.identity(dtype=jnp.float64)
        ns_ref = dataclasses.replace(ns_ref, v=v0)
        # ground-truth current state: p = v*dt (R stays I, v stays v0)
        p_true = v0 * dt_img
        ns_true = dataclasses.replace(ns_ref, p=p_true)

        # camera sees world points; body==camera (Rcb=I, tcb=0)
        pts = jnp.asarray(np.stack([rs.uniform(-2, 2, 120), rs.uniform(-1.5, 1.5, 120),
                                    rs.uniform(3, 8, 120)], -1))
        Rbw = jnp.swapaxes(ns_true.R, -1, -2)
        pc = jax.vmap(lambda p: Rbw @ (p - ns_true.p))(pts)
        uv = jnp.stack([FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1)
        uv = uv + jnp.asarray(rs.randn(120, 2) * 0.3)

        # initial guess: propagate ref by preint (what the tracker does)
        ns0 = dataclasses.replace(
            ns_ref,
            p=ns_ref.p + ns_ref.v * dt_img + 0.5 * g_w * dt_img**2 + lie.mv(ns_ref.R, M.dP),
            v=ns_ref.v + g_w * dt_img + lie.mv(ns_ref.R, M.dV),
            R=lie.mm(ns_ref.R, M.dR),
        )

        ns_opt, inlier, n_in, H_post = pose_optimization_vi(
            ns0, ns_ref, M, pts, uv, jnp.ones(120, bool), jnp.ones(120, jnp.float64),
            g_w, jnp.eye(3, dtype=jnp.float64), jnp.zeros(3, jnp.float64),
            FX, FY, CX, CY, 2.5e-9, 1e-6,
            depth_meas=jnp.asarray(float(p_true[2]), jnp.float64),
            depth_info=jnp.asarray(1.0 / 0.25, jnp.float64),
            use_depth=True,
        )
        assert int(n_in) > 100
        np.testing.assert_allclose(np.asarray(ns_opt.p), np.asarray(p_true), atol=5e-3)
        np.testing.assert_allclose(np.asarray(ns_opt.v), np.asarray(v0), atol=5e-2)
        # posterior information should be PD
        eig = np.linalg.eigvalsh(np.asarray(H_post))
        assert eig.min() > 0


class TestPoseOptimizationVI2:
    def test_two_state_marginalized_solve(self):
        """Two-state frame-to-frame solve: prev state under a marginal
        prior + both frames' reprojections + preint + depth-projected.
        Must recover the current state and produce a PD Schur marginal."""
        import dataclasses as dc

        from uvipslam_tpu.solver.pose_opt import pose_optimization_vi2

        rs = np.random.RandomState(5)
        g_w = jnp.asarray([0.0, 0.0, -9.81], jnp.float64)
        dt_img = 0.25
        T = 50
        dts = jnp.full((T,), dt_img / T, jnp.float64)
        v0 = jnp.asarray([0.4, 0.0, -0.2], jnp.float64)
        omg = jnp.zeros((T, 3), jnp.float64)
        acc = jnp.broadcast_to(-np.asarray(g_w), (T, 3)).astype(jnp.float64)
        z3 = jnp.zeros(3, jnp.float64)
        M = preintegrate(omg, acc, dts, jnp.ones(T), z3, z3, 0.01, 0.1)

        ns_prev = dc.replace(NavState.identity(dtype=jnp.float64), v=v0)
        p_true = v0 * dt_img
        ns_true = dc.replace(ns_prev, p=p_true)

        def project(ns, pts):
            Rbw = jnp.swapaxes(ns.R, -1, -2)
            pc = jax.vmap(lambda p: Rbw @ (p - ns.p))(pts)
            return jnp.stack(
                [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1)

        pts = jnp.asarray(np.stack(
            [rs.uniform(-2, 2, 120), rs.uniform(-1.5, 1.5, 120),
             rs.uniform(3, 8, 120)], -1))
        uv_cur = project(ns_true, pts) + jnp.asarray(rs.randn(120, 2) * 0.3)

        ns0 = dc.replace(
            ns_prev,
            p=ns_prev.p + ns_prev.v * dt_img + 0.5 * g_w * dt_img**2 + lie.mv(ns_prev.R, M.dP),
            v=ns_prev.v + g_w * dt_img + lie.mv(ns_prev.R, M.dV),
            R=lie.mm(ns_prev.R, M.dR),
        )

        ones = jnp.ones(120, jnp.float64)
        vmask = jnp.ones(120, bool)
        prior_info = jnp.eye(15, dtype=jnp.float64) * 1e2
        ns_opt, inlier, n_in, H_marg = pose_optimization_vi2(
            ns_prev, ns0, prior_info, M,
            pts, uv_cur, vmask, ones,
            g_w, jnp.eye(3, dtype=jnp.float64), jnp.zeros(3, jnp.float64),
            FX, FY, CX, CY, 2.5e-9, 1e-6,
            depth_meas=jnp.asarray(float(p_true[2]), jnp.float64),
            depth_info=jnp.asarray(1.0 / 0.25, jnp.float64),
            use_depth=True,
        )
        assert int(n_in) > 100
        np.testing.assert_allclose(np.asarray(ns_opt.p), np.asarray(p_true), atol=5e-3)
        np.testing.assert_allclose(np.asarray(ns_opt.v), np.asarray(v0), atol=5e-2)
        eig = np.linalg.eigvalsh(np.asarray(H_marg))
        assert eig.min() > 0, eig.min()
        # the marginal must carry more position information than the bare
        # prior (landmarks + preint + depth observed this frame)
        assert np.trace(np.asarray(H_marg)[:3, :3]) > 3 * 1e2

    def test_prior_pulls_when_vision_is_blind(self):
        """With no current-frame reprojections, the solve must follow the
        IMU/prior instead of diverging (the marginal prior's job)."""
        import dataclasses as dc

        from uvipslam_tpu.solver.pose_opt import pose_optimization_vi2

        rs = np.random.RandomState(6)
        g_w = jnp.asarray([0.0, 0.0, -9.81], jnp.float64)
        dt_img = 0.25
        T = 50
        dts = jnp.full((T,), dt_img / T, jnp.float64)
        v0 = jnp.asarray([0.3, -0.1, 0.0], jnp.float64)
        omg = jnp.zeros((T, 3), jnp.float64)
        acc = jnp.broadcast_to(-np.asarray(g_w), (T, 3)).astype(jnp.float64)
        z3 = jnp.zeros(3, jnp.float64)
        M = preintegrate(omg, acc, dts, jnp.ones(T), z3, z3, 0.01, 0.1)
        ns_prev = dc.replace(NavState.identity(dtype=jnp.float64), v=v0)
        p_true = v0 * dt_img

        pts = jnp.asarray(np.stack(
            [rs.uniform(-2, 2, 60), rs.uniform(-1.5, 1.5, 60),
             rs.uniform(3, 8, 60)], -1))

        ns0 = dc.replace(
            ns_prev,
            p=ns_prev.p + ns_prev.v * dt_img + 0.5 * g_w * dt_img**2 + lie.mv(ns_prev.R, M.dP),
            v=ns_prev.v + g_w * dt_img + lie.mv(ns_prev.R, M.dV),
            R=lie.mm(ns_prev.R, M.dR),
        )
        ones = jnp.ones(60, jnp.float64)
        ns_opt, _, n_in, H_marg = pose_optimization_vi2(
            ns_prev, ns0, jnp.eye(15, dtype=jnp.float64) * 1e2, M,
            pts, jnp.zeros((60, 2), jnp.float64), jnp.zeros(60, bool), ones,
            g_w, jnp.eye(3, dtype=jnp.float64), jnp.zeros(3, jnp.float64),
            FX, FY, CX, CY, 2.5e-9, 1e-6,
            use_depth=False,
        )
        np.testing.assert_allclose(np.asarray(ns_opt.p), np.asarray(p_true), atol=1e-2)
        assert np.linalg.eigvalsh(np.asarray(H_marg)).min() > 0
