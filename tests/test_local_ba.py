import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.preintegration import PreintState, preintegrate
from uvipslam_tpu.core.state import NavState
from uvipslam_tpu.solver.local_ba import local_ba_navstate, local_ba_se3

FX, FY, CX, CY = 420.0, 420.0, 320.0, 240.0


def build_ba_problem(K=5, P=120, noise=0.4, seed=0):
    """K cameras on a line looking at a point cloud; observations with
    noise; poses/points perturbed (except fixed kf 0)."""
    rs = np.random.RandomState(seed)
    pts = np.stack([rs.uniform(-3, 3, P), rs.uniform(-2, 2, P), rs.uniform(4, 9, P)], -1)
    R_true, t_true = [], []
    for k in range(K):
        w = np.array([0.02, -0.03, 0.01]) * k
        Rcw = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float64)))
        C = np.array([0.3 * k, 0.02 * k, 0.0])
        tcw = -Rcw @ C
        R_true.append(Rcw); t_true.append(tcw)
    R_true = np.stack(R_true); t_true = np.stack(t_true)

    obs_kf, obs_pt, obs_uv = [], [], []
    for k in range(K):
        pc = pts @ R_true[k].T + t_true[k]
        uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1)
        ok = (pc[:, 2] > 0.5) & (np.abs(uv[:, 0] - CX) < 400) & (np.abs(uv[:, 1] - CY) < 300)
        for p in np.nonzero(ok)[0]:
            obs_kf.append(k); obs_pt.append(p)
            obs_uv.append(uv[p] + rs.randn(2) * noise)
    return dict(
        pts=pts, R=R_true, t=t_true,
        obs_kf=np.asarray(obs_kf, np.int32), obs_pt=np.asarray(obs_pt, np.int32),
        obs_uv=np.asarray(obs_uv),
    )


class TestLocalBASE3:
    def test_reduces_error_and_fixes_gauge(self):
        prob = build_ba_problem()
        rs = np.random.RandomState(1)
        K, P = 5, 120
        # perturb all but KF0, and all points
        R0 = prob["R"].copy(); t0 = prob["t"].copy()
        for k in range(1, K):
            d = jnp.asarray(rs.randn(6) * np.r_[0.02, 0.02, 0.02, 0.01, 0.01, 0.01], jnp.float64)
            dR, dt = lie.se3_exp(d)
            R0[k] = np.asarray(dR) @ R0[k]
            t0[k] = np.asarray(dR) @ t0[k] + np.asarray(dt)
        pts0 = prob["pts"] + rs.randn(P, 3) * 0.05

        O = len(prob["obs_kf"])
        Rn, tn, ptsn, inl = local_ba_se3(
            jnp.asarray(R0), jnp.asarray(t0),
            jnp.asarray([True] + [False] * (K - 1)),
            jnp.ones(K, bool),
            jnp.asarray(pts0), jnp.ones(P, bool),
            jnp.asarray(prob["obs_kf"]), jnp.asarray(prob["obs_pt"]),
            jnp.asarray(prob["obs_uv"]), jnp.ones(O, jnp.float64),
            jnp.ones(O, bool), FX, FY, CX, CY, n_iters=8, rounds=2,
        )
        # fixed KF unchanged
        np.testing.assert_allclose(np.asarray(Rn)[0], R0[0], atol=1e-12)
        np.testing.assert_allclose(np.asarray(tn)[0], t0[0], atol=1e-12)
        # poses recovered
        for k in range(1, K):
            dR = np.asarray(Rn)[k].T @ prob["R"][k]
            ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
            assert ang < 0.15, (k, ang)
            assert np.linalg.norm(np.asarray(tn)[k] - prob["t"][k]) < 0.02
        # points recovered to the triangulation noise floor
        # (sigma_z ~ z^2 sigma_px / (f B) ~ 0.03 m here)
        err = np.linalg.norm(np.asarray(ptsn) - prob["pts"], axis=1)
        assert np.median(err) < 0.06, np.median(err)
        assert np.asarray(inl).mean() > 0.95
        # optimality: final reprojection chi2 must not exceed ground truth's
        def chi2_of(R, t, pts):
            tot = 0.0
            for o in range(len(prob["obs_kf"])):
                k, pt = prob["obs_kf"][o], prob["obs_pt"][o]
                pc = np.asarray(R)[k] @ np.asarray(pts)[pt] + np.asarray(t)[k]
                uv = np.array([FX * pc[0] / pc[2] + CX, FY * pc[1] / pc[2] + CY])
                tot += ((uv - prob["obs_uv"][o]) ** 2).sum()
            return tot
        assert chi2_of(Rn, tn, ptsn) <= chi2_of(prob["R"], prob["t"], prob["pts"]) * 1.02


class TestLocalBANavState:
    def test_vi_window_ba(self):
        """3 keyframes with constant velocity + IMU preints + depth priors;
        perturb and recover."""
        rs = np.random.RandomState(2)
        g_w = jnp.asarray([0.0, 0.0, -9.81], jnp.float64)
        K = 3
        dt_kf = 0.5
        v = np.array([0.5, 0.1, -0.2])
        p_true = np.stack([v * dt_kf * k for k in range(K)])
        # IMU between consecutive KFs: R=I throughout, specific force -g
        T = 100
        dts = jnp.full((T,), dt_kf / T, jnp.float64)
        omg = jnp.zeros((T, 3), jnp.float64)
        acc = jnp.broadcast_to(-np.asarray(g_w), (T, 3)).astype(jnp.float64)
        z3 = jnp.zeros(3, jnp.float64)
        M1 = preintegrate(omg, acc, dts, jnp.ones(T), z3, z3, 0.01, 0.1)
        pre = jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), M1)

        P = 100
        pts = np.stack([rs.uniform(-3, 3, P), rs.uniform(-2, 2, P), rs.uniform(4, 9, P)], -1)
        obs_kf, obs_pt, obs_uv = [], [], []
        for k in range(K):
            pc = pts - p_true[k]
            uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1)
            for p in range(P):
                if pc[p, 2] > 1:
                    obs_kf.append(k); obs_pt.append(p)
                    obs_uv.append(uv[p] + rs.randn(2) * 0.3)
        O = len(obs_kf)

        ns = NavState.identity((K,), jnp.float64)
        ns = dataclasses.replace(
            ns,
            p=jnp.asarray(p_true + np.vstack([np.zeros(3), rs.randn(K - 1, 3) * 0.05])),
            v=jnp.asarray(np.tile(v, (K, 1)) + np.vstack([np.zeros(3), rs.randn(K - 1, 3) * 0.05])),
        )
        pts0 = pts + rs.randn(P, 3) * 0.05

        kf, ptsn, inl = local_ba_navstate(
            ns,
            jnp.asarray([True, False, False]),
            jnp.ones(K, bool),
            jnp.asarray(pts0), jnp.ones(P, bool),
            jnp.asarray(obs_kf, jnp.int32), jnp.asarray(obs_pt, jnp.int32),
            jnp.asarray(np.asarray(obs_uv)), jnp.ones(O, jnp.float64), jnp.ones(O, bool),
            jnp.asarray([0, 1], jnp.int32), jnp.asarray([1, 2], jnp.int32),
            pre, jnp.ones(2, bool),
            g_w, jnp.eye(3, dtype=jnp.float64), jnp.zeros(3, jnp.float64),
            FX, FY, CX, CY, 2.5e-9, 1e-6,
            depth_meas=jnp.asarray(p_true[:, 2]),
            depth_info=jnp.full((K,), 1.0 / 0.25, jnp.float64),
            n_iters=8, rounds=2,
        )
        p_err = np.linalg.norm(np.asarray(kf.p) - p_true, axis=1)
        assert p_err.max() < 0.01, p_err
        v_err = np.linalg.norm(np.asarray(kf.v) - v, axis=1)
        assert v_err.max() < 0.05, v_err
        # noise floor here is larger (z up to 9 m, 0.25 m baselines)
        pt_err = np.linalg.norm(np.asarray(ptsn) - pts, axis=1)
        assert np.median(pt_err) < 0.12, np.median(pt_err)
