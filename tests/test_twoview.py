import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.core import lie
from uvipslam_tpu.ops import twoview


def make_scene(n=200, planar=False, seed=0, noise=0.3, outlier_frac=0.2):
    rs = np.random.RandomState(seed)
    K = np.array([[420.0, 0, 320], [0, 420.0, 240], [0, 0, 1.0]])
    if planar:
        X = np.stack(
            [rs.uniform(-2, 2, n), rs.uniform(-1.5, 1.5, n), np.full(n, 4.0)], -1
        )
    else:
        X = np.stack(
            [rs.uniform(-2, 2, n), rs.uniform(-1.5, 1.5, n), rs.uniform(3, 8, n)], -1
        )
    R = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.12, 0.03])))
    t = np.array([0.6, 0.05, 0.02])

    def proj(P):
        p = P / P[:, 2:3]
        return (K @ p.T).T[:, :2]

    x1 = proj(X)
    X2 = X @ R.T + t
    x2 = proj(X2)
    x1 += rs.randn(n, 2) * noise
    x2 += rs.randn(n, 2) * noise
    n_out = int(n * outlier_frac)
    out_idx = rs.choice(n, n_out, replace=False)
    x2[out_idx] += rs.uniform(30, 120, (n_out, 2)) * rs.choice([-1, 1], (n_out, 2))
    is_outlier = np.zeros(n, bool)
    is_outlier[out_idx] = True
    return dict(K=K, R=R, t=t, X=X, x1=x1, x2=x2, is_outlier=is_outlier)


class TestFundamentalRANSAC:
    def test_finds_inliers(self):
        sc = make_scene()
        F, score, inl = twoview.find_fundamental(
            jax.random.PRNGKey(0),
            jnp.asarray(sc["x1"]), jnp.asarray(sc["x2"]),
            jnp.ones(len(sc["x1"]), bool), sigma=1.0,
        )
        inl = np.asarray(inl)
        # recall: most true inliers kept; precision: outliers rejected
        true_in = ~sc["is_outlier"]
        assert inl[true_in].mean() > 0.9
        assert inl[sc["is_outlier"]].mean() < 0.05

    def test_epipolar_constraint_holds(self):
        sc = make_scene(noise=0.0, outlier_frac=0.0)
        F, score, inl = twoview.find_fundamental(
            jax.random.PRNGKey(1),
            jnp.asarray(sc["x1"]), jnp.asarray(sc["x2"]),
            jnp.ones(len(sc["x1"]), bool),
        )
        F = np.asarray(F)
        x1h = np.concatenate([sc["x1"], np.ones((len(sc["x1"]), 1))], 1)
        x2h = np.concatenate([sc["x2"], np.ones((len(sc["x2"]), 1))], 1)
        resid = np.abs(np.einsum("ni,ij,nj->n", x2h, F, x1h))
        # scale-invariant check
        resid /= np.abs(F).max()
        assert np.median(resid) < 1.0


class TestHomographyRANSAC:
    def test_planar_scene(self):
        sc = make_scene(planar=True)
        H, score, inl = twoview.find_homography(
            jax.random.PRNGKey(2),
            jnp.asarray(sc["x1"]), jnp.asarray(sc["x2"]),
            jnp.ones(len(sc["x1"]), bool),
        )
        inl = np.asarray(inl)
        true_in = ~sc["is_outlier"]
        assert inl[true_in].mean() > 0.9
        assert inl[sc["is_outlier"]].mean() < 0.05

    def test_model_selection_ratio(self):
        """Planar scene: H score should dominate F score (the reference's
        SH/(SH+SF) > 0.40 rule, src/Tracking.cc Initialize)."""
        sc = make_scene(planar=True, outlier_frac=0.0)
        ka, kb = jax.random.split(jax.random.PRNGKey(3))
        v = jnp.ones(len(sc["x1"]), bool)
        _, sh, _ = twoview.find_homography(ka, jnp.asarray(sc["x1"]), jnp.asarray(sc["x2"]), v)
        _, sf, _ = twoview.find_fundamental(kb, jnp.asarray(sc["x1"]), jnp.asarray(sc["x2"]), v)
        assert float(sh) / (float(sh) + float(sf)) > 0.40


class TestReconstruction:
    def test_recovers_motion_and_structure(self):
        sc = make_scene(noise=0.2, outlier_frac=0.15)
        K = jnp.asarray(sc["K"])
        F, score, inl = twoview.find_fundamental(
            jax.random.PRNGKey(4),
            jnp.asarray(sc["x1"]), jnp.asarray(sc["x2"]),
            jnp.ones(len(sc["x1"]), bool),
        )
        out = twoview.reconstruct_from_fundamental(
            F, K, jnp.asarray(sc["x1"]), jnp.asarray(sc["x2"]), inl
        )
        assert bool(out["ok"]), (int(out["n_good"]), float(out["parallax"]))
        R_est = np.asarray(out["R"])
        t_est = np.asarray(out["t"])
        # rotation error
        dR = R_est.T @ sc["R"]
        ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
        assert ang < 1.0, ang
        # translation direction error
        tdir = sc["t"] / np.linalg.norm(sc["t"])
        cos = abs(float(t_est @ tdir))
        assert cos > 0.999, cos
        # structure: scale-aligned 3D error on good points
        good = np.asarray(out["good"])
        X_est = np.asarray(out["points"])[good]
        X_true = sc["X"][good]
        s = np.median(np.linalg.norm(X_true, axis=1) / np.linalg.norm(X_est, axis=1))
        err = np.linalg.norm(X_est * s - X_true, axis=1)
        assert np.median(err) < 0.1, np.median(err)

    def test_triangulate_exact(self):
        sc = make_scene(noise=0.0, outlier_frac=0.0)
        K = jnp.asarray(sc["K"])
        P1 = jnp.concatenate([K, jnp.zeros((3, 1))], 1)
        Rt = jnp.concatenate([jnp.asarray(sc["R"]), jnp.asarray(sc["t"])[:, None]], 1)
        P2 = K @ Rt
        X = twoview.triangulate_linear(P1, P2, jnp.asarray(sc["x1"]), jnp.asarray(sc["x2"]))
        np.testing.assert_allclose(np.asarray(X), sc["X"], atol=1e-6)


class TestF32Regression:
    """Round-1 regression guards: the f32 path (the library's runtime
    dtype) must behave like the f64 path. In round 1 an f32
    inverse-iteration DLT collapsed F to ~0, and the degenerate
    hypothesis won RANSAC with a perfect score (BENCH_r01:
    frames_tracked 0)."""

    def test_find_fundamental_f32(self):
        sc = make_scene()
        with jax.enable_x64(False):
            F, score, inl = twoview.find_fundamental(
                jax.random.PRNGKey(0),
                jnp.asarray(sc["x1"], jnp.float32),
                jnp.asarray(sc["x2"], jnp.float32),
                jnp.ones(len(sc["x1"]), bool), sigma=1.0,
            )
            assert float(jnp.max(jnp.abs(F))) > 1e-8, "F collapsed to zero"
            inl = np.asarray(inl)
            true_in = ~sc["is_outlier"]
            assert inl[true_in].mean() > 0.85
            assert inl[sc["is_outlier"]].mean() < 0.1

    def test_reconstruct_f32(self):
        sc = make_scene(noise=0.2, outlier_frac=0.15)
        with jax.enable_x64(False):
            K = jnp.asarray(sc["K"], jnp.float32)
            x1 = jnp.asarray(sc["x1"], jnp.float32)
            x2 = jnp.asarray(sc["x2"], jnp.float32)
            F, _, inl = twoview.find_fundamental(
                jax.random.PRNGKey(4), x1, x2, jnp.ones(len(sc["x1"]), bool)
            )
            out = twoview.reconstruct_from_fundamental(F, K, x1, x2, inl)
            assert bool(out["ok"]), (int(out["n_good"]), float(out["parallax"]))
            dR = np.asarray(out["R"]).T @ sc["R"]
        ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
        assert ang < 2.0, ang

    def test_degenerate_hypothesis_rejected(self):
        """An all-zero F must score 0 inliers, not a perfect score."""
        sc = make_scene()
        d_a, d_b = twoview._epipolar_errors(
            jnp.zeros((1, 3, 3)), jnp.asarray(sc["x1"]), jnp.asarray(sc["x2"])
        )
        score, inlier = twoview._ransac_score(
            d_a, d_b, jnp.ones(len(sc["x1"]), bool), twoview.TH_F, 1.0
        )
        assert float(score[0]) == 0.0
        assert int(inlier[0].sum()) == 0


class TestHomographyReconstruction:
    def test_decompose_homography_recovers_motion(self):
        """One of the 8 Faugeras hypotheses must match the true motion."""
        K = jnp.asarray([[420.0, 0, 320], [0, 420.0, 240], [0, 0, 1.0]])
        R = lie.so3_exp(jnp.asarray([0.05, -0.1, 0.04]))
        t = jnp.asarray([0.3, 0.05, 0.02])
        n = jnp.asarray([0.05, 0.02, -1.0])
        n = n / jnp.linalg.norm(n)
        d = 4.0
        H = K @ (R + jnp.outer(t, n) / d) @ jnp.linalg.inv(K)
        Rs, ts, _ = twoview.decompose_homography(H, K)
        angs = [
            float(jnp.linalg.norm(lie.so3_log(Rs[i].T @ R))) for i in range(8)
        ]
        best = int(np.argmin(angs))
        assert np.degrees(angs[best]) < 0.5
        tc = abs(float(ts[best] @ t / jnp.linalg.norm(t)))
        assert tc > 0.999

    def test_planar_scene_initializes_via_h(self):
        """Pure planar scene: the 8-point F is degenerate (any epipole
        fits), so the reference switches to H — initialize_two_view must
        pick H and recover the metric motion (reference:
        Initializer::Initialize RH>0.40 + ReconstructH)."""
        sc = make_scene(planar=True, noise=0.2, outlier_frac=0.1, seed=4)
        K = jnp.asarray(sc["K"])
        rec = twoview.initialize_two_view(
            jax.random.PRNGKey(8), jnp.asarray(sc["x1"]), jnp.asarray(sc["x2"]),
            jnp.ones(len(sc["x1"]), bool), K,
        )
        assert bool(rec["used_homography"]), "planar scene must select H"
        assert bool(rec["ok"]), (int(rec["n_good"]), float(rec["parallax"]))
        dR = np.asarray(rec["R"]).T @ sc["R"]
        ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
        assert ang < 1.0, ang
        tdir = sc["t"] / np.linalg.norm(sc["t"])
        assert abs(float(rec["t"] @ tdir)) > 0.995

    def test_general_scene_initializes_via_f(self):
        sc = make_scene(noise=0.2, outlier_frac=0.1, seed=5)
        K = jnp.asarray(sc["K"])
        rec = twoview.initialize_two_view(
            jax.random.PRNGKey(9), jnp.asarray(sc["x1"]), jnp.asarray(sc["x2"]),
            jnp.ones(len(sc["x1"]), bool), K,
        )
        assert not bool(rec["used_homography"])
        assert bool(rec["ok"])
        dR = np.asarray(rec["R"]).T @ sc["R"]
        ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
        assert ang < 1.0, ang
