"""Place recognition + loop geometry: vocab, haloc, DBSCAN, Sim3 RANSAC,
essential graph, PnP."""

import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.core import lie
from uvipslam_tpu.loop import dbscan, haloc, vocab
from uvipslam_tpu.ops.pnp import pnp_ransac
from uvipslam_tpu.ops.sim3solver import horn_sim3, sim3_ransac
from uvipslam_tpu.solver.essential_graph import (
    correct_points_after_pose_graph,
    optimize_essential_graph,
)


def rand_desc(rs, n):
    return rs.randint(0, 2, (n, 256)).astype(np.int8)


class TestVocab:
    def test_retrieval(self):
        rs = np.random.RandomState(0)
        base = rand_desc(rs, 4000)
        cb = jnp.asarray(vocab.train_codebook(base, n_words=128, n_iters=4))
        idf = jnp.ones(128)

        # two "places": frame A and a noisy revisit A'; distractor B
        def noisy(d, flips=8):
            d = d.copy()
            for i in range(len(d)):
                j = rs.choice(256, flips, replace=False)
                d[i, j] = 1 - d[i, j]
            return d

        A = rand_desc(rs, 100)
        B = rand_desc(rs, 100)
        vA = vocab.bow_vector(jnp.asarray(A), jnp.ones(100, bool), cb, idf)
        vA2 = vocab.bow_vector(jnp.asarray(noisy(A)), jnp.ones(100, bool), cb, idf)
        vB = vocab.bow_vector(jnp.asarray(B), jnp.ones(100, bool), cb, idf)
        sAA = float(vocab.l1_score(vA, vA2))
        sAB = float(vocab.l1_score(vA, vB))
        assert sAA > sAB + 0.1, (sAA, sAB)

        kfs = jnp.stack([vA2, vB, vB])
        idx, score, ok = vocab.detect_candidates(
            vA, kfs, jnp.ones(3, bool), jnp.zeros(3, bool),
            jnp.asarray(sAB), top_k=2,
        )
        assert int(idx[0]) == 0 and bool(ok[0])


class TestHaloc:
    def test_hash_similarity(self):
        rs = np.random.RandomState(1)
        A = rand_desc(rs, 200)
        A2 = A.copy()
        flip = rs.rand(200, 256) < 0.03
        A2 = np.where(flip, 1 - A2, A2).astype(np.int8)
        B = rand_desc(rs, 200)
        v = jnp.ones(200, bool)
        hA = haloc.compute_hash(jnp.asarray(A), v)
        hA2 = haloc.compute_hash(jnp.asarray(A2), v)
        hB = haloc.compute_hash(jnp.asarray(B), v)
        dAA = float(haloc.hash_distance(hA, hA2))
        dAB = float(haloc.hash_distance(hA, hB))
        assert dAA < 0.5 * dAB, (dAA, dAB)

        idx, dist, ok = haloc.detect_candidates_haloc(
            hA, jnp.stack([hA2, hB, hB]), jnp.ones(3, bool), jnp.zeros(3, bool)
        )
        assert int(idx[0]) == 0


class TestDBSCAN:
    def test_two_clusters_and_noise(self):
        rs = np.random.RandomState(2)
        c1 = rs.randn(40, 2) * 8 + [50, 50]
        c2 = rs.randn(40, 2) * 8 + [250, 200]
        noise = np.array([[150.0, 120.0], [10.0, 220.0]])
        xy = jnp.asarray(np.vstack([c1, c2, noise]).astype(np.float32))
        valid = jnp.ones(82, bool)
        labels, core = dbscan.dbscan_labels(xy, valid, eps=30.0, min_pts=10)
        labels = np.asarray(labels)
        assert len(set(labels[:40])) == 1 and labels[0] >= 0
        assert len(set(labels[40:80])) == 1 and labels[40] >= 0
        assert labels[0] != labels[40]
        assert labels[80] == -1 and labels[81] == -1

    def test_centroids(self):
        rs = np.random.RandomState(3)
        xy = jnp.asarray(np.vstack([rs.randn(30, 2) * 5 + [40, 40],
                                    rs.randn(30, 2) * 5 + [200, 100]]).astype(np.float32))
        labels, _ = dbscan.dbscan_labels(xy, jnp.ones(60, bool), eps=25.0, min_pts=8)
        xyz = jnp.concatenate([xy, jnp.zeros((60, 1))], -1)
        ids, cents, cnt = dbscan.cluster_centroids(xyz, labels, n_clusters_cap=4)
        assert int(cnt[0]) == 30 and int(cnt[1]) == 30
        cents = np.asarray(cents[:2, :2])
        got = {tuple(np.round(c, -1)) for c in cents}
        assert (40.0, 40.0) in got and (200.0, 100.0) in got


class TestSim3:
    def test_horn_exact(self):
        rs = np.random.RandomState(4)
        p1 = jnp.asarray(rs.randn(50, 3))
        s, R, t = 2.3, np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5]))), np.array([1.0, -2.0, 0.5])
        p2 = jnp.asarray(s * np.asarray(p1) @ R.T + t)
        s_e, R_e, t_e = horn_sim3(p1, p2)
        np.testing.assert_allclose(float(s_e), s, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_e), t, atol=1e-6)

    def test_ransac_with_outliers(self):
        rs = np.random.RandomState(5)
        p1 = rs.randn(120, 3) + [0, 0, 5]
        s, R, t = 1.6, np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.2, -0.1]))), np.array([0.5, 0.2, 1.0])
        p2 = s * p1 @ R.T + t + rs.randn(120, 3) * 0.01
        out = rs.choice(120, 30, replace=False)
        p2[out] += rs.uniform(1, 3, (30, 3))
        s_e, R_e, t_e, inl, n_in = sim3_ransac(
            jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2),
            jnp.ones(120, bool), 400.0, 400.0, 320.0, 240.0,
        )
        np.testing.assert_allclose(float(s_e), s, rtol=0.02)
        ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(np.asarray(R_e).T @ R)))))
        assert ang < 1.0
        inl = np.asarray(inl)
        assert inl[out].mean() < 0.2 and int(n_in) > 70


class TestEssentialGraph:
    def test_corrects_drift(self):
        """Chain of 12 KFs with odometry edges + 1 loop edge; inject scale
        + translation drift; pose graph must pull the chain back."""
        K = 12
        rs = np.random.RandomState(6)
        # ground truth: circle-ish path, identity scale
        true_t = np.stack([np.array([np.cos(a), np.sin(a), 0.0]) * 3 for a in np.linspace(0, 2 * np.pi * 0.9, K)])
        true_R = np.stack([np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.1 * k]))) for k in range(K)])
        true_s = np.ones(K)

        # drifted estimate: growing scale and offset
        est_s = true_s * np.exp(np.linspace(0, 0.3, K))
        est_t = true_t + np.linspace(0, 1.0, K)[:, None] * np.array([0.3, -0.2, 0.1])
        est_R = true_R.copy()
        est_s[0], est_t[0] = true_s[0], true_t[0]

        # odometry edges from the TRUE relative Sim3, in the factor's
        # convention: r = log(S_m S_i S_j^-1) = 0  =>  S_m = S_j S_i^-1
        ei, ej, ms, mR, mt = [], [], [], [], []
        def add_edge(i, j):
            Si = (jnp.asarray(true_s[i]), jnp.asarray(true_R[i]), jnp.asarray(true_t[i]))
            Sj = (jnp.asarray(true_s[j]), jnp.asarray(true_R[j]), jnp.asarray(true_t[j]))
            M = lie.sim3_compose(*Sj, *lie.sim3_inverse(*Si))
            ei.append(i); ej.append(j)
            ms.append(float(M[0])); mR.append(np.asarray(M[1])); mt.append(np.asarray(M[2]))
        for k in range(1, K):
            add_edge(k, k - 1)
        add_edge(K - 1, 0)  # loop edge

        E = len(ei)
        s2, R2, t2 = optimize_essential_graph(
            jnp.asarray(est_s), jnp.asarray(est_R), jnp.asarray(est_t),
            jnp.ones(K, bool), jnp.asarray([True] + [False] * (K - 1)),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(ms), jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)),
            jnp.ones(E, bool), n_iters=25,
        )
        np.testing.assert_allclose(np.asarray(s2), true_s, rtol=0.02)
        np.testing.assert_allclose(np.asarray(t2), true_t, atol=0.05)

        # point correction: a landmark expressed via drifted ref KF moves
        pts = jnp.asarray(rs.randn(20, 3))
        refk = jnp.asarray(rs.randint(0, K, 20), jnp.int32)
        corrected = correct_points_after_pose_graph(
            pts, refk, jnp.asarray(est_s), jnp.asarray(est_R), jnp.asarray(est_t),
            s2, R2, t2, jnp.ones(20, bool),
        )
        assert np.isfinite(np.asarray(corrected)).all()


class TestPnP:
    def test_relocalization_solve(self):
        rs = np.random.RandomState(7)
        pts = rs.uniform(-2, 2, (200, 3)) + [0, 0, 6]
        Rcw = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.3, 0.1])))
        tcw = np.array([0.4, -0.2, 0.8])
        pc = pts @ Rcw.T + tcw
        uv = np.stack([420 * pc[:, 0] / pc[:, 2] + 320, 420 * pc[:, 1] / pc[:, 2] + 240], -1)
        uv += rs.randn(200, 2) * 0.5
        out = rs.choice(200, 60, replace=False)
        uv[out] += rs.uniform(30, 100, (60, 2))

        R_e, t_e, inl, n_in = pnp_ransac(
            jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(200, bool), 420.0, 420.0, 320.0, 240.0,
        )
        assert int(n_in) > 100
        ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(np.asarray(R_e).T @ Rcw)))))
        assert ang < 1.0, ang
        assert np.linalg.norm(np.asarray(t_e) - tcw) < 0.1
