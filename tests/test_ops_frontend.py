import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvipslam_tpu.ops import fast as fast_ops
from uvipslam_tpu.ops import hamming
from uvipslam_tpu.ops.clahe import clahe
from uvipslam_tpu.ops.image import bilinear_sample, gaussian_blur
from uvipslam_tpu.ops.klt import build_flow_pyramid, klt_track
from uvipslam_tpu.ops.orb import Features, extract_orb, level_quotas


def checker_texture(h=240, w=320, seed=0):
    rs = np.random.RandomState(seed)
    img = rs.uniform(40, 220, (h // 8, w // 8))
    img = np.kron(img, np.ones((8, 8)))
    img += rs.uniform(-5, 5, img.shape)
    return np.clip(img, 0, 255).astype(np.float32)


class TestCLAHE:
    def test_matches_opencv(self):
        import cv2
        # Aqualoc-sized frame: algorithm matches OpenCV to rounding noise
        img = checker_texture(512, 640)
        ours = np.asarray(clahe(jnp.asarray(img), 4.0, (12, 12)))
        ref = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(12, 12)).apply(
            img.astype(np.uint8)
        )
        diff = np.abs(ours - ref.astype(np.float32))
        assert np.mean(diff) < 0.5, np.mean(diff)
        assert diff.max() <= 2.0, diff.max()

    def test_improves_contrast_on_flat(self):
        rs = np.random.RandomState(1)
        img = (100 + 5 * rs.randn(120, 160)).astype(np.float32)
        out = np.asarray(clahe(jnp.asarray(img)))
        assert out.std() > img.std() * 1.5


class TestFAST:
    def test_detects_synthetic_corners(self):
        img = np.full((120, 160), 50.0, np.float32)
        img[30:, 40:] = 200.0  # a strong corner at (40, 30)
        resp = np.asarray(fast_ops.fast_response(jnp.asarray(img), 20.0))
        nms = np.asarray(fast_ops.nms(jnp.asarray(resp)))
        ys, xs = np.nonzero(nms)
        assert len(xs) >= 1
        d = np.hypot(xs - 40.0, ys - 30.0).min()
        assert d <= 3.0, (xs, ys)

    def test_agrees_with_opencv_fast(self):
        import cv2
        img = checker_texture()
        ref_kps = cv2.FastFeatureDetector_create(
            threshold=20, nonmaxSuppression=True
        ).detect(img.astype(np.uint8))
        ref_xy = np.array([k.pt for k in ref_kps]) if ref_kps else np.zeros((0, 2))
        resp = fast_ops.nms(fast_ops.fast_response(jnp.asarray(img), 20.0))
        ys, xs = np.nonzero(np.asarray(resp))
        ours = np.stack([xs, ys], -1).astype(np.float64)
        assert len(ours) > 20
        # every strong OpenCV corner should have one of ours within 2.5 px
        strong = ref_xy[[k.response > 40 for k in ref_kps]] if len(ref_xy) else ref_xy
        if len(strong) and len(ours):
            d = np.sqrt(((strong[:, None] - ours[None]) ** 2).sum(-1)).min(1)
            assert (d <= 2.5).mean() > 0.9, (d.max(), (d <= 2.5).mean())

    def test_occupancy_suppression(self):
        img = jnp.asarray(checker_texture())
        resp = fast_ops.nms(fast_ops.fast_response(img, 20.0))
        ys, xs = np.nonzero(np.asarray(resp))
        occ = jnp.asarray(np.stack([xs[:5], ys[:5]], -1).astype(np.float32))
        out = fast_ops.occupancy_suppress(resp, occ, jnp.ones(5, bool), 10.0)
        out_np = np.asarray(out)
        for x, y in np.asarray(occ):
            y0, y1 = max(0, int(y) - 9), int(y) + 10
            x0, x1 = max(0, int(x) - 9), int(x) + 10
            assert out_np[y0:y1, x0:x1].max() == 0.0

    def test_grid_topk_shapes_and_coverage(self):
        img = jnp.asarray(checker_texture())
        resp = fast_ops.nms(fast_ops.fast_response(img, 10.0))
        xy, score, valid = fast_ops.grid_topk(resp, 20, 100)
        assert xy.shape == (100, 2) and valid.shape == (100,)
        n = int(valid.sum())
        assert n > 30
        # winners must be at actual response locations
        resp_np = np.asarray(resp)
        for i in range(n):
            x, y = np.asarray(xy[i]).astype(int)
            assert resp_np[y, x] > 0


class TestORB:
    def test_quotas(self):
        qs = level_quotas(400, 8, 1.2)
        assert sum(qs) == 400 and qs[0] > qs[-1] > 0

    def test_extract_shapes(self):
        img = jnp.asarray(checker_texture())
        feats = extract_orb(img, jnp.zeros((1, 2)), jnp.zeros(1, bool), n_features=200)
        assert feats.xy.shape == (200, 2)
        assert feats.desc.shape == (200, 256)
        assert int(feats.valid.sum()) > 50

    def test_descriptor_match_under_shift(self):
        """Two crops of the same texture shifted by 8px: matched descriptors
        should agree and matching should recover the shift."""
        base = checker_texture(260, 340, seed=3)
        imgA = jnp.asarray(base[10:250, 10:330])
        imgB = jnp.asarray(base[18:258, 10:330])  # shift dy=8
        fa = extract_orb(imgA, jnp.zeros((1, 2)), jnp.zeros(1, bool), n_features=150)
        fb = extract_orb(imgB, jnp.zeros((1, 2)), jnp.zeros(1, bool), n_features=150)
        idx, dist, ok = hamming.match_best(
            fa.desc, fb.desc, fa.valid, fb.valid, max_dist=60.0, ratio=0.9
        )
        ok = np.asarray(ok)
        assert ok.sum() >= 10
        dxy = np.asarray(fb.xy)[np.asarray(idx)[ok]] - np.asarray(fa.xy)[ok]
        med = np.median(dxy, axis=0)
        assert abs(med[0] - 0.0) < 1.5 and abs(med[1] - (-8.0)) < 1.5, med

    def test_rotation_invariance(self):
        """Descriptors should be stable under 90-degree image rotation
        (steered BRIEF)."""
        base = checker_texture(200, 200, seed=5)
        imgA = jnp.asarray(base)
        imgB = jnp.asarray(np.rot90(base).copy())
        fa = extract_orb(imgA, jnp.zeros((1, 2)), jnp.zeros(1, bool), n_features=100)
        fb = extract_orb(imgB, jnp.zeros((1, 2)), jnp.zeros(1, bool), n_features=100)
        idx, dist, ok = hamming.match_best(
            fa.desc, fb.desc, fa.valid, fb.valid, max_dist=70.0, ratio=0.85
        )
        ok_np = np.asarray(ok)
        assert ok_np.sum() >= 8
        # verify matches map through the known rotation: (x,y)->(y, W-1-x)
        H = 200
        xa = np.asarray(fa.xy)[ok_np]
        xb = np.asarray(fb.xy)[np.asarray(idx)[ok_np]]
        pred = np.stack([xa[:, 1], H - 1 - xa[:, 0]], -1)
        err = np.linalg.norm(pred - xb, axis=1)
        assert np.median(err) < 3.0, np.median(err)


class TestHamming:
    def test_matrix_exact(self):
        rs = np.random.RandomState(0)
        a = rs.randint(0, 2, (37, 256)).astype(np.int8)
        b = rs.randint(0, 2, (53, 256)).astype(np.int8)
        D = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        ref = (a[:, None, :] != b[None, :, :]).sum(-1)
        np.testing.assert_array_equal(D, ref)

    def test_mutual_filter(self):
        idx_ab = jnp.asarray([1, 0, 2])
        ok_ab = jnp.asarray([True, True, True])
        idx_ba = jnp.asarray([1, 0, 0])
        ok_ba = jnp.asarray([True, True, True])
        m = np.asarray(hamming.mutual_filter(idx_ab, ok_ab, idx_ba, ok_ba))
        np.testing.assert_array_equal(m, [True, True, False])


class TestKLT:
    def test_recovers_known_translation(self):
        base = checker_texture(300, 400, seed=7)
        base = np.asarray(gaussian_blur(jnp.asarray(base), 5, 1.2))
        dx, dy = 6.3, -3.7
        H, W = 240, 320
        A = jnp.asarray(base[30 : 30 + H, 40 : 40 + W])
        # shift: sample base at (x + dx, y + dy)
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        xy = jnp.asarray(np.stack([xs + 40 + dx, ys + 30 + dy], -1))
        B = bilinear_sample(jnp.asarray(base), xy)

        feats = extract_orb(A, jnp.zeros((1, 2)), jnp.zeros(1, bool), n_features=80)
        pts = feats.xy
        valid = feats.valid & (pts[:, 0] > 30) & (pts[:, 0] < W - 30) & \
            (pts[:, 1] > 30) & (pts[:, 1] < H - 30)

        pyrA = tuple(build_flow_pyramid(A, 4))
        pyrB = tuple(build_flow_pyramid(B, 4))
        nxt, ok = klt_track(pyrA, pyrB, pts, pts, valid, win=21, iters=10, levels=4)
        ok = np.asarray(ok & valid)
        assert ok.sum() >= 10
        flow = np.asarray(nxt)[ok] - np.asarray(pts)[ok]
        med = np.median(flow, axis=0)
        # LK recovers the *apparent* motion = (-dx, -dy)
        assert abs(med[0] + dx) < 0.3 and abs(med[1] + dy) < 0.3, med

    def test_rejects_out_of_bounds(self):
        img = jnp.asarray(checker_texture())
        pyr = tuple(build_flow_pyramid(img, 3))
        pts = jnp.asarray([[5.0, 5.0], [150.0, 100.0]])
        guess = jnp.asarray([[-50.0, -50.0], [150.0, 100.0]])
        nxt, ok = klt_track(pyr, pyr, pts, guess, jnp.ones(2, bool), win=21, iters=5, levels=3)
        ok = np.asarray(ok)
        assert ok[1]


class TestMatcherGates:
    def test_bow_node_mask(self):
        from uvipslam_tpu.ops import hamming
        wa = jnp.asarray([3, 5, 7])
        wb = jnp.asarray([5, 3, 3, 9])
        m = hamming.bow_node_mask(wa, wb)
        exp = np.array([[False, True, True, False],
                        [True, False, False, False],
                        [False, False, False, False]])
        np.testing.assert_array_equal(np.asarray(m), exp)

    def test_epipolar_band_mask(self):
        """Points generated on the epipolar geometry must pass the band;
        points far off the line must fail (reference:
        CheckDistEpipolarLine, src/ORBmatcher.cc:33)."""
        from uvipslam_tpu.core import lie
        from uvipslam_tpu.ops import hamming

        rs = np.random.RandomState(0)
        K = np.array([[420.0, 0, 320], [0, 420.0, 240], [0, 0, 1.0]])
        R = np.asarray(lie.so3_exp(jnp.asarray([0.03, -0.1, 0.02])))
        t = np.array([0.5, 0.1, 0.05])
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
        F12 = np.linalg.inv(K).T @ tx @ R @ np.linalg.inv(K)

        X = np.stack([rs.uniform(-2, 2, 40), rs.uniform(-1.5, 1.5, 40),
                      rs.uniform(3, 8, 40)], -1)
        x1 = (K @ (X / X[:, 2:3]).T).T[:, :2]
        X2 = X @ R.T + t
        x2 = (K @ (X2 / X2[:, 2:3]).T).T[:, :2]

        m = hamming.epipolar_band_mask(
            jnp.asarray(F12), jnp.asarray(x1), jnp.asarray(x2), 2.0)
        m = np.asarray(m)
        # diagonal (true correspondences) passes
        assert m[np.arange(40), np.arange(40)].all()
        # shifted points (20 px off the line direction) mostly fail
        x2_off = x2 + 20.0
        m_off = np.asarray(hamming.epipolar_band_mask(
            jnp.asarray(F12), jnp.asarray(x1), jnp.asarray(x2_off), 2.0))
        assert m_off[np.arange(40), np.arange(40)].mean() < 0.3
