import jax
import jax.numpy as jnp
import numpy as np

from uvipslam_tpu.models.camera import FISHEYE, RADTAN, CameraModel

# Aqualoc harbor intrinsics (reference: Data/Settings_VI_Aqualoc_harbor.yaml)
AQUALOC = dict(
    fx=413.32595366596017, fy=413.70198739483686,
    cx=305.9507483284928, cy=259.4439948946375,
    dist=(-0.06125568297136998, -0.003796743395135256,
          0.027326634771204592, -0.030296403142887066),
)


def _grid_pixels(w=640, h=512, n=20, dtype=jnp.float64):
    u = jnp.linspace(50, w - 50, n, dtype=dtype)
    v = jnp.linspace(50, h - 50, n, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)
    return jnp.stack([uu.ravel(), vv.ravel()], axis=-1)


class TestRadtan:
    def setup_method(self):
        self.cam = CameraModel.create(**AQUALOC, kind=RADTAN, dtype=jnp.float64)

    def test_undistort_roundtrip(self):
        # sample within the camera's actual FOV (|xn| <~ 0.77 for Aqualoc);
        # the radtan polynomial is not invertible arbitrarily far out.
        xn = jax.random.uniform(jax.random.PRNGKey(0), (500, 2), dtype=jnp.float64,
                                minval=-0.7, maxval=0.7)
        xd = self.cam.distort_normalized(xn)
        xn2 = self.cam.undistort_normalized(xd)
        np.testing.assert_allclose(xn2, xn, atol=1e-6)

    def test_zero_distortion_identity(self):
        cam = CameraModel.create(400.0, 400.0, 320.0, 240.0, dtype=jnp.float64)
        uv = _grid_pixels()
        np.testing.assert_allclose(cam.undistort_pixels(uv), uv, atol=1e-10)

    def test_project_unproject(self):
        p = jnp.array([[0.1, -0.2, 2.0], [0.5, 0.3, 5.0]], dtype=jnp.float64)
        uv = self.cam.project(p)
        uv_u = self.cam.undistort_pixels(uv)
        rays = self.cam.unproject_pixels(uv_u)
        np.testing.assert_allclose(rays * p[:, 2:3], p, atol=1e-5)


class TestFisheye:
    def setup_method(self):
        self.cam = CameraModel.create(**AQUALOC, kind=FISHEYE, dtype=jnp.float64)

    def test_undistort_roundtrip(self):
        xn = 0.4 * jax.random.normal(jax.random.PRNGKey(1), (500, 2), dtype=jnp.float64)
        xd = self.cam.distort_normalized(xn)
        xn2 = self.cam.undistort_normalized(xd)
        np.testing.assert_allclose(xn2, xn, atol=1e-6)

    def test_center_is_fixed_point(self):
        xn = jnp.zeros((1, 2), dtype=jnp.float64)
        np.testing.assert_allclose(self.cam.distort_normalized(xn), 0.0, atol=1e-12)

    def test_equidistant_formula(self):
        # pure equidistant with zero k's: r_d = atan(r)
        cam = CameraModel.create(400.0, 400.0, 320.0, 240.0, kind=FISHEYE, dtype=jnp.float64)
        xn = jnp.array([[0.5, 0.0]], dtype=jnp.float64)
        xd = cam.distort_normalized(xn)
        np.testing.assert_allclose(xd[0, 0], np.arctan(0.5), atol=1e-12)

    def test_in_image(self):
        uv = jnp.array([[0.0, 0.0], [639.0, 511.0], [640.0, 100.0], [-1.0, 5.0]], dtype=jnp.float64)
        m = self.cam.in_image(uv)
        np.testing.assert_array_equal(np.asarray(m), [True, True, False, False])


def test_opencv_golden_if_available():
    """Golden comparison against cv2 when present (optional)."""
    try:
        import cv2  # noqa
    except ImportError:
        return
    cam = CameraModel.create(**AQUALOC, kind=RADTAN, dtype=jnp.float64)
    uv = np.asarray(_grid_pixels(n=8), dtype=np.float64).reshape(-1, 1, 2)
    K = np.asarray(cam.K)
    D = np.asarray(cam.dist)
    # Forward golden: cv2.projectPoints applies the same radtan model.
    # (cv2.undistortPoints only runs 5 fixed-point iterations and is not
    # converged at image corners, so we instead verify that cv2's *forward*
    # model maps our undistorted points back onto the original pixels.)
    ours = np.asarray(cam.undistort_pixels(jnp.asarray(uv.reshape(-1, 2))))
    xn = (ours - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
    pts3 = np.concatenate([xn, np.ones((len(xn), 1))], axis=1)
    back, _ = cv2.projectPoints(pts3, np.zeros(3), np.zeros(3), K, D)
    np.testing.assert_allclose(back.reshape(-1, 2), uv.reshape(-1, 2), atol=1e-6)

    # Fisheye: criteria is exposed, so compare undistortion directly, and
    # check the forward model against cv2.fisheye.distortPoints.
    camf = CameraModel.create(**AQUALOC, kind=FISHEYE, dtype=jnp.float64)
    crit = (cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 100, 1e-12)
    reff = cv2.fisheye.undistortPoints(
        uv, K, np.asarray(camf.dist), None, None, K, criteria=crit
    ).reshape(-1, 2)
    oursf = np.asarray(camf.undistort_pixels(jnp.asarray(uv.reshape(-1, 2))))
    np.testing.assert_allclose(oursf, reff, atol=1e-3)

    xn_f = 0.3 * np.random.RandomState(0).randn(64, 2)
    p3 = np.concatenate([xn_f, np.ones((64, 1))], axis=1)
    fwd_ref, _ = cv2.fisheye.projectPoints(
        p3.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), K, np.asarray(camf.dist)
    )
    fwd_ours = np.asarray(camf.project(jnp.asarray(p3)))
    np.testing.assert_allclose(fwd_ours, fwd_ref.reshape(-1, 2), atol=1e-6)
