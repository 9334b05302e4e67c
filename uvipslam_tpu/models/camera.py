"""Camera projection and distortion models.

TPU-native equivalent of the reference's OpenCV camera handling:
`cv::undistortPoints` (plumb-bob/radtan) and `cv::fisheye::undistortPoints`
(Kannala-Brandt equidistant), selected by `Camera.Fisheye`
(reference: src/Tracking.cc:1265-1283, Data/*.yaml `Camera.*`).

All functions batch over arbitrary leading dims and are jit/vmap-safe:
undistortion is a fixed-iteration Newton/fixed-point solve (no
tolerance-based early exit — constant trip count for XLA).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

RADTAN = 0
FISHEYE = 1

_UNDISTORT_ITERS = 40


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraModel:
    """Pinhole intrinsics + distortion (radtan or equidistant fisheye).

    dist: 4-vector, interpreted as (k1, k2, p1, p2) for radtan and
    (k1, k2, k3, k4) for fisheye — matching how the reference feeds its
    YAML `Camera.k1..p2` into either cv::undistortPoints or
    cv::fisheye::undistortPoints unchanged.
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    dist: jax.Array  # [4]
    kind: int = dataclasses.field(metadata=dict(static=True), default=RADTAN)
    width: int = dataclasses.field(metadata=dict(static=True), default=640)
    height: int = dataclasses.field(metadata=dict(static=True), default=512)

    @staticmethod
    def create(fx, fy, cx, cy, dist=(0.0, 0.0, 0.0, 0.0), kind=RADTAN,
               width=640, height=512, dtype=jnp.float32) -> "CameraModel":
        # intrinsics live as NUMPY, never eager device arrays: camera
        # fields are closure-captured by every jitted tracker stage, and
        # MLIR lowering must FETCH a device-resident constant back
        # through the (slow remote) device tunnel to embed it — measured
        # 300+ s of the VIP "compile" time. numpy constants embed free.
        npdt = np.dtype(dtype)
        return CameraModel(
            fx=np.asarray(fx, npdt), fy=np.asarray(fy, npdt),
            cx=np.asarray(cx, npdt), cy=np.asarray(cy, npdt),
            dist=np.asarray(dist, npdt), kind=kind, width=width,
            height=height,
        )

    @property
    def K(self):
        dtype = self.fx.dtype
        if isinstance(self.fx, (np.ndarray, np.generic)):
            return np.asarray(
                [[self.fx, 0.0, self.cx],
                 [0.0, self.fy, self.cy],
                 [0.0, 0.0, 1.0]], dtype)
        z = jnp.zeros((), dtype)
        o = jnp.ones((), dtype)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx]),
            jnp.stack([z, self.fy, self.cy]),
            jnp.stack([z, z, o]),
        ])

    # -- normalized-plane distortion ----------------------------------------

    def distort_normalized(self, xn: jax.Array) -> jax.Array:
        """Apply distortion to normalized coords [..., 2] -> [..., 2]."""
        if self.kind == FISHEYE:
            return _fisheye_distort(xn, self.dist)
        return _radtan_distort(xn, self.dist)

    def undistort_normalized(self, xd: jax.Array) -> jax.Array:
        """Invert distortion on normalized coords (fixed-iteration).

        Zero-distortion fast path: when the coefficients are concrete
        zeros (the synthetic/bench cameras), skip the fixed-point
        iterations entirely — measured 1.5 ms/frame otherwise."""
        import numpy as _np
        if not isinstance(self.dist, jax.core.Tracer):
            if not _np.asarray(self.dist).any():
                return xd
        if self.kind == FISHEYE:
            return _fisheye_undistort(xd, self.dist)
        return _radtan_undistort(xd, self.dist)

    # -- pixel-level API ------------------------------------------------------

    def project(self, p_cam: jax.Array) -> jax.Array:
        """Camera-frame 3D points [..., 3] -> distorted pixels [..., 2]."""
        xn = p_cam[..., :2] / p_cam[..., 2:3]
        xd = self.distort_normalized(xn)
        return jnp.stack(
            [self.fx * xd[..., 0] + self.cx, self.fy * xd[..., 1] + self.cy],
            axis=-1,
        )

    def project_ideal(self, p_cam: jax.Array) -> jax.Array:
        """Project without distortion (for already-undistorted pixel space)."""
        xn = p_cam[..., :2] / p_cam[..., 2:3]
        return jnp.stack(
            [self.fx * xn[..., 0] + self.cx, self.fy * xn[..., 1] + self.cy],
            axis=-1,
        )

    def undistort_pixels(self, uv: jax.Array) -> jax.Array:
        """Distorted pixels -> undistorted pixels (same K), matching the
        reference's undistort_point which passes P = K
        (reference: src/Tracking.cc:1265-1283)."""
        xd = jnp.stack(
            [(uv[..., 0] - self.cx) / self.fx, (uv[..., 1] - self.cy) / self.fy],
            axis=-1,
        )
        xn = self.undistort_normalized(xd)
        return jnp.stack(
            [self.fx * xn[..., 0] + self.cx, self.fy * xn[..., 1] + self.cy],
            axis=-1,
        )

    def unproject_pixels(self, uv: jax.Array) -> jax.Array:
        """Undistorted pixels -> unit-depth camera rays [..., 3]."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    def in_image(self, uv: jax.Array, border: float = 0.0) -> jax.Array:
        return (
            (uv[..., 0] >= border)
            & (uv[..., 0] < self.width - border)
            & (uv[..., 1] >= border)
            & (uv[..., 1] < self.height - border)
        )


# ---------------------------------------------------------------------------
# radtan (plumb bob, k1 k2 p1 p2)
# ---------------------------------------------------------------------------


def _radtan_distort(xn: jax.Array, d: jax.Array) -> jax.Array:
    k1, k2, p1, p2 = d[0], d[1], d[2], d[3]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xy = x * y
    xd = x * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
    return jnp.stack([xd, yd], axis=-1)


def _radtan_undistort(xd: jax.Array, d: jax.Array) -> jax.Array:
    """Fixed-point iteration, same scheme as cv::undistortPoints."""
    k1, k2, p1, p2 = d[0], d[1], d[2], d[3]
    x0, y0 = xd[..., 0], xd[..., 1]

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        icdist = 1.0 / (1.0 + k1 * r2 + k2 * r2 * r2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return ((x0 - dx) * icdist, (y0 - dy) * icdist)

    x, y = jax.lax.fori_loop(0, _UNDISTORT_ITERS, body, (x0, y0))
    return jnp.stack([x, y], axis=-1)


# ---------------------------------------------------------------------------
# Kannala-Brandt equidistant fisheye (k1..k4), cv::fisheye convention
# ---------------------------------------------------------------------------


def _fisheye_theta_d(theta: jax.Array, d: jax.Array) -> jax.Array:
    k1, k2, k3, k4 = d[0], d[1], d[2], d[3]
    t2 = theta * theta
    return theta * (1.0 + k1 * t2 + k2 * t2 * t2 + k3 * t2 * t2 * t2 + k4 * t2 * t2 * t2 * t2)


def _fisheye_distort(xn: jax.Array, d: jax.Array) -> jax.Array:
    x, y = xn[..., 0], xn[..., 1]
    r = jnp.sqrt(x * x + y * y)
    small = r < 1e-8
    safe_r = jnp.where(small, 1.0, r)
    theta = jnp.arctan(r)
    scale = jnp.where(small, 1.0, _fisheye_theta_d(theta, d) / safe_r)
    return jnp.stack([x * scale, y * scale], axis=-1)


def _fisheye_undistort(xd: jax.Array, d: jax.Array) -> jax.Array:
    """Invert theta_d(theta) by Newton iteration (fixed count), then
    rescale — mirrors cv::fisheye::undistortPoints numerics."""
    k1, k2, k3, k4 = d[0], d[1], d[2], d[3]
    x, y = xd[..., 0], xd[..., 1]
    theta_d = jnp.sqrt(x * x + y * y)
    small = theta_d < 1e-8
    safe_td = jnp.where(small, 1.0, theta_d)

    def body(_, theta):
        t2 = theta * theta
        f = theta * (1.0 + k1 * t2 + k2 * t2 * t2 + k3 * t2 * t2 * t2 + k4 * t2 * t2 * t2 * t2) - safe_td
        fp = 1.0 + 3 * k1 * t2 + 5 * k2 * t2 * t2 + 7 * k3 * t2 * t2 * t2 + 9 * k4 * t2 * t2 * t2 * t2
        return theta - f / jnp.where(jnp.abs(fp) < 1e-8, 1.0, fp)

    theta = jax.lax.fori_loop(0, _UNDISTORT_ITERS, body, safe_td)
    scale = jnp.where(small, 1.0, jnp.tan(theta) / safe_td)
    return jnp.stack([x * scale, y * scale], axis=-1)
