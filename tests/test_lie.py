import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvipslam_tpu.core import lie


def rand_w(key, n, scale=2.0):
    return scale * jax.random.normal(key, (n, 3), dtype=jnp.float64)


def rand_w_principal(key, n, max_angle=3.0):
    """Random rotation vectors with norm < max_angle (< pi), so that
    log(exp(w)) == w (principal value)."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (n, 3), dtype=jnp.float64)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    ang = jax.random.uniform(k2, (n, 1), dtype=jnp.float64, minval=0.0, maxval=max_angle)
    return axis * ang


class TestSO3:
    def test_exp_is_rotation(self):
        w = rand_w(jax.random.PRNGKey(0), 64)
        R = lie.so3_exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)

    def test_log_exp_roundtrip(self):
        w = rand_w_principal(jax.random.PRNGKey(1), 128)
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-10)

    def test_log_near_pi(self):
        axis = jnp.array([1.0, 0.0, 0.0], dtype=jnp.float64)
        for ang in [np.pi - 1e-6, np.pi - 1e-3, 3.0]:
            w = axis * ang
            w2 = lie.so3_log(lie.so3_exp(w))
            np.testing.assert_allclose(w2, w, atol=1e-6)

    def test_log_small_angle(self):
        w = jnp.array([[1e-9, -2e-9, 3e-10], [0.0, 0.0, 0.0]], dtype=jnp.float64)
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-15)

    def test_exp_matches_scipy_rodrigues(self):
        w = np.array([0.3, -0.5, 0.7])
        theta = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]) / theta
        R_ref = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
        np.testing.assert_allclose(lie.so3_exp(jnp.asarray(w)), R_ref, atol=1e-12)

    def test_jacobians_numeric(self):
        # Jl(w) satisfies: exp(w + Jl(w)^-T ... ) — verify via the identity
        # exp((w + e)) ~= exp(Jl(w) e) exp(w) for small e.
        w = jnp.array([0.4, -0.2, 0.9], dtype=jnp.float64)
        e = jnp.array([1e-6, -2e-6, 1.5e-6], dtype=jnp.float64)
        lhs = lie.so3_exp(w + e)
        Jl = lie.so3_left_jacobian(w)
        rhs = lie.so3_exp(Jl @ e) @ lie.so3_exp(w)
        np.testing.assert_allclose(lhs, rhs, atol=1e-11)
        # right jacobian: exp(w + e) ~= exp(w) exp(Jr(w) e)
        Jr = lie.so3_right_jacobian(w)
        rhs2 = lie.so3_exp(w) @ lie.so3_exp(Jr @ e)
        np.testing.assert_allclose(lhs, rhs2, atol=1e-11)

    def test_jacobian_inverses(self):
        w = rand_w(jax.random.PRNGKey(2), 32, scale=1.5)
        eye = jnp.broadcast_to(jnp.eye(3), (32, 3, 3))
        np.testing.assert_allclose(
            lie.so3_left_jacobian(w) @ lie.so3_left_jacobian_inv(w), eye, atol=1e-10
        )
        np.testing.assert_allclose(
            lie.so3_right_jacobian(w) @ lie.so3_right_jacobian_inv(w), eye, atol=1e-10
        )

    def test_quat_roundtrip(self):
        w = rand_w(jax.random.PRNGKey(3), 64)
        R = lie.so3_exp(w)
        R2 = lie.rotmat_from_quat(lie.quat_from_rotmat(R))
        np.testing.assert_allclose(R2, R, atol=1e-12)

    def test_normalize_rotation(self):
        w = rand_w(jax.random.PRNGKey(4), 8)
        R = lie.so3_exp(w) + 1e-5 * jax.random.normal(jax.random.PRNGKey(5), (8, 3, 3), dtype=jnp.float64)
        Rn = lie.normalize_rotation(R)
        eye = jnp.broadcast_to(jnp.eye(3), Rn.shape)
        np.testing.assert_allclose(Rn @ jnp.swapaxes(Rn, -1, -2), eye, atol=1e-9)


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(6)
        rho = jax.random.normal(key, (64, 3), dtype=jnp.float64)
        phi = rand_w_principal(jax.random.PRNGKey(16), 64)
        xi = jnp.concatenate([rho, phi], axis=-1)
        R, t = lie.se3_exp(xi)
        np.testing.assert_allclose(lie.se3_log(R, t), xi, atol=1e-10)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(7)
        xi = jax.random.normal(key, (16, 6), dtype=jnp.float64)
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-12)
        np.testing.assert_allclose(tc, 0.0, atol=1e-12)

    def test_apply(self):
        xi = jnp.array([0.1, 0.2, 0.3, 0.0, 0.0, jnp.pi / 2], dtype=jnp.float64)
        R, t = lie.se3_exp(xi)
        x = jnp.array([1.0, 0.0, 0.0], dtype=jnp.float64)
        y = lie.se3_apply(R, t, x)
        np.testing.assert_allclose(y, R @ x + t, atol=1e-12)


class TestSim3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(8)
        xi = jax.random.normal(key, (64, 7), dtype=jnp.float64) * 0.8
        s, R, t = lie.sim3_exp(xi)
        np.testing.assert_allclose(lie.sim3_log(s, R, t), xi, atol=1e-8)

    def test_zero_sigma_matches_se3(self):
        key = jax.random.PRNGKey(9)
        xi6 = jax.random.normal(key, (16, 6), dtype=jnp.float64)
        xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1), dtype=jnp.float64)], axis=-1)
        s, R, t = lie.sim3_exp(xi7)
        R2, t2 = lie.se3_exp(xi6)
        np.testing.assert_allclose(s, 1.0, atol=1e-12)
        np.testing.assert_allclose(R, R2, atol=1e-12)
        np.testing.assert_allclose(t, t2, atol=1e-10)

    def test_small_everything(self):
        xi = jnp.full((7,), 1e-9, dtype=jnp.float64)
        s, R, t = lie.sim3_exp(xi)
        out = lie.sim3_log(s, R, t)
        np.testing.assert_allclose(out, xi, atol=1e-12)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(10)
        xi = jax.random.normal(key, (8, 7), dtype=jnp.float64) * 0.5
        s, R, t = lie.sim3_exp(xi)
        si, Ri, ti = lie.sim3_inverse(s, R, t)
        sc, Rc, tc = lie.sim3_compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(sc, 1.0, atol=1e-10)
        np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-10)
        np.testing.assert_allclose(tc, 0.0, atol=1e-9)

    def test_apply(self):
        xi = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, jnp.log(2.0)], dtype=jnp.float64)
        s, R, t = lie.sim3_exp(xi)
        x = jnp.array([[1.0, 2.0, 3.0]], dtype=jnp.float64)
        np.testing.assert_allclose(lie.sim3_apply(s, R, t, x), 2.0 * x, atol=1e-12)
