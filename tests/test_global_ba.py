"""Global BA (visual + NavState) and keyframe culling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvipslam_tpu.core import lie
from uvipslam_tpu.core.state import NavState
from uvipslam_tpu.frontend.tracker import _cam_pose_to_ns
from uvipslam_tpu.mapstate.hygiene import cull_keyframes
from uvipslam_tpu.mapstate.map import MapState
from uvipslam_tpu.solver.global_ba import global_ba_navstate, global_ba_visual

FX, FY, CX, CY = 420.0, 420.0, 320.0, 240.0
G = jnp.asarray([0.0, 0.0, -9.81])


@pytest.fixture(autouse=True)
def _f32_mode():
    with jax.enable_x64(False):
        yield


def _zero_preint():
    return jax.tree_util.tree_map(
        lambda a: a[0], MapState.empty(1, 1, 1).kf_preint)


def build_map(K=6, P=96, F=96, pose_noise=0.03, pt_noise=0.08, seed=0,
              with_imu=False, S=64, dt=0.01):
    """K keyframes on a constant-velocity line observing a cloud; exact
    uv from TRUE poses; stored poses/points perturbed. With `with_imu`,
    raw IMU windows consistent with the true trajectory (R=I, a_w=0)."""
    rs = np.random.RandomState(seed)
    m = MapState.empty(K, P, F, imu_window=S) if with_imu else MapState.empty(K, P, F)
    pts = np.stack([rs.uniform(-3, 3, P), rs.uniform(-2, 2, P),
                    rs.uniform(5, 9, P)], -1).astype(np.float32)

    T = S * dt
    vel = np.array([0.4, 0.05, 0.0], np.float32)
    true_C = np.stack([vel * (k * T) for k in range(K)])

    m = dataclasses.replace(
        m,
        pt_xyz=jnp.asarray(pts + rs.randn(P, 3).astype(np.float32) * pt_noise),
        pt_valid=jnp.ones((P,), bool),
        pt_desc=jnp.asarray(rs.randint(0, 2, (P, 256)), jnp.int8),
        n_pt=jnp.asarray(P, jnp.int32),
    )

    for k in range(K):
        C_true = true_C[k]
        pc = pts - C_true
        uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                       FY * pc[:, 1] / pc[:, 2] + CY], -1).astype(np.float32)
        # stored (perturbed) pose — KF0 stays exact as the gauge
        d = rs.randn(3).astype(np.float32) * pose_noise * (k > 0)
        ns = _cam_pose_to_ns(jnp.eye(3), jnp.asarray(-(C_true + d), jnp.float32))
        ns = dataclasses.replace(
            ns, v=jnp.asarray(vel + rs.randn(3).astype(np.float32)
                              * pose_noise * (k > 0)))
        kw = {}
        if with_imu:
            # body-frame samples for R=I, a_w=0: acc = -g, omega = 0
            kw = dict(
                imu_omg=jnp.zeros((S, 3)),
                imu_acc=jnp.broadcast_to(-G, (S, 3)),
                imu_dt=jnp.full((S,), dt),
                imu_mask=jnp.ones((S,)) * (k > 0),
            )
        m, _ = m.add_keyframe(
            ns, jnp.asarray(k * T), jnp.asarray(k * 3, jnp.int32),
            jnp.asarray(uv[:F]), m.pt_desc[:F], jnp.zeros(F, jnp.int32),
            jnp.zeros(F), jnp.ones(F, bool),
            jnp.arange(F, dtype=jnp.int32),
            jnp.asarray(C_true[2]), jnp.asarray(True),
            _zero_preint(), jnp.asarray(k - 1, jnp.int32),
            **kw,
        )
    return m, true_C, pts


def _centers(m, K):
    return np.asarray(m.kf_ns.p[:K])


def test_global_ba_visual_converges():
    m, true_C, pts = build_map()
    err0 = np.linalg.norm(_centers(m, 6) - true_C, axis=1)
    sig = jnp.ones((8,), jnp.float32)
    m2 = global_ba_visual(m, FX, FY, CX, CY, sig)
    err1 = np.linalg.norm(_centers(m2, 6) - true_C, axis=1)
    assert err1[0] < 1e-6                      # gauge KF untouched
    assert err1[1:].max() < 0.25 * err0[1:].max(), (err0, err1)
    pt_err = np.linalg.norm(np.asarray(m2.pt_xyz) - pts, axis=1)
    assert np.median(pt_err) < 0.03, np.median(pt_err)
    # velocities/biases preserved (visual BA must not zero them)
    np.testing.assert_allclose(np.asarray(m2.kf_ns.v), np.asarray(m.kf_ns.v))


def test_global_ba_navstate_converges():
    m, true_C, pts = build_map(with_imu=True, seed=1)
    err0 = np.linalg.norm(_centers(m, 6) - true_C, axis=1)
    sig = jnp.ones((8,), jnp.float32)
    m2 = global_ba_navstate(
        m, G, jnp.eye(3), jnp.zeros(3), FX, FY, CX, CY,
        1.7e-4, 2e-3, 1e-9, 1e-8, 1.0 / 0.01**2, sig,
    )
    err1 = np.linalg.norm(_centers(m2, 6) - true_C, axis=1)
    assert err1[1:].max() < 0.3 * err0[1:].max(), (err0, err1)
    v_err = np.linalg.norm(np.asarray(m2.kf_ns.v[:6]) - [0.4, 0.05, 0.0], axis=1)
    assert v_err.max() < 0.05, v_err


def test_cull_keyframes():
    # K=6 all observing the same cloud: middle KFs are fully redundant
    m, _, _ = build_map(pose_noise=0.0, pt_noise=0.0)
    n_before = int(jnp.sum(m.kf_valid))
    m2 = cull_keyframes(m)
    assert int(jnp.sum(m2.kf_valid)) == n_before - 1
    culled = int(jnp.argmin(jnp.where(m.kf_valid, m2.kf_valid, True)))
    # protected slots survive: first and the keep_last=3 newest
    assert culled not in (0, 3, 4, 5)
    # chain spliced across the culled slot
    nxt = culled + 1
    assert int(m2.kf_prev[nxt]) == culled - 1
    # its observations detached
    assert not bool(jnp.any(m2.kf_feat_valid[culled]))
    # a second pass culls at most one more, never the protected set
    m3 = cull_keyframes(m2)
    assert bool(m3.kf_valid[0]) and bool(m3.kf_valid[5])
