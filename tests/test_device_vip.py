"""The fully device-resident VIP tracker must bootstrap, VIO-initialize
on device, and track metrically — same sequence/thresholds family as the
host-orchestrated VipTracker e2e (tests/test_vip_tracker.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests._isolate import isolated


@pytest.fixture(autouse=True)
def _f32_mode():
    with jax.enable_x64(False):
        yield

from uvipslam_tpu.frontend.device_vip import FrameBundle, build_vip_tracker
from uvipslam_tpu.frontend.tracker import WORKING
from uvipslam_tpu.frontend.vip_tracker import VipConfig
from uvipslam_tpu.io.synthetic import ate_rmse, make_sequence
from uvipslam_tpu.models.camera import CameraModel


@pytest.mark.slow
@isolated
def test_device_vip_end_to_end_metric():
    T = 110
    seq = make_sequence(
        n_frames=T, H=240, W=320, n_points=4000, seed=3, speed=1.2,
        gyr_noise=0.005, acc_noise=0.05,
        gyr_bias=(0.004, -0.006, 0.003), acc_bias=(0.0, 0.0, 0.0),
        depth_noise=0.02, z_amp=0.5,
    )
    cam = CameraModel.create(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2],
        width=320, height=240,
    )
    cfg = VipConfig(
        n_tracks=200, min_init_tracks=60, local_window=6,
        gyr_noise_sd=0.01, acc_noise_sd=0.1, depth_noise_sd=0.05,
        vio_init_min_kfs=8, vio_init_min_time=2.5,
        imu_cap_per_kf=256,
    )
    st, step = build_vip_tracker(cam, cfg, kf_cap=64, pt_cap=8192)

    outs = []
    for f in range(T):
        b = FrameBundle(
            img=jnp.asarray(seq.images[f], jnp.float32),
            imu_omg=jnp.asarray(seq.imu_omg[f], jnp.float32),
            imu_acc=jnp.asarray(seq.imu_acc[f], jnp.float32),
            imu_dt=jnp.asarray(seq.imu_dt[f], jnp.float32),
            imu_mask=jnp.asarray(seq.imu_mask[f], jnp.float32),
            depth=jnp.asarray(seq.depth[f], jnp.float32),
            depth_valid=jnp.asarray(bool(seq.depth_valid[f])),
            timestamp=jnp.asarray(seq.timestamps[f], jnp.float32),
        )
        st, out = step(st, b)
        outs.append(out)

    states = np.asarray([int(o.state) for o in outs])
    vio = np.asarray([bool(o.vio_ok) for o in outs])
    assert vio.any(), "VIO never initialized on device"
    init_f = int(np.argmax(vio))
    assert states[-1] == WORKING, states[-10:]

    Rs = np.stack([np.asarray(o.Rcw) for o in outs]).astype(np.float64)
    ts = np.stack([np.asarray(o.tcw) for o in outs]).astype(np.float64)
    C = np.stack([-Rs[i].T @ ts[i] for i in range(T)])
    sel = np.asarray([i for i in range(T)
                      if i >= init_f + 5 and states[i] == WORKING])
    assert len(sel) >= 30, (init_f, states)

    gt = seq.positions_w[sel]
    est = C[sel]
    # METRIC accuracy (no scale alignment): pressure fixes absolute scale
    rmse_metric, _ = ate_rmse(est, gt, align_scale=False)
    span = np.linalg.norm(gt[-1] - gt[0])
    assert rmse_metric < 0.12 * span, (rmse_metric, span)

    # z locked by the pressure factor
    z_err = np.abs(est[:, 2] - gt[:, 2])
    assert np.median(z_err) < 0.1, np.median(z_err)

    # gyro bias estimated on device with the right sign/magnitude
    bg = np.asarray(st.map.kf_ns.bg[0])
    assert abs(bg[2] - 0.003) < 0.005, bg


@pytest.mark.slow
@isolated
def test_device_vip_relocalizes_after_preinit_blackout():
    """A tracking loss BEFORE VIO init must route through the device
    relocalization (reference: Tracking::Relocalisation) instead of
    wedging the tracker in LOST forever (the post-init loss path is
    branch_recovery, tested by the host e2e)."""
    from uvipslam_tpu.frontend.tracker import LOST

    T = 40
    seq = make_sequence(n_frames=T, H=240, W=320, n_points=2500, seed=3,
                        speed=1.2, depth_noise=0.02, z_amp=0.5)
    cam = CameraModel.create(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2],
                             seq.K[1, 2], width=320, height=240)
    # vio_init_min_time far beyond the sequence: stays in the mono phase
    cfg = VipConfig(n_tracks=200, min_init_tracks=60, local_window=6,
                    vio_init_min_kfs=8, vio_init_min_time=1e6,
                    imu_cap_per_kf=256)
    st, step = build_vip_tracker(cam, cfg, kf_cap=32, pt_cap=4096)

    def bundle(img, f):
        return FrameBundle(
            img=jnp.asarray(img, jnp.float32),
            imu_omg=jnp.asarray(seq.imu_omg[f], jnp.float32),
            imu_acc=jnp.asarray(seq.imu_acc[f], jnp.float32),
            imu_dt=jnp.asarray(seq.imu_dt[f], jnp.float32),
            imu_mask=jnp.asarray(seq.imu_mask[f], jnp.float32),
            depth=jnp.asarray(seq.depth[f], jnp.float32),
            depth_valid=jnp.asarray(bool(seq.depth_valid[f])),
            timestamp=jnp.asarray(seq.timestamps[f], jnp.float32),
        )

    for f in range(28):
        st, out = step(st, bundle(seq.images[f], f))
    assert int(out.state) == WORKING
    assert not bool(out.vio_ok)

    black = np.zeros_like(seq.images[0])
    for f in range(28, 31):
        st, out = step(st, bundle(black, f))
    assert int(out.state) == LOST

    kf_frames = np.asarray(st.map.kf_frame_id[: int(st.map.n_kf)])
    reloc_frame = int(kf_frames[-1])
    relocalized = False
    for f in range(31, 34):
        st, out = step(st, bundle(seq.images[reloc_frame], f))
        if int(out.state) == WORKING:
            relocalized = True
            break
    assert relocalized, int(out.state)

    ns_k = jax.tree_util.tree_map(lambda a: a[int(st.map.n_kf) - 1],
                                  st.map.kf_ns)
    C_kf = np.asarray(ns_k.p)
    R, t = np.asarray(out.Rcw), np.asarray(out.tcw)
    C = -R.T @ t
    assert np.linalg.norm(C - C_kf) < 0.15, (C, C_kf)


@pytest.mark.slow
@isolated
def test_device_vip_matches_host_trajectory():
    """Host/device VIP equivalence: the single-jitted-step device tracker
    and the host-orchestrated VipTracker run the SAME sequence with the
    same thresholds; their camera trajectories must agree within a small
    tolerance of each other (they are not bit-identical — RNG split
    order and the device's skipped ring z-offset differ — but any
    algorithmic divergence shows up as metres, not centimetres)."""
    from uvipslam_tpu.frontend.vip_tracker import VipTracker
    from uvipslam_tpu.io.synthetic import ate_rmse

    T = 110
    seq = make_sequence(
        n_frames=T, H=240, W=320, n_points=4000, seed=3, speed=1.2,
        gyr_noise=0.005, acc_noise=0.05,
        gyr_bias=(0.004, -0.006, 0.003), acc_bias=(0.0, 0.0, 0.0),
        depth_noise=0.02, z_amp=0.5,
    )
    cam = CameraModel.create(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2],
        width=320, height=240,
    )
    cfg = VipConfig(
        n_tracks=200, min_init_tracks=60, local_window=6,
        gyr_noise_sd=0.01, acc_noise_sd=0.1, depth_noise_sd=0.05,
        vio_init_min_kfs=8, vio_init_min_time=2.5,
        imu_cap_per_kf=256,
    )

    # --- device run ---
    st, step = build_vip_tracker(cam, cfg, kf_cap=64, pt_cap=8192)
    dev_C = np.full((T, 3), np.nan)
    dev_working = np.zeros(T, bool)
    for f in range(T):
        b = FrameBundle(
            img=jnp.asarray(seq.images[f], jnp.float32),
            imu_omg=jnp.asarray(seq.imu_omg[f], jnp.float32),
            imu_acc=jnp.asarray(seq.imu_acc[f], jnp.float32),
            imu_dt=jnp.asarray(seq.imu_dt[f], jnp.float32),
            imu_mask=jnp.asarray(seq.imu_mask[f], jnp.float32),
            depth=jnp.asarray(seq.depth[f], jnp.float32),
            depth_valid=jnp.asarray(bool(seq.depth_valid[f])),
            timestamp=jnp.asarray(seq.timestamps[f], jnp.float32),
        )
        st, out = step(st, b)
        if int(out.state) == WORKING and bool(out.vio_ok):
            R = np.asarray(out.Rcw, np.float64)
            t = np.asarray(out.tcw, np.float64)
            dev_C[f] = -R.T @ t
            dev_working[f] = True
    assert dev_working.sum() >= 30

    # --- host run ---
    tr = VipTracker(cam, cfg, kf_cap=64, pt_cap=8192)
    host_C = np.full((T, 3), np.nan)
    host_working = np.zeros(T, bool)
    for f in range(T):
        s = tr.process_frame_vip(
            seq.images[f], seq.imu_omg[f], seq.imu_acc[f],
            seq.imu_dt[f], seq.imu_mask[f],
            depth=seq.depth[f], depth_valid=bool(seq.depth_valid[f]),
            timestamp=seq.timestamps[f],
        )
        if s.get("state") == "WORKING" and tr.vio_ok:
            R = np.asarray(tr.Rcw, np.float64)
            t = np.asarray(tr.tcw, np.float64)
            host_C[f] = -R.T @ t
            host_working[f] = True
    assert host_working.sum() >= 30

    both = dev_working & host_working
    assert both.sum() >= 25, (dev_working.sum(), host_working.sum())
    dev = dev_C[both]
    host = host_C[both]
    gt = seq.positions_w[both]
    span = np.linalg.norm(gt[-1] - gt[0])

    # both implementations hit the same metric-accuracy family vs GT
    rmse_dev, _ = ate_rmse(dev, gt, align_scale=False)
    rmse_host, _ = ate_rmse(host, gt, align_scale=False)
    assert rmse_dev < 0.12 * span, (rmse_dev, span)
    assert rmse_host < 0.12 * span, (rmse_host, span)

    # trajectory-SHAPE equivalence: each run estimates its own VIO-init
    # anchor (gravity tilt + pressure scale) from a slightly different
    # keyframe set, so the raw trajectories differ by a small global
    # Sim3 (measured ~10% of span); after aligning one onto the other
    # the residual is the algorithmic disagreement and must be small
    rmse_mutual, _ = ate_rmse(dev, host)
    assert rmse_mutual < 0.04 * span, (rmse_mutual, span)
