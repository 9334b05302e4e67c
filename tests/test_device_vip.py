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
