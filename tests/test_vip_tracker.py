"""End-to-end VIP (visual-inertial-pressure) tracking: mono bootstrap,
VIO init with metric scale from pressure, NavState tracking."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _f32_mode():
    """These are production-dtype (f32) end-to-end tests; the global x64
    test mode would inject f64 into scan carries."""
    import jax
    with jax.enable_x64(False):
        yield

from uvipslam_tpu.frontend.vip_tracker import VipConfig, VipTracker
from uvipslam_tpu.io.synthetic import ate_rmse, make_sequence
from uvipslam_tpu.models.camera import CameraModel


@pytest.mark.slow
def test_vip_end_to_end_metric():
    seq = make_sequence(
        n_frames=110, H=240, W=320, n_points=4000, seed=3, speed=1.2,
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
    )
    tr = VipTracker(cam, cfg, kf_cap=64, pt_cap=8192)
    init_f = None
    states = []
    for f in range(110):
        st = tr.process_frame_vip(
            seq.images[f], seq.imu_omg[f], seq.imu_acc[f],
            seq.imu_dt[f], seq.imu_mask[f],
            depth=seq.depth[f], depth_valid=bool(seq.depth_valid[f]),
            timestamp=seq.timestamps[f],
        )
        states.append(st.get("state"))
        if tr.vio_ok and init_f is None:
            init_f = f

    # VIO must initialize and tracking must survive to the end
    assert init_f is not None, "VIO never initialized"
    assert states[-1] == "WORKING", states[-10:]

    est = tr.trajectory_positions()
    ids = [i for i, _, _ in tr.trajectory]
    gt = seq.positions_w[ids]

    # post-init segment must be METRIC (no scale alignment): the pressure
    # channel fixes absolute scale
    sel = [n for n, i in enumerate(ids) if i >= init_f + 5]
    rmse_metric, _ = ate_rmse(est[sel], gt[sel], align_scale=False)
    span = np.linalg.norm(gt[sel][-1] - gt[sel][0])
    assert rmse_metric < 0.12 * span, (rmse_metric, span)

    # z (depth) should be tightly locked by the pressure factor
    z_err = np.abs(est[sel][:, 2] - gt[sel][:, 2])
    assert np.median(z_err) < 0.1, np.median(z_err)

    # gyro bias estimated with the right sign and order of magnitude
    bg = np.asarray(tr.map.kf_ns.bg[0])
    assert abs(bg[2] - 0.003) < 0.005
