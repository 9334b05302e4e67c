"""Real-dataset ATE parity harness.

The reference's evaluation protocol is: run USLAM on a rosbag with a
settings YAML, write `stamped_traj_estimate.txt` (TUM format,
reference: src/main.cc:186-204), then compute ATE against a stamped
groundtruth file with rpg_trajectory_evaluation (reference:
src/Tracking.cc:2710,2744). No real Aqualoc/EuRoC data is reachable
from this environment (zero egress), so the harness is exercised end to
end on a SYNTHESIZED bag: rendered sequence -> rosbag bytes -> native
C++ decoder -> settings YAML -> app.main() -> TUM estimate ->
evaluate_ate() vs the rendered groundtruth. A real dataset is a drop-in:
  python -m uvipslam_tpu.app --settings Data/X.yaml --bag X.bag \
      --gt stamped_groundtruth.txt
"""

import os
import subprocess

import numpy as np
import pytest

from tests._isolate import isolated
from uvipslam_tpu.io.evaluate import (
    associate,
    evaluate_ate,
    posyaw_alignment,
    save_tum_groundtruth,
    umeyama_alignment,
)

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


class TestEvaluateUnits:
    def test_associate_nearest_within_tolerance(self):
        ts_e = np.asarray([0.0, 1.0, 2.0, 3.0])
        ts_g = np.asarray([0.005, 1.2, 2.001, 2.996])
        ie, ig = associate(ts_e, ts_g, max_dt=0.02)
        np.testing.assert_array_equal(ie, [0, 2, 3])
        np.testing.assert_array_equal(ig, [0, 2, 3])

    def test_umeyama_recovers_sim3(self):
        rs = np.random.RandomState(0)
        P = rs.randn(50, 3)
        th = 0.7
        R = np.asarray([[np.cos(th), -np.sin(th), 0],
                        [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        G = 2.5 * (R @ P.T).T + [1.0, -2.0, 0.5]
        s, R2, t2 = umeyama_alignment(P, G, with_scale=True)
        assert abs(s - 2.5) < 1e-9
        np.testing.assert_allclose(R2, R, atol=1e-9)
        np.testing.assert_allclose(
            s * (R2 @ P.T).T + t2, G, atol=1e-8)

    def test_posyaw_removes_only_yaw(self):
        rs = np.random.RandomState(1)
        P = rs.randn(40, 3)
        th = -0.4
        Rz = np.asarray([[np.cos(th), -np.sin(th), 0],
                         [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        G = (Rz @ P.T).T + [0.3, 0.1, -0.2]
        s, R, t = posyaw_alignment(P, G)
        np.testing.assert_allclose((R @ P.T).T + t, G, atol=1e-8)
        # a tilt (roll) error must NOT be absorbed
        Rx = np.asarray([[1.0, 0, 0], [0, np.cos(0.2), -np.sin(0.2)],
                         [0, np.sin(0.2), np.cos(0.2)]])
        G_tilt = (Rx @ P.T).T
        _, R2, t2 = posyaw_alignment(P, G_tilt)
        resid = np.linalg.norm((R2 @ P.T).T + t2 - G_tilt, axis=1)
        assert resid.max() > 0.05

    def test_evaluate_ate_files(self, tmp_path):
        ts = np.arange(20) * 0.05
        gt = np.stack([np.linspace(0, 2, 20), np.zeros(20), np.zeros(20)], 1)
        est = 0.5 * gt + np.asarray([3.0, 1.0, 0.0])  # scaled + shifted
        est[7] += [0.0, 0.02, 0.0]                     # one small error
        gt_f, est_f = str(tmp_path / "gt.txt"), str(tmp_path / "est.txt")
        save_tum_groundtruth(gt_f, ts, gt)
        save_tum_groundtruth(est_f, ts, est)
        r = evaluate_ate(est_f, gt_f, align="sim3")
        assert r["n_matched"] == 20
        assert abs(r["scale"] - 2.0) < 0.01
        assert r["ate_rmse_m"] < 0.03
        r2 = evaluate_ate(est_f, gt_f, align="none")
        assert r2["ate_rmse_m"] > 1.0


@pytest.mark.slow
@isolated
def test_bag_to_ate_parity_pipeline(tmp_path):
    """Full protocol on a synthesized bag: render -> bag -> native decode
    -> settings YAML -> app.main -> TUM -> ATE vs groundtruth."""
    from tests._bagwrite import imu_stream_from_sequence, write_bag
    from uvipslam_tpu.app import main as app_main
    from uvipslam_tpu.io.synthetic import make_sequence

    so = os.path.join(ROOT, "native", "libbagreader.so")
    if not os.path.exists(so):
        subprocess.check_call(
            ["sh", os.path.join(ROOT, "scripts", "build_native.sh")])

    seq = make_sequence(n_frames=45, H=240, W=320, n_points=2500, seed=3,
                        speed=1.2)
    T_BASE = 1000.0
    imu_ts, omg, acc = imu_stream_from_sequence(seq)
    bag = str(tmp_path / "seq.bag")
    write_bag(bag, seq.images, seq.timestamps,
              imu_ts=imu_ts, imu_omg=omg, imu_acc=acc,
              pressure_ts=seq.timestamps[seq.depth_valid],
              pressure=seq.depth[seq.depth_valid], t_base=T_BASE)

    gt_f = str(tmp_path / "stamped_groundtruth.txt")
    save_tum_groundtruth(gt_f, seq.timestamps + T_BASE, seq.positions_w)

    K = seq.K
    yaml = str(tmp_path / "settings.yaml")
    with open(yaml, "w") as f:
        f.write(f"""%YAML:1.0
Camera.fx: {K[0, 0]}
Camera.fy: {K[1, 1]}
Camera.cx: {K[0, 2]}
Camera.cy: {K[1, 2]}
Camera.col: 320
Camera.row: 240
Camera.fps: 20.0
ORBextractor.nFeatures: 200
LocalMapping.LocalWindowSize: 6
Mode: 0
Enhance: 1
LoopC: 0
imagetopic: "/camera/image_raw"
imutopic: "/imu"
depthtopic: "/depth"
""")

    out = str(tmp_path / "stamped_traj_estimate.txt")
    res = app_main(["--settings", yaml, "--bag", bag,
                    "--gt", gt_f, "--out", out])
    # KF-trajectory export (reference: src/main.cc:180-204): one
    # line per keyframe, not per frame
    assert res is not None and res["n_matched"] >= 8, res
    span = res["gt_span_m"]
    assert res["ate_rmse_m"] < 0.05 * span, res


@pytest.mark.slow
@isolated
def test_bag_to_ate_parity_vip_with_extrinsics(tmp_path):
    """Full VIP protocol with Tbc != I THROUGH THE APP PATH: the settings
    YAML carries a real Camera.Tbc (rotated ~15 deg, offset ~10 cm) and
    app.main must thread it into the tracker (reference:
    src/IMU/configparam.cpp:41-69 — a real Aqualoc YAML run must not
    silently fall back to identity extrinsics)."""
    from tests._bagwrite import imu_stream_from_sequence, write_bag
    from uvipslam_tpu.app import main as app_main
    from uvipslam_tpu.io.synthetic import _so3_exp_np, make_sequence

    so = os.path.join(ROOT, "native", "libbagreader.so")
    if not os.path.exists(so):
        subprocess.check_call(
            ["sh", os.path.join(ROOT, "scripts", "build_native.sh")])

    Tbc = np.eye(4)
    Tbc[:3, :3] = _so3_exp_np(np.array([0.15, -0.10, 0.20]))
    Tbc[:3, 3] = [0.08, -0.05, 0.07]

    seq = make_sequence(
        n_frames=110, H=240, W=320, n_points=4000, seed=3, speed=1.2,
        gyr_noise=0.005, acc_noise=0.05,
        gyr_bias=(0.004, -0.006, 0.003), acc_bias=(0.0, 0.0, 0.0),
        depth_noise=0.02, z_amp=0.5, Tbc=Tbc,
    )
    T_BASE = 1000.0
    imu_ts, omg, acc = imu_stream_from_sequence(seq)
    bag = str(tmp_path / "seq.bag")
    write_bag(bag, seq.images, seq.timestamps,
              imu_ts=imu_ts, imu_omg=omg, imu_acc=acc,
              pressure_ts=seq.timestamps[seq.depth_valid],
              pressure=seq.depth[seq.depth_valid], t_base=T_BASE)

    gt_f = str(tmp_path / "stamped_groundtruth.txt")
    save_tum_groundtruth(gt_f, seq.timestamps + T_BASE, seq.positions_w)

    K = seq.K
    tbc_flat = ", ".join(f"{v}" for v in Tbc.reshape(-1))
    yaml = str(tmp_path / "settings.yaml")
    with open(yaml, "w") as f:
        f.write(f"""%YAML:1.0
Camera.fx: {K[0, 0]}
Camera.fy: {K[1, 1]}
Camera.cx: {K[0, 2]}
Camera.cy: {K[1, 2]}
Camera.col: 320
Camera.row: 240
Camera.fps: 20.0
Camera.Tbc: !!opencv-matrix
   rows: 4
   cols: 4
   dt: d
   data: [{tbc_flat}]
gyr.noise: 0.01
acc.noise: 0.1
gyr.rw: 5.0e-5
acc.rw: 1.0e-3
depth.noise: 0.05
ORBextractor.nFeatures: 200
LocalMapping.LocalWindowSize: 6
Mode: 2
Enhance: 1
LoopC: 0
time.Init: 2.5
Init_mode: 2
imagetopic: "/camera/image_raw"
imutopic: "/imu"
depthtopic: "/depth"
""")

    # loader sanity: the Tbc actually parses to the matrix we wrote
    from uvipslam_tpu.io.config import load_settings
    s = load_settings(yaml)
    np.testing.assert_allclose(s.Tbc, Tbc, atol=1e-12)

    out = str(tmp_path / "stamped_traj_estimate.txt")
    res = app_main(["--settings", yaml, "--bag", bag,
                    "--gt", gt_f, "--out", out])
    assert res is not None and res["n_matched"] >= 12, res
    span = res["gt_span_m"]
    # metric (posyaw) alignment: only passes if the extrinsics were
    # consumed — identity extrinsics on this rig breaks VIO init/scale
    assert res["ate_rmse_m"] < 0.12 * span, res


@pytest.mark.slow
@isolated
def test_app_device_scan_mode(tmp_path):
    """--device replays the sequence as ONE jitted lax.scan program (the
    fast path the bench measures) through the app entry point, and its
    trajectory lands in the same ATE family as the host path
    (reference: src/main.cc:51-209 runs the real system at real speed)."""
    from uvipslam_tpu.app import main as app_main
    from uvipslam_tpu.io.evaluate import evaluate_ate
    from uvipslam_tpu.io.synthetic import make_sequence

    # groundtruth for the app's built-in synthetic sequence (same params)
    seq = make_sequence(n_frames=120, H=240, W=320, n_points=4000,
                        speed=1.2, z_amp=0.5, depth_noise=0.02)
    gt_f = str(tmp_path / "gt.txt")
    save_tum_groundtruth(gt_f, seq.timestamps, seq.positions_w)

    out = str(tmp_path / "est_device.txt")
    res = app_main(["--synthetic", "120", "--mode", "2", "--device",
                    "--gt", gt_f, "--out", out])
    assert res is not None and res["n_matched"] >= 8, res
    span = res["gt_span_m"]
    assert res["ate_rmse_m"] < 0.12 * span, res
