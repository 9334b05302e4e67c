"""Application driver: the `USLAM` executable equivalent.

TPU-native equivalent of the reference's main()
(reference: src/main.cc:51-209): load settings YAML, decode the rosbag
(or generate a synthetic sequence), construct the tracker for the
configured Mode (MONO / VI / VIP), replay all frames, and write the
TUM-format trajectory + throughput line at exit
(reference: src/Tracking.cc:398-399 FPS print; src/main.cc:186-204).

Usage:
  python -m uvipslam_tpu.app --settings Data/xxx.yaml [--bag file.bag]
  python -m uvipslam_tpu.app --synthetic 120 --mode 2
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings", help="reference-schema YAML settings file")
    ap.add_argument("--bag", help="rosbag path (overrides settings bagfile)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run N synthetic frames instead of a bag")
    ap.add_argument("--mode", type=int, default=None, help="0 MONO / 2 VIP")
    ap.add_argument("--out", default="stamped_traj_estimate.txt")
    ap.add_argument("--gt", default=None,
                    help="stamped_groundtruth.txt (TUM) — runs the "
                         "rpg-style ATE evaluation after the replay")
    ap.add_argument("--align", default=None,
                    choices=["sim3", "se3", "posyaw", "none"],
                    help="ATE alignment (default: sim3 for MONO, "
                         "posyaw for VI/VIP)")
    ap.add_argument("--metrics", default=None,
                    help="write a structured JSONL metrics stream here")
    args = ap.parse_args(argv)

    from uvipslam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from uvipslam_tpu.io.config import MONO, VIP, Settings, load_settings
    from uvipslam_tpu.io.trajectory import save_tum_trajectory
    from uvipslam_tpu.models.camera import FISHEYE, RADTAN, CameraModel

    if args.settings:
        import os
        if not os.path.exists(args.settings):
            ap.error(f"settings file not found: {args.settings}")
        s = load_settings(args.settings)
    else:
        s = Settings()
    if args.mode is not None:
        s.mode = args.mode

    if args.synthetic:
        from uvipslam_tpu.io.synthetic import make_sequence
        seq = make_sequence(n_frames=args.synthetic, H=240, W=320,
                            n_points=4000, speed=1.2, z_amp=0.5,
                            depth_noise=0.02)
        bundles = dict(
            images=seq.images, timestamps=seq.timestamps,
            imu_omg=seq.imu_omg, imu_acc=seq.imu_acc,
            imu_dt=seq.imu_dt, imu_mask=seq.imu_mask,
            depth=seq.depth, depth_valid=seq.depth_valid,
        )
        cam = CameraModel.create(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2],
                                 seq.K[1, 2], width=320, height=240)
        imu_cfg = dict(gyr_noise_sd=0.01, acc_noise_sd=0.1, depth_noise_sd=0.05,
                       vio_init_min_kfs=8, vio_init_min_time=2.5)
    else:
        from uvipslam_tpu.io.bag import make_frame_bundles, read_bag
        bagpath = args.bag or s.bagfile
        bag = read_bag(bagpath, s.image_topic, s.imu_topic, s.depth_topic)
        bundles = make_frame_bundles(bag, delay_to_imu=s.delay_to_imu)
        cam = CameraModel.create(
            s.fx, s.fy, s.cx, s.cy, dist=(s.k1, s.k2, s.p1, s.p2),
            kind=FISHEYE if s.fisheye else RADTAN,
            width=s.width, height=s.height,
        )
        imu_cfg = dict(gyr_noise_sd=s.gyr_noise, acc_noise_sd=s.acc_noise,
                       gyr_bias_rw2=s.gyr_rw**2, acc_bias_rw2=s.acc_rw**2,
                       depth_noise_sd=s.depth_noise,
                       vio_init_min_time=s.init_time,
                       init_mode=s.init_mode)

    n_frames = len(bundles["timestamps"])
    from uvipslam_tpu.utils.metrics import MetricsLogger
    ml = MetricsLogger(args.metrics, run_id=f"mode{s.mode}")
    t0 = time.time()

    if s.mode == MONO:
        from uvipslam_tpu.frontend.tracker import MonoTracker, TrackerConfig
        cfg = TrackerConfig(n_tracks=s.n_features, px_distance=s.px_distance,
                            local_window=s.local_window_size,
                            enhance=bool(s.enhance),
                            loop_closing=bool(s.loop_closing))
        tr = MonoTracker(cam, cfg)
        for f in range(n_frames):
            st = tr.process_frame(bundles["images"][f])
            ml.frame(f, st)
    else:
        from uvipslam_tpu.frontend.vip_tracker import VipConfig, VipTracker
        cfg = VipConfig(n_tracks=s.n_features, px_distance=s.px_distance,
                        local_window=s.local_window_size,
                        enhance=bool(s.enhance),
                        loop_closing=bool(s.loop_closing), **imu_cfg)
        tr = VipTracker(cam, cfg)
        for f in range(n_frames):
            st = tr.process_frame_vip(
                bundles["images"][f], bundles["imu_omg"][f],
                bundles["imu_acc"][f], bundles["imu_dt"][f],
                bundles["imu_mask"][f],
                depth=bundles["depth"][f],
                depth_valid=bool(bundles["depth_valid"][f]),
                timestamp=float(bundles["timestamps"][f]),
            )
            ml.frame(f, st)

    wall = time.time() - t0
    ml.counter("frames", n_frames)
    ml.event("run_end", fps=round(n_frames / max(wall, 1e-9), 2),
             n_keyframes=int(tr.map.n_kf))
    ml.close()
    ids = [i for i, _, _ in tr.trajectory]
    ts = [float(bundles["timestamps"][i]) for i in ids]
    Rs = [R for _, R, _ in tr.trajectory]
    tvs = [t for _, _, t in tr.trajectory]
    save_tum_trajectory(args.out, ts, Rs, tvs)
    # reference prints FPS = Frame_Count / wall seconds at exit
    print(f"frames: {n_frames}  tracked: {len(ids)}  "
          f"FPS: {n_frames / max(wall, 1e-9):.2f}  -> {args.out}")

    if args.gt:
        import json

        from uvipslam_tpu.io.evaluate import evaluate_ate
        align = args.align or ("sim3" if s.mode == MONO else "posyaw")
        res = evaluate_ate(args.out, args.gt, align=align)
        print("ATE " + json.dumps(res))
        return res


if __name__ == "__main__":
    main()
