"""Per-stage device profiler: capture a JAX trace of the scan-mode
tracker and aggregate device time by source line and HLO category.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_trace.py [--vip]

This is the profiling harness SURVEY §5 calls for (the reference has
only wall-clock FPS prints, src/Tracking.cc:398-399). It found the
round-2 hot spots: global_shift's big-kernel convolutions (47 ms/frame)
and the [1,1,H,W]-layout separable convs (31 ms/frame).
"""

import collections
import glob
import gzip
import json
import sys
import tempfile


def aggregate(trace_dir: str, top: int = 25):
    path = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")[0]
    data = json.load(gzip.open(path))
    agg = collections.Counter()
    cats = collections.Counter()
    total = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            args = e.get("args", {})
            src = args.get("source")
            cat = args.get("hlo_category", "")
            if src and cat not in ("conditional",):
                agg[src] += e["dur"]
                cats[cat] += e["dur"]
                total += e["dur"]
    print(f"=== device time by source line (total {total / 1e3:.0f} ms)")
    for src, d in agg.most_common(top):
        print(f"{d / 1e3:9.1f} ms  {src}")
    print("=== by HLO category")
    for c, d in cats.most_common(12):
        print(f"{d / 1e3:9.1f} ms  {c}")


def main():
    # self-locate the repo root: the axon TPU backend registers through
    # PYTHONPATH=/root/.axon_site, so REPLACING PYTHONPATH breaks backend
    # registration ('axon' missing from known backends); appending works,
    # but self-location makes the script invocation-proof
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from uvipslam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from uvipslam_tpu.io.synthetic import make_sequence
    from uvipslam_tpu.models.camera import CameraModel

    vip = "--vip" in sys.argv
    N = 60
    seq = make_sequence(n_frames=N, H=512, W=640, n_points=6000, seed=7,
                        speed=1.2)
    cam = CameraModel.create(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2],
                             seq.K[1, 2], width=640, height=512)

    if vip:
        from uvipslam_tpu.frontend.device_vip import FrameBundle, build_vip_tracker
        from uvipslam_tpu.frontend.vip_tracker import VipConfig
        cfg = VipConfig(n_tracks=400, min_init_tracks=100, local_window=8,
                        vio_init_min_kfs=6, vio_init_min_time=1.0)
        st0, step = build_vip_tracker(cam, cfg, kf_cap=64, pt_cap=8192)
        xs = FrameBundle(
            img=jnp.asarray(seq.images, jnp.float32),
            imu_omg=jnp.asarray(seq.imu_omg, jnp.float32),
            imu_acc=jnp.asarray(seq.imu_acc, jnp.float32),
            imu_dt=jnp.asarray(seq.imu_dt, jnp.float32),
            imu_mask=jnp.asarray(seq.imu_mask, jnp.float32),
            depth=jnp.asarray(seq.depth, jnp.float32),
            depth_valid=jnp.asarray(seq.depth_valid),
            timestamp=jnp.asarray(seq.timestamps, jnp.float32),
        )
    else:
        from uvipslam_tpu.frontend.device_tracker import build_tracker
        from uvipslam_tpu.frontend.tracker import TrackerConfig
        cfg = TrackerConfig(n_tracks=400, min_init_tracks=100, local_window=8)
        st0, step = build_tracker(cam, cfg, kf_cap=64, pt_cap=8192)
        xs = jnp.asarray(seq.images)

    scan = jax.jit(lambda st, x: jax.lax.scan(step.__wrapped__, st, x))
    r = scan(st0, xs)
    jax.block_until_ready(r[0].tcw)

    trace_dir = tempfile.mkdtemp(prefix="uvip_trace_")
    jax.profiler.start_trace(trace_dir)
    r = scan(st0, xs)
    jax.block_until_ready(r[0].tcw)
    jax.profiler.stop_trace()
    aggregate(trace_dir)


if __name__ == "__main__":
    main()
