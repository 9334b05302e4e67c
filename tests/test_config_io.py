"""Config YAML parsing (reference schema) + trajectory export roundtrip."""

import numpy as np

from uvipslam_tpu.io.config import VIP, load_settings
from uvipslam_tpu.io.trajectory import load_tum_trajectory, save_tum_trajectory

REFERENCE_YAML = """%YAML:1.0
test.DiscardTime: 0
bagfile: "/data/harbor_sequence_1.bag"
imutopic: "/rtimulib_node/imu"
imagetopic: "/camera/image_raw"
depthtopic: "/barometer_node/depth"
gyr.noise: 0.01414213562373
acc.noise: 0.28284271247462
gyr.rw : 5.0e-5
acc.rw : 1.0e-3
depth.noise : 0.5 # originally 0.2
Camera.fx: 413.32595366596017
Camera.fy: 413.70198739483686
Camera.cx: 305.9507483284928
Camera.cy: 259.4439948946375
Camera.k1: -0.06125568297136998
Camera.k2: -0.003796743395135256
Camera.p1: 0.027326634771204592
Camera.p2: -0.030296403142887066
Camera.fps: 20.0
Camera.RGB: 1
Camera.col: 640
Camera.row: 512
Camera.delaytoimu: -0.0403806549886
IMU.multiplyG: 0
Camera.Tbc:
 [-0.99978035,  0.01210101,  0.01711187, -0.01866921,
  0.0169654,  -0.01210461,  0.9997828,   0.02125636,
  0.01230552,  0.99985351,  0.01189665, -0.1489863,
  0.0, 0.0, 0.0, 1.0]
LocalMapping.LocalWindowSize: 10
ORBextractor.nFeatures: 400
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.fastTh: 20
ORBextractor.nScoreType: 0
Mode: 2
Enhance: 1
Px_distance: 20
LoopC: 0
LoopCHALOC: 0
LoopCBOF: 0
time.Init: 22
Pyramid.Level: 5
Window.Size : 21
Camera.Fisheye : 1
"""


def test_parse_reference_schema(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text(REFERENCE_YAML)
    s = load_settings(str(p))
    assert s.mode == VIP
    assert abs(s.fx - 413.32595366596017) < 1e-9
    assert s.fisheye == 1
    assert s.width == 640 and s.height == 512
    assert abs(s.depth_noise - 0.5) < 1e-12
    assert abs(s.gyr_rw - 5e-5) < 1e-12
    assert s.n_features == 400 and s.n_levels == 8
    assert s.local_window_size == 10
    assert abs(s.init_time - 22.0) < 1e-9
    assert s.bagfile == "/data/harbor_sequence_1.bag"
    assert s.imu_topic == "/rtimulib_node/imu"
    assert abs(s.delay_to_imu + 0.0403806549886) < 1e-12
    np.testing.assert_allclose(s.Tbc[0, 0], -0.99978035)
    np.testing.assert_allclose(s.Tbc[2, 3], -0.1489863)
    np.testing.assert_allclose(s.Tbc[3], [0, 0, 0, 1])


def test_trajectory_roundtrip(tmp_path):
    from uvipslam_tpu.core import lie
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    n = 10
    ts = 100.0 + np.arange(n) * 0.05
    Rs = [np.asarray(lie.so3_exp(jnp.asarray(rs.randn(3) * 0.3))) for _ in range(n)]
    tvs = [rs.randn(3) for _ in range(n)]
    p = str(tmp_path / "traj.txt")
    save_tum_trajectory(p, ts, Rs, tvs)
    ts2, pos, quat = load_tum_trajectory(p)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    for i in range(n):
        C = -Rs[i].T @ tvs[i]
        np.testing.assert_allclose(pos[i], C, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(quat[i]), 1.0, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from uvipslam_tpu.io.checkpoint import load_map, save_map
    from uvipslam_tpu.mapstate.map import MapState

    m = MapState.empty(4, 16, 8)
    import dataclasses
    m = dataclasses.replace(m, pt_xyz=m.pt_xyz.at[0].set(jnp.asarray([1.0, 2.0, 3.0])),
                            pt_valid=m.pt_valid.at[0].set(True))
    p = str(tmp_path / "map.npz")
    save_map(p, m)
    m2 = load_map(p, MapState.empty(4, 16, 8))
    np.testing.assert_allclose(np.asarray(m2.pt_xyz[0]), [1, 2, 3])
    assert bool(m2.pt_valid[0])


def test_viz_draw(tmp_path):
    from uvipslam_tpu.viz.publishers import draw_tracked_frame, plot_map
    from uvipslam_tpu.mapstate.map import MapState
    img = np.random.RandomState(0).uniform(0, 255, (48, 64)).astype(np.float32)
    xy = np.asarray([[10.0, 10.0], [30.0, 20.0]])
    rgb = draw_tracked_frame(img, xy, np.asarray([True, True]), np.asarray([True, False]))
    assert rgb.shape == (48, 64, 3)
    assert (rgb[10, 10] == (0, 255, 0)).all()
    plot_map(str(tmp_path / "map.png"), MapState.empty(4, 16, 8), trajectory=[[0, 0, 0], [1, 0, 0]])

    # populated map: covisibility web + spanning tree + frustum markers
    # (reference: MapPublisher covisibility/MST/camera, src/MapPublisher.cc)
    import jax
    import jax.numpy as jnp

    from uvipslam_tpu.core.state import NavState

    m = MapState.empty(4, 16, 8)
    m = m.__class__(**{**m.__dict__, "pt_valid": m.pt_valid.at[:8].set(True),
                       "n_pt": jnp.asarray(8, jnp.int32)})
    for k in range(3):
        ns = NavState.identity((), jnp.float32)
        ns = ns.__class__(**{**ns.__dict__,
                             "p": jnp.asarray([0.1 * k, 0.0, 0.0])})
        m, _ = m.add_keyframe(
            ns, jnp.asarray(float(k)), jnp.asarray(k, jnp.int32),
            jnp.zeros((8, 2)), jnp.zeros((8, 256), jnp.int8),
            jnp.zeros(8, jnp.int32), jnp.zeros(8),
            jnp.ones(8, bool), jnp.arange(8, dtype=jnp.int32),
            jnp.asarray(0.0), jnp.asarray(False),
            jax.tree_util.tree_map(lambda a: a[0], m.kf_preint),
            jnp.asarray(k - 1, jnp.int32),
        )
    plot_map(str(tmp_path / "map2.png"), m, covis_th=4)
    assert (tmp_path / "map2.png").exists()


def test_metrics_logger_jsonl(tmp_path):
    """Structured metrics stream: typed JSONL rows, timers, counters,
    and a summary record (replaces the reference's unstructured
    cout/ROS_INFO observability, src/Tracking.cc:2040,2172)."""
    import json

    from uvipslam_tpu.utils.metrics import MetricsLogger

    p = str(tmp_path / "metrics.jsonl")
    ml = MetricsLogger(p, run_id="t")
    ml.frame(0, {"state": "WORKING", "n_inliers": 42, "arr": [1, 2]})
    with ml.timer("local_ba", kf=3):
        pass
    ml.counter("keyframes")
    ml.counter("keyframes")
    ml.close()

    rows = [json.loads(ln) for ln in open(p)]
    kinds = [r["kind"] for r in rows]
    assert kinds == ["frame", "timing", "summary"]
    assert rows[0]["state"] == "WORKING" and rows[0]["n_inliers"] == 42
    assert "arr" not in rows[0]  # non-scalar fields are dropped
    assert rows[1]["stage"] == "local_ba" and rows[1]["dur_s"] >= 0
    assert rows[2]["counters"]["keyframes"] == 2
    assert rows[2]["frame_states"] == {"WORKING": 1}
