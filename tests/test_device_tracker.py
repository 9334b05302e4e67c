"""The fully device-resident tracker must reproduce the host-orchestrated
pipeline's behavior on the same sequence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests._isolate import isolated


@pytest.fixture(autouse=True)
def _f32_mode():
    """These are production-dtype (f32) end-to-end tests; the global x64
    test mode would inject f64 into scan carries."""
    import jax
    with jax.enable_x64(False):
        yield

from uvipslam_tpu.frontend.device_tracker import WORKING, build_tracker
from uvipslam_tpu.frontend.tracker import TrackerConfig
from uvipslam_tpu.io.synthetic import ate_rmse, make_sequence
from uvipslam_tpu.models.camera import CameraModel


@pytest.mark.slow
@isolated
def test_device_tracker_end_to_end():
    seq = make_sequence(n_frames=40, H=240, W=320, n_points=2500, seed=3, speed=1.2)
    cam = CameraModel.create(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], width=320, height=240
    )
    cfg = TrackerConfig(n_tracks=200, min_init_tracks=60, local_window=6)
    st, step = build_tracker(cam, cfg, kf_cap=32, pt_cap=4096)

    outs = []
    for f in range(40):
        st, out = step(st, jnp.asarray(seq.images[f], jnp.float32))
        outs.append(out)

    states = np.asarray([int(o.state) for o in outs])
    working = states == WORKING
    assert working.sum() >= 30, states
    assert states[-1] == WORKING

    Rs = np.stack([np.asarray(o.Rcw, np.float64) for o in outs])
    ts = np.stack([np.asarray(o.tcw, np.float64) for o in outs])
    C = np.stack([-Rs[i].T @ ts[i] for i in range(len(outs))])
    gt = seq.positions_w[np.nonzero(working)[0]]
    rmse, _ = ate_rmse(C[working], gt)
    span = np.linalg.norm(gt[-1] - gt[0])
    assert rmse < 0.02 * span, (rmse, span)

    # map grew on device
    assert int(st.map.n_kf) >= 5
    assert int(st.map.pt_valid.sum()) >= 150


@pytest.mark.slow
@isolated
def test_device_tracker_relocalizes_after_blackout():
    """The device-resident LOST branch must recover tracking via the
    on-device relocalization (reference: Tracking::Relocalisation)."""
    from uvipslam_tpu.frontend.tracker import LOST, WORKING as W

    seq = make_sequence(n_frames=40, H=240, W=320, n_points=2500, seed=3,
                        speed=1.2)
    cam = CameraModel.create(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2],
                             seq.K[1, 2], width=320, height=240)
    cfg = TrackerConfig(n_tracks=200, min_init_tracks=60, local_window=6)
    st, step = build_tracker(cam, cfg, kf_cap=32, pt_cap=4096)

    for f in range(28):
        st, out = step(st, jnp.asarray(seq.images[f], jnp.float32))
    assert int(out.state) == W

    black = jnp.zeros_like(jnp.asarray(seq.images[0], jnp.float32))
    for _ in range(3):
        st, out = step(st, black)
    assert int(out.state) == LOST

    # revisit the latest keyframe's own view
    kf_frames = np.asarray(st.map.kf_frame_id[: int(st.map.n_kf)])
    reloc_frame = int(kf_frames[-1])
    relocalized = False
    for _ in range(3):
        st, out = step(st, jnp.asarray(seq.images[reloc_frame], jnp.float32))
        if int(out.state) == W:
            relocalized = True
            break
    assert relocalized, int(out.state)

    # pose agrees with where that frame was originally tracked
    ns_k = jax.tree_util.tree_map(lambda a: a[int(st.map.n_kf) - 1],
                                  st.map.kf_ns)
    C_kf = np.asarray(ns_k.p)
    R = np.asarray(out.Rcw)
    t = np.asarray(out.tcw)
    C = -R.T @ t
    assert np.linalg.norm(C - C_kf) < 0.15, (C, C_kf)
