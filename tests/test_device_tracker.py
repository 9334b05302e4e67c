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
