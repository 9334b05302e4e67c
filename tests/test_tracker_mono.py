"""End-to-end monocular VO on a synthetic sequence with ATE evaluation
(the SURVEY's minimum end-to-end slice; reference BASELINE config 2)."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _f32_mode():
    """These are production-dtype (f32) end-to-end tests; the global x64
    test mode would inject f64 into scan carries."""
    import jax
    with jax.enable_x64(False):
        yield

from uvipslam_tpu.frontend.tracker import WORKING, MonoTracker, TrackerConfig
from uvipslam_tpu.io.synthetic import ate_rmse, make_sequence
from uvipslam_tpu.models.camera import CameraModel


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=45, H=240, W=320, n_points=2500, seed=3, speed=1.2)


@pytest.fixture(scope="module")
def tracked(seq):
    cam = CameraModel.create(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2],
        width=320, height=240,
    )
    cfg = TrackerConfig(n_tracks=200, min_init_tracks=60, local_window=6)
    tr = MonoTracker(cam, cfg, kf_cap=32, pt_cap=4096)
    states = [tr.process_frame(seq.images[f]) for f in range(seq.images.shape[0])]
    return tr, states


def test_mono_vo_end_to_end(seq, tracked):
    tr, states = tracked
    assert any(s.get("initialized") for s in states), states[:10]
    n_working = sum(1 for s in states if s.get("state") == "WORKING")
    assert n_working >= 35, [s.get("state") for s in states]
    assert tr.state == WORKING, states[-1]

    # ATE after Sim3 alignment (mono scale is free)
    est = tr.trajectory_positions()
    frame_ids = [fid for fid, _, _ in tr.trajectory]
    gt = seq.positions_w[frame_ids]
    rmse, _ = ate_rmse(est, gt, align_scale=True)
    span = np.linalg.norm(gt[-1] - gt[0])
    # demand < 2% of trajectory span
    assert rmse < 0.02 * span, (rmse, span)


def test_mono_vo_map_growth(seq, tracked):
    tr, _ = tracked
    assert int(tr.map.n_kf) >= 5
    assert int(tr.map.pt_valid.sum()) >= 150
