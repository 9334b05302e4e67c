"""Relocalization from LOST + map hygiene (culling/fusion)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _f32_mode():
    """These are production-dtype (f32) end-to-end tests; the global x64
    test mode would inject f64 into scan carries."""
    import jax
    with jax.enable_x64(False):
        yield

from uvipslam_tpu.frontend.tracker import LOST, WORKING, MonoTracker, TrackerConfig
from uvipslam_tpu.io.synthetic import make_sequence
from uvipslam_tpu.mapstate.hygiene import cull_points, fuse_duplicates
from uvipslam_tpu.mapstate.map import MapState
from uvipslam_tpu.models.camera import CameraModel


@pytest.mark.slow
def test_relocalization_after_blackout():
    seq = make_sequence(n_frames=40, H=240, W=320, n_points=2500, seed=3, speed=1.2)
    cam = CameraModel.create(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2],
                             width=320, height=240)
    cfg = TrackerConfig(n_tracks=200, min_init_tracks=60, local_window=6)
    tr = MonoTracker(cam, cfg, kf_cap=32, pt_cap=4096)

    for f in range(28):
        tr.process_frame(seq.images[f])
    assert tr.state == WORKING

    # blackout: tracking must die
    black = np.zeros_like(seq.images[0])
    for _ in range(3):
        tr.process_frame(black)
    assert tr.state == LOST

    # revisit a mapped view (the latest keyframe's own frame — exercises
    # retrieval + matching + PnP + the state transition; wide-baseline
    # robustness is bounded by the synthetic random-texture content)
    kf_frames = np.asarray(tr.map.kf_frame_id[: int(tr.map.n_kf)])
    reloc_frame = int(kf_frames[-1])
    st = tr.process_frame(seq.images[reloc_frame])
    if not st.get("relocalized"):
        st = tr.process_frame(seq.images[reloc_frame])
    assert tr.state == WORKING, st
    # pose close to the pre-blackout estimate of that frame (same map scale)
    C = -np.asarray(tr.Rcw).T @ np.asarray(tr.tcw)
    fid = [i for i, _, _ in tr.trajectory]
    k = fid.index(reloc_frame)
    R_then, t_then = tr.trajectory[k][1], tr.trajectory[k][2]
    C_then = -R_then.T @ t_then
    assert np.linalg.norm(C - C_then) < 0.1, (C, C_then)


class TestHygiene:
    def test_cull_points(self):
        m = MapState.empty(4, 32, 8)
        m = dataclasses.replace(
            m,
            pt_valid=m.pt_valid.at[:3].set(True),
            pt_found=m.pt_found.at[0].set(1.0).at[1].set(9.0).at[2].set(9.0),
            pt_visible=m.pt_visible.at[0].set(10.0).at[1].set(10.0).at[2].set(10.0),
            pt_first_frame=m.pt_first_frame.at[:3].set(0),
            n_pt=jnp.asarray(3, jnp.int32),
        )
        # point 2 gets two observations; 0 has bad ratio; 1 has no obs and
        # is long past probation
        kf_feat_pt = m.kf_feat_pt.at[0, 0].set(2).at[1, 0].set(2)
        kf_feat_valid = m.kf_feat_valid.at[0, 0].set(True).at[1, 0].set(True)
        m = dataclasses.replace(m, kf_feat_pt=kf_feat_pt, kf_feat_valid=kf_feat_valid)
        m2 = cull_points(m, jnp.asarray(100, jnp.int32))
        v = np.asarray(m2.pt_valid)
        assert not v[0]      # bad found ratio
        assert not v[1]      # no observations after probation
        assert v[2]          # healthy

    def test_fuse_duplicates(self):
        rs = np.random.RandomState(0)
        m = MapState.empty(2, 16, 8)
        d = rs.randint(0, 2, (256,)).astype(np.int8)
        m = dataclasses.replace(
            m,
            pt_xyz=m.pt_xyz.at[0].set(jnp.asarray([1.0, 1.0, 1.0]))
                         .at[1].set(jnp.asarray([1.0, 1.0, 1.02]))
                         .at[2].set(jnp.asarray([5.0, 5.0, 5.0])),
            pt_desc=m.pt_desc.at[0].set(jnp.asarray(d)).at[1].set(jnp.asarray(d)),
            pt_valid=m.pt_valid.at[:3].set(True),
        )
        kf_feat_pt = m.kf_feat_pt.at[0, 0].set(1).at[0, 1].set(2)
        m = dataclasses.replace(m, kf_feat_pt=kf_feat_pt)
        m2 = fuse_duplicates(m)
        v = np.asarray(m2.pt_valid)
        assert v[0] and not v[1] and v[2]
        # the observation of 1 now points to 0
        assert int(m2.kf_feat_pt[0, 0]) == 0
        assert int(m2.kf_feat_pt[0, 1]) == 2

    def test_fuse_duplicates_recent(self):
        """The per-KF windowed fuse: a recent duplicate of an old point is
        redirected to it; old-old pairs are untouched; recent points with
        no old twin survive."""
        from uvipslam_tpu.mapstate.hygiene import fuse_duplicates_recent

        rs = np.random.RandomState(1)
        m = MapState.empty(2, 16, 8)
        d = rs.randint(0, 2, (256,)).astype(np.int8)
        d2 = rs.randint(0, 2, (256,)).astype(np.int8)
        m = dataclasses.replace(
            m,
            pt_xyz=m.pt_xyz.at[0].set(jnp.asarray([1.0, 1.0, 4.0]))    # old
                         .at[1].set(jnp.asarray([1.002, 1.002, 4.02]))  # recent dup of 0
                         .at[2].set(jnp.asarray([-2.0, 1.5, 5.0])),     # recent unique
            pt_desc=m.pt_desc.at[0].set(jnp.asarray(d)).at[1].set(jnp.asarray(d))
                           .at[2].set(jnp.asarray(d2)),
            pt_valid=m.pt_valid.at[:3].set(True),
            pt_first_frame=m.pt_first_frame.at[0].set(0).at[1].set(95).at[2].set(96),
        )
        kf_feat_pt = m.kf_feat_pt.at[0, 0].set(1).at[0, 1].set(2)
        m = dataclasses.replace(m, kf_feat_pt=kf_feat_pt)
        m2 = fuse_duplicates_recent(
            m, jnp.asarray(100, jnp.int32),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            400.0, 400.0, 320.0, 240.0, recent_frames=40, cap=8)
        v = np.asarray(m2.pt_valid)
        assert v[0] and not v[1] and v[2], v[:3]
        assert int(m2.kf_feat_pt[0, 0]) == 0
        assert int(m2.kf_feat_pt[0, 1]) == 2

    def test_compact_points(self):
        """Slot recycling: valid landmarks pack to the front, n_pt resets
        to the live count, observations and the remap stay consistent."""
        from uvipslam_tpu.mapstate.hygiene import compact_points

        rs = np.random.RandomState(2)
        m = MapState.empty(2, 16, 8)
        xyz = rs.uniform(-1, 1, (16, 3)).astype(np.float32)
        valid = np.zeros(16, bool)
        valid[[1, 4, 5, 9]] = True
        m = dataclasses.replace(
            m,
            pt_xyz=jnp.asarray(xyz),
            pt_valid=jnp.asarray(valid),
            pt_first_frame=jnp.arange(16, dtype=jnp.int32),
            n_pt=jnp.asarray(12, jnp.int32),
        )
        # observations of live points 4 and 9, and a dangling ref to dead 2
        kf_feat_pt = m.kf_feat_pt.at[0, 0].set(4).at[0, 1].set(9).at[1, 0].set(2)
        m = dataclasses.replace(m, kf_feat_pt=kf_feat_pt)
        m2, remap = compact_points(m)
        assert int(m2.n_pt) == 4
        v = np.asarray(m2.pt_valid)
        assert v[:4].all() and not v[4:].any()
        # geometry follows the landmark into its new slot
        for old in [1, 4, 5, 9]:
            new = int(remap[old])
            assert new < 4
            np.testing.assert_allclose(np.asarray(m2.pt_xyz[new]), xyz[old])
        assert int(m2.kf_feat_pt[0, 0]) == int(remap[4])
        assert int(m2.kf_feat_pt[0, 1]) == int(remap[9])
        assert int(m2.kf_feat_pt[1, 0]) == -1   # dead ref severed
