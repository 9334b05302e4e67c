"""Per-stage HLO module size breakdown for the device-VIP step.

Compile time scales with compiled-module size; this script lowers (traces,
no backend compile) the full VIP step and each heavy sub-stage separately
and prints StableHLO text sizes, so compile-time work can be targeted at
the stages that actually dominate (VERDICT r4 weak #1).

Run on CPU: JAX_PLATFORMS=cpu python scripts/hlo_size.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _size(fn, *args, name="", **kw):
    try:
        txt = jax.jit(fn).lower(*args, **kw).as_text()
        n_ops = txt.count("\n")
        print(f"{name:44s} {len(txt)/1e6:9.2f} MB  {n_ops:8d} lines")
        return len(txt)
    except Exception as e:  # pragma: no cover
        print(f"{name:44s} FAILED: {type(e).__name__}: {e}")
        return 0


def main():
    from uvipslam_tpu.frontend.device_vip import FrameBundle, build_vip_tracker
    from uvipslam_tpu.frontend.vip_tracker import VipConfig
    from uvipslam_tpu.models.camera import CameraModel

    H, W = 512, 640
    cam = CameraModel.create(400.0, 400.0, 320.0, 256.0, width=W, height=H)
    cfg = VipConfig(n_tracks=400, min_init_tracks=100, local_window=8,
                    gyr_noise_sd=0.01, acc_noise_sd=0.1, depth_noise_sd=0.05,
                    vio_init_min_kfs=6, vio_init_min_time=1.0)
    st0, step = build_vip_tracker(cam, cfg, kf_cap=64, pt_cap=8192)

    S = 10  # per-frame IMU window in the bench sequence (200 Hz / 20 fps)
    b = FrameBundle(
        img=jnp.zeros((H, W), jnp.float32),
        imu_omg=jnp.zeros((S, 3), jnp.float32),
        imu_acc=jnp.zeros((S, 3), jnp.float32),
        imu_dt=jnp.zeros((S,), jnp.float32),
        imu_mask=jnp.zeros((S,), jnp.float32),
        depth=jnp.asarray(0.0), depth_valid=jnp.asarray(False),
        timestamp=jnp.asarray(0.0),
    )

    print("== full step ==")
    _size(step.__wrapped__, st0, b, name="vip step (full)")

    # sub-stages
    from uvipslam_tpu.frontend.tracker import (
        _local_ba_jit, _motion_guess_jit, _pose_and_localmap_jit,
        _triangulate_new_jit,
    )
    from uvipslam_tpu.frontend.vip_tracker import _vi_ba_jit, _vi_track_jit
    from uvipslam_tpu.frontend.frame import (
        Tracks, propagate_tracks, refill_tracks, refresh_descriptors,
    )
    from uvipslam_tpu.frontend.device_tracker import device_hygiene
    from uvipslam_tpu.ops.clahe import clahe
    from uvipslam_tpu.ops.klt import build_flow_pyramid
    from uvipslam_tpu.ops.twoview import initialize_two_view
    from uvipslam_tpu.core.preintegration import PreintState, preintegrate
    from uvipslam_tpu.core.state import NavState

    scale_sigmas = jnp.asarray(cfg.scale_sigmas, jnp.float32)
    gravity = jnp.asarray(cfg.gravity, jnp.float32)
    t = st0.tracks
    m = st0.map
    img = b.img
    key = jax.random.PRNGKey(0)
    R = jnp.eye(3, dtype=jnp.float32)
    tv = jnp.zeros(3, jnp.float32)
    pyr = tuple(build_flow_pyramid(img, cfg.n_levels_klt))

    print("== stages ==")
    _size(clahe, img, name="clahe")
    _size(lambda im: tuple(build_flow_pyramid(im, cfg.n_levels_klt)), img,
          name="build_flow_pyramid")
    _size(lambda tk, im: refresh_descriptors(
        refill_tracks(tk, im, jnp.asarray(0, jnp.int32),
                      n_features=cfg.n_tracks,
                      px_distance=cfg.px_distance), im), t, img,
          name="refill+refresh_desc (ORB)")
    guess = t.xy
    gok = jnp.zeros(t.xy.shape[0], bool)
    _size(lambda tk, p0, p1, g, go, k: propagate_tracks(
        tk, p0, p1, g, go, k, win=cfg.klt_win, iters=cfg.klt_iters,
        levels=cfg.n_levels_klt), t, pyr, pyr, guess, gok, key,
          name="propagate_tracks (KLT)")
    _size(lambda k, a, c, v: initialize_two_view(k, a, c, v, cam.K,
                                                 sigma=1.0),
          key, t.xy_und, t.xy_und, t.valid, name="initialize_two_view")
    _size(lambda tk, mm_, R_, t_: _motion_guess_jit(
        tk, mm_, R_, t_, cam.fx, cam.fy, cam.cx, cam.cy), t, m, R, tv,
          name="motion_guess")
    _size(lambda tk, mm_, R_, t_: _pose_and_localmap_jit(
        tk, mm_, R_, t_, cam.fx, cam.fy, cam.cx, cam.cy, scale_sigmas),
        t, m, R, tv, name="pose_and_localmap x1")
    _size(lambda tk, mm_, R_, t_: jax.vmap(
        lambda R0, t0: _pose_and_localmap_jit(
            tk, mm_, R0, t0, cam.fx, cam.fy, cam.cx, cam.cy, scale_sigmas)
    )(jnp.stack([R_, R_]), jnp.stack([t_, t_])), t, m, R, tv,
        name="pose_and_localmap vmap2")
    _size(lambda mm_, tk: _triangulate_new_jit(
        mm_, tk, st0.ring_R, st0.ring_t, st0.ring_frame, R, tv,
        cam.fx, cam.fy, cam.cx, cam.cy, jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32)), m, t, name="triangulate_new")
    fixed = m.kf_valid
    _size(lambda mm_: _local_ba_jit(mm_, fixed, cam.fx, cam.fy, cam.cx,
                                    cam.cy, scale_sigmas), m,
          name="local_ba (mono)")
    _size(lambda mm_: _vi_ba_jit(
        mm_, gravity, cam.fx, cam.fy, cam.cx, cam.cy, scale_sigmas,
        cfg.gyr_bias_rw2, cfg.acc_bias_rw2, jnp.asarray(400.0), R, tv), m,
        name="vi_ba")
    ns = NavState.identity(dtype=jnp.float32)
    pre = PreintState.zero(dtype=jnp.float32)
    _size(lambda tk, mm_, n1, n0, p_: _vi_track_jit(
        tk, mm_, n1, n0, p_, gravity, cam.fx, cam.fy, cam.cx, cam.cy,
        scale_sigmas, cfg.gyr_bias_rw2, cfg.acc_bias_rw2,
        jnp.asarray(0.0), jnp.asarray(400.0), st0.H_prior, R, tv),
        t, m, ns, ns, pre, name="vi_track")
    _size(lambda mm_, tk: device_hygiene(
        mm_, tk, jnp.asarray(0, jnp.int32), R, tv, cam.fx, cam.fy,
        cam.cx, cam.cy), m, t, name="device_hygiene")
    _size(lambda o, a, d, mk: preintegrate(
        o, a, d, mk, tv, tv, cfg.gyr_noise_sd, cfg.acc_noise_sd),
        b.imu_omg, b.imu_acc, b.imu_dt, b.imu_mask, name="preintegrate 1win")

    # try_init_vio is module-level inaccessible; approximate with global BA
    from uvipslam_tpu.solver.global_ba import global_ba_visual
    _size(lambda mm_: global_ba_visual(
        mm_, cam.fx, cam.fy, cam.cx, cam.cy, scale_sigmas,
        kf_window=min(24, 64), n_iters=5, p_active=2048), m,
        name="global_ba_visual (init)")

    from uvipslam_tpu.loop.reloc import relocalize_frame
    _size(lambda tk, mm_, k: relocalize_frame(
        tk, mm_, k, cam.fx, cam.fy, cam.cx, cam.cy), t, m, key,
        name="relocalize_frame")


if __name__ == "__main__":
    main()
