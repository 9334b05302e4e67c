"""Per-stage TPU compile-time attribution for the device-VIP step.

Compiles each heavy sub-stage of the VIP step as its own XLA program on
the real backend and reports wall compile seconds, so the 383 s full-step
compile (BENCH_r04) can be attributed and attacked stage by stage.

Run: UVIP_NO_CACHE=1 python scripts/compile_time.py
(disable the persistent cache so every stage measures a cold compile)
"""

import os
import time

os.environ.setdefault("UVIP_NO_CACHE", "1")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _ct(fn, *args, name="", **kw):
    try:
        t0 = time.time()
        lowered = jax.jit(fn).lower(*args, **kw)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        print(f"{name:44s} trace {t1-t0:7.2f}s  compile {t2-t1:8.2f}s",
              flush=True)
        return t2 - t1
    except Exception as e:  # pragma: no cover
        print(f"{name:44s} FAILED: {type(e).__name__}: {e}", flush=True)
        return 0.0


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

    S = 10
    b = FrameBundle(
        img=jnp.zeros((H, W), jnp.float32),
        imu_omg=jnp.zeros((S, 3), jnp.float32),
        imu_acc=jnp.zeros((S, 3), jnp.float32),
        imu_dt=jnp.zeros((S,), jnp.float32),
        imu_mask=jnp.zeros((S,), jnp.float32),
        depth=jnp.asarray(0.0), depth_valid=jnp.asarray(False),
        timestamp=jnp.asarray(0.0),
    )

    from uvipslam_tpu.frontend.tracker import (
        _local_ba_jit, _pose_and_localmap_jit, _triangulate_new_jit,
    )
    from uvipslam_tpu.frontend.vip_tracker import _vi_ba_jit, _vi_track_jit
    from uvipslam_tpu.frontend.frame import (
        Tracks, propagate_tracks, refill_tracks, refresh_descriptors,
    )
    from uvipslam_tpu.frontend.device_tracker import device_hygiene
    from uvipslam_tpu.ops.klt import build_flow_pyramid
    from uvipslam_tpu.ops.twoview import initialize_two_view
    from uvipslam_tpu.core.preintegration import PreintState
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

    print("== stages (cold compiles) ==", flush=True)
    total = 0.0
    total += _ct(lambda tk, im: refresh_descriptors(
        refill_tracks(tk, im, jnp.asarray(0, jnp.int32),
                      n_features=cfg.n_tracks,
                      px_distance=cfg.px_distance), im), t, img,
        name="refill+refresh_desc (ORB)")
    guess = t.xy
    gok = jnp.zeros(t.xy.shape[0], bool)
    total += _ct(lambda tk, p0, p1, g, go, k: propagate_tracks(
        tk, p0, p1, g, go, k, win=cfg.klt_win, iters=cfg.klt_iters,
        levels=cfg.n_levels_klt), t, pyr, pyr, guess, gok, key,
        name="propagate_tracks (KLT)")
    total += _ct(lambda k, a, c, v: initialize_two_view(
        k, a, c, v, cam.K, sigma=1.0),
        key, t.xy_und, t.xy_und, t.valid, name="initialize_two_view")
    total += _ct(lambda tk, mm_, R_, t_: jax.vmap(
        lambda R0, t0: _pose_and_localmap_jit(
            tk, mm_, R0, t0, cam.fx, cam.fy, cam.cx, cam.cy, scale_sigmas)
    )(jnp.stack([R_, R_]), jnp.stack([t_, t_])), t, m, R, tv,
        name="pose_and_localmap vmap2")
    total += _ct(lambda mm_, tk: _triangulate_new_jit(
        mm_, tk, st0.ring_R, st0.ring_t, st0.ring_frame, R, tv,
        cam.fx, cam.fy, cam.cx, cam.cy, jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32)), m, t, name="triangulate_new")
    fixed = m.kf_valid
    total += _ct(lambda mm_: _local_ba_jit(
        mm_, fixed, cam.fx, cam.fy, cam.cx, cam.cy, scale_sigmas), m,
        name="local_ba (mono)")
    total += _ct(lambda mm_: _vi_ba_jit(
        mm_, gravity, cam.fx, cam.fy, cam.cx, cam.cy, scale_sigmas,
        cfg.gyr_bias_rw2, cfg.acc_bias_rw2, jnp.asarray(400.0), R, tv), m,
        name="vi_ba")
    ns = NavState.identity(dtype=jnp.float32)
    pre = PreintState.zero(dtype=jnp.float32)
    total += _ct(lambda tk, mm_, n1, n0, p_: _vi_track_jit(
        tk, mm_, n1, n0, p_, gravity, cam.fx, cam.fy, cam.cx, cam.cy,
        scale_sigmas, cfg.gyr_bias_rw2, cfg.acc_bias_rw2,
        jnp.asarray(0.0), jnp.asarray(400.0), st0.H_prior, R, tv),
        t, m, ns, ns, pre, name="vi_track")
    total += _ct(lambda mm_, tk: device_hygiene(
        mm_, tk, jnp.asarray(0, jnp.int32), R, tv, cam.fx, cam.fy,
        cam.cx, cam.cy), m, t, name="device_hygiene")

    from uvipslam_tpu.solver.global_ba import global_ba_visual
    total += _ct(lambda mm_: global_ba_visual(
        mm_, cam.fx, cam.fy, cam.cx, cam.cy, scale_sigmas,
        kf_window=min(24, 64), n_iters=5, p_active=2048), m,
        name="global_ba_visual (init)")

    from uvipslam_tpu.loop.reloc import relocalize_frame
    total += _ct(lambda tk, mm_, k: relocalize_frame(
        tk, mm_, k, cam.fx, cam.fy, cam.cx, cam.cy), t, m, key,
        name="relocalize_frame")

    print(f"{'SUM of stages':44s} {'':14s} {total:8.2f}s", flush=True)

    t0 = time.time()
    scan_all = jax.jit(
        lambda st, bs: jax.lax.scan(step.__wrapped__, st, bs))
    bundles = jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a]), b)
    lowered = scan_all.lower(st0, bundles)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    print(f"{'FULL scan step':44s} trace {t1-t0:7.2f}s  "
          f"compile {t2-t1:8.2f}s", flush=True)


if __name__ == "__main__":
    main()
