"""Per-stage timing of the tracker pipeline at the bench working point
(512x640, 400 feats) on the default (TPU) platform.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_stages.py
"""

import time

import numpy as np


def t_of(fn, *args, n=20, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3  # ms


def main():
    from uvipslam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from uvipslam_tpu.frontend.frame import (
        Tracks, propagate_tracks, refill_tracks, refresh_descriptors,
    )
    from uvipslam_tpu.frontend import tracker as HT
    from uvipslam_tpu.io.synthetic import make_sequence
    from uvipslam_tpu.mapstate.map import MapState
    from uvipslam_tpu.models.camera import CameraModel
    from uvipslam_tpu.ops.clahe import clahe
    from uvipslam_tpu.ops.klt import build_flow_pyramid
    from uvipslam_tpu.ops.orb import extract_orb
    from uvipslam_tpu.ops.twoview import find_fundamental, initialize_two_view

    print("platform:", jax.devices())
    H, W, NF = 512, 640, 400
    seq = make_sequence(n_frames=8, H=H, W=W, n_points=6000, seed=7, speed=1.2)
    cam = CameraModel.create(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2],
                             width=W, height=H)
    img0 = jnp.asarray(seq.images[0])
    img1 = jnp.asarray(seq.images[1])

    rows = []

    pyr_f = jax.jit(lambda im: tuple(build_flow_pyramid(im, 5)))
    rows.append(("clahe", t_of(jax.jit(clahe), img0)))
    rows.append(("flow_pyramid(5)", t_of(pyr_f, img0)))

    tr = Tracks.empty(NF)
    refill_j = jax.jit(lambda t, im: refill_tracks(t, im, jnp.asarray(0, jnp.int32),
                                                   n_features=NF, px_distance=20))
    tr1 = refill_j(tr, img0)
    rows.append(("refill_tracks(ORB+fill)", t_of(refill_j, tr, img0)))
    rows.append(("extract_orb alone", t_of(
        jax.jit(lambda im: extract_orb(im, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                                       n_features=NF)), img0)))
    rows.append(("refresh_descriptors", t_of(
        jax.jit(lambda t, im: refresh_descriptors(t, im)), tr1, img0)))

    pyr0 = pyr_f(img0)
    pyr1 = pyr_f(img1)
    key = jax.random.PRNGKey(0)
    prop_j = jax.jit(lambda t, pa, pb, k: propagate_tracks(
        t, pa, pb, t.xy, jnp.zeros((NF,), bool), k, win=21, iters=10, levels=5))
    rows.append(("propagate_tracks", t_of(prop_j, tr1, pyr0, pyr1, key)))

    und_j = jax.jit(lambda xy: cam.undistort_pixels(xy))
    rows.append(("undistort", t_of(und_j, tr1.xy)))

    # pose + local map at bench capacities
    m = MapState.empty(64, 8192, NF)
    rs = np.random.RandomState(0)
    m = m.__class__(**{**{f.name: getattr(m, f.name)
                          for f in __import__("dataclasses").fields(m)},
                       "pt_xyz": jnp.asarray(rs.uniform(-3, 3, (8192, 3)).astype(np.float32)),
                       "pt_valid": jnp.ones((8192,), bool)})
    import dataclasses
    tr2 = dataclasses.replace(
        tr1, pt_id=jnp.where(tr1.valid, jnp.arange(NF, dtype=jnp.int32), -1),
        xy_und=tr1.xy)
    sig = jnp.asarray([1.2 ** (2 * i) for i in range(8)], jnp.float32)
    plm = lambda t: HT._pose_and_localmap_jit(
        t, m, jnp.eye(3), jnp.zeros(3), cam.fx, cam.fy, cam.cx, cam.cy, sig)
    rows.append(("pose+localmap (2x pose opt + match)", t_of(plm, tr2)))

    # KF-frame work
    tri = lambda: HT._triangulate_new_jit(
        m, tr2, jnp.tile(jnp.eye(3)[None], (64, 1, 1)), jnp.zeros((64, 3)),
        jnp.zeros((64,), jnp.int32), jnp.eye(3), jnp.zeros(3),
        cam.fx, cam.fy, cam.cx, cam.cy, jnp.asarray(5, jnp.int32),
        jnp.asarray(0, jnp.int32))
    rows.append(("triangulate_new", t_of(tri)))
    fixed = jnp.zeros((64,), bool).at[0].set(True)
    ba = lambda: HT._local_ba_jit(m, fixed, cam.fx, cam.fy, cam.cx, cam.cy, sig)
    rows.append(("local_ba (16-KF window)", t_of(ba, n=5)))

    v = tr1.valid
    ff = lambda: find_fundamental(key, tr1.xy, tr1.xy + 1.0, v)
    rows.append(("find_fundamental", t_of(ff)))
    itv = lambda: initialize_two_view(key, tr1.xy, tr1.xy + 1.0, v, cam.K)
    rows.append(("initialize_two_view (H+F)", t_of(itv, n=5)))

    print()
    total = 0.0
    for name, ms in rows:
        print(f"{name:42s} {ms:8.2f} ms")
    per_frame = sum(ms for n_, ms in rows if n_ in (
        "clahe", "flow_pyramid(5)", "refill_tracks(ORB+fill)",
        "refresh_descriptors", "propagate_tracks", "undistort",
        "pose+localmap (2x pose opt + match)"))
    print(f"\nestimated WORKING-frame cost: {per_frame:.1f} ms "
          f"({1000.0 / max(per_frame, 1e-9):.1f} fps)")


if __name__ == "__main__":
    main()
