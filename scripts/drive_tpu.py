"""End-to-end drive of uvipslam_tpu on the default (TPU) platform.

Run: python scripts/drive_tpu.py
Exercises every shipped subsystem through the public package surface on
real hardware and checks physically meaningful outputs. Prints
"ALL DRIVES OK" on success. Extend as new subsystems land.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def drive_core():
    from uvipslam_tpu.core import lie, preintegrate

    T, dt = 400, 0.005
    g_w = np.array([0.0, 0.0, -9.81])
    yaw_rate = (np.pi / 2) / 2.0
    omg = np.tile([0.0, 0.0, yaw_rate], (T, 1)).astype(np.float32)
    p = np.zeros(3); v = np.zeros(3); R = np.eye(3)
    acc = []
    for _ in range(T):
        a_world = R @ np.array([1.0, 0.0, 0.0])
        acc.append(R.T @ (a_world - g_w))
        p = p + v * dt + 0.5 * a_world * dt * dt
        v = v + a_world * dt
        ang = yaw_rate * dt
        Rz = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
        R = R @ Rz
    acc = np.asarray(acc, np.float32)

    pre = jax.jit(preintegrate)(
        jnp.asarray(omg), jnp.asarray(acc),
        jnp.full((T,), dt, jnp.float32), jnp.ones((T,), jnp.float32),
        jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32), 0.014, 0.28,
    )
    tt = T * dt
    p_err = np.linalg.norm(0.5 * g_w * tt * tt + np.asarray(pre.dP, np.float64) - p)
    r_err = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R.T, jnp.float32) @ pre.dR)))
    print(f"core: preint pos err {p_err:.2e} m, rot err {np.degrees(r_err):.2e} deg")
    assert p_err < 1e-3 and np.degrees(r_err) < 1e-2


def drive_frontend():
    from uvipslam_tpu.ops.clahe import clahe
    from uvipslam_tpu.ops.hamming import match_best
    from uvipslam_tpu.ops.klt import build_flow_pyramid, klt_track
    from uvipslam_tpu.ops.orb import extract_orb

    rs = np.random.RandomState(0)
    base = rs.uniform(40, 220, (70, 86))
    base = np.kron(base, np.ones((8, 8)))[:512, :640].astype(np.float32)

    img = jnp.asarray(base)
    t0 = time.time()
    enh = clahe(img).block_until_ready()
    feats = extract_orb(enh, jnp.zeros((1, 2)), jnp.zeros(1, bool), n_features=400)
    jax.block_until_ready(feats)
    t_first = time.time() - t0
    nval = int(feats.valid.sum())
    print(f"frontend: {nval} ORB features (first call {t_first:.1f}s incl. compile)")
    assert nval > 100

    # shifted image -> KLT + descriptor matching must agree on the shift
    dy = 7.0
    shifted = jnp.asarray(np.roll(base, int(dy), axis=0))
    f2 = extract_orb(shifted, jnp.zeros((1, 2)), jnp.zeros(1, bool), n_features=400)
    idx, dist, ok = match_best(feats.desc, f2.desc, feats.valid, f2.valid,
                               max_dist=60.0, ratio=0.9)
    ok_np = np.asarray(ok)
    flow_desc = np.asarray(f2.xy)[np.asarray(idx)[ok_np]] - np.asarray(feats.xy)[ok_np]
    med = np.median(flow_desc, axis=0)
    print(f"frontend: {ok_np.sum()} desc matches, median flow {med}")
    assert abs(med[1] - dy) < 1.5

    pyrA = tuple(build_flow_pyramid(enh, 5))
    pyrB = tuple(build_flow_pyramid(jnp.asarray(np.roll(np.asarray(enh), int(dy), 0)), 5))
    nxt, okk = klt_track(pyrA, pyrB, feats.xy, feats.xy, feats.valid)
    okk = np.asarray(okk)
    med2 = np.median((np.asarray(nxt) - np.asarray(feats.xy))[okk], axis=0)
    print(f"frontend: KLT {okk.sum()} tracks, median flow {med2}")
    assert abs(med2[1] - dy) < 0.5

    # steady-state timing (one frame extract, compiled)
    t0 = time.time()
    for _ in range(10):
        f = extract_orb(enh, jnp.zeros((1, 2)), jnp.zeros(1, bool), n_features=400)
    jax.block_until_ready(f)
    print(f"frontend: extract_orb steady state {(time.time()-t0)/10*1000:.1f} ms/frame")


def drive_solver():
    import dataclasses
    from uvipslam_tpu.core import lie
    from uvipslam_tpu.solver.pose_opt import pose_optimization_se3
    from uvipslam_tpu.solver.local_ba import local_ba_se3

    FX, FY, CX, CY = 420.0, 420.0, 320.0, 240.0
    rs = np.random.RandomState(0)
    pts = np.stack([rs.uniform(-2, 2, 150), rs.uniform(-1.5, 1.5, 150), rs.uniform(3, 8, 150)], -1).astype(np.float32)
    Rcw = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.08], jnp.float32)))
    tcw = np.array([0.2, -0.1, 0.3], np.float32)
    pc = pts @ Rcw.T + tcw
    uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1)
    uv += rs.randn(150, 2) * 0.5
    out = rs.choice(150, 30, replace=False)
    uv[out] += rs.uniform(20, 80, (30, 2))
    dR, dt = lie.se3_exp(jnp.asarray([0.05, -0.03, 0.04, 0.03, -0.05, 0.02], jnp.float32))
    R0 = lie.mm(dR, jnp.asarray(Rcw))
    t0 = lie.mv(dR, jnp.asarray(tcw)) + dt

    t_start = time.time()
    R_opt, t_opt, inlier, n_in = pose_optimization_se3(
        R0, t0, jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
        jnp.ones(150, bool), jnp.ones(150, jnp.float32), FX, FY, CX, CY,
    )
    jax.block_until_ready(t_opt)
    ang = np.degrees(np.linalg.norm(np.asarray(
        lie.so3_log(lie.mm(jnp.swapaxes(R_opt, -1, -2), jnp.asarray(Rcw))))))
    terr = np.linalg.norm(np.asarray(t_opt) - tcw)
    print(f"solver: pose-opt on TPU f32: rot err {ang:.4f} deg, t err {terr:.4f} m, "
          f"{int(n_in)}/150 inliers (first call {time.time()-t_start:.1f}s)")
    assert ang < 0.3 and terr < 0.02 and 100 < int(n_in) < 130

    t0s = time.time()
    for _ in range(20):
        R_opt, t_opt, inlier, n_in = pose_optimization_se3(
            R0, t0, jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
            jnp.ones(150, bool), jnp.ones(150, jnp.float32), FX, FY, CX, CY)
    jax.block_until_ready(t_opt)
    print(f"solver: pose-opt steady state {(time.time()-t0s)/20*1000:.1f} ms")


def drive_tracker():
    from uvipslam_tpu.frontend.tracker import MonoTracker, TrackerConfig
    from uvipslam_tpu.io.synthetic import ate_rmse, make_sequence
    from uvipslam_tpu.models.camera import CameraModel

    seq = make_sequence(n_frames=45, H=240, W=320, n_points=2500, seed=3, speed=1.2)
    cam = CameraModel.create(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2],
                             width=320, height=240)
    cfg = TrackerConfig(n_tracks=200, min_init_tracks=60, local_window=6)
    tr = MonoTracker(cam, cfg, kf_cap=32, pt_cap=4096)
    t0 = time.time()
    per_frame = []
    for f in range(45):
        tf = time.time()
        tr.process_frame(seq.images[f])
        per_frame.append(time.time() - tf)
    est = tr.trajectory_positions()
    ids = [i for i, _, _ in tr.trajectory]
    gt = seq.positions_w[ids]
    rmse, _ = ate_rmse(est, gt)
    span = np.linalg.norm(gt[-1] - gt[0])
    steady = np.median(per_frame[25:])
    print(f"tracker: mono VO on TPU: {len(ids)}/45 frames, ATE {rmse*100:.2f} cm "
          f"over {span:.2f} m; total {time.time()-t0:.0f}s, steady {steady*1000:.0f} ms/frame "
          f"({1.0/steady:.1f} fps)")
    assert len(ids) >= 35 and rmse < 0.02 * span


def main():
    print("platform:", jax.devices())
    drive_core()
    drive_frontend()
    drive_solver()
    drive_tracker()
    print("ALL DRIVES OK")


if __name__ == "__main__":
    main()
