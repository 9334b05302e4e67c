"""Synthetic sensor-sequence generator (host-side numpy).

Stands in for the Aqualoc/EuRoC rosbag datasets, which are not available
in this environment (zero egress). Generates:
  * image sequences rendered from a 3D sprite field (textured square
    sprites splatted at projected positions with sub-pixel placement and
    depth-scaled size) — enough texture for FAST/BRIEF/KLT to behave
    like on real footage;
  * IMU samples (gyro/accel with biases + noise) consistent with the
    continuous-time trajectory;
  * pressure-depth samples (z + noise), the U-VIP sensor;
  * ground-truth poses for ATE evaluation.

The replay semantics (buffers, interval selection) mirror the
reference's feed_*/select_* functions (reference:
src/Tracking.cc:2620-2840) in that each frame bundle carries the IMU
samples strictly between image timestamps and the mean depth in the
interval.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SyntheticSequence:
    images: np.ndarray        # [T, H, W] f32 in [0, 255]
    timestamps: np.ndarray    # [T]
    R_cw: np.ndarray          # [T, 3, 3] world->camera
    t_cw: np.ndarray          # [T, 3]
    K: np.ndarray             # [3, 3]
    # per-frame IMU bundle (samples in (t_{k-1}, t_k]), padded
    imu_omg: np.ndarray       # [T, S, 3]
    imu_acc: np.ndarray       # [T, S, 3]
    imu_dt: np.ndarray        # [T, S]
    imu_mask: np.ndarray      # [T, S]
    depth: np.ndarray         # [T] pressure depth (world z of body)
    depth_valid: np.ndarray   # [T]
    gravity_w: np.ndarray     # [3]
    points: np.ndarray        # [P, 3] world sprite centers (for debugging)

    @property
    def positions_w(self) -> np.ndarray:
        """Ground-truth camera centers in world frame [T, 3]."""
        return -np.einsum("tij,ti->tj", self.R_cw, self.t_cw)


def _so3_exp_np(w):
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-12:
        return np.eye(3) + K
    return np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * K @ K


def _so3_log_np(R):
    cos = np.clip((np.trace(R) - 1) / 2, -1, 1)
    th = np.arccos(cos)
    if th < 1e-9:
        return np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / 2
    return th / (2 * np.sin(th)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )


def make_sequence(
    n_frames: int = 60,
    fps: float = 20.0,
    imu_rate: float = 200.0,
    H: int = 240,
    W: int = 320,
    n_points: int = 1500,
    seed: int = 0,
    motion: str = "arc",
    speed: float = 0.35,
    gyr_noise: float = 0.003,
    acc_noise: float = 0.02,
    gyr_bias: tuple = (0.002, -0.003, 0.001),
    acc_bias: tuple = (0.03, -0.02, 0.04),
    depth_noise: float = 0.05,
    sprite: int = 9,
    z_amp: float = 0.1,
    image_noise_seed: int | None = None,
    Tbc: np.ndarray | None = None,
) -> SyntheticSequence:
    """Tbc: optional 4x4 camera-in-body extrinsics (x_b = Rbc x_c + tbc,
    the reference's Camera.Tbc). When given, the IMU stream describes the
    BODY's motion (lever-arm accelerations included) and the pressure
    depth is the body's world z — matching a real rig where the IMU and
    pressure sensor are NOT at the camera's optical center."""
    rs = np.random.RandomState(seed)
    # separate stream for per-pixel image noise so two renders of the
    # SAME scene/trajectory can differ only in sensor noise (retrieval-
    # quality tests re-render revisited viewpoints this way)
    rs_img = np.random.RandomState(seed if image_noise_seed is None
                                   else image_noise_seed)
    fx = fy = 0.65 * W
    cx, cy = W / 2.0, H / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    g_w = np.array([0.0, 0.0, -9.81])

    # ---- camera trajectory (world frame; camera looks +z toward scene) ----
    dt_img = 1.0 / fps
    ts = np.arange(n_frames) * dt_img
    centers, yaws = [], []
    for t in ts:
        if motion == "arc":
            cx_w = speed * t
            cy_w = 0.15 * np.sin(0.7 * t)
            cz_w = z_amp * np.sin(0.5 * t)    # depth variation for pressure
            yaw = 0.12 * np.sin(0.4 * t)
        elif motion == "excited":
            # strong proper acceleration (~1 m/s^2) so that scale is
            # observable for pure-VI initialization (VI-ORB needs motion
            # excitation; the paper's pressure method exists precisely
            # because AUV surveys lack it)
            cx_w = speed * t + 0.25 * np.sin(2.0 * t)
            cy_w = 0.20 * np.sin(1.3 * t + 1.0)
            cz_w = z_amp * np.sin(0.9 * t)
            yaw = 0.12 * np.sin(0.4 * t)
        elif motion == "loop":
            # out-and-back revisit: x = 2A sin^2(pi t / T) returns to the
            # start pose at t = T with the same heading and zero velocity
            # (loop-closure test trajectory)
            t_end = (n_frames - 1) * dt_img
            amp = speed * t_end / np.pi
            cx_w = 2.0 * amp * np.sin(np.pi * t / t_end) ** 2
            cy_w = 0.1 * np.sin(2 * np.pi * t / t_end)
            cz_w = z_amp * np.sin(0.5 * t)
            yaw = 0.0
        elif motion == "circuit":
            # translation-only circular circuit at CONSTANT speed: drift
            # accumulates around the loop (visiting distinct regions) and
            # the final revisit of the start is a genuine loop closure —
            # unlike "loop", whose return leg re-traces its own map so
            # end-to-end drift self-cancels
            # 1.1 revolutions: the final tenth RETRACES the first
            # tenth's poses exactly, giving a real revisit window while
            # the loop's middle visits distinct regions (so drift does
            # not self-cancel as in "loop")
            t_end = (n_frames - 1) * dt_img
            r = speed * t_end / (2 * np.pi * 1.1)
            th = 2 * np.pi * 1.1 * t / t_end
            cx_w = r * np.sin(th)
            cy_w = r * (np.cos(th) - 1.0)
            cz_w = z_amp * np.sin(th)   # periodic with the revolution:
            yaw = 0.0                   # retraced frames share their z
        else:  # forward
            cx_w, cy_w, cz_w, yaw = 0.0, 0.0, speed * t, 0.0
        centers.append([cx_w, cy_w, cz_w])
        yaws.append(yaw)
    centers = np.asarray(centers)

    R_wc, t_cw_list, R_cw_list = [], [], []
    for c, yaw in zip(centers, yaws):
        Rwc = _so3_exp_np(np.array([0.0, yaw, 0.0]))  # yaw about camera-y
        Rcw = Rwc.T
        tcw = -Rcw @ c
        R_wc.append(Rwc); R_cw_list.append(Rcw); t_cw_list.append(tcw)
    R_cw = np.asarray(R_cw_list)
    t_cw = np.asarray(t_cw_list)

    # ---- multi-scale sprite field in front of the trajectory ----
    # three size classes give continuous multi-frequency texture (large
    # background patches + mid + small detail), so descriptors see stable
    # local content like on real imagery instead of isolated dots
    span_x = speed * ts[-1] + 6.0
    sizes = np.array([sprite, sprite * 2 + 1, sprite * 4 + 1])
    cls = rs.choice(3, n_points, p=[0.6, 0.3, 0.1])
    if motion == "circuit":
        r_c = speed * ts[-1] / (2 * np.pi * 1.1)
        pts = np.stack(
            [
                rs.uniform(-r_c - 3.0, r_c + 3.0, n_points),
                rs.uniform(-2.0 * r_c - 2.2, 2.2, n_points),
                rs.uniform(2.5, 7.0, n_points),
            ],
            axis=-1,
        )
    else:
        pts = np.stack(
            [
                rs.uniform(-3.0, span_x, n_points),
                rs.uniform(-2.2, 2.2, n_points),
                rs.uniform(2.5, 7.0, n_points),
            ],
            axis=-1,
        )
    # spatially-correlated textures: random at ~1/3 resolution, bilinearly
    # upsampled — real imagery is smooth at pixel scale, and per-pixel
    # white noise would make ANY binary descriptor decorrelate under
    # sub-pixel shifts (verified: BRIEF distance ~90/256 for true pairs
    # on white-noise sprites vs ~35 on correlated ones)
    def make_texture(sz):
        lo = max(3, sz // 3)
        base = rs.uniform(20, 235, (lo, lo)).astype(np.float32)
        yi = np.linspace(0, lo - 1, sz)
        xi = np.linspace(0, lo - 1, sz)
        y0 = np.clip(yi.astype(int), 0, lo - 2)
        x0 = np.clip(xi.astype(int), 0, lo - 2)
        wy = (yi - y0)[:, None]
        wx = (xi - x0)[None, :]
        return ((1 - wy) * (1 - wx) * base[y0][:, x0]
                + (1 - wy) * wx * base[y0][:, x0 + 1]
                + wy * (1 - wx) * base[y0 + 1][:, x0]
                + wy * wx * base[y0 + 1][:, x0 + 1]).astype(np.float32)

    sprites = [make_texture(int(sizes[c])) for c in cls]

    # ---- render ----
    images = np.zeros((n_frames, H, W), np.float32)
    for f in range(n_frames):
        img = np.full((H, W), 60.0, np.float32)
        pc = pts @ R_cw[f].T + t_cw[f]
        z = pc[:, 2]
        vis = z > 0.5
        u = fx * pc[:, 0] / np.where(vis, z, 1.0) + cx
        v = fy * pc[:, 1] / np.where(vis, z, 1.0) + cy
        max_s = int(sizes.max())
        vis &= (u > -max_s) & (u < W + max_s) & (v > -max_s) & (v < H + max_s)
        order = np.argsort(-z)  # far first, near overwrites (painter)
        for p in order:
            if not vis[p]:
                continue
            sp = sprites[p]
            sz = sp.shape[0]
            half = sz // 2
            u0 = u[p] - half
            v0 = v[p] - half
            iu, iv = int(np.floor(u0)), int(np.floor(v0))
            au, av = u0 - iu, v0 - iv
            s_pad = np.pad(sp, 1)
            s_shift = (
                s_pad[1:-1, 1:-1] * (1 - au) * (1 - av)
                + s_pad[1:-1, 0:-2] * au * (1 - av)
                + s_pad[0:-2, 1:-1] * (1 - au) * av
                + s_pad[0:-2, 0:-2] * au * av
            )
            y0, y1 = max(0, iv), min(H, iv + sz)
            x0, x1 = max(0, iu), min(W, iu + sz)
            if y1 <= y0 or x1 <= x0:
                continue
            img[y0:y1, x0:x1] = s_shift[y0 - iv : y1 - iv, x0 - iu : x1 - iu]
        images[f] = img + rs_img.randn(H, W).astype(np.float32) * 1.0

    # ---- IMU (body frame; == camera frame unless Tbc given) ----
    Tbc_np = np.eye(4) if Tbc is None else np.asarray(Tbc, np.float64)
    Rbc_ = Tbc_np[:3, :3]
    tbc_ = Tbc_np[:3, 3]
    Rcb_ = Rbc_.T
    tcb_ = -Rbc_.T @ tbc_
    n_sub = max(1, int(round(imu_rate / fps)))
    dt_imu = dt_img / n_sub
    S = n_sub
    imu_omg = np.zeros((n_frames, S, 3), np.float32)
    imu_acc = np.zeros((n_frames, S, 3), np.float32)
    imu_dt = np.zeros((n_frames, S), np.float32)
    imu_mask = np.zeros((n_frames, S), np.float32)
    bg = np.asarray(gyr_bias); ba = np.asarray(acc_bias)

    # continuous velocity/accel by finite differences on a fine grid
    fine_n = n_frames * n_sub + 1
    fine_t = np.arange(fine_n) * dt_imu

    def center_at(t):
        # MUST mirror the camera-trajectory formulas above exactly, or
        # the IMU describes a different motion than the images (round-2
        # bug: "excited" fell into the forward default, so the gyro
        # carried no yaw and the accelerometer no excitation — the
        # gyro-bias solve absorbed the real yaw rate and the VI scale
        # solve collapsed)
        if motion == "arc":
            return np.array([speed * t, 0.15 * np.sin(0.7 * t), z_amp * np.sin(0.5 * t)])
        if motion == "excited":
            return np.array([
                speed * t + 0.25 * np.sin(2.0 * t),
                0.20 * np.sin(1.3 * t + 1.0),
                z_amp * np.sin(0.9 * t),
            ])
        if motion == "loop":
            t_end = (n_frames - 1) * dt_img
            amp = speed * t_end / np.pi
            return np.array([
                2.0 * amp * np.sin(np.pi * t / t_end) ** 2,
                0.1 * np.sin(2 * np.pi * t / t_end),
                z_amp * np.sin(0.5 * t),
            ])
        if motion == "circuit":
            t_end = (n_frames - 1) * dt_img
            r = speed * t_end / (2 * np.pi * 1.1)
            th = 2 * np.pi * 1.1 * t / t_end
            return np.array([
                r * np.sin(th),
                r * (np.cos(th) - 1.0),
                z_amp * np.sin(th),
            ])
        return np.array([0.0, 0.0, speed * t])

    def yaw_at(t):
        return 0.12 * np.sin(0.4 * t) if motion in ("arc", "excited") else 0.0

    def Rwc_at(t):
        return _so3_exp_np(np.array([0.0, yaw_at(t), 0.0]))

    def Rwb_at(t):
        return Rwc_at(t) @ Rcb_

    def body_center_at(t):
        # Twb = Twc * Tbc^-1: p_b = C + Rwc tcb
        return center_at(t) + Rwc_at(t) @ tcb_

    for f in range(1, n_frames):
        for s in range(S):
            t_a = (f - 1) * dt_img + s * dt_imu
            t_b = t_a + dt_imu
            Rwa = Rwb_at(t_a)
            Rwb = Rwb_at(t_b)
            w_body = _so3_log_np(Rwa.T @ Rwb) / dt_imu
            # world acceleration of the BODY origin by central difference
            # (the lever arm makes this differ from the camera's when
            # Tbc != I and the rig rotates)
            eps = dt_imu
            a_w = (body_center_at(t_b + eps) - 2 * body_center_at(t_b)
                   + body_center_at(t_b - eps)) / eps**2
            f_body = Rwb.T @ (a_w - g_w)
            imu_omg[f, s] = w_body + bg + rs.randn(3) * gyr_noise
            imu_acc[f, s] = f_body + ba + rs.randn(3) * acc_noise
            imu_dt[f, s] = dt_imu
            imu_mask[f, s] = 1.0

    body_z = np.array([body_center_at(t)[2] for t in ts])
    depth = body_z + rs.randn(n_frames) * depth_noise
    return SyntheticSequence(
        images=images, timestamps=ts, R_cw=R_cw, t_cw=t_cw, K=K,
        imu_omg=imu_omg, imu_acc=imu_acc, imu_dt=imu_dt, imu_mask=imu_mask,
        depth=depth.astype(np.float32), depth_valid=np.ones(n_frames, bool),
        gravity_w=g_w, points=pts,
    )


def ate_rmse(est_pos: np.ndarray, gt_pos: np.ndarray, align_scale: bool = True):
    """Absolute trajectory error after Umeyama (Sim3 or SE3) alignment —
    the reference's external evaluation protocol
    (rpg_trajectory_evaluation on stamped_traj_estimate.txt,
    reference: src/main.cc:186-204)."""
    est = np.asarray(est_pos, np.float64)
    gt = np.asarray(gt_pos, np.float64)
    mu_e = est.mean(0); mu_g = gt.mean(0)
    E = est - mu_e; G = gt - mu_g
    U, D, Vt = np.linalg.svd(G.T @ E / len(est))
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if align_scale:
        var = (E * E).sum() / len(est)
        s = float(np.trace(np.diag(D) @ S) / max(var, 1e-12))
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    aligned = (s * (R @ est.T)).T + t
    return float(np.sqrt(((aligned - gt) ** 2).sum(-1).mean())), aligned
