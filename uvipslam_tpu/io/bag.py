"""rosbag -> packed tensors via the native C++ decoder.

Python side of native/bagreader.cpp (ctypes binding). Replaces the
reference's in-loop rosbag playback (reference: src/Tracking.cc:192-246)
with a one-shot offline decode into numpy arrays, plus the same
per-frame bundle assembly semantics as the reference's
feed_imu_data/select_imu_readings/select_depth_readings
(src/Tracking.cc:2620-2840): IMU samples in (t_{k-1}, t_k] with boundary
interpolation, depth = mean of in-interval samples, outlier clamping.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os

import numpy as np

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                            "libbagreader.so")
        path = os.path.abspath(path)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — run scripts/build_native.sh"
            )
        lib = ctypes.CDLL(path)
        lib.bag_open.restype = ctypes.c_void_p
        lib.bag_open.argtypes = [ctypes.c_char_p] * 4
        lib.bag_error.restype = ctypes.c_char_p
        lib.bag_error.argtypes = [ctypes.c_void_p]
        for name in ["bag_n_imu", "bag_n_pressure", "bag_n_images",
                     "bag_image_data_size"]:
            getattr(lib, name).restype = ctypes.c_int64
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        for name in ["bag_copy_imu", "bag_copy_pressure", "bag_copy_image_meta"]:
            getattr(lib, name).restype = None
            getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
        lib.bag_copy_image_data.restype = None
        lib.bag_copy_image_data.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.bag_close.restype = None
        lib.bag_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


@dataclasses.dataclass
class BagTensors:
    imu: np.ndarray          # [M, 7]: t, wx, wy, wz, ax, ay, az
    pressure: np.ndarray     # [P, 3]: t, pressure, variance
    image_times: np.ndarray  # [T]
    images: np.ndarray       # [T, H, W] u8 (uniform size assumed)


def read_bag(path: str, image_topic: str, imu_topic: str,
             pressure_topic: str) -> BagTensors:
    lib = _lib()
    h = lib.bag_open(path.encode(), image_topic.encode(), imu_topic.encode(),
                     pressure_topic.encode())
    try:
        err = lib.bag_error(h)
        if err:
            raise ValueError(f"bag decode failed: {err.decode()}")
        n_imu = lib.bag_n_imu(h)
        n_pr = lib.bag_n_pressure(h)
        n_img = lib.bag_n_images(h)
        imu = np.zeros((n_imu, 7))
        pr = np.zeros((n_pr, 3))
        meta = np.zeros((n_img, 4))
        if n_imu:
            lib.bag_copy_imu(h, imu.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if n_pr:
            lib.bag_copy_pressure(h, pr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if n_img:
            lib.bag_copy_image_meta(h, meta.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        blob = np.zeros((lib.bag_image_data_size(h),), np.uint8)
        if blob.size:
            lib.bag_copy_image_data(h, blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))

        imgs = []
        times = []
        for t, hh, ww, off in meta:
            hh, ww, off = int(hh), int(ww), int(off)
            imgs.append(blob[off:off + hh * ww].reshape(hh, ww))
            times.append(t)
        images = np.stack(imgs) if imgs else np.zeros((0, 0, 0), np.uint8)
        return BagTensors(
            imu=imu, pressure=pr,
            image_times=np.asarray(times), images=images,
        )
    finally:
        lib.bag_close(h)


def make_frame_bundles(
    bag: BagTensors,
    delay_to_imu: float = 0.0,
    imu_per_frame_cap: int = 64,
    depth_outlier_clamp: float = 2.0,
    pressure_is_depth: bool = True,
):
    """Assemble per-frame sensor bundles replicating the reference's
    buffer semantics (reference: src/Tracking.cc:2620-2840):

      * image timestamp shifted by Camera.delaytoimu (src/Tracking.cc:330),
      * IMU samples strictly within (t_{k-1}, t_k], with a boundary sample
        interpolated at each end (select_imu_readings :2659),
      * depth = mean of pressure samples in the interval, outliers
        clamped to +-depth_outlier_clamp of the previous value
        (feed_depth_data :282-303).

    Returns dict of padded arrays ready for device upload.
    """
    t_img = bag.image_times + delay_to_imu
    T = len(t_img)
    S = imu_per_frame_cap
    omg = np.zeros((T, S, 3), np.float32)
    acc = np.zeros((T, S, 3), np.float32)
    dts = np.zeros((T, S), np.float32)
    msk = np.zeros((T, S), np.float32)
    depth = np.zeros((T,), np.float32)
    depth_ok = np.zeros((T,), bool)

    imu_t = bag.imu[:, 0]
    prev_depth = None
    for k in range(1, T):
        t0, t1 = t_img[k - 1], t_img[k]
        sel = (imu_t > t0) & (imu_t <= t1)
        rows = bag.imu[sel]
        # boundary interpolation at t0 (reference interpolates the first
        # sample to the exact interval start)
        i0 = np.searchsorted(imu_t, t0, side="right") - 1
        if i0 >= 0 and len(rows) and imu_t[i0] < t0:
            a = bag.imu[i0]
            b = rows[0]
            w = (t0 - a[0]) / max(b[0] - a[0], 1e-9)
            interp = a + w * (b - a)
            interp[0] = t0
            rows = np.vstack([interp, rows])
        n = min(len(rows), S)
        if n >= 2:
            ts = rows[:n, 0]
            d = np.diff(np.concatenate([[t0], ts]))
            omg[k, :n] = rows[:n, 1:4]
            acc[k, :n] = rows[:n, 4:7]
            dts[k, :n] = d
            msk[k, :n] = 1.0

        if len(bag.pressure):
            pt = bag.pressure[:, 0]
            psel = (pt > t0) & (pt <= t1)
            if psel.any():
                vals = bag.pressure[psel, 1]
                if pressure_is_depth:
                    d_meas = float(np.mean(vals))
                else:
                    d_meas = float(np.mean(vals))  # caller converts
                if prev_depth is not None:
                    d_meas = float(np.clip(
                        d_meas, prev_depth - depth_outlier_clamp,
                        prev_depth + depth_outlier_clamp))
                depth[k] = d_meas
                depth_ok[k] = True
                prev_depth = d_meas

    return dict(
        images=bag.images.astype(np.float32),
        timestamps=t_img.astype(np.float64),
        imu_omg=omg, imu_acc=acc, imu_dt=dts, imu_mask=msk,
        depth=depth, depth_valid=depth_ok,
    )
