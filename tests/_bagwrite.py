"""Synthesize rosbag v2.0 files from sensor arrays (test helper).

Generalizes the tiny-bag writer in test_bag_decoder.py: pack a full
rendered sequence (images + IMU stream + pressure samples) into an
uncompressed rosbag for end-to-end parity-harness runs through the
native decoder (native/bagreader.cpp)."""

from __future__ import annotations

import struct

import numpy as np


def _field(name: str, value: bytes) -> bytes:
    payload = name.encode() + b"=" + value
    return struct.pack("<I", len(payload)) + payload


def _record(header_fields: dict, data: bytes) -> bytes:
    hdr = b"".join(_field(k, v) for k, v in header_fields.items())
    return struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(data)) + data


def _ros_time(t: float) -> bytes:
    sec = int(t)
    nsec = int(round((t - sec) * 1e9))
    return struct.pack("<II", sec, nsec)


def _ros_header(t: float, frame: bytes = b"cam") -> bytes:
    return struct.pack("<I", 0) + _ros_time(t) + struct.pack("<I", len(frame)) + frame


def _imu_msg(t, w, a):
    out = _ros_header(t)
    out += struct.pack("<4d", 0, 0, 0, 1) + struct.pack("<9d", *([0] * 9))
    out += struct.pack("<3d", *w) + struct.pack("<9d", *([0] * 9))
    out += struct.pack("<3d", *a) + struct.pack("<9d", *([0] * 9))
    return out


def _pressure_msg(t, p, var=0.01):
    return _ros_header(t) + struct.pack("<dd", p, var)


def _image_msg(t, img: np.ndarray):
    h, w = img.shape
    out = _ros_header(t)
    out += struct.pack("<II", h, w)
    enc = b"mono8"
    out += struct.pack("<I", len(enc)) + enc
    out += struct.pack("<B", 0)
    out += struct.pack("<I", w)
    out += struct.pack("<I", h * w) + img.tobytes()
    return out


def write_bag(path, images, image_ts, imu_ts=None, imu_omg=None,
              imu_acc=None, pressure_ts=None, pressure=None,
              image_topic="/camera/image_raw", imu_topic="/imu",
              pressure_topic="/depth", t_base=1000.0):
    """Write an uncompressed rosbag v2.0 holding the given streams.
    Timestamps are shifted by `t_base` (bags never start at t=0)."""
    conns = {
        0: (image_topic.encode(), b"sensor_msgs/Image"),
        1: (imu_topic.encode(), b"sensor_msgs/Imu"),
        2: (pressure_topic.encode(), b"sensor_msgs/FluidPressure"),
    }
    chunk = b""
    for cid, (topic, typ) in conns.items():
        conn_hdr = _field("topic", topic) + _field("type", typ) + \
            _field("md5sum", b"x" * 32) + _field("message_definition", b"")
        chunk += _record(
            {"op": b"\x07", "conn": struct.pack("<I", cid), "topic": topic},
            conn_hdr,
        )

    msgs = []
    for i in range(len(images)):
        t = t_base + float(image_ts[i])
        img = np.clip(np.asarray(images[i]), 0, 255).astype(np.uint8)
        msgs.append((t, 0, _image_msg(t, img)))
    if imu_ts is not None:
        for i in range(len(imu_ts)):
            t = t_base + float(imu_ts[i])
            msgs.append((t, 1, _imu_msg(t, imu_omg[i], imu_acc[i])))
    if pressure_ts is not None:
        for i in range(len(pressure_ts)):
            t = t_base + float(pressure_ts[i])
            msgs.append((t, 2, _pressure_msg(t, float(pressure[i]))))
    msgs.sort(key=lambda m: m[0])
    for t, cid, data in msgs:
        chunk += _record(
            {"op": b"\x02", "conn": struct.pack("<I", cid), "time": _ros_time(t)},
            data,
        )

    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        bh = _record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                      "conn_count": struct.pack("<I", 3),
                      "chunk_count": struct.pack("<I", 1)}, b" " * 128)
        f.write(bh)
        f.write(_record({"op": b"\x05", "compression": b"none",
                         "size": struct.pack("<I", len(chunk))}, chunk))


def imu_stream_from_sequence(seq):
    """Flatten a SyntheticSequence's per-frame padded IMU windows back
    into a (ts, omg, acc) sample stream."""
    ts, omg, acc = [], [], []
    T = seq.images.shape[0]
    for k in range(1, T):
        mask = seq.imu_mask[k] > 0
        if not mask.any():
            continue
        d = seq.imu_dt[k][mask]
        t = float(seq.timestamps[k - 1]) + np.cumsum(d)
        ts.append(t)
        omg.append(seq.imu_omg[k][mask])
        acc.append(seq.imu_acc[k][mask])
    if not ts:
        return np.zeros(0), np.zeros((0, 3)), np.zeros((0, 3))
    return np.concatenate(ts), np.concatenate(omg), np.concatenate(acc)
