"""Native rosbag decoder: write a tiny rosbag v2.0 in pure Python, decode
with the C++ library, verify contents."""

import os
import struct
import subprocess

import numpy as np
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


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


def write_tiny_bag(path):
    rs = np.random.RandomState(0)
    imgs = [rs.randint(0, 255, (24, 32)).astype(np.uint8) for _ in range(3)]
    conns = {
        0: (b"/camera/image_raw", b"sensor_msgs/Image"),
        1: (b"/imu", b"sensor_msgs/Imu"),
        2: (b"/depth", b"sensor_msgs/FluidPressure"),
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
    for i, img in enumerate(imgs):
        t = 100.0 + 0.05 * i
        msgs.append((t, 0, _image_msg(t, img)))
    for i in range(20):
        t = 100.0 + 0.0075 * i
        msgs.append((t, 1, _imu_msg(t, (0.01 * i, 0.0, -0.02), (0.1, 0.2, 9.8))))
    for i in range(5):
        t = 100.0 + 0.03 * i
        msgs.append((t, 2, _pressure_msg(t, 1.5 + 0.01 * i)))
    msgs.sort(key=lambda m: m[0])
    for t, cid, data in msgs:
        chunk += _record(
            {"op": b"\x02", "conn": struct.pack("<I", cid), "time": _ros_time(t)},
            data,
        )

    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        # minimal bag header record (op=3), padded as rosbag does
        bh = _record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                      "conn_count": struct.pack("<I", 3),
                      "chunk_count": struct.pack("<I", 1)}, b" " * 128)
        f.write(bh)
        f.write(_record({"op": b"\x05", "compression": b"none",
                         "size": struct.pack("<I", len(chunk))}, chunk))
    return imgs


@pytest.fixture(scope="module")
def built_lib():
    so = os.path.join(ROOT, "native", "libbagreader.so")
    if not os.path.exists(so):
        subprocess.check_call(["sh", os.path.join(ROOT, "scripts", "build_native.sh")])
    return so


def test_decode_tiny_bag(tmp_path, built_lib):
    from uvipslam_tpu.io.bag import make_frame_bundles, read_bag

    path = str(tmp_path / "tiny.bag")
    imgs = write_tiny_bag(path)
    bag = read_bag(path, "/camera/image_raw", "/imu", "/depth")

    assert bag.images.shape == (3, 24, 32)
    np.testing.assert_array_equal(bag.images[0], imgs[0])
    np.testing.assert_array_equal(bag.images[2], imgs[2])
    np.testing.assert_allclose(bag.image_times, [100.0, 100.05, 100.1], atol=1e-7)

    assert bag.imu.shape == (20, 7)
    np.testing.assert_allclose(bag.imu[3, 1], 0.03, atol=1e-9)   # wx of sample 3
    np.testing.assert_allclose(bag.imu[:, 6], 9.8, atol=1e-9)    # az

    assert bag.pressure.shape == (5, 3)
    np.testing.assert_allclose(bag.pressure[:, 1], 1.5 + 0.01 * np.arange(5), atol=1e-9)

    bundles = make_frame_bundles(bag)
    assert bundles["images"].shape == (3, 24, 32)
    # frame 1 covers (100.0, 100.05]: IMU samples at 0.0075..0.045 -> 6 + 1 boundary
    assert bundles["imu_mask"][1].sum() >= 6
    assert bundles["depth_valid"][1]
    # depth = mean of pressures in (100.0, 100.05] = samples 1..2 wait 0.03 grid:
    # t=100.03 is in interval (also 100.0 exclusive)
    assert 1.5 <= bundles["depth"][1] <= 1.55


def test_rejects_garbage(tmp_path, built_lib):
    from uvipslam_tpu.io.bag import read_bag

    p = str(tmp_path / "junk.bag")
    with open(p, "wb") as f:
        f.write(b"not a bag at all")
    with pytest.raises(ValueError):
        read_bag(p, "/a", "/b", "/c")


def write_tiny_bag_bz2(path):
    """Same content as write_tiny_bag but with a BZ2-compressed chunk —
    the format real Aqualoc/EuRoC recordings use (`rosbag record`
    defaults to bz2/lz4; the reference plays such bags directly,
    src/Tracking.cc:192-246)."""
    import bz2

    rs = np.random.RandomState(0)
    imgs = [rs.randint(0, 255, (24, 32)).astype(np.uint8) for _ in range(3)]
    conns = {
        0: (b"/camera/image_raw", b"sensor_msgs/Image"),
        1: (b"/imu", b"sensor_msgs/Imu"),
        2: (b"/depth", b"sensor_msgs/FluidPressure"),
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
    for i, img in enumerate(imgs):
        t = 100.0 + 0.05 * i
        msgs.append((t, 0, _image_msg(t, img)))
    for i in range(20):
        t = 100.0 + 0.0075 * i
        msgs.append((t, 1, _imu_msg(t, (0.01 * i, 0.0, -0.02), (0.1, 0.2, 9.8))))
    for i in range(5):
        t = 100.0 + 0.03 * i
        msgs.append((t, 2, _pressure_msg(t, 1.5 + 0.01 * i)))
    msgs.sort(key=lambda m: m[0])
    for t, cid, data in msgs:
        chunk += _record(
            {"op": b"\x02", "conn": struct.pack("<I", cid), "time": _ros_time(t)},
            data,
        )

    comp = bz2.compress(chunk)
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        bh = _record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                      "conn_count": struct.pack("<I", 3),
                      "chunk_count": struct.pack("<I", 1)}, b" " * 128)
        f.write(bh)
        f.write(_record({"op": b"\x05", "compression": b"bz2",
                         "size": struct.pack("<I", len(chunk))}, comp))
    return imgs


def test_decode_bz2_chunk_bag(tmp_path, built_lib):
    from uvipslam_tpu.io.bag import read_bag

    path = str(tmp_path / "tiny_bz2.bag")
    imgs = write_tiny_bag_bz2(path)
    bag = read_bag(path, "/camera/image_raw", "/imu", "/depth")
    assert bag.images.shape == (3, 24, 32)
    np.testing.assert_array_equal(bag.images[0], imgs[0])
    np.testing.assert_array_equal(bag.images[2], imgs[2])
    assert bag.imu.shape == (20, 7)
    assert bag.pressure.shape == (5, 3)
