"""rosbag2 reader: real recorded data (the reference's bundled
rosbag2_odom2d_imu bag) + CDR round-trips for the cloud type.

Reference counterparts: `lego_loam_bag_node.cpp` (bag-driven offline
mapping) and `odom_3d_example.cpp` (the bag this data was recorded for).
"""
import os
import struct

import numpy as np
import pytest

from dddmr_navigation_tpu.io.rosbag import (
    BagReader, parse_pointcloud2, parse_imu, parse_odometry)

REF_BAG = "/root/reference/src/dddmr_odom_3d/bag_files/rosbag2_odom2d_imu"

needs_bag = pytest.mark.skipif(not os.path.isdir(REF_BAG),
                               reason="reference bag not mounted")


@needs_bag
def test_real_bag_topics_and_counts():
    bag = BagReader(REF_BAG)
    assert bag.topics["/odom_2d"]["type"] == "nav_msgs/msg/Odometry"
    assert bag.topics["/imu/data"]["type"] == "sensor_msgs/msg/Imu"
    # counts from metadata.yaml
    assert bag.count("/odom_2d") == 952
    assert bag.count("/imu/data") == 952
    assert bag.count() == 1904


@needs_bag
def test_real_bag_message_contents():
    bag = BagReader(REF_BAG)
    n_checked = 0
    for ts, name, msg in bag.messages("/odom_2d"):
        assert msg["frame_id"] == "odom"
        assert msg["child_frame_id"] == "base_link"
        assert np.isfinite(msg["position"]).all()
        assert np.isfinite(msg["linear"]).all()
        n_checked += 1
        if n_checked >= 20:
            break
    for ts, name, msg in bag.messages("/imu/data"):
        q = msg["orientation"]
        assert abs(np.linalg.norm(q) - 1.0) < 1e-3
        assert np.isfinite(msg["angular_velocity"]).all()
        break
    # timestamps are monotonic within a topic
    stamps = [ts for ts, _, _ in bag.raw_messages("/odom_2d")]
    assert all(b >= a for a, b in zip(stamps, stamps[1:]))


@needs_bag
def test_odom3d_fusion_from_real_bag():
    """The odom_3d_example pipeline on its actual recorded data: the fused
    3D trajectory is finite and travels a plausible distance."""
    import examples.run_bag_offline as rb
    path = rb.run_odom3d(REF_BAG)
    assert np.isfinite(path).all()
    dist = float(np.sum(np.linalg.norm(np.diff(path, axis=0), axis=1)))
    # 31.4 s of driving: the robot moved, but less than 3 m/s average
    assert 0.5 < dist < 100.0, dist


def _make_pointcloud2_cdr(pts: np.ndarray) -> bytes:
    """Hand-assemble a little-endian CDR PointCloud2 with x/y/z/intensity
    float32 fields (what the reference's lidar pipelines publish)."""
    out = bytearray(b"\x00\x01\x00\x00")   # CDR_LE encapsulation
    pos = lambda: len(out) - 4

    def align(n):
        while pos() % n:
            out.append(0)

    def u32(v):
        align(4)
        out.extend(struct.pack("<I", v))

    def s(txt):
        b = txt.encode() + b"\x00"
        u32(len(b))
        out.extend(b)

    # header
    align(4); out.extend(struct.pack("<i", 7))        # sec
    u32(500)                                          # nanosec
    s("velodyne")
    u32(1)                 # height
    u32(len(pts))          # width
    u32(4)                 # n fields
    for i, name in enumerate(("x", "y", "z", "intensity")):
        s(name)
        u32(i * 4)         # offset
        out.append(7)      # FLOAT32
        u32(1)             # count
    out.append(0)          # is_bigendian
    u32(16)                # point_step
    u32(16 * len(pts))     # row_step
    data = np.concatenate(
        [pts.astype(np.float32),
         np.arange(len(pts), dtype=np.float32)[:, None]], axis=1).tobytes()
    u32(len(data))
    out.extend(data)
    out.append(0)          # is_dense
    return bytes(out)


def test_pointcloud2_roundtrip():
    pts = np.array([[1.0, 2.0, 3.0], [-4.0, 5.5, 0.25]], np.float32)
    msg = parse_pointcloud2(_make_pointcloud2_cdr(pts))
    assert msg["frame_id"] == "velodyne"
    assert msg["field_names"] == ["x", "y", "z", "intensity"]
    np.testing.assert_allclose(msg["points"][:, :3], pts)
    np.testing.assert_allclose(msg["points"][:, 3], [0.0, 1.0])
    assert abs(msg["stamp"] - 7.0000005) < 1e-6
