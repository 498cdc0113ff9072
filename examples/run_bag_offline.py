"""Offline bag-driven processing — the `lego_loam_bag_node` /
`odom_3d_example` counterparts (`lego_loam_bor/src/lego_loam_bag_node.cpp`,
`src/dddmr_odom_3d/src/odom_3d_example.cpp`): replay a recorded rosbag2
directly from its sqlite3/CDR storage, no ROS required.

Modes:
  odom3d  — fuse nav_msgs/Odometry twist × sensor_msgs/Imu orientation
            into a 3D trajectory (defaults to the reference's bundled
            rosbag2_odom2d_imu bag).
  mapping — feed sensor_msgs/PointCloud2 scans through the SLAM
            MappingSession and save the pose-graph artifact directory.

Usage:
  python examples/run_bag_offline.py odom3d [BAG_DIR]
  python examples/run_bag_offline.py mapping BAG_DIR --cloud-topic /points
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_BAG = "/root/reference/src/dddmr_odom_3d/bag_files/rosbag2_odom2d_imu"


def run_odom3d(bag_dir: str):
    import jax.numpy as jnp
    from dddmr_navigation_tpu.io.rosbag import BagReader
    from dddmr_navigation_tpu.state_estimation import (
        init_odom3d, integrate_log)

    bag = BagReader(bag_dir)
    odom_topic = next(k for k, v in bag.topics.items()
                      if v["type"] == "nav_msgs/msg/Odometry")
    imu_topic = next(k for k, v in bag.topics.items()
                     if v["type"] == "sensor_msgs/msg/Imu")

    # merge the two streams by bag timestamp, holding the latest IMU
    vs, quats, dts = [], [], []
    latest_quat = np.array([0, 0, 0, 1], np.float64)
    last_t = None
    for ts, name, msg in bag.messages():
        if name == imu_topic:
            latest_quat = msg["orientation"]
        else:
            t = ts * 1e-9
            if last_t is not None:
                vs.append(float(msg["linear"][0]))
                quats.append(latest_quat.copy())
                dts.append(t - last_t)
            last_t = t
    state, path = integrate_log(
        init_odom3d(), jnp.asarray(np.asarray(vs, np.float32)),
        jnp.asarray(np.asarray(quats, np.float32)),
        jnp.asarray(np.asarray(dts, np.float32)))
    path = np.asarray(path)
    dist = float(np.sum(np.linalg.norm(np.diff(path, axis=0), axis=1)))
    print(f"fused {len(vs)} odom ticks ({bag.count(imu_topic)} imu msgs): "
          f"travelled {dist:.2f} m, final pose "
          f"{np.round(np.asarray(state.pos), 3)}")
    return path


def run_mapping(bag_dir: str, cloud_topic: str, out_dir: str):
    from dddmr_navigation_tpu.io.rosbag import BagReader
    from dddmr_navigation_tpu.slam.pipeline import MappingSession

    bag = BagReader(bag_dir)
    sess = MappingSession()
    n = 0
    for ts, name, msg in bag.messages(cloud_topic):
        pts = msg["points"][:, :3]
        mask = np.isfinite(pts).all(axis=1)
        sess.process_scan(pts, mask)
        n += 1
    print(f"processed {n} scans → {sess.n_keyframes} keyframes, "
          f"{len(sess.loop_closures)} loop closures")
    sess.save(out_dir)
    print(f"pose graph saved to {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["odom3d", "mapping"])
    ap.add_argument("bag", nargs="?", default=REF_BAG)
    ap.add_argument("--cloud-topic", default="/segmented_cloud_pure")
    ap.add_argument("--out", default="/tmp/bag_pose_graph")
    args = ap.parse_args()
    if args.mode == "odom3d":
        run_odom3d(args.bag)
    else:
        run_mapping(args.bag, args.cloud_topic, args.out)


if __name__ == "__main__":
    sys.exit(main())
