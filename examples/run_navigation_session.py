"""Full-vertical navigation demo: the reference's headline scenario
(`dummy_pc_pub` toggling wall + full stack) driven from simulated lidar
scans only — perception mark/clear, stacked dGraph composition, DWA global
replans, sampling-MPC local planner, move-base FSM.

Usage: python examples/run_navigation_session.py [--ticks 600]
"""
import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=600)
    ap.add_argument("--wall-period", type=float, default=15.0,
                    help="toggling-wall period (s), like dummy_pc_pub")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    from dddmr_navigation_tpu.config import (
        NavigationConfig, PerceptionConfig, SpinningLidarConfig)
    from dddmr_navigation_tpu.geometry import quat_from_yaw
    from dddmr_navigation_tpu.io import flat_ground_map
    from dddmr_navigation_tpu.control.session import NavigationSession
    from dddmr_navigation_tpu.control.fsm import Decision
    from dddmr_navigation_tpu.utils.lidar_sim import BoxWorld, simulate_scan

    lidar = SpinningLidarConfig(
        xy_resolution=0.1, height_resolution=0.1,
        range_image_rows=32, range_image_cols=360,
        vertical_FOV_bottom=-40.0, vertical_FOV_top=40.0,
        scan_effective_positive_start=0.0,
        scan_effective_positive_end=180.0,
        scan_effective_negative_start=0.0,
        scan_effective_negative_end=-180.0)
    cfg = dataclasses.replace(
        NavigationConfig(),
        perception=PerceptionConfig(lidar=lidar, voxel_window_cells_xy=72,
                                    voxel_window_cells_z=24))
    ground = flat_ground_map(14, 8, 0.2)
    sess = NavigationSession(cfg, ground)

    room = BoxWorld.room(half=6.0, wall_h=1.5)
    walled = BoxWorld.room(half=6.0, wall_h=1.5)
    walled.add_box([-0.1, -1.4, 0.0], [0.1, 1.4, 1.2])

    goal = np.array([3.5, 0.0, 0.0], np.float32)
    sess.set_goal(goal)
    pos = np.array([-3.0, 0.0, 0.0], np.float32)
    yaw, v, w = 0.0, 0.0, 0.0
    dt = 0.1
    last_dec = None
    t_start = time.perf_counter()
    for i in range(args.ticks):
        now = i * dt
        world = walled if (now % args.wall_period) < args.wall_period / 2 \
            else room
        pts, mask = simulate_scan(world, pos + [0, 0, 0.5], sensor_yaw=yaw,
                                  n_rings=24, n_cols=240, v_bottom=-40.0,
                                  v_top=40.0, max_range=15.0)
        mask = mask & (pts[:, 2] + 0.5 >= 0.15)   # segmented_cloud_pure
        quat = np.asarray(quat_from_yaw(jnp.float32(yaw)))
        vx, wz, dec, done, ok = sess.tick(pts, mask, pos, quat, v, w, now)
        v, w = vx, wz
        pos = pos + np.array([v * np.cos(yaw) * dt, v * np.sin(yaw) * dt,
                              0.0], np.float32)
        yaw = float(yaw + w * dt)
        if dec != last_dec:
            print(f"t={now:5.1f}s  {Decision(dec).name:22s} "
                  f"pos=({pos[0]:+.2f},{pos[1]:+.2f}) "
                  f"wall={'UP' if world is walled else 'down'}")
            last_dec = dec
        if done:
            wall_s = time.perf_counter() - t_start
            print(f"{'SUCCESS' if ok else 'ABORT'} at t={now:.1f}s "
                  f"pos=({pos[0]:+.2f},{pos[1]:+.2f}) "
                  f"[{wall_s:.1f}s wall, {1e3*wall_s/(i+1):.0f} ms/tick]")
            return 0 if ok else 1
    print(f"ran out of ticks at pos=({pos[0]:+.2f},{pos[1]:+.2f})")
    return 1


if __name__ == "__main__":
    sys.exit(main())
