"""Demo: map a synthetic world with the SLAM vertical, save the pose
graph in the reference format, then localize against it with MCL.

Usage:  python examples/run_slam_mcl.py [out_dir]

The reference's equivalent is the bag-driven mapping + mcl_3dl replay
demos (SURVEY.md §4); here the 'bag' is the analytic box-world lidar
simulator.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dddmr_navigation_tpu.config import SlamConfig, MCLConfig
from dddmr_navigation_tpu.slam import MappingSession
from dddmr_navigation_tpu.utils import BoxWorld, simulate_scan
from dddmr_navigation_tpu.state_estimation import (
    read_pose_graph, SubmapManager, init_mcl, mcl_update)
from dddmr_navigation_tpu.geometry import quat_from_yaw
from dddmr_navigation_tpu.runtime import TickMonitor


def main(out_dir="/tmp/dddmr_demo_pg"):
    world = BoxWorld.room(half=7.0).add_box([2.5, -1.0, 0], [3.1, 1.0, 1.8])
    slam_cfg = SlamConfig(num_vertical_scans=16, num_horizontal_scans=500,
                          max_keyframes=64, max_edges=128)

    # ---- mapping pass --------------------------------------------------
    print("== mapping ==")
    sess = MappingSession(cfg=slam_cfg)
    pos = np.array([-4.0, -4.0, 0.8], np.float32)
    yaw = 0.0
    mon = TickMonitor(budget_ms=100.0)
    for t in range(16):
        pts, mask = simulate_scan(world, pos, yaw, n_rings=16, n_cols=500)
        mon.start()
        est_p, est_q = sess.process_scan(pts, mask)
        mon.stop()
        pos = pos + np.array([0.5 * np.cos(yaw), 0.5 * np.sin(yaw), 0.0],
                             np.float32)
        yaw += 0.12
    print(f"keyframes={sess.n_keyframes} loops={len(sess.loop_closures)} "
          f"tick_stats={mon.stats()}")
    sess.save(out_dir)
    print(f"pose graph saved to {out_dir}")

    # ---- localization pass ---------------------------------------------
    print("== localization ==")
    mcl_cfg = MCLConfig(num_particles=48)
    graph = read_pose_graph(out_dir)
    mgr = SubmapManager(graph=graph, cfg=mcl_cfg)
    ctx = mgr.initialize([0.0, 0.0, 0.0])
    state = init_mcl(jax.random.PRNGKey(0), mcl_cfg,
                     jnp.asarray([0.3, -0.3, 0.0]),
                     jnp.asarray([0.0, 0.0, 0.0, 1.0]))
    step = jax.jit(functools.partial(mcl_update, mcl_cfg))

    # world-truth trajectory starting where mapping started (map frame ~
    # first keyframe frame)
    rng = np.random.default_rng(0)
    tru = np.array([-4.0, -4.0, 0.8], np.float32)
    yaw = 0.0
    prev_o = (jnp.zeros(3), quat_from_yaw(jnp.asarray(0.0)))
    t0 = np.array([-4.0, -4.0, 0.8], np.float32)
    for t in range(10):
        yaw += 0.1
        tru = tru + np.asarray([0.3 * np.cos(yaw), 0.3 * np.sin(yaw), 0.0],
                               np.float32)
        pts, mask = simulate_scan(world, tru, yaw, n_rings=16, n_cols=500)
        # crude feature split: low points = flat, high = sharp
        low = pts[:, 2] < -0.4
        def pad(p, m, n=512):
            out = np.zeros((n, 3), np.float32); mm = np.zeros((n,), bool)
            sel = np.nonzero(m)[0][:n]
            out[:len(sel)] = p[sel]; mm[:len(sel)] = True
            return jnp.asarray(out), jnp.asarray(mm)
        flat, fm = pad(pts, mask & low)
        sharp, sm = pad(pts, mask & ~low)
        cur_map = tru - t0   # odom == truth relative to start
        cur = (jnp.asarray(cur_map), quat_from_yaw(jnp.asarray(yaw)))
        ctx = mgr.current(np.asarray(cur_map))
        state, out = step(ctx, state, prev_o[0], prev_o[1], cur[0], cur[1],
                          jnp.asarray(0.25), flat, fm, sharp, sm,
                          jnp.ones(512))
        prev_o = cur
        err = np.linalg.norm(np.asarray(out.pose_pos)[:2] - cur_map[:2])
        print(f"t={t} err={err:.3f} m match={float(out.match_ratio_max):.2f}")
    print("demo OK")


if __name__ == "__main__":
    main(*sys.argv[1:])
