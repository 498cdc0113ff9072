"""Integrated perception→planning loop (`NavigationSession`): the
reference's headline demo — a toggling obstacle wall forcing
mark → replan-around → clear → replan-through (`test/dummy_pc_pub.cpp:33-70`
driving `stacked_perception.cpp:72-155` + both planners) — asserted
end-to-end from simulated lidar scans only. No hand-fed dgraphs anywhere.
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from dddmr_navigation_tpu.config import (
    NavigationConfig, PerceptionConfig, SpinningLidarConfig)
from dddmr_navigation_tpu.geometry import quat_from_yaw
from dddmr_navigation_tpu.io import flat_ground_map
from dddmr_navigation_tpu.control.session import NavigationSession
from dddmr_navigation_tpu.utils.lidar_sim import BoxWorld, simulate_scan


def _cfg():
    lidar = SpinningLidarConfig(
        xy_resolution=0.1, height_resolution=0.1,
        range_image_rows=32, range_image_cols=360,
        # full-circle effective scan (the synthetic lidar has no mast
        # shadow), generous vertical FOV for the near wall
        vertical_FOV_bottom=-40.0, vertical_FOV_top=40.0,
        scan_effective_positive_start=0.0,
        scan_effective_positive_end=180.0,
        scan_effective_negative_start=0.0,
        scan_effective_negative_end=-180.0)
    perception = PerceptionConfig(
        lidar=lidar, voxel_window_cells_xy=72, voxel_window_cells_z=24)
    return dataclasses.replace(NavigationConfig(), perception=perception)


def _scan(world, robot_pos, yaw):
    """Simulated `segmented_cloud_pure`: the reference's lidar layer input
    is LeGO-LOAM's ground-REMOVED segmented cloud (SURVEY §3.2) — mimic by
    dropping returns near the ground plane (global z < 0.15)."""
    pts, mask = simulate_scan(
        world, np.asarray(robot_pos) + [0, 0, 0.5], sensor_yaw=yaw,
        n_rings=24, n_cols=240, v_bottom=-40.0, v_top=40.0, max_range=15.0)
    sensor_z = float(robot_pos[2]) + 0.5
    mask = mask & (pts[:, 2] + sensor_z >= 0.15)
    return pts, mask


def _room():
    # surrounding room walls: keeps the cleared-phase scan non-empty so
    # free space can be asserted (real scans always return structure)
    return BoxWorld.room(half=6.0, wall_h=1.5)


def _wall_world():
    # wall across the corridor at x=0, y ∈ [-1.4, 1.4]; free space beyond
    w = _room()
    w.add_box([-0.1, -1.4, 0.0], [0.1, 1.4, 1.2])
    return w


@pytest.fixture(scope="module")
def session_ctx():
    cfg = _cfg()
    ground = flat_ground_map(14, 8, 0.2)
    return cfg, ground


@pytest.mark.slow
def test_mark_replan_clear_replan(session_ctx):
    """Static robot: wall appears → dynamic dGraph goes lethal and the
    plan detours; wall disappears → ray-cast clearing restores the field
    and the plan relaxes straight (`dummy_pc_pub` cycle)."""
    cfg, ground = session_ctx
    # the toggling-wall demo runs the plain `get_plan` action (full replan
    # every query) — the DWA mode deliberately keeps its cached tail
    cfg = dataclasses.replace(cfg, move_base=dataclasses.replace(
        cfg.move_base, global_planner_action_name="get_plan"))
    sess = NavigationSession(cfg, ground)
    goal = [4.0, 0.0, 0.0]
    sess.set_goal(goal)

    wall = _wall_world()
    empty = _room()

    # closed-loop stepping: the FSM only re-queries plans while it is in
    # planning/controlling/waiting (reference executeCycle), so the robot
    # must actually follow commands for replans to flow
    pos = np.array([-2.5, 0.0, 0.0], np.float32)
    yaw, v, w = 0.0, 0.0, 0.0
    dt = 0.1

    def run(world, n_ticks, t0):
        nonlocal pos, yaw, v, w
        for i in range(n_ticks):
            quat = np.asarray(quat_from_yaw(jnp.float32(yaw)))
            pts, mask = _scan(world, pos, yaw)
            vx, wz, dec, done, ok = sess.tick(pts, mask, pos, quat, v, w,
                                              now=t0 + i * dt)
            v, w = vx, wz
            pos = pos + np.array([v * np.cos(yaw) * dt,
                                  v * np.sin(yaw) * dt, 0.0], np.float32)
            yaw = float(yaw + w * dt)

    # --- phase 1: wall present → mark + detour ---
    run(wall, 10, 0.0)
    dg = np.asarray(sess.composed_dgraph)
    near_wall = np.linalg.norm(ground[:, :2] - [0.0, 0.0], axis=1) < 0.4
    assert (dg[near_wall] < cfg.perception.inscribed_radius).any(), \
        "wall not marked lethal in the composed dGraph"
    plan1 = np.asarray(sess.driver.plan.positions)[
        np.asarray(sess.driver.plan.valid)]
    assert np.max(np.abs(plan1[:, 1])) > 1.2, "plan did not detour"

    # --- phase 2: wall removed → clear + relax ---
    # Long enough for the reference's real cycle: finish aligning to the
    # (old) detour heading (~1.1 rad at the rotate limit), enter
    # d_controlling, and adopt the replanned straight path there
    # (`p2p_move_base.cpp:469-489` — plans are adopted in controlling,
    # while the 5 Hz GPM query thread kept planning during align).
    run(empty, 30, 1.0)
    dg = np.asarray(sess.composed_dgraph)
    assert (dg[near_wall] > cfg.perception.inscribed_radius).all(), \
        "marks not cleared after the wall vanished"
    plan2 = np.asarray(sess.driver.plan.positions)[
        np.asarray(sess.driver.plan.valid)]
    assert np.max(np.abs(plan2[:, 1])) < abs(pos[1]) + 0.6, \
        "plan did not relax straight"


@pytest.mark.slow
def test_closed_loop_navigation_from_scans(session_ctx):
    """Full vertical closed loop: the robot navigates around the wall to
    the goal using only simulated scans — perception feeds both planners
    every tick."""
    cfg, ground = session_ctx
    sess = NavigationSession(cfg, ground)
    wall = _wall_world()
    goal = np.array([3.5, 0.0, 0.0], np.float32)
    sess.set_goal(goal)

    pos = np.array([-3.0, 0.0, 0.0], np.float32)
    yaw, v, w = 0.0, 0.0, 0.0
    dt = 0.1
    done = ok = False
    min_wall_clear = 1e9
    for i in range(600):
        quat = quat_from_yaw(jnp.float32(yaw))
        pts, mask = _scan(wall, pos, yaw)
        vx, wz, dec, done, ok = sess.tick(pts, mask, pos, np.asarray(quat),
                                          v, w, now=i * dt)
        v, w = vx, wz
        pos = pos + np.array([v * np.cos(yaw) * dt, v * np.sin(yaw) * dt,
                              0.0], np.float32)
        yaw = float(yaw + w * dt)
        if -0.4 < pos[0] < 0.4:
            min_wall_clear = min(min_wall_clear,
                                 float(np.abs(pos[1]) - 1.4))
        if done:
            break
    assert done and ok, f"nav failed at pos {pos}, decision {dec}"
    assert np.linalg.norm(pos[:2] - goal[:2]) < 0.6
    assert min_wall_clear > 0.2, min_wall_clear  # went around, with margin


@pytest.mark.slow
def test_perception_malfunction_on_scan_dropout(session_ctx):
    """Scan dropout → freshness gate fails → zero velocity
    (PERCEPTION_MALFUNCTION path, `local_planner.cpp:489-491`)."""
    cfg, ground = session_ctx
    sess = NavigationSession(cfg, ground)
    robot = np.array([-2.0, 0.0, 0.0], np.float32)
    quat = np.asarray(quat_from_yaw(jnp.float32(0.0)))
    sess.set_goal([3.0, 0.0, 0.0])
    world = _room()
    for i in range(6):
        pts, mask = _scan(world, robot, 0.0)
        vx, wz, dec, done, ok = sess.tick(pts, mask, robot, quat, 0.0, 0.0,
                                          now=i * 0.1)
    assert (vx, wz) != (0.0, 0.0) or int(dec) >= 0  # healthy loop commands
    # drop scans past the gate window
    empty_pts = np.zeros((8, 3), np.float32)
    empty_mask = np.zeros((8,), bool)
    t = 0.6
    out = None
    for k in range(8):
        t += 0.3
        out = sess.tick(empty_pts, empty_mask, robot, quat, 0.3, 0.0, now=t)
    vx, wz, dec, done, ok = out
    assert (vx, wz) == (0.0, 0.0)

    # TF staleness → TF_FAIL zero velocity too
    pts, mask = _scan(world, robot, 0.0)
    vx, wz, dec, done, ok = sess.tick(pts, mask, robot, quat, 0.3, 0.0,
                                      now=t + 0.1, tf_age=3.0)
    assert (vx, wz) == (0.0, 0.0)


@pytest.mark.slow
def test_depth_camera_layer_in_session(session_ctx):
    """Multi-camera depth layer inside the stacked session: camera 0's
    observation marks a wall into the composed dGraph; camera 1 later sees
    through that volume and the buffered-frustum clearing relaxes it
    (cross-camera clearing, `stacked_perception.cpp:72-90`)."""
    cfg, ground = session_ctx
    sess = NavigationSession(cfg, ground, depth_cameras=2,
                             depth_keep_time=1.0)
    robot = np.array([-2.0, 0.0, 0.0], np.float32)
    quat = np.asarray(quat_from_yaw(jnp.float32(0.0)))
    sess.set_goal([3.0, 0.0, 0.0])
    room = _room()

    # camera 0 at the robot, looking +x: a depth wall 1.5 m ahead
    ys, zs = np.meshgrid(np.linspace(-0.5, 0.5, 14),
                         np.linspace(0.2, 0.9, 8))
    wall = np.stack([np.full(ys.size, robot[0] + 1.5),
                     ys.ravel(), zs.ravel()], 1).astype(np.float32)
    cam_pos = robot + [0, 0, 0.4]
    sess.push_depth_observation(0, cam_pos, quat, wall, now=0.0)
    pts, mask = _scan(room, robot, 0.0)
    sess.tick(pts, mask, robot, quat, 0.0, 0.0, now=0.05)
    dg = np.asarray(sess.composed_dgraph)
    near = np.linalg.norm(ground[:, :2] - [robot[0] + 1.5, 0.0], axis=1) < 0.4
    assert (dg[near] < cfg.perception.inscribed_radius).any(), \
        "depth wall not marked in the composed dGraph"

    # the wall vanishes; camera 1 (slightly behind) sees through to 2.4 m.
    # Camera 0's buffered observation still ATTACHES the voxels while it
    # lives (`frustum_utils.cpp:219-291` re-observation keeps marks), so
    # the relax can only happen after its keep_time (1 s) expires.
    far = np.stack([np.full(8, robot[0] + 2.4),
                    np.linspace(-0.5, 0.5, 8),
                    np.full(8, 0.4)], 1).astype(np.float32)
    for k in range(3):
        t = 1.2 + 0.1 * k
        sess.push_depth_observation(1, robot + [-0.2, 0, 0.4], quat, far,
                                    now=t)
        pts, mask = _scan(room, robot, 0.0)
        sess.tick(pts, mask, robot, quat, 0.0, 0.0, now=t + 0.05)
    dg = np.asarray(sess.composed_dgraph)
    assert (dg[near] > cfg.perception.inscribed_radius).all(), \
        "cross-camera frustum clearing did not relax the depth marks"
