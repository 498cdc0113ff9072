"""End-to-end navigation session: MoveBaseDriver steers a simulated robot
from start to goal around an obstacle wall (the full vertical: global
wavefront plan -> FSM -> batched local planner -> cmd_vel)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dddmr_navigation_tpu.config import NavigationConfig
from dddmr_navigation_tpu.geometry import quat_from_yaw, yaw_from_quat
from dddmr_navigation_tpu.io import flat_ground_map
from dddmr_navigation_tpu.io.maps import box_obstacle
from dddmr_navigation_tpu.control.move_base import MoveBaseDriver
from dddmr_navigation_tpu.control.fsm import Decision


@pytest.mark.slow
def test_full_navigation_session():
    cfg = NavigationConfig()
    # 0.2 m ground (the reference's demo grounds are ~0.1 m; the DWA
    # window replanner assumes ground within its hardcoded 0.25 m
    # plan-pose match radius, `dynamic_window_aware_global_planner.cpp:249`)
    ground = flat_ground_map(14, 8, 0.2)

    # obstacle wall at x=0 with a gap at y ∈ [1.2, 2.4]
    wall_pts = []
    for y in np.arange(-4.0, 4.0, 0.1):
        if 1.2 <= y <= 2.4:
            continue
        for z in (0.1, 0.4):
            wall_pts.append([0.0, y, z])
    wall = np.asarray(wall_pts, np.float32)

    # dgraph: XY distance of each ground node to the wall (lethal near it)
    d = np.linalg.norm(ground[:, None, :2] - wall[None, :, :2], axis=-1).min(1)
    dgraph = np.where(d < cfg.perception.inflation_radius, d,
                      cfg.perception.max_obstacle_distance).astype(np.float32)

    driver = MoveBaseDriver(cfg, ground)
    driver.set_dgraph(dgraph)
    driver.set_goal([5.0, 0.0, 0.0])

    k = cfg.local_planner.max_obstacle_points
    obstacles = np.zeros((k, 3), np.float32)
    obstacles[: len(wall)] = wall
    obs_valid = np.zeros((k,), bool)
    obs_valid[: len(wall)] = True
    obstacles = jnp.asarray(obstacles)
    obs_valid = jnp.asarray(obs_valid)

    pos = np.array([-5.0, 0.0, 0.0], np.float32)
    yaw = 0.0
    v = w = 0.0
    dt = 1.0 / cfg.move_base.controller_frequency

    succeeded = False
    min_wall_clearance = 1e9
    for i in range(600):
        now = i * dt
        quat = quat_from_yaw(jnp.float32(yaw))
        vx, wz, decision, done, ok = driver.tick(
            pos, quat, v, w, obstacles, obs_valid, now)
        v, w = vx, wz
        pos = pos + np.array([v * np.cos(yaw) * dt, v * np.sin(yaw) * dt, 0.0],
                             np.float32)
        yaw = float(yaw + w * dt)
        clearance = np.linalg.norm(wall[:, :2] - pos[:2], axis=1).min()
        min_wall_clearance = min(min_wall_clearance, clearance)
        if done:
            succeeded = ok
            break

    assert succeeded, f"nav did not succeed; last decision {decision}, pos {pos}"
    assert np.linalg.norm(pos[:2] - [5.0, 0.0]) < 0.6
    # never hit the wall (inscribed-ish clearance)
    assert min_wall_clearance > 0.3, min_wall_clearance
    # the path must have used the gap
    # (we can't assert trajectory shape easily; clearance + success suffice)
