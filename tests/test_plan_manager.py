"""Host failure gates → PlannerState and the async global-plan manager.

Reference: `local_planner.cpp:482-524` (gates), `p2p_move_base.cpp:495-503`
(zero velocity on gate states), `p2p_global_plan_manager.cpp:83-186`
(query thread, stop/resume, hasPlan/copyPlan).
"""
import time

import numpy as np
import jax.numpy as jnp
import pytest

from dddmr_navigation_tpu.config import NavigationConfig
from dddmr_navigation_tpu.geometry import quat_from_yaw
from dddmr_navigation_tpu.io import flat_ground_map
from dddmr_navigation_tpu.control.move_base import MoveBaseDriver
from dddmr_navigation_tpu.control.fsm import Decision
from dddmr_navigation_tpu.control.plan_manager import AsyncPlanManager
from dddmr_navigation_tpu.planning.global_.runtime import GlobalPlannerRuntime
from dddmr_navigation_tpu.planning.global_.dwa import DWAGlobalPlanManager
from dddmr_navigation_tpu.runtime.watchdog import FreshnessGate

CFG = NavigationConfig()


def _driver():
    ground = flat_ground_map(10, 6, 0.25)
    driver = MoveBaseDriver(CFG, ground)
    driver.set_goal([4.0, 0.0, 0.0])
    k = CFG.local_planner.max_obstacle_points
    obstacles = jnp.zeros((k, 3))
    obs_valid = jnp.zeros((k,), bool)
    return driver, obstacles, obs_valid


def test_gates_zero_velocity_and_hold_state():
    """Stale TF / stale sensors must never command the base
    (`p2p_move_base.cpp:495-503`) and must not advance the mission."""
    driver, obstacles, obs_valid = _driver()
    quat = np.asarray(quat_from_yaw(jnp.float32(0.0)))
    pos = np.array([-4.0, 0.0, 0.0], np.float32)

    # progress to controlling with healthy gates
    dec = None
    for i in range(6):
        vx, wz, dec, done, ok = driver.tick(pos, quat, 0.0, 0.0, obstacles,
                                            obs_valid, i * 0.1)
    assert dec in (Decision.D_ALIGN_HEADING, Decision.D_CONTROLLING)
    dec_before = dec

    # TF failure: zero velocity, decision held
    vx, wz, dec, done, ok = driver.tick(pos, quat, 0.3, 0.0, obstacles,
                                        obs_valid, 0.7, tf_ok=False)
    assert (vx, wz) == (0.0, 0.0)
    assert dec == dec_before and not done

    # perception failure: same safety behavior
    vx, wz, dec, done, ok = driver.tick(pos, quat, 0.3, 0.0, obstacles,
                                        obs_valid, 0.8, sensor_ok=False)
    assert (vx, wz) == (0.0, 0.0)
    assert dec == dec_before and not done

    # gates recover → commands resume
    vx, wz, dec, done, ok = driver.tick(pos, quat, 0.0, 0.0, obstacles,
                                        obs_valid, 0.9)
    assert dec in (Decision.D_ALIGN_HEADING, Decision.D_CONTROLLING)


def test_freshness_gate_drives_sensor_ok():
    gate = FreshnessGate(expected_dt={"lidar": 0.2, "odom": 0.2})
    gate.update("lidar", now=10.0)
    gate.update("odom", now=10.0)
    assert gate.ok(now=10.1)
    assert not gate.ok(now=10.5)          # lidar+odom stale
    gate.update("lidar", now=10.5)
    assert not gate.ok(now=10.55)         # odom still stale (AND semantics)
    gate.update("odom", now=10.55)
    assert gate.ok(now=10.6)


@pytest.mark.slow
def test_async_plan_manager_produces_plan_off_thread():
    ground = flat_ground_map(10, 6, 0.25)
    rt = GlobalPlannerRuntime(CFG, ground)
    dwa = DWAGlobalPlanManager(rt, CFG.dwa_global_planner)
    mgr = AsyncPlanManager(dwa, query_frequency=20.0)
    try:
        g = len(ground)
        free = np.full((g,), CFG.perception.max_obstacle_distance, np.float32)
        mgr.set_goal(np.array([4.0, 0.0, 0.0], np.float32),
                     np.array([0, 0, 0, 1], np.float32))
        mgr.offer(np.array([-4.0, 0.0, 0.0], np.float32), free, now=0.0)
        deadline = time.monotonic() + 30.0
        plan = None
        while time.monotonic() < deadline:
            plan = mgr.take_plan()
            if plan is not None:
                break
            time.sleep(0.05)
        assert plan is not None, "worker never produced a plan"
        assert np.linalg.norm(plan.positions[-1] - [4.0, 0.0, 0.0]) < 0.5
        # stop(): no NEW results after draining anything in flight
        mgr.stop()
        time.sleep(0.2)
        mgr.take_plan()   # drain a result that may have raced the stop
        mgr.offer(np.array([-3.0, 0.0, 0.0], np.float32), free, now=1.0)
        time.sleep(0.3)
        assert mgr.take_plan() is None
        assert not dwa.threading_active
    finally:
        mgr.close()


@pytest.mark.slow
def test_threaded_driver_navigates():
    """MoveBaseDriver with the thread-backed manager completes a short
    goal (plan queries off the control tick)."""
    ground = flat_ground_map(10, 6, 0.25)
    driver = MoveBaseDriver(CFG, ground, threaded_plan_manager=True)
    try:
        driver.set_goal([3.0, 0.0, 0.0])
        k = CFG.local_planner.max_obstacle_points
        obstacles = jnp.zeros((k, 3))
        obs_valid = jnp.zeros((k,), bool)
        pos = np.array([-3.0, 0.0, 0.0], np.float32)
        yaw, v, w = 0.0, 0.0, 0.0
        dt = 0.1
        done = ok = False
        for i in range(400):
            quat = quat_from_yaw(jnp.float32(yaw))
            vx, wz, dec, done, ok = driver.tick(
                pos, quat, v, w, obstacles, obs_valid, i * dt)
            v, w = vx, wz
            pos = pos + np.array([v * np.cos(yaw) * dt,
                                  v * np.sin(yaw) * dt, 0.0], np.float32)
            yaw = float(yaw + w * dt)
            if done:
                break
            # give the worker thread real time to produce the first plan
            if driver.plan is None:
                time.sleep(0.02)
        assert done and ok, f"not done; pos {pos}"
    finally:
        driver.plan_manager.close()


def test_async_set_goal_race_never_publishes_stale_goal():
    """Hammer set_goal/offer against the worker: after every goal swap, a
    plan published as fresh must lead to the CURRENT goal, never a
    superseded one (round-2 review: the worker read `goal` unlocked, so a
    stale goal's plan could surface as fresh just after a new goal
    arrived)."""
    ground = flat_ground_map(10, 6, 0.25)
    rt = GlobalPlannerRuntime(CFG, ground)
    dwa = DWAGlobalPlanManager(rt, CFG.dwa_global_planner)
    mgr = AsyncPlanManager(dwa, query_frequency=200.0)
    goals = [np.array([4.0, 0.0, 0.0], np.float32),
             np.array([-4.0, 0.5, 0.0], np.float32),
             np.array([0.0, -2.5, 0.0], np.float32)]
    try:
        g = len(ground)
        free = np.full((g,), CFG.perception.max_obstacle_distance, np.float32)
        robot = np.array([0.0, 0.0, 0.0], np.float32)
        ident = np.array([0, 0, 0, 1], np.float32)

        # warm-up: compile the planning programs on one stable goal
        mgr.set_goal(goals[0], ident)
        mgr.offer(robot, free, now=0.0)
        deadline = time.monotonic() + 60.0
        while time.monotonic() < deadline and mgr.take_plan() is None:
            time.sleep(0.02)

        checked = 0
        i = 0
        deadline = time.monotonic() + 20.0
        while time.monotonic() < deadline and checked < 10:
            i += 1
            cur = goals[i % len(goals)]
            mgr.set_goal(cur, ident)
            mgr.offer(robot, free, now=float(i))
            # worker may or may not finish before the next swap; any plan
            # that DOES surface must match the goal current at take time
            t_poll = time.monotonic() + 0.25
            while time.monotonic() < t_poll:
                plan = mgr.take_plan()
                if plan is not None:
                    goal_now = mgr.goal[0]
                    err = np.linalg.norm(plan.positions[-1] - goal_now)
                    assert err < 0.5, (
                        f"stale plan surfaced: ends {plan.positions[-1]}, "
                        f"current goal {goal_now}")
                    checked += 1
                time.sleep(0.005)
        assert checked >= 3, "race test never observed a published plan"
    finally:
        mgr.close()
