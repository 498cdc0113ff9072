"""Parity tests: batched JAX local planner vs the sequential NumPy oracle
mirroring the reference C++ semantics (SURVEY.md §4 test strategy)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dddmr_navigation_tpu.config import (
    NavigationConfig, LocalPlannerConfig, DDSimpleGeneratorConfig,
    TrajectoryGeneratorLimits)
from dddmr_navigation_tpu.geometry import quat_identity, quat_from_yaw, quat_from_rpy
from dddmr_navigation_tpu.planning.local.sampler import (
    velocity_axis_samples, dd_simple_samples, rotate_inplace_samples)
from dddmr_navigation_tpu.planning.local.rollout import rollout, end_positions
from dddmr_navigation_tpu.planning.local.planner import (
    GlobalPlan, make_global_plan, prune_plan, compute_velocity_command,
    goal_reached, PlannerState, initial_heading_deviation)

from oracles import local_planner_oracle as oracle


CFG = LocalPlannerConfig()
GEN = CFG.generator


def make_plan_line(n=60, step=0.1, y=0.0):
    pts = np.stack([np.arange(n) * step, np.full(n, y), np.zeros(n)], 1)
    return pts.astype(np.float32)


def pad_obstacles(pts, n=512):
    out = np.zeros((n, 3), np.float32)
    pts = np.asarray(pts, np.float32).reshape(-1, 3)[:n]
    out[: len(pts)] = pts
    mask = np.zeros((n,), bool)
    mask[: len(pts)] = True
    return jnp.asarray(out), jnp.asarray(mask)


# ---------------------------------------------------------------------------
# sampler parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("vmin,vmax,n", [
    (0.1, 1.0, 5), (-0.5, 0.5, 4), (-0.6, -0.1, 10), (0.3, 0.3, 5),
    (-0.45, 0.75, 10),
])
def test_velocity_axis_samples_match_iterator(vmin, vmax, n):
    vals, mask = velocity_axis_samples(jnp.float32(vmin), jnp.float32(vmax), n)
    got = np.asarray(vals)[np.asarray(mask)]
    want = np.array(oracle.velocity_iterator(vmin, vmax, n), np.float32)
    np.testing.assert_allclose(np.sort(got), np.sort(want), atol=1e-5)
    # ascending order (reference emit order)
    assert np.all(np.diff(got) >= -1e-6)


@pytest.mark.parametrize("v,w,cap", [(0.0, 0.0, -1.0), (0.5, 0.2, -1.0),
                                     (1.0, -0.5, -1.0), (0.4, 0.0, 0.3)])
def test_dd_simple_samples_match_oracle(v, w, cap):
    samples, valid = dd_simple_samples(GEN, jnp.float32(v), jnp.float32(w),
                                       jnp.float32(cap))
    got = np.asarray(samples)[np.asarray(valid)]
    want = np.array(oracle.dd_simple_sample_list(GEN, v, w, cap), np.float32)
    assert got.shape == want.shape
    # sort rows for comparison (order is x-major both sides but zero-insert
    # slot ordering may differ within equal values)
    gi = np.lexsort((got[:, 1], got[:, 0]))
    wi = np.lexsort((want[:, 1], want[:, 0]))
    np.testing.assert_allclose(got[gi], want[wi], atol=1e-5)


def test_rotate_samples():
    samples, valid = rotate_inplace_samples(CFG.rotate_generator, GEN.limits)
    got = np.asarray(samples)[np.asarray(valid)]
    np.testing.assert_allclose(got, [[0.0, 0.5], [0.0, -0.5]], atol=1e-6)


# ---------------------------------------------------------------------------
# rollout parity
# ---------------------------------------------------------------------------

def test_rollout_matches_oracle_flat():
    robot_pos = jnp.asarray([0.3, -0.2, 0.0])
    robot_quat = quat_from_yaw(jnp.float32(0.7))
    samples = jnp.asarray([[0.5, 0.3], [0.8, -0.2], [0.2, 0.0]], jnp.float32)
    valid = jnp.ones((3,), bool)
    r = rollout(samples, valid, robot_pos, robot_quat,
                sim_time=GEN.sim_time, sim_granularity=GEN.sim_granularity,
                angular_sim_granularity=GEN.angular_sim_granularity,
                min_vel_x=GEN.limits.min_vel_x,
                min_vel_theta=GEN.limits.min_vel_theta,
                max_vel_x=GEN.limits.max_vel_x, max_steps=GEN.max_num_steps)
    for i, (vx, w) in enumerate([(0.5, 0.3), (0.8, -0.2), (0.2, 0.0)]):
        out = oracle.generate_trajectory(GEN, np.asarray(robot_pos),
                                         np.asarray(robot_quat), vx, w)
        assert out is not None
        poses, dt = out
        n = len(poses)
        assert int(r.num_steps[i]) == n
        np.testing.assert_allclose(float(r.dt[i]), dt, rtol=1e-5)
        got = np.asarray(r.positions[i][:n])
        want = np.array([p for p, _ in poses])
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_rollout_on_slope():
    # robot pitched 10 deg: rollout must ride the slope via the 3D transform
    robot_quat = quat_from_rpy(jnp.float32(0.0), jnp.float32(-0.1745),
                               jnp.float32(0.0))
    samples = jnp.asarray([[0.5, 0.0]], jnp.float32)
    r = rollout(samples, jnp.ones((1,), bool), jnp.zeros(3), robot_quat,
                sim_time=2.0, sim_granularity=0.05,
                angular_sim_granularity=0.025, min_vel_x=0.1,
                min_vel_theta=0.15, max_vel_x=1.0, max_steps=64)
    e = np.asarray(end_positions(r))[0]
    assert e[2] > 0.15  # climbed
    out = oracle.generate_trajectory(GEN, np.zeros(3), np.asarray(robot_quat),
                                     0.5, 0.0)
    np.testing.assert_allclose(e, out[0][-1][0], atol=1e-4)


# ---------------------------------------------------------------------------
# prune plan parity
# ---------------------------------------------------------------------------

# note: robot x positions chosen off exact arc-length budget boundaries —
# at a knife-edge (e.g. x=2.5 with 1.0 m backward prune on a 0.1 m-step
# plan) f32 vs f64 rounding legitimately flips the boundary pose.
@pytest.mark.parametrize("robot_xy", [(0.0, 0.0), (2.53, 0.05), (5.8, -0.3)])
def test_prune_plan_matches_oracle(robot_xy):
    pts = make_plan_line(60, 0.1)
    plan = make_global_plan(pts, max_len=CFG.max_plan_len)
    robot_pos = jnp.asarray([robot_xy[0], robot_xy[1], 0.0])
    pp, ok = prune_plan(CFG, plan, robot_pos)
    idx, ok_o = oracle.prune_plan_oracle(pts, np.asarray(robot_pos),
                                         CFG.forward_prune, CFG.backward_prune)
    assert bool(ok) == ok_o
    if ok_o:
        got = np.asarray(pp.positions)[np.asarray(pp.valid)]
        np.testing.assert_allclose(got, pts[idx], atol=1e-5)


def test_prune_plan_deviation_fails():
    pts = make_plan_line(60, 0.1)
    plan = make_global_plan(pts, max_len=CFG.max_plan_len)
    pp, ok = prune_plan(CFG, plan, jnp.asarray([0.0, 5.0, 0.0]))
    assert not bool(ok)
    assert int(pp.count) == 0


# ---------------------------------------------------------------------------
# full tick parity
# ---------------------------------------------------------------------------

TICK = jax.jit(compute_velocity_command, static_argnums=(0, 10))


def run_both(robot_pos, robot_quat, v, w, obstacles, plan_pts=None):
    if plan_pts is None:
        plan_pts = make_plan_line(60, 0.1)
    plan = make_global_plan(plan_pts, max_len=CFG.max_plan_len)
    obs, obs_mask = pad_obstacles(obstacles)
    cmd = TICK(CFG, plan, jnp.asarray(robot_pos), jnp.asarray(robot_quat),
               jnp.float32(v), jnp.float32(w), obs, obs_mask, -1.0, 0.0)
    o_vx, o_w, o_cost, o_costs = oracle.compute_velocity_command_oracle(
        CFG, plan_pts, np.asarray(plan.quats[:len(plan_pts)]),
        np.asarray(robot_pos, np.float64), np.asarray(robot_quat, np.float64),
        v, w, np.asarray(obstacles, np.float64).reshape(-1, 3))
    return cmd, (o_vx, o_w, o_cost, o_costs)


def test_tick_parity_no_obstacles():
    cmd, (o_vx, o_w, o_cost, _) = run_both(
        [0.0, 0.0, 0.0], np.asarray(quat_identity()), 0.0, 0.0,
        np.zeros((0, 3)))
    assert int(cmd.state) == PlannerState.TRAJECTORY_FOUND
    assert abs(float(cmd.vx) - o_vx) < 1e-4
    assert abs(float(cmd.wz) - o_w) < 1e-4
    assert abs(float(cmd.best_cost) - o_cost) < 1e-3


def test_tick_parity_with_obstacle_wall():
    # wall crossing the plan at x=1.2; asymmetric in y so left/right dodge
    # costs don't tie exactly (exact ties are resolved by scan order and
    # legitimately flip between f32 and f64)
    ys = np.arange(-0.7, 1.0, 0.1)
    zs = np.arange(0.0, 0.6, 0.1)
    wall = np.array([[1.2, y, z] for y in ys for z in zs], np.float32)
    cmd, (o_vx, o_w, o_cost, o_costs) = run_both(
        [0.0, 0.0, 0.0], np.asarray(quat_identity()), 0.5, 0.0, wall)
    assert abs(float(cmd.vx) - o_vx) < 1e-4
    assert abs(float(cmd.wz) - o_w) < 1e-4
    assert abs(float(cmd.best_cost) - o_cost) < 1e-3
    # some trajectories must be rejected by collision
    assert bool(jnp.any(cmd.rejected))


def test_tick_parity_moving_states():
    rng = np.random.default_rng(3)
    for trial in range(4):
        v = float(rng.uniform(0.0, 0.9))
        w = float(rng.uniform(-0.4, 0.4))
        x = float(rng.uniform(0.0, 3.0))
        yaw = float(rng.uniform(-0.3, 0.3))
        obstacles = rng.uniform([-1, -2, 0], [5, 2, 0.5], size=(40, 3)).astype(np.float32)
        cmd, (o_vx, o_w, o_cost, o_costs) = run_both(
            [x, 0.02, 0.0], np.asarray(quat_from_yaw(jnp.float32(yaw))),
            v, w, obstacles)
        assert abs(float(cmd.vx) - o_vx) < 1e-4, (trial, float(cmd.vx), o_vx)
        assert abs(float(cmd.wz) - o_w) < 1e-4, (trial, float(cmd.wz), o_w)
        assert abs(float(cmd.best_cost) - o_cost) < 1e-3


def test_all_trajectories_fail_when_boxed_in():
    # obstacles ringing the robot inside the footprint sweep
    ring = []
    for ang in np.arange(0, 2 * np.pi, 0.2):
        ring.append([0.55 * np.cos(ang), 0.55 * np.sin(ang), 0.3])
    cmd, _ = run_both([0.0, 0.0, 0.0], np.asarray(quat_identity()), 0.3, 0.0,
                      np.asarray(ring, np.float32))
    assert int(cmd.state) == PlannerState.ALL_TRAJECTORIES_FAIL
    assert float(cmd.vx) == 0.0


def test_goal_reached_and_heading():
    pts = make_plan_line(60, 0.1)
    plan = make_global_plan(pts, max_len=CFG.max_plan_len)
    assert bool(goal_reached(CFG, plan, jnp.asarray([5.85, 0.05, 0.0])))
    assert not bool(goal_reached(CFG, plan, jnp.asarray([0.0, 0.0, 0.0])))
    yaw_dev, aligned, ok = initial_heading_deviation(
        CFG, plan, jnp.asarray([0.0, 0.0, 0.0]), quat_from_yaw(jnp.float32(0.0)))
    assert bool(ok) and bool(aligned)
    yaw_dev2, aligned2, ok2 = initial_heading_deviation(
        CFG, plan, jnp.asarray([0.0, 0.0, 0.0]), quat_from_yaw(jnp.float32(2.0)))
    assert bool(ok2) and not bool(aligned2)
    assert abs(float(yaw_dev2) + 2.0) < 0.1


# ---------------------------------------------------------------------------
# omni-drive generator parity
# ---------------------------------------------------------------------------

OMNI = LocalPlannerConfig().omni_generator


# windows whose zero crossing is not exactly on a sample point (f32 vs f64
# rounding flips the VelocityIterator zero-insertion there — a documented
# tie-break edge, SURVEY.md §7 "parity semantics")
@pytest.mark.parametrize("v,vy,w", [
    (0.0, 0.0, 0.0), (0.43, -0.21, 0.13), (1.0, 0.5, -0.31), (-0.3, 0.0, 0.5),
])
def test_omni_samples_match_oracle(v, vy, w):
    from dddmr_navigation_tpu.planning.local.sampler import omni_simple_samples
    got, mask = jax.jit(omni_simple_samples, static_argnums=0)(
        OMNI, jnp.float32(v), jnp.float32(vy), jnp.float32(w))
    got = np.asarray(got)[np.asarray(mask)]
    want = np.array(oracle.omni_sample_list(OMNI, v, vy, w), np.float32)
    # same multiset of (vx, vy, ω) triples (padded slots sorted differently)
    got_sorted = got[np.lexsort(got.T)]
    want_sorted = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-5)


def test_omni_rollout_matches_oracle():
    from dddmr_navigation_tpu.planning.local.sampler import omni_simple_samples
    robot_pos = jnp.asarray([0.5, -0.2, 0.1])
    robot_quat = quat_from_yaw(jnp.float32(0.7))
    samples, valid = omni_simple_samples(
        OMNI, jnp.float32(0.5), jnp.float32(0.2), jnp.float32(0.1))
    r = rollout(samples, valid, robot_pos, robot_quat,
                sim_time=OMNI.sim_time, sim_granularity=OMNI.sim_granularity,
                angular_sim_granularity=OMNI.angular_sim_granularity,
                min_vel_x=OMNI.limits.min_vel_trans,
                min_vel_theta=OMNI.limits.min_vel_theta,
                max_vel_x=OMNI.limits.max_vel_trans,
                max_steps=OMNI.max_num_steps)
    samples_np = np.asarray(samples)
    checked = 0
    for i in np.flatnonzero(np.asarray(valid))[:40]:
        vx, vy, w = samples_np[i]
        out = oracle.generate_trajectory_omni(
            OMNI, np.asarray(robot_pos), np.asarray(robot_quat), vx, vy, w)
        if out is None:
            assert not bool(r.valid[i])
            continue
        poses, dt = out
        assert bool(r.valid[i])
        n = min(len(poses), OMNI.max_num_steps)
        got = np.asarray(r.positions[i, :n])
        want = np.stack([p for p, _ in poses[:n]])
        np.testing.assert_allclose(got, want, atol=2e-4)
        checked += 1
    assert checked > 10


def test_omni_tick_picks_lateral_dodge():
    """With a wall dead ahead and free space laterally, the omni planner
    must produce a command with nonzero vy capability (vy field populated)
    and avoid collision."""
    cfg = LocalPlannerConfig()
    plan = make_global_plan(make_plan_line(), max_len=cfg.max_plan_len)
    obs, obs_mask = pad_obstacles(
        [[0.8, y, 0.25] for y in np.arange(-1.0, 1.01, 0.05)])
    cmd = compute_velocity_command(
        cfg, plan, jnp.zeros(3), quat_identity(), jnp.float32(0.3),
        jnp.float32(0.0), obs, obs_mask, generator="omni_drive_simple",
        vy_now=jnp.float32(0.0))
    assert int(cmd.state) in (int(PlannerState.TRAJECTORY_FOUND),
                              int(PlannerState.ALL_TRAJECTORIES_FAIL))
    if int(cmd.state) == int(PlannerState.TRAJECTORY_FOUND):
        # chosen rollout must be collision-free: its cost is finite & ≥ 0
        assert float(cmd.best_cost) >= 0.0
    assert cmd.vy.shape == ()


def test_collision_min_max_critic():
    """AABB variant (`collision_min_max_model.cpp:51-89`): obstacle inside
    the swept footprint AABB rejects; distant obstacle passes; <5 points
    short-circuits to 0."""
    from dddmr_navigation_tpu.planning.local.critics import (
        collision_min_max_scores)
    from dddmr_navigation_tpu.planning.local.sampler import dd_simple_samples
    samples, valid = dd_simple_samples(GEN, jnp.float32(0.3), jnp.float32(0.0),
                                       jnp.float32(-1.0))
    r = rollout(samples, valid, jnp.zeros(3), quat_identity(),
                sim_time=GEN.sim_time, sim_granularity=GEN.sim_granularity,
                angular_sim_granularity=GEN.angular_sim_granularity,
                min_vel_x=GEN.limits.min_vel_x,
                min_vel_theta=GEN.limits.min_vel_theta,
                max_vel_x=GEN.limits.max_vel_x, max_steps=GEN.max_num_steps)

    # wall dead ahead at x=0.5: every forward rollout's AABB crosses it
    obs, mask = pad_obstacles([[0.5, y, 0.3] for y in
                               np.arange(-0.5, 0.51, 0.1)])
    s = collision_min_max_scores(r, GEN.cuboid, obs, mask)
    fwd = np.asarray(r.valid) & (np.asarray(r.samples[:, 0]) > 0.2) \
        & (np.abs(np.asarray(r.samples[:, -1])) < 0.1)
    assert np.all(np.asarray(s)[fwd] == -1.0)

    # distant obstacles: all pass
    obs_far, mask_far = pad_obstacles([[50.0 + i, 50.0, 0.3]
                                       for i in range(10)])
    s_far = collision_min_max_scores(r, GEN.cuboid, obs_far, mask_far)
    assert np.all(np.asarray(s_far) == 0.0)

    # fewer than 5 points: no rejection even with a wall
    obs4, mask4 = pad_obstacles([[0.5, 0.0, 0.3]] * 4)
    s4 = collision_min_max_scores(r, GEN.cuboid, obs4, mask4)
    assert np.all(np.asarray(s4) == 0.0)


def test_collision_min_max_in_stack():
    """Configured via CriticsConfig.collision_min_max, it rejects like the
    oriented critic on an obvious wall."""
    from dddmr_navigation_tpu.config import CriticsConfig, CriticConfig
    cfg = LocalPlannerConfig(critics=CriticsConfig(
        collision=None,
        collision_min_max=CriticConfig(
            plugin="mpc_critics::CollisionMinMaxModel", weight=1.0)))
    plan = make_global_plan(make_plan_line(), max_len=cfg.max_plan_len)
    obs, mask = pad_obstacles([[0.6, y, 0.3]
                               for y in np.arange(-1.5, 1.51, 0.05)])
    cmd = compute_velocity_command(
        cfg, plan, jnp.zeros(3), quat_identity(), jnp.float32(0.3),
        jnp.float32(0.0), obs, mask)
    # every forward trajectory hits the wall; only slow/turning ones can
    # survive, so either a trajectory is found with a low vx or all fail
    if int(cmd.state) == int(PlannerState.TRAJECTORY_FOUND):
        assert float(cmd.vx) <= 0.31
    else:
        assert int(cmd.state) == int(PlannerState.ALL_TRAJECTORIES_FAIL)
