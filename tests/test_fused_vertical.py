"""Fused vertical parity: the single-program tick must match the
host-glued chain (what `NavigationSession` does: perception_update →
min-compose → lethal → GlobalPlannerRuntime.plan → path_to_poses →
make_global_plan → compute_velocity_command) stage for stage.

Reference call stacks: `perception_3d_ros.cpp:220-249`,
`a_star_on_pc.cpp:200-329`, `global_planner.cpp:313-391`,
`local_planner.cpp:482-621`.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dddmr_navigation_tpu.config import (
    NavigationConfig, LocalPlannerConfig, DDSimpleGeneratorConfig,
    PerceptionConfig, SpinningLidarConfig)
from dddmr_navigation_tpu.geometry import quat_from_yaw
from dddmr_navigation_tpu.io.maps import flat_ground_map, box_obstacle
from dddmr_navigation_tpu.perception.marking import perception_update
from dddmr_navigation_tpu.perception.layers import min_dgraph
from dddmr_navigation_tpu.planning.global_.los import lethal_cloud_from_dgraph
from dddmr_navigation_tpu.planning.global_.runtime import GlobalPlannerRuntime
from dddmr_navigation_tpu.planning.local.planner import (
    make_global_plan, compute_velocity_command)
from dddmr_navigation_tpu.control.fused import (
    build_fused_map, init_fused_state, make_fused_tick, device_observation)


def _light_cfg():
    lidar = SpinningLidarConfig(
        scan_effective_positive_start=0.0, scan_effective_negative_start=0.0,
        max_scan_points=4096, range_image_rows=16, range_image_cols=360)
    perception = PerceptionConfig(
        lidar=lidar, voxel_window_cells_xy=64, voxel_window_cells_z=24,
        max_marked_voxels=512)
    lp = LocalPlannerConfig(
        generator=DDSimpleGeneratorConfig(
            linear_x_sample=4, angular_z_sample=6, max_num_steps=24),
        max_obstacle_points=512, collision_obstacle_chunk=16,
        collision_near_k=64)
    return NavigationConfig(local_planner=lp, perception=perception)


def _scan_from_box(center, robot_pos, sensor_offset, n_pad):
    """A synthetic obstacle cloud in the SENSOR frame."""
    pts_world = box_obstacle(center, size=(0.4, 0.8, 1.0), resolution=0.1)
    pts = pts_world - (np.asarray(robot_pos) + np.asarray(sensor_offset))
    pad = np.zeros((n_pad, 3), np.float32)
    pad[:len(pts)] = pts[:n_pad]
    mask = np.zeros((n_pad,), bool)
    mask[:min(len(pts), n_pad)] = True
    return pad, mask


@pytest.fixture(scope="module")
def setup():
    cfg = _light_cfg()
    ground = flat_ground_map(10, 6, 0.25)
    fmap = build_fused_map(cfg, ground)
    tick, spec, ri_spec, params = make_fused_tick(cfg)
    return cfg, ground, fmap, tick, spec, ri_spec, params


def test_fused_tick_matches_host_glued_chain(setup):
    cfg, ground, fmap, tick, spec, ri_spec, params = setup
    robot_pos = np.array([-4.0, 0.0, 0.0], np.float32)
    robot_quat = np.asarray(quat_from_yaw(jnp.float32(0.0)))
    goal = np.array([4.0, 0.0, 0.0], np.float32)
    offset = np.array([0.0, 0.0, 0.5], np.float32)
    scan, smask = _scan_from_box([-2.0, 0.3, 0.0], robot_pos, offset,
                                 cfg.perception.lidar.max_scan_points)

    state = init_fused_state(cfg, len(ground), robot_xyz=robot_pos)
    state2, out = tick(fmap, state, jnp.asarray(scan), jnp.asarray(smask),
                       jnp.asarray(robot_pos), jnp.asarray(robot_quat),
                       jnp.asarray(offset), jnp.asarray(goal),
                       jnp.float32(0.2), jnp.float32(0.0))

    # --- host-glued chain over the same inputs -------------------------
    sensor_pos = robot_pos + offset
    scan_global = scan + sensor_pos[None, :]
    jit_pu = jax.jit(perception_update, static_argnums=(0, 1, 2))
    marking = jit_pu(spec, ri_spec, params, state.marking, fmap.map_ctx,
                     jnp.asarray(scan_global), jnp.asarray(smask),
                     jnp.asarray(robot_pos), jnp.asarray(robot_quat),
                     jnp.asarray(sensor_pos), jnp.asarray(robot_quat))
    composed = min_dgraph(fmap.static_dgraph, marking.dgraph)
    np.testing.assert_allclose(np.asarray(out.composed_dgraph),
                               np.asarray(composed), atol=1e-5)

    lp, lv = lethal_cloud_from_dgraph(
        fmap.ground, fmap.ground_valid, composed,
        inscribed_radius=cfg.perception.inscribed_radius,
        max_lethal=cfg.global_planner.max_lethal_points)
    rt = GlobalPlannerRuntime(cfg, ground)
    host = rt.plan(robot_pos, goal, composed, lethal_pts=lp, lethal_valid=lv)
    assert host is not None and bool(out.plan_ok)
    pos_h, quat_h = host

    n_dev = int(out.plan.count)
    assert n_dev == len(pos_h), (n_dev, len(pos_h))
    np.testing.assert_allclose(np.asarray(out.plan.positions[:n_dev]),
                               pos_h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.plan.quats[:n_dev]),
                               quat_h, atol=1e-5)

    host_plan = make_global_plan(pos_h, quat_h,
                                 max_len=cfg.local_planner.max_plan_len)
    cmd = compute_velocity_command(
        cfg.local_planner, host_plan, jnp.asarray(robot_pos),
        jnp.asarray(robot_quat), jnp.float32(0.2), jnp.float32(0.0),
        out.obs, out.obs_mask)
    assert int(cmd.state) == int(out.state)
    np.testing.assert_allclose(float(out.vx), float(cmd.vx), atol=1e-6)
    np.testing.assert_allclose(float(out.wz), float(cmd.wz), atol=1e-6)


def test_fused_plan_reacts_to_marked_obstacle(setup):
    """The plan fed to the critics must come from THIS tick's wavefront:
    marking a wall across the straight-line path bends the extracted plan
    around it (the round-2 review's honesty criterion for config 3)."""
    cfg, ground, fmap, tick, *_ = setup
    robot_pos = np.array([-4.0, 0.0, 0.0], np.float32)
    robot_quat = np.asarray(quat_from_yaw(jnp.float32(0.0)))
    goal = np.array([4.0, 0.0, 0.0], np.float32)
    offset = np.array([0.0, 0.0, 0.5], np.float32)
    n_pad = cfg.perception.lidar.max_scan_points

    # tick A: empty scan (enough points to count as fresh is irrelevant
    # here — the program always runs) → straight plan
    empty = np.zeros((n_pad, 3), np.float32)
    emask = np.zeros((n_pad,), bool)
    state = init_fused_state(cfg, len(ground), robot_xyz=robot_pos)
    _, out_free = tick(fmap, state, jnp.asarray(empty), jnp.asarray(emask),
                       jnp.asarray(robot_pos), jnp.asarray(robot_quat),
                       jnp.asarray(offset), jnp.asarray(goal),
                       jnp.float32(0.2), jnp.float32(0.0))
    n_free = int(out_free.plan.count)
    y_free = float(np.abs(np.asarray(out_free.plan.positions[:n_free, 1])).max())

    # tick B: wall across the corridor 1 m ahead (inside the 3.2 m
    # robot-centric voxel window of the light config)
    wall = np.concatenate([
        box_obstacle([-3.0, y, 0.0], size=(0.3, 0.3, 1.2), resolution=0.1)
        for y in (-1.2, -0.6, 0.0, 0.6, 1.2)])
    wall_s = wall - (robot_pos + offset)
    scan = np.zeros((n_pad, 3), np.float32)
    scan[:len(wall_s)] = wall_s[:n_pad]
    smask = np.zeros((n_pad,), bool)
    smask[:min(len(wall_s), n_pad)] = True
    state = init_fused_state(cfg, len(ground), robot_xyz=robot_pos)
    _, out_wall = tick(fmap, state, jnp.asarray(scan), jnp.asarray(smask),
                       jnp.asarray(robot_pos), jnp.asarray(robot_quat),
                       jnp.asarray(offset), jnp.asarray(goal),
                       jnp.float32(0.2), jnp.float32(0.0))
    assert bool(out_wall.plan_ok)
    n_wall = int(out_wall.plan.count)
    y_wall = float(np.abs(np.asarray(out_wall.plan.positions[:n_wall, 1])).max())
    assert y_wall > y_free + 0.5, (y_free, y_wall)
    # and the marked field actually differs where the wall is
    assert float(jnp.min(out_wall.composed_dgraph)) < float(
        jnp.min(out_free.composed_dgraph))


def test_device_observation_one_point_per_voxel():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-2, 2, size=(600, 3)).astype(np.float32)
    mask = rng.random(600) < 0.8
    obs, ok = device_observation(jnp.asarray(pts), jnp.asarray(mask), 1024,
                                 leaf=0.1)
    got = np.asarray(obs)[np.asarray(ok)]
    want_vox = np.unique(np.floor(pts[mask] / 0.1).astype(np.int64), axis=0)
    got_vox = np.unique(np.floor(got / 0.1).astype(np.int64), axis=0)
    assert len(got) == len(want_vox)            # one representative each
    np.testing.assert_array_equal(got_vox, want_vox)
    # every representative is an actual (valid) scan point
    valid_set = {tuple(p) for p in pts[mask].tolist()}
    assert all(tuple(p) in valid_set for p in got.tolist())


def test_fused_state_checkpoint_roundtrip(tmp_path, setup):
    """The fused vertical's state is one pytree — checkpoint/resume rides
    the standard runtime machinery (SURVEY §5 checkpoint row)."""
    from dddmr_navigation_tpu.runtime.checkpoint import (
        save_pytree, restore_pytree)
    from dddmr_navigation_tpu.control.fused import init_fused_state
    cfg, ground, fmap, tick, *_ = setup
    robot = np.array([-4.0, 0.0, 0.0], np.float32)
    quat = np.asarray(quat_from_yaw(jnp.float32(0.0)))
    n_pad = cfg.perception.lidar.max_scan_points
    scan = np.zeros((n_pad, 3), np.float32)
    scan[:50] = np.random.default_rng(0).uniform(
        -1, 1, (50, 3)).astype(np.float32) + [-3.2, 0.3, 0.6]
    mask = np.zeros((n_pad,), bool)
    mask[:50] = True
    state = init_fused_state(cfg, len(ground), robot_xyz=robot)
    state, _ = tick(fmap, state, jnp.asarray(scan), jnp.asarray(mask),
                    jnp.asarray(robot), jnp.asarray(quat),
                    jnp.asarray([0.0, 0.0, 0.5]),
                    jnp.asarray([4.0, 0.0, 0.0]),
                    jnp.float32(0.2), jnp.float32(0.0))
    p = str(tmp_path / "fused_ckpt")
    save_pytree(p, state)
    template = init_fused_state(cfg, len(ground), robot_xyz=robot)
    restored = restore_pytree(p, template)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resuming produces the same next tick as the original
    s1, o1 = tick(fmap, state, jnp.asarray(scan), jnp.asarray(mask),
                  jnp.asarray(robot), jnp.asarray(quat),
                  jnp.asarray([0.0, 0.0, 0.5]), jnp.asarray([4.0, 0.0, 0.0]),
                  jnp.float32(0.2), jnp.float32(0.0))
    s2, o2 = tick(fmap, restored, jnp.asarray(scan), jnp.asarray(mask),
                  jnp.asarray(robot), jnp.asarray(quat),
                  jnp.asarray([0.0, 0.0, 0.5]), jnp.asarray([4.0, 0.0, 0.0]),
                  jnp.float32(0.2), jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(o1.vx), np.asarray(o2.vx))
    np.testing.assert_array_equal(np.asarray(s1.marking.grid),
                                  np.asarray(s2.marking.grid))


@pytest.mark.slow
def test_depth_camera_bends_fused_plan(setup):
    """VERDICT r3 item 8: the DepthCameraLayer runs INSIDE the fused
    program — a depth observation marks its own layer grid, min-composes
    into the stacked dGraph, joins the aggregated observation, and bends
    THIS tick's extracted plan (`perception_3d_ros.cpp:220-249`)."""
    import numpy as np
    from dddmr_navigation_tpu.io.maps import flat_ground_map, box_obstacle
    from dddmr_navigation_tpu.perception.depth_camera import CameraModel
    from dddmr_navigation_tpu.control.fused import (
        build_fused_map, init_fused_state, make_fused_tick)
    from dddmr_navigation_tpu.geometry import quat_from_yaw

    cfg = setup[0]
    ground = flat_ground_map(10, 8, 0.25)
    fmap = build_fused_map(cfg, ground)
    cam = CameraModel()
    tick, spec, ri, params = make_fused_tick(cfg, depth_cam=cam)

    robot = jnp.asarray([-3.5, 0.0, 0.0])
    quat = quat_from_yaw(jnp.float32(0.0))
    goal = jnp.asarray([3.5, 0.0, 0.0])
    offset = jnp.asarray([0.0, 0.0, 0.3])
    n_pad = cfg.perception.lidar.max_scan_points
    empty_scan = jnp.zeros((n_pad, 3))
    empty_mask = jnp.zeros((n_pad,), bool)

    # camera on the robot looking +x; a wall of depth points 1.2 m ahead
    # (inside the 1.6 m marking half-window) spanning the corridor
    wall = box_obstacle([-2.3, 0.0, 0.0], size=(0.15, 1.6, 1.0),
                        resolution=0.1).astype(np.float32)
    P = 512
    dpts = np.zeros((1, P, 3), np.float32)
    dmask = np.zeros((1, P), bool)
    dpts[0, :len(wall)] = wall[:P]
    dmask[0, :min(len(wall), P)] = True
    frames = (jnp.asarray([[-3.5, 0.0, 0.3]]),
              jnp.asarray(np.asarray(quat)[None]),
              jnp.asarray(dpts), jnp.asarray(dmask))

    # without depth: straight-line plan through the wall position
    st0 = init_fused_state(cfg, len(ground), robot_xyz=np.asarray(robot))
    _, out_plain = tick(fmap, st0, empty_scan, empty_mask, robot, quat,
                        offset, goal, jnp.float32(0.3), jnp.float32(0.0))
    assert bool(out_plain.plan_ok)
    plan0 = np.asarray(out_plain.plan.positions)[
        np.asarray(out_plain.plan.valid)]
    seg0 = plan0[(plan0[:, 0] > -2.8) & (plan0[:, 0] < -1.8)]
    assert np.abs(seg0[:, 1]).max() < 0.3      # goes straight through

    # with a depth frame: the layer marks, composes, and the SAME tick's
    # plan routes around the wall
    st1 = init_fused_state(cfg, len(ground), robot_xyz=np.asarray(robot),
                           depth_cameras=1, depth_max_points=P)
    st2, out_depth = tick(fmap, st1, empty_scan, empty_mask, robot, quat,
                          offset, goal, jnp.float32(0.3), jnp.float32(0.0),
                          depth_frames=frames, now=jnp.float32(0.0))
    assert int(jnp.sum(st2.depth_marking.grid)) > 0
    composed = np.asarray(out_depth.composed_dgraph)
    assert (composed < 9000.0).sum() > 20      # depth layer wrote the field
    assert bool(out_depth.plan_ok)
    plan1 = np.asarray(out_depth.plan.positions)[
        np.asarray(out_depth.plan.valid)]
    seg1 = plan1[(plan1[:, 0] > -2.8) & (plan1[:, 0] < -1.8)]
    assert len(seg1) > 0
    assert np.abs(seg1[:, 1]).max() > 0.8      # bent around the wall
    # the critics saw the depth points in the aggregated observation
    obs = np.asarray(out_depth.obs)[np.asarray(out_depth.obs_mask)]
    assert len(obs) > 0
    d_wall = np.linalg.norm(obs[:, None, :2] - wall[None, :, :2], axis=-1)
    assert d_wall.min() < 0.1


@pytest.mark.slow
def test_zone_layers_in_fused_program(setup):
    """The zone layers complete the plugin stack INSIDE the fused program:
    the no-entry field min-composes under its runtime toggle and the
    speed-limit zone caps the sampler (`no_entry_layer.cpp:225-290`,
    `speed_limit_layer.cpp:222-300`)."""
    import numpy as np
    from dddmr_navigation_tpu.io.maps import flat_ground_map
    from dddmr_navigation_tpu.control.fused import (
        build_fused_map, init_fused_state, make_fused_tick)
    from dddmr_navigation_tpu.geometry import quat_from_yaw

    cfg = setup[0]
    ground = flat_ground_map(10, 8, 0.25)
    # no-entry strip across the corridor; speed zone at the start
    ys = np.arange(-1.2, 1.21, 0.1, dtype=np.float32)
    ne = np.stack([np.full_like(ys, -1.0), ys, np.zeros_like(ys)], 1)
    sz = np.stack([np.full(25, -3.5), np.linspace(-0.6, 0.6, 25),
                   np.zeros(25)], 1).astype(np.float32)
    fmap = build_fused_map(cfg, ground, no_entry_zones=ne,
                           speed_zones=(sz, np.full(25, 0.21, np.float32)))
    tick, spec, ri, params = make_fused_tick(cfg)

    robot = jnp.asarray([-3.5, 0.0, 0.0])
    quat = quat_from_yaw(jnp.float32(0.0))
    goal = jnp.asarray([3.5, 0.0, 0.0])
    offset = jnp.asarray([0.0, 0.0, 0.3])
    n_pad = cfg.perception.lidar.max_scan_points
    empty = jnp.zeros((n_pad, 3)); emask = jnp.zeros((n_pad,), bool)

    def run(enabled):
        st = init_fused_state(cfg, len(ground), robot_xyz=np.asarray(robot))
        return tick(fmap, st, empty, emask, robot, quat, offset, goal,
                    jnp.float32(0.2), jnp.float32(0.0),
                    no_entry_enabled=enabled)

    _, out_on = run(True)
    _, out_off = run(False)
    assert bool(out_on.plan_ok) and bool(out_off.plan_ok)
    p_on = np.asarray(out_on.plan.positions)[np.asarray(out_on.plan.valid)]
    p_off = np.asarray(out_off.plan.positions)[np.asarray(out_off.plan.valid)]
    band_on = p_on[(p_on[:, 0] > -1.4) & (p_on[:, 0] < -0.6)]
    band_off = p_off[(p_off[:, 0] > -1.4) & (p_off[:, 0] < -0.6)]
    # toggle ON: the plan routes around the zone; OFF: straight through
    assert np.abs(band_on[:, 1]).max() > 1.0, band_on
    assert np.abs(band_off[:, 1]).max() < 0.4, band_off
    # the composed field carries the zone only when enabled
    assert (np.asarray(out_on.composed_dgraph) < 2.0).sum() \
        > (np.asarray(out_off.composed_dgraph) < 2.0).sum()
    # speed zone at the robot caps the sampled command
    assert float(out_on.vx) <= 0.21 + 1e-5
    assert float(out_on.vx) > 0.0


def test_budgeted_relaxation_amortizes_cold_solve(setup):
    """relax_iters_per_tick: a fresh goal's cold solve spreads across
    control ticks (each tick's relax bounded by the budget, FSM-visible
    plan empty while the field converges), and once converged the plan is
    IDENTICAL to the one-shot solve. The per-tick wall bound on hardware
    follows from the iteration bound (`bench_config3_real`
    new_goal_latency fields); here we assert the iteration contract."""
    cfg, ground, fmap, _, spec, ri_spec, params = setup
    budget = 8
    cfgb = dataclasses.replace(
        cfg, global_planner=dataclasses.replace(
            cfg.global_planner, relax_iters_per_tick=budget))
    from dddmr_navigation_tpu.control.fused import (
        fused_tick, init_fused_state)
    import functools
    tick_b = jax.jit(functools.partial(
        fused_tick, cfgb, spec, ri_spec, params,
        "differential_drive_simple"))
    tick_full = jax.jit(functools.partial(
        fused_tick, cfg, spec, ri_spec, params,
        "differential_drive_simple"))

    robot_pos = np.array([-4.0, 0.0, 0.0], np.float32)
    robot_quat = np.asarray(quat_from_yaw(jnp.float32(0.0)))
    offset = np.array([0.0, 0.0, 0.5], np.float32)
    scan, smask = _scan_from_box([-2.0, 0.8, 0.0], robot_pos, offset,
                                 cfg.perception.lidar.max_scan_points)
    args = (jnp.asarray(scan), jnp.asarray(smask), jnp.asarray(robot_pos),
            jnp.asarray(robot_quat), jnp.asarray(offset))

    goal_a = jnp.asarray([4.0, 0.0, 0.0])
    goal_b = jnp.asarray([4.0, 2.0, 0.0])

    # converge on goal A under the budget
    state = init_fused_state(cfgb, len(ground), robot_xyz=robot_pos)
    for _ in range(40):
        state, out = tick_b(fmap, state, *args, goal_a,
                            jnp.float32(0.2), jnp.float32(0.0))
        assert int(out.wf_iters) <= budget          # contract: bounded tick
        if bool(out.plan_ok):
            break
    assert bool(out.plan_ok)

    # switch to goal B mid-run: ticks stay bounded; plan empty while the
    # new field spreads; converges within ceil(cold_iters/budget) ticks
    ticks_to_ok = 0
    for _ in range(60):
        state, out = tick_b(fmap, state, *args, goal_b,
                            jnp.float32(0.2), jnp.float32(0.0))
        assert int(out.wf_iters) <= budget
        ticks_to_ok += 1
        if bool(out.plan_ok):
            break
    assert bool(out.plan_ok), "budgeted solve never converged on goal B"
    assert ticks_to_ok > 1, "goal change should take >1 budgeted tick"

    # run to full convergence, then compare against the one-shot path
    for _ in range(20):
        state, out = tick_b(fmap, state, *args, goal_b,
                            jnp.float32(0.2), jnp.float32(0.0))
    sfull = init_fused_state(cfg, len(ground), robot_xyz=robot_pos)
    sfull, out_full = tick_full(fmap, sfull, *args, goal_b,
                                jnp.float32(0.2), jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out.plan.positions),
                               np.asarray(out_full.plan.positions),
                               atol=1e-5)
    assert int(out.plan.count) == int(out_full.plan.count)


def test_fleet_interpolation_matches_per_robot(setup):
    """fleet_interpolate_path_device (flat-scatter batched) must be
    emission-for-emission identical to interpolate_path_device."""
    import jax
    from dddmr_navigation_tpu.control.fused import (
        interpolate_path_device, fleet_interpolate_path_device)
    from dddmr_navigation_tpu.planning.global_.planner import (
        GlobalPathResult)
    cfg, ground, fmap, _, _, _, _ = setup
    rng = np.random.default_rng(0)
    L, R = 64, 5
    rows = []
    for r in range(R):
        n = int(rng.integers(2, 40))
        ids = rng.integers(0, len(ground), size=L).astype(np.int32)
        valid = np.arange(L) < n
        rows.append(GlobalPathResult(
            node_ids=jnp.asarray(ids), node_valid=jnp.asarray(valid),
            length=jnp.asarray(n, jnp.int32), ok=jnp.asarray(True),
            dist_to_goal=jnp.zeros(3), dist_carry=jnp.zeros(3),
            goal_idx=jnp.asarray(0, jnp.int32),
            iters=jnp.asarray(1, jnp.int32)))
    res_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *rows)
    batched = fleet_interpolate_path_device(fmap.ground, res_b,
                                            max_plan_len=128)
    for r in range(R):
        solo = interpolate_path_device(fmap.ground, rows[r],
                                       max_plan_len=128)
        np.testing.assert_array_equal(np.asarray(batched.valid[r]),
                                      np.asarray(solo.valid))
        np.testing.assert_allclose(np.asarray(batched.positions[r]),
                                   np.asarray(solo.positions), atol=0)
        assert int(batched.count[r]) == int(solo.count)
