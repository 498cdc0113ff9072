"""Multi-level world: stacked floors, ramp connectivity, overhang lethal,
z-disambiguation, and cross-floor navigation (the reference's flagship
go2 multi-level demo, `src/dddmr_beginner_guide/README.md:9-60`;
overhang z-passthrough `static_layer.cpp:201-231`)."""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from dddmr_navigation_tpu.config import (
    NavigationConfig, PerceptionConfig, SpinningLidarConfig,
    LocalPlannerConfig, DDSimpleGeneratorConfig)
from dddmr_navigation_tpu.geometry import quat_from_yaw
from dddmr_navigation_tpu.io.maps import multi_level_map
from dddmr_navigation_tpu.perception.static_weights import compute_node_weights
from dddmr_navigation_tpu.perception.voxel import (
    VoxelSpec, world_to_cell, window_origin_for)
from dddmr_navigation_tpu.perception.marking import (
    MarkingParams, update_dgraph)
from dddmr_navigation_tpu.perception.static_map import build_map_context
from dddmr_navigation_tpu.planning.global_.graph import build_ground_graph
from dddmr_navigation_tpu.planning.global_.planner import plan_on_graph
from dddmr_navigation_tpu.config import GlobalPlannerConfig


@pytest.fixture(scope="module")
def world():
    ground, map_pts = multi_level_map()
    weights, static_dgraph = compute_node_weights(ground, map_pts)
    return ground, map_pts, weights, static_dgraph


def test_overhang_lethal_only_under_the_duct(world):
    """The low duct (0.6 m clearance) trips the z-passthrough lethal; the
    stacked floor B (2.5 m clearance) must NOT (`static_layer.cpp:201-231`:
    box z+0.1..z+1.0)."""
    ground, _, _, sd = world
    under_duct = ((ground[:, 2] == 0.0)
                  & (ground[:, 0] >= 4.3) & (ground[:, 0] <= 5.7)
                  & (ground[:, 1] >= 0.3) & (ground[:, 1] <= 3.7))
    assert under_duct.sum() > 20
    assert (sd[under_duct] == 0.25).all(), "duct region not lethal"
    floor_b = ground[:, 2] == 2.5
    clear_a = ((ground[:, 2] == 0.0)
               & ((ground[:, 0] < 3.4) | (ground[:, 0] > 6.6)))
    assert (sd[floor_b] > 1.0).all(), "stacked floor wrongly lethal"
    assert (sd[clear_a] > 1.0).all()


def _plan(ground, weights, static_dgraph, start, goal, gcfg=None):
    import jax
    gcfg = gcfg or GlobalPlannerConfig()
    graph = build_ground_graph(ground, radius=0.5, k_max=16)
    g = len(ground)
    res = jax.jit(lambda *a: plan_on_graph(
        gcfg, *a, inscribed_radius=0.5, inflation_descending_rate=2.0))(
        jnp.asarray(graph.nbr_idx), jnp.asarray(graph.nbr_dist),
        jnp.asarray(graph.nbr_valid), jnp.asarray(ground),
        jnp.ones((g,), bool), jnp.asarray(static_dgraph),
        jnp.asarray(weights), jnp.asarray(graph.avg_intensity),
        jnp.asarray(start, jnp.float32), jnp.asarray(goal, jnp.float32))
    ids = np.asarray(res.node_ids)[np.asarray(res.node_valid)]
    return res, ground[ids] if len(ids) else np.zeros((0, 3))


def test_cross_floor_plan_climbs_the_ramp(world):
    """Floor A → directly-overhead floor B goal: the path must traverse
    the ramp band (y > floor_y) and span the full height."""
    ground, _, weights, sd = world
    res, path = _plan(ground, weights, sd,
                      [8.5, 7.0, 0.0], [8.5, 7.0, 2.5])
    assert bool(res.ok), "cross-floor plan failed"
    assert path[:, 2].min() <= 0.01 and path[:, 2].max() >= 2.49
    assert path[:, 1].max() > 8.1, "path never used the ramp band"
    # monotone-ish climb: no jump discontinuity (adjacent nodes ≤0.6 apart)
    steps = np.linalg.norm(np.diff(path, axis=0), axis=1)
    assert steps.max() < 0.75, f"path teleports between levels: {steps.max()}"


def test_plan_routes_around_duct(world):
    """On-floor plan through the duct strip must deviate around the
    overhang lethal region."""
    ground, _, weights, sd = world
    res, path = _plan(ground, weights, sd, [1.0, 2.0, 0.0], [9.0, 2.0, 0.0])
    assert bool(res.ok)
    # never enters the lethal strip
    in_duct = ((path[:, 2] < 0.1) & (path[:, 0] > 4.2) & (path[:, 0] < 5.8)
               & (path[:, 1] < 3.8) & (path[:, 1] > 0.2))
    assert not in_duct.any(), "plan crosses the overhang lethal region"
    assert path[:, 1].max() > 4.0, "plan did not detour around the duct"


def test_marked_obstacle_does_not_leak_across_floors(world):
    """z-disambiguation: a dynamic mark on floor A must not write distance
    values into the stacked floor B nodes directly above (3D
    inflation-radius gate, `cluster_marking.cpp:49-96`)."""
    ground, _, _, _ = world
    params = MarkingParams()
    spec = VoxelSpec(nx=64, ny=64, nz=24, xy_resolution=0.1,
                     height_resolution=0.1)
    robot = jnp.asarray([5.0, 2.0, 0.0], jnp.float32)
    quat = jnp.asarray(np.asarray(quat_from_yaw(jnp.float32(0.0))))
    origin = window_origin_for(spec, robot)
    grid = jnp.zeros((spec.nx, spec.ny, spec.nz), jnp.uint8)
    # mark a column at (5.5, 2.0, 0.2..0.8) on floor A
    for z in (0.2, 0.5, 0.8):
        c = world_to_cell(spec, jnp.asarray([5.5, 2.0, z])) - origin
        grid = grid.at[c[0], c[1], c[2]].set(1)
    map_ctx = build_map_context(ground)
    dg0 = jnp.full((len(ground),), params.max_obstacle_distance)
    dg = np.asarray(update_dgraph(spec, params, grid, origin, dg0, map_ctx,
                                  robot, quat))
    near_a = ((ground[:, 2] == 0.0)
              & (np.linalg.norm(ground[:, :2] - [5.5, 2.0], axis=1) < 1.0))
    above_b = ((ground[:, 2] == 2.5)
               & (np.linalg.norm(ground[:, :2] - [5.5, 2.0], axis=1) < 1.0))
    assert (dg[near_a] < 1.2).any(), "mark did not reach floor A nodes"
    assert (dg[above_b] >= params.max_obstacle_distance - 1e-3).all(), \
        "mark leaked through the floor to the level above"


@pytest.mark.slow
def test_cross_floor_navigation_e2e(world):
    """Full NavigationSession drive from floor A to a goal on floor B
    directly above a floor-A region — reachable only via the ramp."""
    from dddmr_navigation_tpu.control.session import NavigationSession
    from dddmr_navigation_tpu.utils.lidar_sim import BoxWorld, simulate_scan

    ground, map_pts, weights, sd = world
    lidar = SpinningLidarConfig(
        xy_resolution=0.1, height_resolution=0.1,
        range_image_rows=16, range_image_cols=180,
        vertical_FOV_bottom=-30.0, vertical_FOV_top=30.0,
        scan_effective_positive_start=0.0,
        scan_effective_negative_start=0.0)
    perception = PerceptionConfig(lidar=lidar, voxel_window_cells_xy=48,
                                  voxel_window_cells_z=24,
                                  max_marked_voxels=512)
    lp = LocalPlannerConfig(
        generator=DDSimpleGeneratorConfig(
            linear_x_sample=6, angular_z_sample=10, max_num_steps=30),
        max_obstacle_points=512, collision_obstacle_chunk=16,
        collision_near_k=64)
    cfg = NavigationConfig(local_planner=lp, perception=perception)
    sess = NavigationSession(cfg, ground, map_pts=map_pts,
                             node_weight=weights, static_dgraph=sd)
    goal = [8.5, 7.0, 2.5]
    sess.set_goal(goal)

    room = BoxWorld.room(half=14.0, wall_h=6.0)
    pos = np.array([8.5, 7.0, 0.0], np.float32)
    yaw, v, w = 0.0, 0.0, 0.0
    dt = 0.1
    done = ok = False
    for i in range(900):
        quat = np.asarray(quat_from_yaw(jnp.float32(yaw)))
        pts, mask = simulate_scan(room, pos + [0, 0, 0.5], sensor_yaw=yaw,
                                  n_rings=8, n_cols=90, v_bottom=-30.0,
                                  v_top=30.0, max_range=15.0)
        # ground removal (the lidar layer's input is LeGO-LOAM's segmented
        # ground-free cloud, SURVEY §3.2): drop z=0-plane returns
        mask = mask & (pts[:, 2] + pos[2] + 0.5 >= 0.15)
        vx, wz, dec, done, ok = sess.tick(pts, mask, pos, quat, v, w,
                                          now=i * dt)
        if done:
            break
        v, w = vx, wz
        pos = pos + np.array([v * np.cos(yaw) * dt,
                              v * np.sin(yaw) * dt, 0.0], np.float32)
        yaw = float(yaw + w * dt)
        # stick to the (3D-nearest) ground surface — floor membership
        # follows continuity, exactly what stacked floors stress
        d3 = np.linalg.norm(ground - pos, axis=1)
        pos[2] = ground[np.argmin(d3), 2]
    assert done and ok, f"never reached cross-floor goal; pos={pos}"
    assert abs(pos[2] - 2.5) < 0.3, f"finished on the wrong floor: {pos}"
