"""Parity harness against the reference's REAL bundled assets.

BASELINE.md's behavior-parity row is "cmd_vel parity with
dddmr_local_planner on recorded 3D maps". The reference ships its demo map
(`src/dddmr_perception_3d/map/{map,ground}.pcd` — a 124 m outdoor slope,
27k ground nodes / 62k map points) and the canonical 347-line deployment
config (`src/dddmr_p2p_move_base/config/p2p_move_base_localization.yaml`).
This module loads those actual artifacts and drives:

  * the ground graph + static node weights on the real map,
  * wavefront cost-to-goal vs the reference-faithful Dijkstra oracle,
  * full local-planner tick sequences along a real planned path,
    comparing (vx, wz, best_cost) against the sequential NumPy oracle
    that mirrors the C++ math (`tests/oracles/local_planner_oracle.py`).

Used by `tests/test_parity_reference_map.py` (assertions) and
`tools/make_parity_report.py` (the per-round PARITY artifact).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import numpy as np

REF = "/root/reference/src"
GROUND_PCD = f"{REF}/dddmr_perception_3d/map/ground.pcd"
MAP_PCD = f"{REF}/dddmr_perception_3d/map/map.pcd"
CANON_YAML = f"{REF}/dddmr_p2p_move_base/config/p2p_move_base_localization.yaml"


def assets_available() -> bool:
    return all(os.path.exists(p) for p in (GROUND_PCD, MAP_PCD, CANON_YAML))


@dataclass
class ReferenceContext:
    cfg: object                  # NavigationConfig from the canonical YAML
    ground: np.ndarray           # (G, 3)
    ground_intensity: np.ndarray # (G,)
    map_pts: np.ndarray          # (M, 3)
    graph: object                # GroundGraph
    node_weight: np.ndarray      # (G,)
    static_dgraph: np.ndarray    # (G,)
    main_cc: np.ndarray          # node ids of the largest weak component


def load_context(with_static_weights: bool = True) -> ReferenceContext:
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    from dddmr_navigation_tpu.io.pcd import read_pcd
    from dddmr_navigation_tpu.config import load_yaml_config
    from dddmr_navigation_tpu.planning.global_.graph import build_ground_graph
    from dddmr_navigation_tpu.perception.static_weights import (
        compute_node_weights)

    cfg = load_yaml_config(CANON_YAML)
    ground4 = read_pcd(GROUND_PCD)
    map4 = read_pcd(MAP_PCD)
    ground = ground4[:, :3]
    g = len(ground)

    graph = build_ground_graph(
        ground, radius=cfg.global_planner.a_star_expanding_radius,
        k_max=cfg.perception.static_layer.max_ground_neighbors,
        intensity=ground4[:, 3])

    if with_static_weights:
        node_weight, static_dgraph = compute_node_weights(
            ground, map4[:, :3], cfg.perception.static_layer,
            cfg.perception.max_obstacle_distance)
    else:
        node_weight = np.zeros((g,), np.float32)
        static_dgraph = np.full((g,), cfg.perception.max_obstacle_distance,
                                np.float32)

    rows = np.repeat(np.arange(g), graph.nbr_idx.shape[1])
    mask = graph.nbr_valid.ravel()
    adj = coo_matrix((np.ones(mask.sum()),
                      (rows[mask], graph.nbr_idx.ravel()[mask])),
                     shape=(g, g))
    _, lbl = connected_components(adj, directed=True, connection="weak")
    main = np.argmax(np.bincount(lbl))
    return ReferenceContext(
        cfg=cfg, ground=ground, ground_intensity=ground4[:, 3],
        map_pts=map4[:, :3], graph=graph,
        node_weight=np.asarray(node_weight, np.float32),
        static_dgraph=np.asarray(static_dgraph, np.float32),
        main_cc=np.where(lbl == main)[0])


def pick_start_goal_pairs(ctx: ReferenceContext, n_pairs: int, seed: int = 0,
                          min_separation: float = 20.0):
    """Deterministic start/goal node pairs inside the main component,
    at least ``min_separation`` apart and non-lethal in the static field."""
    rng = np.random.default_rng(seed)
    inscribed = ctx.cfg.perception.inscribed_radius
    ok = ctx.main_cc[(ctx.static_dgraph[ctx.main_cc] >= inscribed)
                     & (ctx.node_weight[ctx.main_cc] < 1000.0)]
    pairs = []
    attempts = 0
    while len(pairs) < n_pairs and attempts < 200:
        attempts += 1
        s, t = rng.choice(ok, 2, replace=False)
        if np.linalg.norm(ctx.ground[s] - ctx.ground[t]) >= min_separation:
            pairs.append((int(s), int(t)))
    return pairs


def global_field_parity(ctx: ReferenceContext, goal_idx: int,
                        dgraph: np.ndarray | None = None):
    """Wavefront distances vs the Dijkstra oracle on the real map.

    Returns (max_abs_diff, n_reachable, wavefront_iters)."""
    import jax.numpy as jnp
    from dddmr_navigation_tpu.planning.global_.wavefront import (
        node_costs, wavefront_distances)
    from tests.oracles.global_planner_oracle import dijkstra, enter_cost

    p = ctx.cfg.perception
    if dgraph is None:
        dgraph = np.minimum(ctx.static_dgraph, p.max_obstacle_distance)
    enter_np = enter_cost(dgraph, ctx.node_weight, p.inscribed_radius,
                          p.inflation_descending_rate)
    wf = wavefront_distances(
        jnp.asarray(ctx.graph.nbr_idx), jnp.asarray(ctx.graph.nbr_dist),
        jnp.asarray(ctx.graph.nbr_valid), jnp.asarray(enter_np),
        jnp.asarray(ctx.graph.avg_intensity), jnp.asarray(goal_idx),
        max_iters=4096)
    dist = np.asarray(wf.dist)
    oracle = dijkstra(ctx.graph.nbr_idx, ctx.graph.nbr_dist,
                      ctx.graph.nbr_valid, enter_np,
                      ctx.graph.avg_intensity, goal_idx)
    both = np.isfinite(dist) & np.isfinite(oracle)
    same_support = np.array_equal(np.isfinite(dist), np.isfinite(oracle))
    max_diff = float(np.max(np.abs(dist[both] - oracle[both]))) if both.any() else 0.0
    return {
        "max_abs_diff": max_diff,
        "same_support": bool(same_support),
        "reachable": int(both.sum()),
        "iters": int(wf.iters),
        "dist": dist,
    }


def plan_real_path(ctx: ReferenceContext, start_idx: int, goal_idx: int):
    """Full jitted plan on the real map → interpolated pose list."""
    import jax
    import jax.numpy as jnp
    from dddmr_navigation_tpu.planning.global_.planner import (
        plan_on_graph, path_to_poses)

    p = ctx.cfg.perception
    jit_plan = jax.jit(partial(
        plan_on_graph, ctx.cfg.global_planner,
        inscribed_radius=p.inscribed_radius,
        inflation_descending_rate=p.inflation_descending_rate))
    g = len(ctx.ground)
    res = jit_plan(jnp.asarray(ctx.graph.nbr_idx),
                   jnp.asarray(ctx.graph.nbr_dist),
                   jnp.asarray(ctx.graph.nbr_valid),
                   jnp.asarray(ctx.ground), jnp.ones(g, bool),
                   jnp.asarray(ctx.static_dgraph),
                   jnp.asarray(ctx.node_weight),
                   jnp.asarray(ctx.graph.avg_intensity),
                   jnp.asarray(ctx.ground[start_idx]),
                   jnp.asarray(ctx.ground[goal_idx]))
    if not bool(res.ok):
        return None
    return path_to_poses(ctx.cfg.global_planner, ctx.ground, res)


def nearby_obstacles(ctx: ReferenceContext, robot_pos: np.ndarray,
                     n_max: int, radius: float = 5.0):
    """Deterministic obstacle observation from the REAL map cloud: points
    within ``radius`` of the robot and 0.1–2.0 m above its base plane
    (the live-scan analogue the local vertical feeds the critics)."""
    rel = ctx.map_pts - robot_pos
    d = np.linalg.norm(rel, axis=1)
    keep = (d <= radius) & (rel[:, 2] >= 0.1) & (rel[:, 2] <= 2.0)
    pts = ctx.map_pts[keep]
    if len(pts) > n_max:
        stride = int(np.ceil(len(pts) / n_max))
        pts = pts[::stride][:n_max]
    return np.asarray(pts, np.float32)


def cmdvel_parity(ctx: ReferenceContext, positions: np.ndarray,
                  quats: np.ndarray, n_ticks: int = 8,
                  n_obstacles: int = 64, stride_m: float = 0.4):
    """Walk the robot along a REAL planned path and compare every control
    tick's (vx, wz, best_cost) between the jitted kernel and the C++-math
    oracle, with obstacle observations sampled from the real map cloud.

    Returns a dict of per-tick deltas and states.
    """
    import jax
    import jax.numpy as jnp
    from dddmr_navigation_tpu.planning.local.planner import (
        compute_velocity_command, make_global_plan, PlannerState)
    from tests.oracles import local_planner_oracle as oracle

    lcfg = ctx.cfg.local_planner
    tick_fn = jax.jit(compute_velocity_command, static_argnums=(0, 10))

    n = min(len(positions), lcfg.max_plan_len)
    plan_pts = np.asarray(positions[:n], np.float32)
    plan_quats = np.asarray(quats[:n], np.float32)
    plan = make_global_plan(plan_pts, plan_quats, max_len=lcfg.max_plan_len)

    # Tick poses: advance ~stride_m of arc length per tick along the plan.
    seg = np.linalg.norm(np.diff(plan_pts, axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    rows = []
    v_now, w_now = 0.0, 0.0
    max_obs_pad = lcfg.max_obstacle_points
    for t in range(n_ticks):
        arc = t * stride_m
        i = int(np.searchsorted(cum, arc))
        if i >= n - 3:
            break
        robot_pos = plan_pts[i]
        robot_quat = plan_quats[i]
        obstacles = nearby_obstacles(ctx, robot_pos, n_obstacles)
        obs = np.zeros((max_obs_pad, 3), np.float32)
        obs[:len(obstacles)] = obstacles
        obs_mask = np.zeros((max_obs_pad,), bool)
        obs_mask[:len(obstacles)] = True

        cmd = tick_fn(lcfg, plan, jnp.asarray(robot_pos),
                      jnp.asarray(robot_quat), jnp.float32(v_now),
                      jnp.float32(w_now), jnp.asarray(obs),
                      jnp.asarray(obs_mask), -1.0, 0.0)
        o_vx, o_w, o_cost, _ = oracle.compute_velocity_command_oracle(
            lcfg, plan_pts.astype(np.float64), plan_quats.astype(np.float64),
            robot_pos.astype(np.float64), robot_quat.astype(np.float64),
            v_now, w_now, obstacles.astype(np.float64).reshape(-1, 3))
        rows.append({
            "tick": t,
            "n_obstacles": int(len(obstacles)),
            "vx": float(cmd.vx), "wz": float(cmd.wz),
            "o_vx": o_vx, "o_wz": o_w,
            "d_vx": abs(float(cmd.vx) - o_vx),
            "d_wz": abs(float(cmd.wz) - o_w),
            "d_cost": abs(float(cmd.best_cost) - o_cost),
            "state": int(cmd.state),
            "found": int(cmd.state) == int(PlannerState.TRAJECTORY_FOUND),
        })
        # closed loop on the kernel's command (identical inputs next tick
        # either way — the oracle consumes the same v_now/w_now)
        v_now, w_now = float(cmd.vx), float(cmd.wz)
    return rows


def raycast_scan_from_map(ctx: ReferenceContext, sensor_pos: np.ndarray,
                          n_rings: int = 16, n_cols: int = 360,
                          v_bottom: float = -15.0, v_top: float = 15.0,
                          max_range: float = 12.0, hit_radius: float = 0.2):
    """Simulate one lidar sweep against the REAL map cloud: rays march at
    ``hit_radius`` steps and return at the first map point within
    ``hit_radius`` (host cKDTree; fixture-quality, like dummy_pc_pub).
    Returns (points (R·C, 3) sensor-frame, mask)."""
    from scipy.spatial import cKDTree
    tree = cKDTree(ctx.map_pts)
    elev = np.radians(np.linspace(v_bottom, v_top, n_rings))
    azim = np.linspace(-np.pi, np.pi, n_cols, endpoint=False)
    E, A = np.meshgrid(elev, azim, indexing="ij")
    dirs = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A),
                     np.sin(E)], -1).reshape(-1, 3)
    n = len(dirs)
    t = np.full((n,), np.inf, np.float32)
    alive = np.ones((n,), bool)
    r = hit_radius
    while r < max_range and alive.any():
        pts = sensor_pos[None, :] + dirs[alive] * r
        d, _ = tree.query(pts, k=1, distance_upper_bound=hit_radius)
        hit = np.isfinite(d)
        idx = np.where(alive)[0]
        t[idx[hit]] = r
        alive[idx[hit]] = False
        r += hit_radius
    mask = np.isfinite(t)
    pts = dirs * np.where(mask, t, 0.0)[:, None]
    return pts.astype(np.float32), mask


# ---------------------------------------------------------------------------
# Dynamic-scene parity: toggling wall + forced recovery on the real map
# ---------------------------------------------------------------------------

def marking_oracle_dgraph(ctx, wall_pts, robot_pos, robot_quat, spec,
                          inflation_radius, max_obstacle_distance,
                          marking_height=2.0):
    """C++-math oracle of the marking distance field for ONE cluster
    (`cluster_marking.cpp:49-123` + the voxel truncation of
    `multilayer_spinning_lidar.cpp:426-428`): truncate wall points to
    voxel keys (toward zero), keep in-window cells within the marking
    height band, project the representatives onto the robot base plane,
    and per ground node record the min XY distance of projected points
    within the 3D ``inflation_radius``. Returns a full (G,) field
    (non-written nodes = ``max_obstacle_distance``)."""
    g = len(ctx.ground)
    out = np.full((g,), max_obstacle_distance, np.float64)
    if len(wall_pts) == 0:
        return out
    res_xy, res_z = spec.xy_resolution, spec.height_resolution
    cells = np.stack([
        np.trunc(wall_pts[:, 0] / res_xy),
        np.trunc(wall_pts[:, 1] / res_xy),
        np.trunc(wall_pts[:, 2] / res_z)], 1).astype(np.int64)
    robot_cell = np.array([
        np.trunc(robot_pos[0] / res_xy), np.trunc(robot_pos[1] / res_xy),
        np.trunc(robot_pos[2] / res_z)], np.int64)
    origin = robot_cell - np.array([spec.nx // 2, spec.ny // 2, spec.nz // 2])
    local = cells - origin
    rel_z = wall_pts[:, 2] - robot_pos[2]
    ok = ((local[:, 0] >= 0) & (local[:, 0] < spec.nx)
          & (local[:, 1] >= 0) & (local[:, 1] < spec.ny)
          & (local[:, 2] >= 0) & (local[:, 2] < spec.nz)
          & (rel_z >= 0.0) & (rel_z <= marking_height))
    cells = np.unique(cells[ok], axis=0)
    if len(cells) == 0:
        return out
    reps = cells.astype(np.float64) * np.array([res_xy, res_xy, res_z])

    # project onto the robot base plane (`cluster_marking.cpp:54-60`)
    from dddmr_navigation_tpu.geometry import quat_rotate
    import jax.numpy as jnp
    normal = np.asarray(quat_rotate(jnp.asarray(robot_quat, jnp.float32),
                                    jnp.asarray([0.0, 0.0, 1.0])), np.float64)
    offs = (reps - robot_pos) @ normal
    proj = reps - offs[:, None] * normal[None, :]

    # per ground node: min XY distance of projected points in 3D radius
    from scipy.spatial import cKDTree
    tree = cKDTree(proj)
    pairs = tree.query_ball_point(ctx.ground.astype(np.float64),
                                  inflation_radius)
    for i, idxs in enumerate(pairs):
        if idxs:
            d = np.hypot(proj[idxs, 0] - ctx.ground[i, 0],
                         proj[idxs, 1] - ctx.ground[i, 1])
            out[i] = d.min()
    return out


def dynamic_wall_parity(ctx, seed=0, phase_len=30, query_every=2):
    """The `dummy_pc_pub` cycle on the REAL map, 4 phases × ``phase_len``
    ticks: wall → mark + replan-around; gone → clear + replan-through;
    wall again → re-mark; trap ring → ALL_TRAJECTORIES_FAIL → forced
    recovery. Per tick the harness compares, against sequential
    C++-math oracles:

      * the marked distance field (device mark/clear vs
        `marking_oracle_dgraph`),
      * cmd_vel/best_cost (jitted tick vs `local_planner_oracle`) on the
        CURRENT phase's replanned path,
      * the FSM decision stream (jittable `fsm_step` vs `FSMOracle`).

    Returns {"phases": [...], "fsm_mismatches": n, "rows": per-tick}.
    """
    import jax
    import jax.numpy as jnp
    from dddmr_navigation_tpu.geometry import quat_from_yaw, yaw_from_quat
    from dddmr_navigation_tpu.io.maps import box_obstacle
    from dddmr_navigation_tpu.perception.voxel import VoxelSpec
    from dddmr_navigation_tpu.perception.fov import RangeImageSpec
    from dddmr_navigation_tpu.perception.static_map import build_map_context
    from dddmr_navigation_tpu.perception.marking import (
        MarkingParams, init_marking_state, perception_update)
    from dddmr_navigation_tpu.perception.layers import min_dgraph, path_blocked
    from dddmr_navigation_tpu.planning.global_.wavefront import (
        node_costs, wavefront_distances)
    from dddmr_navigation_tpu.planning.global_.planner import (
        plan_on_graph, path_to_poses)
    from dddmr_navigation_tpu.planning.local.planner import (
        compute_velocity_command, make_global_plan, PlannerState,
        goal_reached, initial_heading_deviation, goal_heading_deviation)
    from dddmr_navigation_tpu.control.fsm import (
        fsm_step, init_fsm_state, FSMInputs, Decision)
    from tests.oracles import local_planner_oracle as lp_oracle
    from tests.oracles.global_planner_oracle import dijkstra, enter_cost
    from tests.oracles.fsm_oracle import FSMOracle

    cfg = ctx.cfg
    p = cfg.perception
    lcfg = cfg.local_planner

    # sensor geometry: full-circle effective scan (the synthetic wall has
    # no mast shadow; canonical YAML's ±30° dead zone is sensor-specific)
    # cluster_iters=64: the trap ring is ~88 cells around — propagation
    # must converge it into ONE cluster so the centroid-FOV rejection
    # matches PCL's single-cluster extraction (the advisor's round-2
    # convergence caveat, exercised here deliberately)
    params = MarkingParams.from_config(p)._replace(
        scan_effective_positive_start=0.0,
        scan_effective_negative_start=0.0,
        cluster_iters=64)
    spec = VoxelSpec(nx=96, ny=96, nz=44,
                     xy_resolution=p.lidar.xy_resolution,
                     height_resolution=p.lidar.height_resolution)
    ri = RangeImageSpec(rows=16, cols=360,
                        elev_min_deg=p.lidar.vertical_FOV_bottom,
                        elev_max_deg=p.lidar.vertical_FOV_top)
    map_ctx = build_map_context(ctx.ground, None)   # no static-match gate

    pairs = pick_start_goal_pairs(ctx, 1, seed=seed, min_separation=15.0)
    start_idx, goal_idx = pairs[0]
    robot_pos = ctx.ground[start_idx].astype(np.float32)
    goal_pos = ctx.ground[goal_idx].astype(np.float32)
    to_goal = goal_pos - robot_pos
    yaw = float(np.arctan2(to_goal[1], to_goal[0]))
    robot_quat = np.asarray(quat_from_yaw(jnp.float32(yaw)), np.float32)
    sensor_pos = robot_pos + np.array([0, 0, 0.5], np.float32)

    # wall across the path ~2.2 m ahead, perpendicular to the heading
    ahead = robot_pos + 2.2 * np.array(
        [np.cos(yaw), np.sin(yaw), 0.0], np.float32)
    perp = np.array([-np.sin(yaw), np.cos(yaw), 0.0], np.float32)
    wall = np.concatenate([
        box_obstacle(ahead + t * perp, size=(0.3, 0.3, 1.2), resolution=0.1)
        for t in (-0.9, -0.45, 0.0, 0.45, 0.9)]).astype(np.float32)
    # trap ring for the forced-recovery phase: a tight circle of points
    ring_az = np.linspace(-np.pi, np.pi, 48, endpoint=False)
    trap = np.stack([robot_pos[0] + 0.7 * np.cos(ring_az),
                     robot_pos[1] + 0.7 * np.sin(ring_az),
                     np.full(48, robot_pos[2] + 0.4)], 1).astype(np.float32)
    far_ring = np.stack([robot_pos[0] + 10.0 * np.cos(ring_az),
                         robot_pos[1] + 10.0 * np.sin(ring_az),
                         np.full(48, robot_pos[2] + 0.5)], 1).astype(np.float32)

    n_scan = 4096
    def make_scan(*clouds):
        pts = np.concatenate(clouds) if clouds else np.zeros((0, 3), np.float32)
        pts = pts - sensor_pos[None, :]         # sensor frame
        buf = np.zeros((n_scan, 3), np.float32)
        m = np.zeros((n_scan,), bool)
        buf[:len(pts)] = pts[:n_scan]
        m[:min(len(pts), n_scan)] = True
        return buf, m

    jit_pu = jax.jit(perception_update, static_argnums=(0, 1, 2))
    jit_cmd = jax.jit(compute_velocity_command, static_argnums=(0, 10))
    jit_fsm = jax.jit(fsm_step, static_argnums=(0,))
    jit_plan = jax.jit(partial(
        plan_on_graph, cfg.global_planner,
        inscribed_radius=p.inscribed_radius,
        inflation_descending_rate=p.inflation_descending_rate))

    g = len(ctx.ground)
    marking = init_marking_state(spec, params, g, jnp.asarray(robot_pos))
    static_f = jnp.asarray(np.minimum(ctx.static_dgraph,
                                      p.max_obstacle_distance))
    # short patiences so the trap phase reaches the timeout->recovery arc
    # within the phase (both sides use the same values)
    import dataclasses
    mb_cfg = dataclasses.replace(cfg.move_base, controller_patience=1.0,
                                 waiting_patience=1.0)
    fsm = init_fsm_state(0.0)
    fsm_oracle = FSMOracle(mb_cfg, 0.0)

    dt = 1.0 / cfg.move_base.controller_frequency
    phases = [("wall", (wall, far_ring)), ("clear", (far_ring,)),
              ("wall2", (wall, far_ring)), ("trap", (trap, far_ring))]
    rows = []
    phase_stats = []
    fsm_mismatch = 0
    plan = None
    plan_pts = plan_quats = None
    v_now = w_now = 0.0
    recovery_active = False
    recovery_ticks = 0
    t = 0

    for phase_name, clouds in phases:
        d_field_max = 0.0
        d_vx_max = d_wz_max = d_cost_max = 0.0
        state_mismatch = 0
        cloud_world = np.concatenate(clouds)
        scan, smask = make_scan(*clouds)
        for k in range(phase_len):
            now = t * dt
            # --- device perception ---
            marking = jit_pu(spec, ri, params, marking, map_ctx,
                             jnp.asarray(scan) + jnp.asarray(sensor_pos),
                             jnp.asarray(smask), jnp.asarray(robot_pos),
                             jnp.asarray(robot_quat), jnp.asarray(sensor_pos),
                             jnp.asarray(robot_quat))
            composed = min_dgraph(static_f, marking.dgraph)

            # --- marking-field oracle (dynamic layer only) ---
            # trap phase: the surrounding ring clusters into one blob whose
            # centroid voxel sits at the sensor and FAILS the centroid-FOV
            # gate (`multilayer_spinning_lidar.cpp:369-432`), so the
            # reference marks NOTHING from it — the oracle expectation is
            # an empty field near the trap
            mark_cloud = wall if phase_name in ("wall", "wall2") else \
                np.zeros((0, 3), np.float32)
            o_dyn = marking_oracle_dgraph(
                ctx, mark_cloud, robot_pos.astype(np.float64),
                robot_quat.astype(np.float64), spec, p.inflation_radius,
                p.max_obstacle_distance)
            dev_dyn = np.asarray(marking.dgraph, np.float64)
            if phase_name == "trap":
                # compare only near the trap (old wall marks 2.2 m out are
                # legitimately KEPT by occlusion, which the distance-math
                # oracle doesn't model); expectation there: NO marks on
                # either side (centroid-FOV rejection)
                from scipy.spatial import cKDTree as _KD
                near_trap = _KD(trap).query(ctx.ground, k=1)[0] <= 1.2
                # ...minus the kept (occluded) wall marks' inflation reach
                near_trap &= _KD(wall).query(ctx.ground, k=1)[0] \
                    > p.inflation_radius + 0.1
                d_field = float(np.max(np.abs(
                    dev_dyn[near_trap] - o_dyn[near_trap]))) \
                    if near_trap.any() else 0.0
            else:
                d_field = float(np.max(np.abs(dev_dyn - o_dyn)))
            d_field_max = max(d_field_max, d_field)

            # --- replan at the query cadence on the composed field ---
            if t % query_every == 0 or plan is None:
                res = jit_plan(
                    jnp.asarray(ctx.graph.nbr_idx),
                    jnp.asarray(ctx.graph.nbr_dist),
                    jnp.asarray(ctx.graph.nbr_valid),
                    jnp.asarray(ctx.ground), jnp.ones(g, bool),
                    composed, jnp.asarray(ctx.node_weight),
                    jnp.asarray(ctx.graph.avg_intensity),
                    jnp.asarray(robot_pos), jnp.asarray(goal_pos))
                if bool(res.ok):
                    plan_pts, plan_quats = path_to_poses(
                        cfg.global_planner, ctx.ground, res)
                    n = min(len(plan_pts), lcfg.max_plan_len)
                    plan_pts, plan_quats = plan_pts[:n], plan_quats[:n]
                    plan = make_global_plan(plan_pts, plan_quats,
                                            max_len=lcfg.max_plan_len)

            # --- observation for the critics: the live cloud ---
            obs_pts = cloud_world[np.linalg.norm(
                cloud_world - robot_pos, axis=1) <= 5.0]
            obs = np.zeros((lcfg.max_obstacle_points, 3), np.float32)
            obs[:len(obs_pts)] = obs_pts[:lcfg.max_obstacle_points]
            obs_m = np.zeros((lcfg.max_obstacle_points,), bool)
            obs_m[:min(len(obs_pts), lcfg.max_obstacle_points)] = True

            # --- cmd parity on the current plan ---
            cmd = jit_cmd(lcfg, plan, jnp.asarray(robot_pos),
                          jnp.asarray(robot_quat), jnp.float32(v_now),
                          jnp.float32(w_now), jnp.asarray(obs),
                          jnp.asarray(obs_m), -1.0, 0.0)
            o_vx, o_wz, o_cost, _ = \
                lp_oracle.compute_velocity_command_oracle(
                    lcfg, plan_pts.astype(np.float64),
                    plan_quats.astype(np.float64),
                    robot_pos.astype(np.float64),
                    robot_quat.astype(np.float64), v_now, w_now,
                    obs_pts.astype(np.float64).reshape(-1, 3))
            _, o_prune_ok = lp_oracle.prune_plan_oracle(
                plan_pts.astype(np.float64), robot_pos.astype(np.float64),
                lcfg.forward_prune, lcfg.backward_prune)
            o_state = (int(PlannerState.PRUNE_PLAN_FAIL) if not o_prune_ok
                       else (int(PlannerState.TRAJECTORY_FOUND) if o_cost >= 0
                             else int(PlannerState.ALL_TRAJECTORIES_FAIL)))
            d_vx_max = max(d_vx_max, abs(float(cmd.vx) - o_vx))
            d_wz_max = max(d_wz_max, abs(float(cmd.wz) - o_wz))
            if float(cmd.best_cost) >= 0 and o_cost >= 0:
                d_cost_max = max(d_cost_max, abs(float(cmd.best_cost) - o_cost))
            if int(cmd.state) != int(o_state):
                state_mismatch += 1

            # --- FSM parity: both sides get the SAME inputs ---
            ps_simple = int(cmd.state)
            if ps_simple == int(PlannerState.TRAJECTORY_FOUND) and bool(
                    path_blocked(cmd.prune, jnp.asarray(obs),
                                 jnp.asarray(obs_m),
                                 p.path_blocked_check_radius)):
                ps_simple = int(PlannerState.PATH_BLOCKED_WAIT)
            hd, init_aligned, _ = initial_heading_deviation(
                lcfg, plan, jnp.asarray(robot_pos), jnp.asarray(robot_quat))
            ghd, goal_aligned = goal_heading_deviation(
                lcfg, plan, jnp.asarray(robot_quat))
            reached = goal_reached(lcfg, plan, jnp.asarray(robot_pos))
            has_new = t % query_every == 0
            if recovery_active:
                recovery_ticks -= 1
                if recovery_ticks <= 0:
                    recovery_active = False
            inputs = dict(
                now=now, robot_pos=robot_pos, robot_yaw=yaw,
                has_new_plan=has_new, plan_empty=plan is None,
                goal_reached=bool(reached),
                initial_heading_aligned=bool(init_aligned),
                goal_heading_aligned=bool(goal_aligned),
                ps_simple=ps_simple, ps_rotate=int(PlannerState.TRAJECTORY_FOUND),
                recovery_active=recovery_active, recovery_succeed=True)
            x = FSMInputs(
                now=jnp.asarray(now, jnp.float32),
                robot_pos=jnp.asarray(robot_pos),
                robot_yaw=jnp.asarray(yaw, jnp.float32),
                has_new_plan=jnp.asarray(has_new),
                plan_empty=jnp.asarray(plan is None),
                goal_reached=reached,
                initial_heading_aligned=jnp.asarray(bool(init_aligned)),
                goal_heading_aligned=jnp.asarray(bool(goal_aligned)),
                ps_simple=jnp.asarray(ps_simple, jnp.int32),
                ps_rotate=jnp.asarray(int(PlannerState.TRAJECTORY_FOUND),
                                      jnp.int32),
                recovery_active=jnp.asarray(recovery_active),
                recovery_succeed=jnp.asarray(True))
            fsm, out = jit_fsm(mb_cfg, fsm, x)
            o_out = fsm_oracle.step(**inputs)
            if int(fsm.decision) != o_out["decision"]:
                fsm_mismatch += 1
            if bool(out.request_recovery) and not recovery_active:
                recovery_active = True
                recovery_ticks = 5
            rows.append({
                "t": t, "phase": phase_name,
                "decision": int(fsm.decision),
                "o_decision": o_out["decision"],
                "ps_simple": ps_simple, "d_field": d_field,
                "vx": float(cmd.vx), "o_vx": o_vx,
            })
            v_now, w_now = float(cmd.vx), float(cmd.wz)
            # synthetic rotate actuator: in align states turn toward the
            # plan heading so the FSM progresses (the robot base stays
            # put — this harness holds position and turns in place)
            from dddmr_navigation_tpu.control.fsm import Decision as _D
            if int(fsm.decision) in (int(_D.D_ALIGN_HEADING),
                                     int(_D.D_ALIGN_GOAL_HEADING)):
                yaw = float(yaw + np.clip(float(hd), -0.12, 0.12))
                robot_quat = np.asarray(quat_from_yaw(jnp.float32(yaw)),
                                        np.float32)
            t += 1

        # field parity at the phase boundary (same dgraph both sides)
        enter_np = enter_cost(np.asarray(composed), ctx.node_weight,
                              p.inscribed_radius,
                              p.inflation_descending_rate)
        wf = wavefront_distances(
            jnp.asarray(ctx.graph.nbr_idx), jnp.asarray(ctx.graph.nbr_dist),
            jnp.asarray(ctx.graph.nbr_valid), jnp.asarray(enter_np),
            jnp.asarray(ctx.graph.avg_intensity), jnp.asarray(goal_idx),
            max_iters=4096)
        oracle_d = dijkstra(ctx.graph.nbr_idx, ctx.graph.nbr_dist,
                            ctx.graph.nbr_valid, enter_np,
                            ctx.graph.avg_intensity, goal_idx)
        dev_d = np.asarray(wf.dist)
        both = np.isfinite(dev_d) & np.isfinite(oracle_d)
        phase_stats.append({
            "phase": phase_name,
            "d_marking_field_max": d_field_max,
            "d_vx_max": d_vx_max, "d_wz_max": d_wz_max,
            "d_cost_max": d_cost_max,
            "cmd_state_mismatches": state_mismatch,
            "wavefront_vs_dijkstra_max": float(
                np.max(np.abs(dev_d[both] - oracle_d[both]))) if both.any()
                else 0.0,
            "support_equal": bool(np.array_equal(np.isfinite(dev_d),
                                                 np.isfinite(oracle_d))),
        })

    saw_recovery = any(r["decision"] == int(Decision.D_RECOVERY_WAITDONE)
                       for r in rows)
    return {"phases": phase_stats, "fsm_mismatches": fsm_mismatch,
            "ticks": t, "saw_recovery": saw_recovery, "rows": rows}
