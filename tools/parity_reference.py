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
