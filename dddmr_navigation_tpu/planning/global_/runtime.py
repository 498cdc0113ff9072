"""Host wrapper owning one map's planning context (the analogue of the
reference `GlobalPlanner` node's synced ground/graph state,
`global_planner.cpp:156-176`): ground cloud + precomputed neighbor table +
static weights live on device; `plan()` runs the jitted snap→relax→extract
program and converts to interpolated poses.

Shared by `MoveBaseDriver` (direct queries) and `DWAGlobalPlanManager`
(full plan + windowed replans)."""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dddmr_navigation_tpu.config import NavigationConfig
from dddmr_navigation_tpu.planning.global_.graph import build_ground_graph
from dddmr_navigation_tpu.planning.global_.planner import (
    plan_on_graph, path_to_poses)


class GlobalPlannerRuntime:
    def __init__(self, cfg: NavigationConfig, ground: np.ndarray,
                 node_weight: Optional[np.ndarray] = None,
                 intensity: Optional[np.ndarray] = None):
        self.nav_cfg = cfg
        self.cfg = cfg.global_planner
        self.inscribed_radius = cfg.perception.inscribed_radius
        self.ground = np.asarray(ground, np.float32)
        g = len(self.ground)
        self.node_weight = (np.zeros(g, np.float32) if node_weight is None
                            else np.asarray(node_weight, np.float32))
        self.graph = build_ground_graph(
            self.ground, radius=self.cfg.a_star_expanding_radius,
            k_max=cfg.perception.static_layer.max_ground_neighbors,
            intensity=intensity)

        self.ground_dev = jnp.asarray(self.ground)
        self.ground_valid_dev = jnp.ones((g,), bool)
        self._nbr_idx = jnp.asarray(self.graph.nbr_idx)
        self._nbr_dist = jnp.asarray(self.graph.nbr_dist)
        self._nbr_valid = jnp.asarray(self.graph.nbr_valid)
        self._avg_int = jnp.asarray(self.graph.avg_intensity)
        self._node_weight = jnp.asarray(self.node_weight)

        common = partial(
            plan_on_graph, self.cfg,
            inscribed_radius=cfg.perception.inscribed_radius,
            inflation_descending_rate=cfg.perception.inflation_descending_rate)
        self._jit_plan = jax.jit(common)
        self._jit_plan_lethal = jax.jit(
            lambda *a, lethal_pts, lethal_valid: common(
                *a, lethal_pts=lethal_pts, lethal_valid=lethal_valid))

    def plan_result(self, start_pos, goal_pos, dgraph,
                    lethal_pts=None, lethal_valid=None):
        args = (self._nbr_idx, self._nbr_dist, self._nbr_valid,
                self.ground_dev, self.ground_valid_dev,
                jnp.asarray(dgraph), self._node_weight, self._avg_int,
                jnp.asarray(start_pos, jnp.float32),
                jnp.asarray(goal_pos, jnp.float32))
        if lethal_pts is None:
            return self._jit_plan(*args)
        return self._jit_plan_lethal(*args, lethal_pts=jnp.asarray(lethal_pts),
                                     lethal_valid=jnp.asarray(lethal_valid))

    def plan(self, start_pos, goal_pos, dgraph,
             lethal_pts=None, lethal_valid=None):
        """Plan → (positions (M,3), quats (M,4)) or None on failure."""
        res = self.plan_result(start_pos, goal_pos, dgraph,
                               lethal_pts, lethal_valid)
        if not bool(res.ok):
            return None
        pos, quats = path_to_poses(self.cfg, self.ground, res)
        if len(pos) < 1:
            return None
        return pos, quats
