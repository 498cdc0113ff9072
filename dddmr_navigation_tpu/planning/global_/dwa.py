"""Dynamic-window-aware global planning: full plan + windowed replan/splice.

Re-designs `DWA_GlobalPlanner` (`dynamic_window_aware_global_planner.cpp:
100-288`):

  * `request()` ≙ `makePlan`: a NEW goal (exact pose equality test,
    `:115-131`) triggers a full plan which is cached; a STALE goal returns
    the cached spliced path without replanning (`:183-189`);
    `activate_threading=False` stops the recompute timer (`:146-151`).
  * `recompute()` ≙ `determineDWAPlan` (`:192-288`), run at
    `recompute_frequency`: nearest cached-path point to the robot, walk
    `look_ahead_distance` of arc (+1 m while the tentative local goal is
    blocked: no ground within 0.25 m, or any ground node within 0.25 m
    lethal per the min dGraph), plan start→local-goal, splice with the
    cached global tail. The reference appends the final pose twice
    (`:285-286` pushes `poses.back()` after the tail loop already included
    it) — reproduced for parity; duplicate terminal poses are harmless to
    every consumer.

The blocked-walk is one fused device computation (pairwise plan×ground
distance matrix + vectorized pivot search over all +1 m shifts) instead of
the reference's per-step KD-tree loop.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dddmr_navigation_tpu.config import (
    GlobalPlannerConfig, DWAGlobalPlannerConfig)
from dddmr_navigation_tpu.planning.global_.graph import build_ground_graph
from dddmr_navigation_tpu.planning.global_.planner import (
    plan_on_graph, path_to_poses)


def dwa_pivot(plan_pos, plan_valid, robot_pos, ground, ground_valid, dgraph,
              *, look_ahead_distance: float, inscribed_radius: float,
              max_shifts: int = 100, ground_match_radius: float = 0.25):
    """Index into the cached plan of the DWA local goal (jittable).

    Mirrors the `determineDWAPlan` walk: start at the nearest plan pose,
    advance ``look_ahead_distance`` of arc length, then shift forward in
    +1 m steps while the tentative goal is blocked; the path end is always
    acceptable. Returns (pivot_index, nearest_index).
    """
    big = jnp.float32(jnp.inf)
    d = jnp.linalg.norm(plan_pos - robot_pos, axis=-1)
    d = jnp.where(plan_valid, d, big)
    i0 = jnp.argmin(d)

    seg = jnp.linalg.norm(jnp.diff(plan_pos, axis=0), axis=-1)
    seg = jnp.where(plan_valid[1:] & plan_valid[:-1], seg, 0.0)
    cum = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(seg)])
    count = jnp.sum(plan_valid)
    last = jnp.maximum(count - 1, 0)

    # per-plan-pose blocked flags: one (P, G) distance matrix
    gp = jnp.where(ground_valid[:, None], ground, 1e6)
    a2 = jnp.sum(plan_pos * plan_pos, axis=-1)
    b2 = jnp.sum(gp * gp, axis=-1)
    cross = jnp.dot(plan_pos, gp.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = a2[:, None] + b2[None, :] - 2.0 * cross
    near = d2 <= ground_match_radius ** 2
    no_ground = ~jnp.any(near, axis=-1)
    lethal_near = jnp.any(near & (dgraph[None, :] < inscribed_radius), axis=-1)
    blocked = (no_ground | lethal_near) & plan_valid

    # vectorized +1 m shift search
    shifts = jnp.arange(max_shifts, dtype=jnp.float32)
    targets = cum[i0] + look_ahead_distance + shifts          # (M,)
    idx = jnp.searchsorted(cum, targets)                      # (M,)
    idx = jnp.minimum(idx, last)
    at_end = idx >= last
    ok = at_end | ~blocked[idx]
    first = jnp.argmax(ok)                                    # first True
    pivot = jnp.where(jnp.any(ok), idx[first], last)
    return pivot, i0


class CachedPlan(NamedTuple):
    positions: np.ndarray
    quats: np.ndarray


class DWAGlobalPlanManager:
    """Host-side DWA planner state machine over a `GlobalPlannerRuntime`."""

    def __init__(self, runtime, dwa_cfg: DWAGlobalPlannerConfig):
        self.rt = runtime
        self.cfg = dwa_cfg
        self.current_goal = None          # (pos(3,), quat(4,)) np arrays
        self.global_path: Optional[CachedPlan] = None
        self.dwa_path: Optional[CachedPlan] = None
        self.threading_active = False
        self.last_recompute_t = -1e9
        self._jit_pivot = jax.jit(partial(
            dwa_pivot,
            look_ahead_distance=dwa_cfg.look_ahead_distance,
            inscribed_radius=runtime.inscribed_radius))

    def _is_new_goal(self, goal_pos, goal_quat) -> bool:
        if self.current_goal is None:
            return True
        p, q = self.current_goal
        return not (np.array_equal(p, goal_pos) and np.array_equal(q, goal_quat))

    def request(self, goal_pos, goal_quat, robot_pos, dgraph,
                activate_threading: bool = True,
                lethal_pts=None, lethal_valid=None) -> Optional[CachedPlan]:
        """`makePlan` handler. Returns the path to hand the controller
        (None = planning failed / no cache)."""
        goal_pos = np.asarray(goal_pos, np.float32)
        goal_quat = np.asarray(goal_quat, np.float32)
        if not activate_threading:
            # `:146-151`: stop recompute, succeed without touching caches.
            self.threading_active = False
            return self.dwa_path or self.global_path
        if self._is_new_goal(goal_pos, goal_quat):
            full = self.rt.plan(robot_pos, goal_pos, dgraph,
                                lethal_pts=lethal_pts,
                                lethal_valid=lethal_valid)
            if full is None:
                return None
            self.current_goal = (goal_pos, goal_quat)
            self.global_path = CachedPlan(*full)
            self.dwa_path = None
            self.threading_active = True
            return self.global_path
        # stale goal → cached spliced path (`:183-189`)
        return self.dwa_path or self.global_path

    def maybe_recompute(self, robot_pos, dgraph, now: float,
                        lethal_pts=None, lethal_valid=None):
        """Run `determineDWAPlan` when the recompute timer elapses.
        Returns the current best path (spliced when recomputed)."""
        if (self.threading_active and self.global_path is not None
                and now - self.last_recompute_t
                >= 1.0 / self.cfg.recompute_frequency):
            self.last_recompute_t = now
            self._recompute(robot_pos, dgraph, lethal_pts, lethal_valid)
        return self.dwa_path or self.global_path

    def _recompute(self, robot_pos, dgraph, lethal_pts, lethal_valid):
        gp = self.global_path
        n = len(gp.positions)
        max_len = self.rt.cfg.max_path_len
        pos_pad = np.zeros((max_len, 3), np.float32)
        take = min(n, max_len)
        pos_pad[:take] = gp.positions[:take]
        valid = np.zeros((max_len,), bool)
        valid[:take] = True
        pivot, _ = self._jit_pivot(
            jnp.asarray(pos_pad), jnp.asarray(valid),
            jnp.asarray(robot_pos, jnp.float32),
            self.rt.ground_dev, self.rt.ground_valid_dev,
            jnp.asarray(dgraph))
        pivot = int(pivot)
        local_goal = gp.positions[min(pivot, take - 1)]
        window = self.rt.plan(robot_pos, local_goal, dgraph,
                              lethal_pts=lethal_pts,
                              lethal_valid=lethal_valid)
        if window is None:
            return  # keep previous cache (reference keeps global_dwa_path_)
        wpos, wquat = window
        # splice: window + cached tail from pivot (+ duplicated final pose,
        # reproducing `:285-286`)
        tail_pos = gp.positions[pivot:]
        tail_quat = gp.quats[pivot:]
        pos = np.concatenate([wpos, tail_pos, gp.positions[-1:]])
        quat = np.concatenate([wquat, tail_quat, gp.quats[-1:]])
        self.dwa_path = CachedPlan(pos.astype(np.float32),
                                   quat.astype(np.float32))
