"""The p2p move-base driver: goal → plan → control loop → cmd_vel.

Host-side orchestration (the reference's `P2PMoveBase` node +
`P2PGlobalPlanManager`, `p2p_move_base.cpp` / `p2p_global_plan_manager.cpp`)
around the jitted device kernels: global-plan queries at
`global_plan_query_frequency`, the FSM step, local-planner ticks with the
generator the FSM selects, and recovery sub-behavior. Everything
device-side is batched/jitted; this class is the "DDS role" — thin
sequencing + wall-clock.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from dddmr_navigation_tpu.config import NavigationConfig
from dddmr_navigation_tpu.geometry import quat_from_yaw, yaw_from_quat
from dddmr_navigation_tpu.planning.local.planner import (
    GlobalPlan, make_global_plan, compute_velocity_command, goal_reached,
    initial_heading_deviation, goal_heading_deviation, PlannerState)
from dddmr_navigation_tpu.planning.global_.graph import build_ground_graph
from dddmr_navigation_tpu.planning.global_.planner import (
    plan_on_graph, path_to_poses)
from dddmr_navigation_tpu.perception.layers import path_blocked
from dddmr_navigation_tpu.control.fsm import (
    Decision, CmdSource, FSMInputs, init_fsm_state, fsm_step)
from dddmr_navigation_tpu.control.recovery import (
    start_rotate_recovery, rotate_recovery_step)


class MoveBaseDriver:
    """One robot's navigation session over a loaded map."""

    def __init__(self, cfg: NavigationConfig, ground: np.ndarray,
                 node_weight: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.ground = np.asarray(ground, np.float32)
        g = len(self.ground)
        self.node_weight = (np.zeros(g, np.float32) if node_weight is None
                            else node_weight)
        self.graph = build_ground_graph(
            self.ground, radius=cfg.global_planner.a_star_expanding_radius,
            k_max=cfg.perception.static_layer.max_ground_neighbors)
        self.dgraph = jnp.full((g,), cfg.perception.max_obstacle_distance)

        self._jit_plan = jax.jit(partial(
            plan_on_graph, cfg.global_planner,
            inscribed_radius=cfg.perception.inscribed_radius,
            inflation_descending_rate=cfg.perception.inflation_descending_rate))
        self._jit_cmd = jax.jit(compute_velocity_command,
                                static_argnums=(0, 10))
        self._jit_fsm = jax.jit(fsm_step, static_argnums=(0,))
        self._jit_recovery = jax.jit(rotate_recovery_step, static_argnums=(0,))
        self._jit_heading = jax.jit(initial_heading_deviation,
                                    static_argnums=(0,))

        self.fsm = init_fsm_state()
        self.plan: Optional[GlobalPlan] = None
        self.pending_plan = None
        self.goal = None
        self.recovery = None
        self.recovery_succeed = False
        self.last_query_t = -1e9

    def set_goal(self, goal_pos, now=0.0):
        self.goal = jnp.asarray(goal_pos, jnp.float32)
        self.fsm = init_fsm_state(now)
        self.plan = None
        self.recovery = None

    def set_dgraph(self, dgraph):
        self.dgraph = jnp.asarray(dgraph)

    def _query_plan(self, robot_pos):
        res = self._jit_plan(
            jnp.asarray(self.graph.nbr_idx), jnp.asarray(self.graph.nbr_dist),
            jnp.asarray(self.graph.nbr_valid), jnp.asarray(self.ground),
            jnp.ones(len(self.ground), bool), self.dgraph,
            jnp.asarray(self.node_weight),
            jnp.asarray(self.graph.avg_intensity),
            jnp.asarray(robot_pos), self.goal)
        if bool(res.ok):
            pos, quats = path_to_poses(self.cfg.global_planner, self.ground,
                                       res)
            if len(pos) >= 1:
                n = min(len(pos), self.cfg.local_planner.max_plan_len)
                return make_global_plan(pos[:n], quats[:n],
                                        max_len=self.cfg.local_planner.max_plan_len)
        return "empty"

    def tick(self, robot_pos, robot_quat, v, w, obstacles, obs_valid, now):
        """One controller cycle. Returns (vx, wz, decision, done, succeeded)."""
        lcfg = self.cfg.local_planner
        robot_pos = jnp.asarray(robot_pos, jnp.float32)
        robot_quat = jnp.asarray(robot_quat, jnp.float32)

        # --- recovery sub-loop preempts everything ---
        if self.recovery is not None:
            rec, wz, done, failed = self._jit_recovery(
                lcfg, self.recovery, robot_pos, robot_quat, obstacles,
                obs_valid)
            if bool(done) or bool(failed):
                self.recovery = None
                self.recovery_succeed = bool(done) and not bool(failed)
            else:
                self.recovery = rec
            return 0.0, float(wz), Decision(int(self.fsm.decision)), False, False

        # --- global plan manager (`p2p_global_plan_manager.cpp:108-132`) ---
        has_new_plan = False
        plan_empty = False
        if (self.goal is not None
                and int(self.fsm.decision) in (Decision.D_PLANNING_WAITDONE,
                                               Decision.D_CONTROLLING,
                                               Decision.D_WAITING)
                and now - self.last_query_t
                >= 1.0 / self.cfg.move_base.global_plan_query_frequency):
            self.last_query_t = now
            result = self._query_plan(np.asarray(robot_pos))
            if result == "empty":
                has_new_plan, plan_empty = True, True
            else:
                self.plan = result
                has_new_plan = True

        plan = self.plan
        if plan is None:
            plan_for_cmd = make_global_plan(
                np.zeros((3, 3), np.float32), max_len=lcfg.max_plan_len)
            plan_for_cmd = plan_for_cmd._replace(
                valid=jnp.zeros_like(plan_for_cmd.valid),
                count=jnp.asarray(0, jnp.int32))
        else:
            plan_for_cmd = plan

        # --- predicates + both generator commands ---
        hd, init_aligned, _ = self._jit_heading(lcfg, plan_for_cmd, robot_pos,
                                                robot_quat)
        ghd, goal_aligned = goal_heading_deviation(lcfg, plan_for_cmd,
                                                   robot_quat)
        reached = goal_reached(lcfg, plan_for_cmd, robot_pos)

        cmd_simple = self._jit_cmd(lcfg, plan_for_cmd, robot_pos, robot_quat,
                                   jnp.float32(v), jnp.float32(w), obstacles,
                                   obs_valid, jnp.float32(-1.0),
                                   jnp.float32(0.0))
        in_goal_align = int(self.fsm.decision) == Decision.D_ALIGN_GOAL_HEADING
        rot_hd = ghd if in_goal_align else hd
        cmd_rotate = self._jit_cmd(lcfg, plan_for_cmd, robot_pos, robot_quat,
                                   jnp.float32(v), jnp.float32(w), obstacles,
                                   obs_valid, jnp.float32(-1.0),
                                   jnp.float32(rot_hd),
                                   "differential_drive_rotate_shortest_angle")

        # path-blocked opinion overrides TRAJECTORY_FOUND
        # (`local_planner.cpp:597-608`)
        ps_simple = int(cmd_simple.state)
        if ps_simple == PlannerState.TRAJECTORY_FOUND and bool(path_blocked(
                cmd_simple.prune, obstacles, obs_valid,
                self.cfg.perception.path_blocked_check_radius)):
            ps_simple = int(PlannerState.PATH_BLOCKED_WAIT)

        x = FSMInputs(
            now=jnp.asarray(now, jnp.float32), robot_pos=robot_pos,
            robot_yaw=yaw_from_quat(robot_quat),
            has_new_plan=jnp.asarray(has_new_plan),
            plan_empty=jnp.asarray(plan_empty),
            goal_reached=reached,
            initial_heading_aligned=init_aligned,
            goal_heading_aligned=goal_aligned,
            ps_simple=jnp.asarray(ps_simple, jnp.int32),
            ps_rotate=cmd_rotate.state,
            recovery_active=jnp.asarray(self.recovery is not None),
            recovery_succeed=jnp.asarray(self.recovery_succeed))
        self.fsm, out = self._jit_fsm(self.cfg.move_base, self.fsm, x)

        if bool(out.request_recovery):
            self.recovery = start_rotate_recovery(robot_quat)
            self.recovery_succeed = False

        src = int(out.cmd_source)
        if src == CmdSource.SIMPLE:
            vx, wz = float(cmd_simple.vx), float(cmd_simple.wz)
        elif src == CmdSource.ROTATE:
            vx, wz = float(cmd_rotate.vx), float(cmd_rotate.wz)
        else:
            vx, wz = 0.0, 0.0
        return vx, wz, Decision(int(self.fsm.decision)), bool(out.done), bool(
            out.succeeded)
