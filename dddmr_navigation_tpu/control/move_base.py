"""The p2p move-base driver: goal → plan → control loop → cmd_vel.

Host-side orchestration (the reference's `P2PMoveBase` node +
`P2PGlobalPlanManager`, `p2p_move_base.cpp` / `p2p_global_plan_manager.cpp`)
around the jitted device kernels: global-plan queries through a
:class:`SyncPlanManager`/:class:`AsyncPlanManager` (DWA windowed replans
included), the FSM step, local-planner ticks with the generator the FSM
selects, recovery sub-behavior, and the host failure gates
(sensor freshness ⇒ PERCEPTION_MALFUNCTION, TF age ⇒ TF_FAIL —
`local_planner.cpp:482-524`). Everything device-side is batched/jitted;
this class is the "DDS role" — thin sequencing + wall-clock.
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
from dddmr_navigation_tpu.planning.global_.runtime import GlobalPlannerRuntime
from dddmr_navigation_tpu.planning.global_.dwa import DWAGlobalPlanManager
from dddmr_navigation_tpu.control.plan_manager import (
    SyncPlanManager, AsyncPlanManager)
from dddmr_navigation_tpu.perception.layers import path_blocked
from dddmr_navigation_tpu.control.fsm import (
    Decision, CmdSource, FSMInputs, init_fsm_state, fsm_step)
from dddmr_navigation_tpu.control.recovery import (
    start_rotate_recovery, rotate_recovery_step)


class MoveBaseDriver:
    """One robot's navigation session over a loaded map."""

    def __init__(self, cfg: NavigationConfig, ground: np.ndarray,
                 node_weight: Optional[np.ndarray] = None,
                 intensity: Optional[np.ndarray] = None,
                 threaded_plan_manager: bool = False,
                 runtime: Optional[GlobalPlannerRuntime] = None):
        self.cfg = cfg
        self.runtime = runtime or GlobalPlannerRuntime(
            cfg, ground, node_weight, intensity)
        self.ground = self.runtime.ground
        self.graph = self.runtime.graph
        g = len(self.ground)
        self.dgraph = jnp.full((g,), cfg.perception.max_obstacle_distance)
        self.lethal_pts = None
        self.lethal_valid = None

        dwa = DWAGlobalPlanManager(self.runtime, cfg.dwa_global_planner)
        manager_cls = (AsyncPlanManager if threaded_plan_manager
                       else SyncPlanManager)
        self.plan_manager = manager_cls(
            dwa, cfg.move_base.global_plan_query_frequency,
            action=cfg.move_base.global_planner_action_name)

        self._jit_cmd = jax.jit(compute_velocity_command,
                                static_argnums=(0, 10))
        self._jit_fsm = jax.jit(fsm_step, static_argnums=(0,))
        self._jit_recovery = jax.jit(rotate_recovery_step, static_argnums=(0,))
        self._jit_heading = jax.jit(initial_heading_deviation,
                                    static_argnums=(0,))

        self.fsm = init_fsm_state()
        self.plan: Optional[GlobalPlan] = None
        self.goal = None
        self.recovery = None
        self.recovery_succeed = False

    def close(self):
        """Shut down the plan-manager worker thread (no-op when sync)."""
        close = getattr(self.plan_manager, "close", None)
        if close is not None:
            close()

    def set_goal(self, goal_pos, now=0.0, goal_quat=None):
        self.goal = jnp.asarray(goal_pos, jnp.float32)
        if goal_quat is None:
            goal_quat = np.asarray([0.0, 0.0, 0.0, 1.0], np.float32)
        self.fsm = init_fsm_state(now)
        self.plan = None
        self.recovery = None
        self.plan_manager.set_goal(np.asarray(goal_pos, np.float32),
                                   np.asarray(goal_quat, np.float32))

    def set_dgraph(self, dgraph):
        self.dgraph = jnp.asarray(dgraph)

    def set_lethal(self, lethal_pts, lethal_valid):
        """Aggregated lethal cloud for the planner's long-edge LOS check
        (`stacked_perception.cpp:142-155` → `a_star_on_pc.cpp:168-198`)."""
        self.lethal_pts = None if lethal_pts is None else jnp.asarray(lethal_pts)
        self.lethal_valid = (None if lethal_valid is None
                             else jnp.asarray(lethal_valid))

    def _gate_tick(self, code: int, now: float):
        """Feed the FSM a host-gate PlannerState (zero velocity, stay) —
        the reference's early returns at `local_planner.cpp:482-524` with
        `p2p_move_base.cpp:495-503` zero-velocity handling."""
        x = FSMInputs(
            now=jnp.asarray(now, jnp.float32),
            robot_pos=jnp.zeros((3,), jnp.float32),
            robot_yaw=jnp.asarray(0.0, jnp.float32),
            has_new_plan=jnp.asarray(False), plan_empty=jnp.asarray(False),
            goal_reached=jnp.asarray(False),
            initial_heading_aligned=jnp.asarray(False),
            goal_heading_aligned=jnp.asarray(False),
            ps_simple=jnp.asarray(code, jnp.int32),
            ps_rotate=jnp.asarray(code, jnp.int32),
            recovery_active=jnp.asarray(self.recovery is not None),
            recovery_succeed=jnp.asarray(self.recovery_succeed))
        self.fsm, out = self._jit_fsm(self.cfg.move_base, self.fsm, x)
        return (0.0, 0.0, Decision(int(self.fsm.decision)), bool(out.done),
                bool(out.succeeded))

    def tick(self, robot_pos, robot_quat, v, w, obstacles, obs_valid, now,
             sensor_ok: bool = True, tf_ok: bool = True,
             allowed_max_speed: float = -1.0):
        """One controller cycle. Returns (vx, wz, decision, done, succeeded).

        ``sensor_ok``/``tf_ok`` are the host freshness gates
        (`StackedPerception::isSensorOK` / TF-age ≤ 2 s); when either
        fails the base is not commanded, matching the reference's
        safety behavior. ``allowed_max_speed`` is the speed-limit layer's
        cap (-1 = unlimited, `speed_limit_layer.cpp:222-300`).
        """
        lcfg = self.cfg.local_planner
        robot_pos = jnp.asarray(robot_pos, jnp.float32)
        robot_quat = jnp.asarray(robot_quat, jnp.float32)

        # --- host failure gates (`local_planner.cpp:482-524`) ---
        if not tf_ok:
            return self._gate_tick(int(PlannerState.TF_FAIL), now)
        if not sensor_ok:
            return self._gate_tick(int(PlannerState.PERCEPTION_MALFUNCTION),
                                   now)

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

        # --- global plan manager (sync or threaded) ---
        # The reference's GPM query thread runs at 5 Hz through EVERY
        # decision state once started (`p2p_global_plan_manager.cpp:83-132`);
        # plans are only ADOPTED in planning_waitdone / controlling
        # (`p2p_move_base.cpp:286-303,469-489`). Keep the queries warm in
        # the align states too so a fresh plan is ready the moment the FSM
        # re-enters controlling.
        has_new_plan = False
        plan_empty = False
        decision_q = int(self.fsm.decision)
        if (self.goal is not None
                and decision_q in (Decision.D_PLANNING_WAITDONE,
                                   Decision.D_CONTROLLING,
                                   Decision.D_WAITING,
                                   Decision.D_ALIGN_HEADING,
                                   Decision.D_ALIGN_GOAL_HEADING)):
            self.plan_manager.offer(
                np.asarray(robot_pos), self.dgraph, now,
                lethal_pts=self.lethal_pts, lethal_valid=self.lethal_valid)
        if (self.goal is not None
                and decision_q in (Decision.D_PLANNING_WAITDONE,
                                   Decision.D_CONTROLLING,
                                   Decision.D_WAITING)):
            result = self.plan_manager.take_plan()
            if result is not None:
                n = min(len(result.positions), lcfg.max_plan_len)
                self.plan = make_global_plan(result.positions[:n],
                                             result.quats[:n],
                                             max_len=lcfg.max_plan_len)
                has_new_plan = True
            elif self.plan_manager.last_query_empty():
                has_new_plan, plan_empty = True, True

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
                                   obs_valid, jnp.float32(allowed_max_speed),
                                   jnp.float32(0.0))
        # the rotate generator only feeds the align states (the FSM reads
        # ps_rotate/CmdSource.ROTATE nowhere else) — skip its dispatch on
        # every other tick
        decision_now = int(self.fsm.decision)
        in_goal_align = decision_now == Decision.D_ALIGN_GOAL_HEADING
        in_any_align = in_goal_align or (
            decision_now == Decision.D_ALIGN_HEADING)
        if in_any_align:
            rot_hd = ghd if in_goal_align else hd
            cmd_rotate = self._jit_cmd(
                lcfg, plan_for_cmd, robot_pos, robot_quat,
                jnp.float32(v), jnp.float32(w), obstacles, obs_valid,
                jnp.float32(-1.0), jnp.float32(rot_hd),
                "differential_drive_rotate_shortest_angle")
            ps_rotate = cmd_rotate.state
        else:
            cmd_rotate = None
            ps_rotate = jnp.asarray(int(PlannerState.TRAJECTORY_FOUND),
                                    jnp.int32)   # unread outside align

        # path-blocked opinion overrides TRAJECTORY_FOUND
        # (`local_planner.cpp:597-608`)
        ps_simple = int(cmd_simple.state)
        if ps_simple == PlannerState.TRAJECTORY_FOUND and bool(path_blocked(
                cmd_simple.prune, obstacles, obs_valid,
                self.cfg.perception.path_blocked_check_radius)):
            ps_simple = int(PlannerState.PATH_BLOCKED_WAIT)
        # observability hooks (viewer/debug): last tick's command + state
        self.last_cmd = cmd_simple
        self.last_planner_state = ps_simple

        x = FSMInputs(
            now=jnp.asarray(now, jnp.float32), robot_pos=robot_pos,
            robot_yaw=yaw_from_quat(robot_quat),
            has_new_plan=jnp.asarray(has_new_plan),
            plan_empty=jnp.asarray(plan_empty),
            goal_reached=reached,
            initial_heading_aligned=init_aligned,
            goal_heading_aligned=goal_aligned,
            ps_simple=jnp.asarray(ps_simple, jnp.int32),
            ps_rotate=ps_rotate,
            recovery_active=jnp.asarray(self.recovery is not None),
            recovery_succeed=jnp.asarray(self.recovery_succeed))
        self.fsm, out = self._jit_fsm(self.cfg.move_base, self.fsm, x)

        if bool(out.request_recovery):
            self.recovery = start_rotate_recovery(robot_quat)
            self.recovery_succeed = False

        src = int(out.cmd_source)
        if src == CmdSource.SIMPLE:
            vx, wz = float(cmd_simple.vx), float(cmd_simple.wz)
        elif src == CmdSource.ROTATE and cmd_rotate is not None:
            vx, wz = float(cmd_rotate.vx), float(cmd_rotate.wz)
        else:
            vx, wz = 0.0, 0.0
        done = bool(out.done)
        if done:
            # goal finished/aborted: stop the query thread + DWA recompute
            # (`p2p_move_base.cpp` calls GPM_->stop()).
            self.plan_manager.stop()
        return vx, wz, Decision(int(self.fsm.decision)), done, bool(
            out.succeeded)
