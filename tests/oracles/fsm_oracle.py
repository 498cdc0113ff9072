"""Sequential NumPy/Python oracle of the p2p move-base decision FSM.

Mirrors `p2p_fsm.cpp:41-113` + `P2PMoveBase::executeCycle`
(`p2p_move_base.cpp:265-658`) as the reference writes it: a string-keyed
decision with wall-clock patiences, evaluated with plain if/elif in
execution order. Used by the dynamic-scene parity harness to check the
jittable `control/fsm.py` step decision-for-decision over
mark → replan → clear → recovery sequences.

States/Decisions use the same integer codes as `control/fsm.py` so rows
compare directly.
"""
from __future__ import annotations

import math


# PlannerState codes (dddmr_enum_states.h:46-54)
TF_FAIL = 0
PRUNE_PLAN_FAIL = 1
ALL_TRAJECTORIES_FAIL = 2
PERCEPTION_MALFUNCTION = 3
TRAJECTORY_FOUND = 4
PATH_BLOCKED_WAIT = 5
PATH_BLOCKED_REPLANNING = 6

# Decision codes (control/fsm.py order)
D_INITIAL = 0
D_PLANNING = 1
D_PLANNING_WAITDONE = 2
D_ALIGN_HEADING = 3
D_CONTROLLING = 4
D_ALIGN_GOAL_HEADING = 5
D_WAITING = 6
D_RECOVERY_WAITDONE = 7
D_SUCCEED = 8
D_ABORT = 9

CMD_ZERO = 0
CMD_SIMPLE = 1
CMD_ROTATE = 2


def _norm_angle(a):
    return (a + math.pi) % (2.0 * math.pi) - math.pi


class FSMOracle:
    """One robot's executeCycle state, stepped sequentially."""

    def __init__(self, cfg, now=0.0):
        # cfg: MoveBaseConfig (duck-typed: controller_frequency etc.)
        self.cfg = cfg
        self.decision = D_INITIAL
        self.last_valid_plan = now
        self.last_valid_control = now
        self.last_oscillation_reset = now
        self.osc_pos = (0.0, 0.0, 0.0)
        self.osc_yaw = 0.0
        self.waiting_time = now
        self.no_plan_recovery_count = 0

    # -- one executeCycle ------------------------------------------------
    def step(self, now, robot_pos, robot_yaw, has_new_plan, plan_empty,
             goal_reached, initial_heading_aligned, goal_heading_aligned,
             ps_simple, ps_rotate, recovery_active, recovery_succeed):
        cfg = self.cfg
        cmd = CMD_ZERO
        req_plan = False
        req_recovery = False
        done = False
        succeeded = False

        # oscillation reset (`p2p_move_base.cpp:267-273`)
        dist = math.dist(robot_pos, self.osc_pos)
        dyaw = abs(_norm_angle(robot_yaw - self.osc_yaw))
        if dist >= cfg.oscillation_distance or dyaw >= cfg.oscillation_angle:
            self.osc_pos = tuple(robot_pos)
            self.osc_yaw = robot_yaw
            self.last_oscillation_reset = now
        osc_timeout = (cfg.oscillation_patience > 0 and
                       now - self.last_oscillation_reset
                       >= cfg.oscillation_patience)
        ctrl_timeout = now - self.last_valid_control > cfg.controller_patience
        plan_timeout = now - self.last_valid_plan > cfg.planner_patience

        d = self.decision
        if d == D_INITIAL:
            self.decision = D_PLANNING
        elif d == D_PLANNING:
            req_plan = True
            self.decision = D_PLANNING_WAITDONE
        elif d == D_PLANNING_WAITDONE:
            if has_new_plan and not plan_empty:
                self.decision = D_ALIGN_HEADING
                self.last_valid_plan = now
            elif has_new_plan and plan_empty:
                self.decision = D_PLANNING
            elif plan_timeout:
                self.decision = D_RECOVERY_WAITDONE
                req_recovery = True
        elif d in (D_ALIGN_HEADING, D_ALIGN_GOAL_HEADING):
            goal_align = d == D_ALIGN_GOAL_HEADING
            aligned = (goal_heading_aligned if goal_align
                       else initial_heading_aligned)
            if aligned:
                if goal_align:
                    self.decision = D_SUCCEED
                    done = succeeded = True
                else:
                    self.decision = D_CONTROLLING
            elif osc_timeout:
                self.decision = D_RECOVERY_WAITDONE
                req_recovery = True
            else:
                ps = ps_rotate
                if ps == TRAJECTORY_FOUND:
                    cmd = CMD_ROTATE
                    self.last_valid_control = now
                elif ps == PRUNE_PLAN_FAIL:
                    self.decision = D_PLANNING
                    self.last_valid_plan = now
                elif goal_align:
                    # goal-align: blocked states count as failures too
                    if ps in (ALL_TRAJECTORIES_FAIL, PATH_BLOCKED_WAIT,
                              PATH_BLOCKED_REPLANNING):
                        if ctrl_timeout:
                            self.decision = D_RECOVERY_WAITDONE
                            req_recovery = True
                        # else stay
                else:
                    if ps == ALL_TRAJECTORIES_FAIL:
                        if ctrl_timeout:
                            self.decision = D_RECOVERY_WAITDONE
                            req_recovery = True
                        else:
                            self.decision = D_PLANNING
                            self.last_valid_plan = now
                    elif ps in (PATH_BLOCKED_WAIT, PATH_BLOCKED_REPLANNING):
                        self.decision = D_PLANNING
                        self.last_valid_plan = now
        elif d == D_CONTROLLING:
            if goal_reached:
                self.decision = D_ALIGN_GOAL_HEADING
            elif osc_timeout:
                self.decision = D_RECOVERY_WAITDONE
                req_recovery = True
            else:
                ps = ps_simple
                if ps == TRAJECTORY_FOUND:
                    cmd = CMD_SIMPLE
                    self.last_valid_control = now
                elif ps == PRUNE_PLAN_FAIL:
                    self.decision = D_PLANNING
                    self.last_valid_plan = now
                elif ps == ALL_TRAJECTORIES_FAIL:
                    if ctrl_timeout:
                        self.decision = D_RECOVERY_WAITDONE
                        req_recovery = True
                    else:
                        self.decision = D_PLANNING
                        self.last_valid_plan = now
                elif ps == PATH_BLOCKED_REPLANNING:
                    self.decision = D_PLANNING
                    self.last_valid_plan = now
                elif ps == PATH_BLOCKED_WAIT:
                    self.decision = D_WAITING
                    self.waiting_time = now
        elif d == D_RECOVERY_WAITDONE:
            if not recovery_active:
                if self.no_plan_recovery_count >= cfg.no_plan_retry_num:
                    self.decision = D_ABORT
                    done = True
                elif recovery_succeed:
                    self.decision = D_PLANNING
                    self.no_plan_recovery_count += 1
                    self.last_valid_plan = now
                else:
                    self.decision = D_ABORT
                    done = True
        elif d == D_WAITING:
            if now - self.waiting_time >= cfg.waiting_patience:
                self.decision = D_PLANNING
                self.last_valid_plan = now
            else:
                ps = ps_simple
                if ps == TRAJECTORY_FOUND:
                    self.decision = D_CONTROLLING
                    self.last_valid_control = now
                elif ps == PRUNE_PLAN_FAIL:
                    self.decision = D_PLANNING
                    self.last_valid_plan = now
                elif ps == ALL_TRAJECTORIES_FAIL:
                    if ctrl_timeout:
                        self.decision = D_RECOVERY_WAITDONE
                        req_recovery = True
                    else:
                        self.decision = D_PLANNING
                        self.last_valid_plan = now
                # PATH_BLOCKED_*: stay waiting
        elif d in (D_SUCCEED, D_ABORT):
            done = True
            succeeded = d == D_SUCCEED

        return {
            "decision": self.decision, "cmd_source": cmd,
            "request_plan_query": req_plan,
            "request_recovery": req_recovery,
            "done": done, "succeeded": succeeded,
        }
