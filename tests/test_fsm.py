import numpy as np
import jax.numpy as jnp

from dddmr_navigation_tpu.config import MoveBaseConfig
from dddmr_navigation_tpu.control.fsm import (
    Decision, CmdSource, FSMState, FSMInputs, FSMOutputs, init_fsm_state,
    fsm_step)
from dddmr_navigation_tpu.planning.local.planner import PlannerState

CFG = MoveBaseConfig()


def make_inputs(now=0.0, **kw):
    base = dict(
        now=jnp.asarray(now, jnp.float32),
        robot_pos=jnp.zeros(3), robot_yaw=jnp.asarray(0.0),
        has_new_plan=jnp.asarray(False), plan_empty=jnp.asarray(False),
        goal_reached=jnp.asarray(False),
        initial_heading_aligned=jnp.asarray(False),
        goal_heading_aligned=jnp.asarray(False),
        ps_simple=jnp.asarray(PlannerState.TRAJECTORY_FOUND, jnp.int32),
        ps_rotate=jnp.asarray(PlannerState.TRAJECTORY_FOUND, jnp.int32),
        recovery_active=jnp.asarray(False),
        recovery_succeed=jnp.asarray(False),
    )
    for k, v in kw.items():
        if k in ("ps_simple", "ps_rotate"):
            base[k] = jnp.asarray(v, jnp.int32)
        elif k == "robot_pos":
            base[k] = jnp.asarray(v, jnp.float32)
        else:
            base[k] = jnp.asarray(v)
    return FSMInputs(**base)


def step(s, **kw):
    return fsm_step(CFG, s, make_inputs(**kw))


def dec(s):
    return Decision(int(s.decision))


def test_happy_path_to_goal():
    s = init_fsm_state()
    s, out = step(s)                      # initial -> planning
    assert dec(s) == Decision.D_PLANNING
    s, out = step(s)                      # planning -> waitdone, query fired
    assert dec(s) == Decision.D_PLANNING_WAITDONE
    assert bool(out.request_plan_query)
    s, out = step(s, has_new_plan=True)   # plan arrives
    assert dec(s) == Decision.D_ALIGN_HEADING
    s, out = step(s, initial_heading_aligned=False)
    assert dec(s) == Decision.D_ALIGN_HEADING
    assert int(out.cmd_source) == CmdSource.ROTATE
    s, out = step(s, initial_heading_aligned=True)
    assert dec(s) == Decision.D_CONTROLLING
    s, out = step(s)
    assert dec(s) == Decision.D_CONTROLLING
    assert int(out.cmd_source) == CmdSource.SIMPLE
    s, out = step(s, goal_reached=True)
    assert dec(s) == Decision.D_ALIGN_GOAL_HEADING
    s, out = step(s, goal_heading_aligned=False)
    assert int(out.cmd_source) == CmdSource.ROTATE
    s, out = step(s, goal_heading_aligned=True)
    assert dec(s) == Decision.D_SUCCEED
    assert bool(out.done) and bool(out.succeeded)


def test_empty_plan_requeries():
    s = init_fsm_state()
    s, _ = step(s)
    s, _ = step(s)
    s, out = step(s, has_new_plan=True, plan_empty=True)
    assert dec(s) == Decision.D_PLANNING


def test_planner_patience_triggers_recovery_then_abort():
    s = init_fsm_state()
    s, _ = step(s)
    s, _ = step(s)
    # no plan for > planner_patience (10 s)
    s, out = step(s, now=11.0)
    assert dec(s) == Decision.D_RECOVERY_WAITDONE
    assert bool(out.request_recovery)
    # recovery running
    s, out = step(s, now=11.5, recovery_active=True)
    assert dec(s) == Decision.D_RECOVERY_WAITDONE
    # recovery succeeded -> back to planning, count incremented
    s, out = step(s, now=12.0, recovery_succeed=True)
    assert dec(s) == Decision.D_PLANNING
    assert int(s.no_plan_recovery_count) == 1
    # recovery failed next time -> abort
    s = s._replace(decision=jnp.asarray(Decision.D_RECOVERY_WAITDONE, jnp.int32))
    s, out = step(s, now=13.0, recovery_succeed=False)
    assert dec(s) == Decision.D_ABORT
    assert bool(out.done) and not bool(out.succeeded)


def test_recovery_retry_cap_aborts():
    s = init_fsm_state()._replace(
        decision=jnp.asarray(Decision.D_RECOVERY_WAITDONE, jnp.int32),
        no_plan_recovery_count=jnp.asarray(CFG.no_plan_retry_num, jnp.int32))
    s, out = step(s, recovery_succeed=True)
    assert dec(s) == Decision.D_ABORT


def test_all_trajectories_fail_replans_then_recovers():
    s = init_fsm_state()._replace(
        decision=jnp.asarray(Decision.D_CONTROLLING, jnp.int32))
    s, out = step(s, now=1.0, ps_simple=PlannerState.ALL_TRAJECTORIES_FAIL)
    assert dec(s) == Decision.D_PLANNING  # within controller patience
    # now exceed controller patience
    s = s._replace(decision=jnp.asarray(Decision.D_CONTROLLING, jnp.int32),
                   last_valid_control=jnp.asarray(0.0))
    s, out = step(s, now=12.0, ps_simple=PlannerState.ALL_TRAJECTORIES_FAIL,
                  robot_pos=[4.9, 0, 0])  # avoid oscillation timeout path
    assert dec(s) == Decision.D_RECOVERY_WAITDONE
    assert bool(out.request_recovery)


def test_path_blocked_wait_and_waiting_patience():
    s = init_fsm_state()._replace(
        decision=jnp.asarray(Decision.D_CONTROLLING, jnp.int32))
    s, out = step(s, now=1.0, ps_simple=PlannerState.PATH_BLOCKED_WAIT)
    assert dec(s) == Decision.D_WAITING
    assert float(s.waiting_time) == 1.0
    # in waiting, still blocked -> stay
    s, out = step(s, now=2.0, ps_simple=PlannerState.PATH_BLOCKED_WAIT)
    assert dec(s) == Decision.D_WAITING
    # clears -> controlling
    s, out = step(s, now=3.0, ps_simple=PlannerState.TRAJECTORY_FOUND)
    assert dec(s) == Decision.D_CONTROLLING
    # blocked again, waiting patience expires -> planning
    s, out = step(s, now=4.0, ps_simple=PlannerState.PATH_BLOCKED_WAIT)
    s, out = step(s, now=4.0 + CFG.waiting_patience + 1.0,
                  ps_simple=PlannerState.PATH_BLOCKED_WAIT)
    assert dec(s) == Decision.D_PLANNING


def test_oscillation_timeout_triggers_recovery():
    s = init_fsm_state()._replace(
        decision=jnp.asarray(Decision.D_CONTROLLING, jnp.int32))
    # robot stays still past oscillation_patience (15 s)
    s, out = step(s, now=16.0)
    assert dec(s) == Decision.D_RECOVERY_WAITDONE
    assert bool(out.request_recovery)


def test_oscillation_reset_on_motion():
    s = init_fsm_state()._replace(
        decision=jnp.asarray(Decision.D_CONTROLLING, jnp.int32))
    # robot moved 6 m -> oscillation timer resets, no recovery at t=16
    s, out = step(s, now=16.0, robot_pos=[6.0, 0.0, 0.0])
    assert dec(s) == Decision.D_CONTROLLING


def test_prune_fail_replans():
    s = init_fsm_state()._replace(
        decision=jnp.asarray(Decision.D_CONTROLLING, jnp.int32))
    s, out = step(s, now=1.0, ps_simple=PlannerState.PRUNE_PLAN_FAIL)
    assert dec(s) == Decision.D_PLANNING
    assert int(out.cmd_source) == CmdSource.ZERO


def test_terminal_states_absorb():
    s = init_fsm_state()._replace(
        decision=jnp.asarray(Decision.D_ABORT, jnp.int32))
    s, out = step(s, now=99.0)
    assert dec(s) == Decision.D_ABORT
    assert bool(out.done)
