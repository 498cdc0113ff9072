"""Orchestration: FSM, recovery, plan managers, move-base driver, and the
integrated NavigationSession (the `dddmr_p2p_move_base` vertical)."""
from dddmr_navigation_tpu.control.fsm import (
    Decision, CmdSource, FSMState, FSMInputs, FSMOutputs, init_fsm_state,
    fsm_step)
from dddmr_navigation_tpu.control.recovery import (
    RotateRecoveryState, start_rotate_recovery, rotate_recovery_step)
from dddmr_navigation_tpu.control.move_base import MoveBaseDriver
from dddmr_navigation_tpu.control.plan_manager import (
    SyncPlanManager, AsyncPlanManager)
from dddmr_navigation_tpu.control.session import NavigationSession
from dddmr_navigation_tpu.control.fused import (
    FusedMap, FusedState, FusedOut, build_fused_map, init_fused_state,
    fused_tick, make_fused_tick)

__all__ = [
    "Decision", "CmdSource", "FSMState", "FSMInputs", "FSMOutputs",
    "init_fsm_state", "fsm_step", "RotateRecoveryState",
    "start_rotate_recovery", "rotate_recovery_step", "MoveBaseDriver",
    "SyncPlanManager", "AsyncPlanManager", "NavigationSession",
    "FusedMap", "FusedState", "FusedOut", "build_fused_map",
    "init_fused_state", "fused_tick", "make_fused_tick",
]
