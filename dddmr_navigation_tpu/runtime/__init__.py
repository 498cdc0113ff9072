"""Host runtime: actions, timers, watchdogs, checkpointing, tracing
(the "DDS role" around the jitted compute core)."""
from dddmr_navigation_tpu.runtime.actions import (
    GoalStatus, GoalHandle, ActionServer, ActionClient, PeriodicTimer,
    GetPlanGoal, GetPlanResult, PToPMoveBaseGoal, RecoveryGoal,
    TagDockingGoal, TagDockingResult)
from dddmr_navigation_tpu.runtime.watchdog import FreshnessGate, TickMonitor
from dddmr_navigation_tpu.runtime.checkpoint import (
    save_pytree, restore_pytree, CheckpointManager)
from dddmr_navigation_tpu.runtime.tracing import trace, DebugDumper
from dddmr_navigation_tpu.runtime.viewer import NavViewer
from dddmr_navigation_tpu.runtime.viewer3d import PoseGraph3DViewer
