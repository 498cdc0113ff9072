"""Global-plan managers: the move-base side of plan querying.

Re-designs `P2PGlobalPlanManager` (`p2p_global_plan_manager.cpp`):
a 5 Hz query timer sends GetPlan goals to either the plain planner
("get_plan") or the DWA planner ("get_dwa_plan"); `stop()` halts the timer
and sends one `activate_threading=false` goal so the DWA recompute thread
also stops (`:83-106`); `hasPlan`/`copyPlan` hand the freshest path to the
control loop under a mutex (`:174-186`).

Two implementations share the interface:

  * :class:`SyncPlanManager` — queries inline when the timer elapses
    (deterministic; tests, sim, benches).
  * :class:`AsyncPlanManager` — a worker thread runs the queries so a slow
    plan can never stall the control tick (the reason the reference runs
    the manager in its own node/timer thread). The tick `offer()`s the
    latest robot/dgraph snapshot; the thread plans from the freshest
    snapshot at the query frequency. JAX device dispatch releases the GIL,
    so the control tick's own device work proceeds concurrently.
"""
from __future__ import annotations

import threading
import time
from typing import Optional

import numpy as np

from dddmr_navigation_tpu.planning.global_.dwa import (
    DWAGlobalPlanManager, CachedPlan)


class _Snapshot:
    __slots__ = ("robot_pos", "dgraph", "lethal_pts", "lethal_valid", "now")

    def __init__(self, robot_pos, dgraph, lethal_pts, lethal_valid, now):
        self.robot_pos = robot_pos
        self.dgraph = dgraph
        self.lethal_pts = lethal_pts
        self.lethal_valid = lethal_valid
        self.now = now


class SyncPlanManager:
    """Inline plan querying at ``query_frequency`` over a DWA manager.

    ``action`` selects the reference's configurable GetPlan target
    (`p2p_global_plan_manager.cpp:45-47`): "get_dwa_plan" (default) uses
    the DWA cache/splice machinery; "get_plan" full-replans from the
    robot on every query (`GlobalPlanner::makeROSPlan` semantics)."""

    def __init__(self, dwa: DWAGlobalPlanManager, query_frequency: float,
                 action: str = "get_dwa_plan"):
        self.dwa = dwa
        self.action = action
        self.query_frequency = query_frequency
        self.goal: Optional[tuple] = None
        self.active = False
        self._last_query_t = -1e9
        self._plan: Optional[CachedPlan] = None
        self._fresh = False
        self._empty_result = False

    # -- GPM surface (`p2p_global_plan_manager.cpp:83-106,168-186`) --------
    def set_goal(self, goal_pos, goal_quat):
        self.goal = (np.asarray(goal_pos, np.float32),
                     np.asarray(goal_quat, np.float32))
        self._plan = None
        self._fresh = False
        self.resume()

    def resume(self):
        self.active = True

    def stop(self):
        """Halt querying; tell the DWA side to stop recomputing
        (`activate_threading=false`, `:96-105`)."""
        self.active = False
        self.dwa.threading_active = False

    def has_plan(self) -> bool:
        return self._fresh

    def take_plan(self) -> Optional[CachedPlan]:
        """copyPlan: hand over the freshest plan once."""
        if not self._fresh:
            return None
        self._fresh = False
        return self._plan

    def last_query_empty(self) -> bool:
        return self._empty_result

    def offer(self, robot_pos, dgraph, now, lethal_pts=None,
              lethal_valid=None):
        """Called every control tick with the live snapshot."""
        if not (self.active and self.goal is not None):
            return
        if self.action == "get_dwa_plan":
            # windowed recompute rides its own (10 Hz) timer inside the DWA
            self.dwa.maybe_recompute(robot_pos, dgraph, now,
                                     lethal_pts=lethal_pts,
                                     lethal_valid=lethal_valid)
        if now - self._last_query_t < 1.0 / self.query_frequency:
            return
        self._last_query_t = now
        gp, gq = self.goal
        if self.action == "get_dwa_plan":
            path = self.dwa.request(gp, gq, robot_pos, dgraph,
                                    lethal_pts=lethal_pts,
                                    lethal_valid=lethal_valid)
        else:  # "get_plan": full replan every query
            full = self.dwa.rt.plan(robot_pos, gp, dgraph,
                                    lethal_pts=lethal_pts,
                                    lethal_valid=lethal_valid)
            path = None if full is None else CachedPlan(*full)
        self._empty_result = path is None
        if path is not None:
            self._plan = path
            self._fresh = True


class AsyncPlanManager(SyncPlanManager):
    """Thread-backed variant: `offer()` only records the snapshot; a
    worker queries at the configured frequency. Uses wall-clock pacing
    (the thread is inherently wall-clock, like the reference's timer)."""

    def __init__(self, dwa: DWAGlobalPlanManager, query_frequency: float,
                 action: str = "get_dwa_plan"):
        super().__init__(dwa, query_frequency, action=action)
        self._lock = threading.Lock()
        self._snapshot: Optional[_Snapshot] = None
        self._shutdown = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def close(self):
        self._shutdown = True
        self._thread.join(timeout=5.0)

    def set_goal(self, goal_pos, goal_quat):
        """Swap the goal under the lock: the worker publishes a finished
        plan only when the goal it planned for is still current, so a plan
        for a superseded goal can never surface as fresh (the unlocked
        read/swap race the round-2 review flagged)."""
        with self._lock:
            super().set_goal(goal_pos, goal_quat)

    def offer(self, robot_pos, dgraph, now, lethal_pts=None,
              lethal_valid=None):
        with self._lock:
            self._snapshot = _Snapshot(
                np.asarray(robot_pos, np.float32), dgraph,
                lethal_pts, lethal_valid, now)

    def take_plan(self) -> Optional[CachedPlan]:
        with self._lock:
            return super().take_plan()

    def stop(self):
        """Stop + discard anything a mid-flight query publishes: the
        worker re-checks `active` under the lock before publishing, so
        after stop() returns no new plan can surface."""
        with self._lock:
            super().stop()
            self._fresh = False

    def _worker(self):
        period = 1.0 / self.query_frequency
        while not self._shutdown:
            t0 = time.monotonic()
            snap = goal = None
            with self._lock:
                if self.active and self.goal is not None:
                    snap, goal = self._snapshot, self.goal
            if snap is not None:
                try:
                    gp, gq = goal
                    if self.action == "get_dwa_plan":
                        self.dwa.maybe_recompute(
                            snap.robot_pos, snap.dgraph, snap.now,
                            lethal_pts=snap.lethal_pts,
                            lethal_valid=snap.lethal_valid)
                        path = self.dwa.request(
                            gp, gq, snap.robot_pos, snap.dgraph,
                            lethal_pts=snap.lethal_pts,
                            lethal_valid=snap.lethal_valid)
                    else:
                        full = self.dwa.rt.plan(
                            snap.robot_pos, gp, snap.dgraph,
                            lethal_pts=snap.lethal_pts,
                            lethal_valid=snap.lethal_valid)
                        path = None if full is None else CachedPlan(*full)
                    with self._lock:
                        # a stop() or set_goal() may have raced the query:
                        # publish only if still active AND the goal we
                        # planned for is still the current goal
                        if self.active and self.goal is goal:
                            self._empty_result = path is None
                            if path is not None:
                                self._plan = path
                                self._fresh = True
                except Exception:  # pragma: no cover - worker must survive
                    import traceback
                    traceback.print_exc()
            dt = period - (time.monotonic() - t0)
            while dt > 0 and not self._shutdown:   # stay close()-responsive
                time.sleep(min(dt, 0.05))
                dt -= 0.05
