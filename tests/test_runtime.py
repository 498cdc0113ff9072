"""Runtime-layer tests: action protocol, timers, watchdog, checkpoint."""
import time

import numpy as np
import jax.numpy as jnp

from dddmr_navigation_tpu.runtime import (
    ActionServer, ActionClient, GoalStatus, PeriodicTimer,
    FreshnessGate, TickMonitor, save_pytree, restore_pytree,
    CheckpointManager, GetPlanGoal)


def test_action_success_and_result():
    def execute(goal, handle):
        handle.publish_feedback("planning")
        handle.succeed(result={"path": [goal.goal, 1, 2]})

    srv = ActionServer("get_plan", execute)
    cli = ActionClient(srv)
    status, result = cli.call(GetPlanGoal(goal=0), timeout=5.0)
    assert status == GoalStatus.SUCCEEDED
    assert result["path"] == [0, 1, 2]


def test_action_preemption():
    started = []

    def execute(goal, handle):
        started.append(goal)
        while not handle.is_cancel_requested():
            time.sleep(0.01)
        handle.canceled()

    srv = ActionServer("move", execute)
    h1 = srv.submit("goal1")
    time.sleep(0.05)
    h2 = srv.submit("goal2")   # preempts goal1
    s1, _ = h1.wait(timeout=5.0)
    assert s1 == GoalStatus.CANCELED
    h2.cancel()
    s2, _ = h2.wait(timeout=5.0)
    assert s2 == GoalStatus.CANCELED
    assert started == ["goal1", "goal2"]


def test_action_exception_aborts():
    def execute(goal, handle):
        raise RuntimeError("boom")

    srv = ActionServer("bad", execute)
    status, result = srv.submit(None).wait(timeout=5.0)
    assert status == GoalStatus.ABORTED
    assert isinstance(result, RuntimeError)


def test_periodic_timer_rate():
    hits = []
    t = PeriodicTimer(50.0, lambda: hits.append(time.monotonic()))
    t.start()
    time.sleep(0.25)
    t.stop()
    assert 5 <= len(hits) <= 20


def test_freshness_gate():
    g = FreshnessGate(expected_dt={"lidar": 0.2, "odom": 0.1})
    assert not g.ok()
    now = 100.0
    g.update("lidar", now)
    g.update("odom", now)
    assert g.ok(now + 0.05)
    assert not g.ok(now + 0.15)       # odom stale
    assert g.is_current("lidar", now + 0.15)


def test_tick_monitor_stats():
    m = TickMonitor(budget_ms=1.0)
    for i in range(10):
        m.start()
        if i == 0:
            time.sleep(0.003)          # one deliberate deadline miss
        m.stop()
    s = m.stats()
    assert s["ticks"] == 10
    assert s["deadline_misses"] >= 1
    assert s["p50_ms"] <= s["p99_ms"] <= s["max_ms"]


def test_checkpoint_roundtrip(tmp_path):
    from dddmr_navigation_tpu.state_estimation import init_particles
    from dddmr_navigation_tpu.config import MCLConfig
    import jax

    cfg = MCLConfig(num_particles=16)
    p = init_particles(jax.random.PRNGKey(0), cfg, jnp.zeros(3),
                       jnp.asarray([0.0, 0.0, 0.0, 1.0]))
    path = str(tmp_path / "state")
    save_pytree(path, p)
    p2 = restore_pytree(path, p)
    np.testing.assert_allclose(np.asarray(p2.pos), np.asarray(p.pos))
    np.testing.assert_allclose(np.asarray(p2.prob), np.asarray(p.prob))


def test_checkpoint_manager_rotation(tmp_path):
    m = CheckpointManager(str(tmp_path), keep=2)
    tree = {"a": jnp.arange(4), "b": jnp.ones((2, 2))}
    for step in range(5):
        m.save(step, {"a": jnp.arange(4) + step, "b": jnp.ones((2, 2))})
    assert m.latest_step() == 4
    step, restored = m.restore_latest(tree)
    assert step == 4
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(4) + 4)
    # only `keep` slots remain
    import os
    slots = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    assert len(slots) == 2


def test_viz_dump_renders_debug_ring(tmp_path):
    """The rviz-topic observability analogue: DebugDumper npz ring →
    rendered PNG frames (tools/viz_dump.py)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from dddmr_navigation_tpu.runtime.tracing import DebugDumper
    from tools.viz_dump import render_dump_dir
    from dddmr_navigation_tpu.io import flat_ground_map

    ground = flat_ground_map(6, 4, 0.5)
    dump = DebugDumper(str(tmp_path / "ring"), keep=4)
    for t in range(3):
        dump.dump(t, ground=ground,
                  dgraph=np.full((len(ground),), 9999.0),
                  robot=np.array([0.0, 0.0, 0.0]),
                  plan=np.zeros((5, 3)))
    outs = render_dump_dir(str(tmp_path / "ring"), str(tmp_path / "png"))
    assert len(outs) == 3
    assert all(os.path.getsize(p) > 10_000 for p in outs)


def test_session_checkpoint_roundtrip(tmp_path):
    """NavigationSession dynamic state round-trips through the pytree
    checkpoint (mid-run compute checkpointing — SURVEY.md §5)."""
    import jax.numpy as jnp
    from dddmr_navigation_tpu.config import NavigationConfig
    from dddmr_navigation_tpu.control.session import NavigationSession
    from dddmr_navigation_tpu.io import flat_ground_map
    from dddmr_navigation_tpu.runtime.checkpoint import (
        save_pytree, restore_pytree)

    cfg = NavigationConfig()
    ground = flat_ground_map(6, 4, 0.4)
    sess = NavigationSession(cfg, ground)
    sess.marking = sess.marking._replace(
        dgraph=sess.marking.dgraph.at[3].set(0.2))
    snap = sess.checkpoint_state()
    path = str(tmp_path / "session_ckpt")
    save_pytree(path, snap)

    sess2 = NavigationSession(cfg, ground)
    restored = restore_pytree(path, sess2.checkpoint_state())
    sess2.restore_state(restored)
    np.testing.assert_allclose(np.asarray(sess2.marking.dgraph),
                               np.asarray(sess.marking.dgraph))
    assert int(sess2.driver.fsm.decision) == int(sess.driver.fsm.decision)
