import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dddmr_navigation_tpu.config import GlobalPlannerConfig
from dddmr_navigation_tpu.io import flat_ground_map
from dddmr_navigation_tpu.planning.global_.graph import build_ground_graph
from dddmr_navigation_tpu.planning.global_.wavefront import (
    node_costs, wavefront_distances, extract_path)
from dddmr_navigation_tpu.planning.global_.planner import (
    plan_on_graph, path_to_poses, snap_to_ground)

from oracles import global_planner_oracle as gp_oracle


INSCRIBED = 0.5
RATE = 2.0


@pytest.fixture(scope="module")
def small_world():
    ground = flat_ground_map(8, 8, 0.4)
    graph = build_ground_graph(ground, radius=0.6, k_max=12)
    return ground, graph


def dgraph_with_wall(ground, x_wall=0.0, gap_y=2.5, max_d=9999.0):
    """Synthetic distance field: lethal wall at x≈x_wall except a gap."""
    d = np.full(len(ground), max_d, np.float32)
    on_wall = (np.abs(ground[:, 0] - x_wall) < 0.3) & (
        np.abs(ground[:, 1] - gap_y) > 0.6)
    d[on_wall] = 0.0  # lethal
    near = (np.abs(ground[:, 0] - x_wall) < 1.0) & ~on_wall
    d[near] = 0.8
    return d


def test_wavefront_matches_dijkstra(small_world):
    ground, graph = small_world
    g = graph.num_nodes
    dgraph = dgraph_with_wall(ground)
    nw = np.zeros(g, np.float32)
    enter = gp_oracle.enter_cost(dgraph, nw, INSCRIBED, RATE)
    want = gp_oracle.dijkstra(graph.nbr_idx, graph.nbr_dist, graph.nbr_valid,
                              enter, graph.avg_intensity, goal=0)

    enter_j = node_costs(jnp.asarray(dgraph), jnp.asarray(nw),
                         inscribed_radius=INSCRIBED,
                         inflation_descending_rate=RATE)
    wf = wavefront_distances(
        jnp.asarray(graph.nbr_idx), jnp.asarray(graph.nbr_dist),
        jnp.asarray(graph.nbr_valid), enter_j,
        jnp.asarray(graph.avg_intensity), jnp.asarray(0))
    got = np.asarray(wf.dist)
    finite = np.isfinite(want)
    assert np.array_equal(finite, np.isfinite(got))
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-4, atol=1e-3)


def test_plan_routes_through_gap(small_world):
    ground, graph = small_world
    cfg = GlobalPlannerConfig(max_path_len=256, max_relax_iters=256)
    dgraph = dgraph_with_wall(ground)
    res = jax.jit(lambda *a: plan_on_graph(
        cfg, *a, inscribed_radius=INSCRIBED, inflation_descending_rate=RATE))(
        jnp.asarray(graph.nbr_idx), jnp.asarray(graph.nbr_dist),
        jnp.asarray(graph.nbr_valid), jnp.asarray(ground),
        jnp.ones(len(ground), bool), jnp.asarray(dgraph),
        jnp.zeros(len(ground)), jnp.asarray(graph.avg_intensity),
        jnp.asarray([-3.0, 0.0, 0.0]), jnp.asarray([3.0, 0.0, 0.0]))
    assert bool(res.ok)
    ids = np.asarray(res.node_ids)[np.asarray(res.node_valid)]
    path = ground[ids]
    # path crosses the wall only near the gap (y≈2.5)
    crossing = path[np.abs(path[:, 0]) < 0.35]
    assert len(crossing) > 0
    assert np.all(np.abs(crossing[:, 1] - 2.5) < 1.0)
    # endpoints snap correctly
    assert np.linalg.norm(path[0] - [-3, 0, 0]) < 0.5
    assert np.linalg.norm(path[-1] - [3, 0, 0]) < 0.5


def test_plan_fails_when_walled_off(small_world):
    ground, graph = small_world
    cfg = GlobalPlannerConfig(max_path_len=256, max_relax_iters=256)
    # wall spans two node columns: the map-boundary kNN-fallback edges
    # reach 0.8 m (mirroring the reference's orphan fallback, which skips
    # the LOS check under 2x inscribed radius) so a one-column wall can be
    # hopped at the border — exactly as the reference would.
    dgraph = np.full(len(ground), 9999.0, np.float32)
    dgraph[np.abs(ground[:, 0]) < 0.45] = 0.0  # full wall, no gap
    res = plan_on_graph(
        cfg, jnp.asarray(graph.nbr_idx), jnp.asarray(graph.nbr_dist),
        jnp.asarray(graph.nbr_valid), jnp.asarray(ground),
        jnp.ones(len(ground), bool), jnp.asarray(dgraph),
        jnp.zeros(len(ground)), jnp.asarray(graph.avg_intensity),
        jnp.asarray([-3.0, 0.0, 0.0]), jnp.asarray([3.0, 0.0, 0.0]),
        inscribed_radius=INSCRIBED, inflation_descending_rate=RATE)
    assert not bool(res.ok)


def test_snap_to_ground(small_world):
    ground, _ = small_world
    i, ok = snap_to_ground(jnp.asarray(ground), jnp.ones(len(ground), bool),
                           jnp.asarray([1.02, 1.02, 0.0]))
    assert bool(ok)
    np.testing.assert_allclose(ground[int(i)][:2], [1.2, 1.2], atol=0.25)
    _, ok2 = snap_to_ground(jnp.asarray(ground), jnp.ones(len(ground), bool),
                            jnp.asarray([1.0, 1.0, 5.0]))
    assert not bool(ok2)


def test_path_to_poses_interpolation(small_world):
    ground, graph = small_world
    cfg = GlobalPlannerConfig(max_path_len=256, max_relax_iters=256)
    dgraph = np.full(len(ground), 9999.0, np.float32)
    res = plan_on_graph(
        cfg, jnp.asarray(graph.nbr_idx), jnp.asarray(graph.nbr_dist),
        jnp.asarray(graph.nbr_valid), jnp.asarray(ground),
        jnp.ones(len(ground), bool), jnp.asarray(dgraph),
        jnp.zeros(len(ground)), jnp.asarray(graph.avg_intensity),
        jnp.asarray([-3.0, 0.0, 0.0]), jnp.asarray([3.0, 0.0, 0.0]),
        inscribed_radius=INSCRIBED, inflation_descending_rate=RATE)
    pos, quats = path_to_poses(cfg, ground, res)
    assert len(pos) > 10
    # interpolated spacing ≤ graph spacing, ≥ 0.1 between emitted poses
    steps = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    assert steps.max() < 0.45
    # quats normalized
    np.testing.assert_allclose(np.linalg.norm(quats, axis=1), 1.0, atol=1e-4)


def test_post_smooth_path_shortcuts_straight_line():
    """On open flat ground a straight run of nodes collapses to endpoints
    (`postSmoothPath`, `global_planner.cpp:233-311`)."""
    from dddmr_navigation_tpu.planning.global_.planner import post_smooth_path
    xs = np.arange(0, 3.01, 0.25, dtype=np.float32)
    # dense flat ground patch so interpolants always see >=2 ground points
    gx, gy = np.meshgrid(np.arange(-0.5, 3.51, 0.2),
                         np.arange(-0.6, 0.61, 0.2))
    ground = np.stack([gx.ravel(), gy.ravel(),
                       np.zeros(gx.size)], 1).astype(np.float32)
    # path = the nodes nearest to the x axis
    ids = [int(np.argmin(np.sum((ground - [x, 0, 0]) ** 2, 1))) for x in xs]
    sm = post_smooth_path(ground, np.zeros((0, 3)), ids)
    assert sm[0] == ids[0] and sm[-1] == ids[-1]
    assert len(sm) < len(ids)  # interior shortcut happened


def test_post_smooth_path_keeps_node_at_obstacle():
    from dddmr_navigation_tpu.planning.global_.planner import post_smooth_path
    gx, gy = np.meshgrid(np.arange(-0.5, 3.51, 0.2),
                         np.arange(-0.6, 0.61, 0.2))
    ground = np.stack([gx.ravel(), gy.ravel(),
                       np.zeros(gx.size)], 1).astype(np.float32)
    xs = np.arange(0, 3.01, 0.25, dtype=np.float32)
    ids = [int(np.argmin(np.sum((ground - [x, 0, 0]) ** 2, 1))) for x in xs]
    # obstacle cluster sitting on the segment midline
    wall = np.array([[1.5, 0.0, 0.0], [1.5, 0.05, 0.0], [1.55, 0.0, 0.0]],
                    np.float32)
    sm = post_smooth_path(ground, wall, ids)
    assert len(sm) > 2  # interior nodes kept near the obstacle


class TestWarmStart:
    """Warm-started relaxation (`wavefront_distances(dist0=...)`) must reach
    the SAME fixpoint as a cold solve — including after cost RISES, which
    the old monotone-clamped operator could not repair."""

    def _solve(self, graph, dgraph, goal, dist0=None, nw=None):
        g = graph.num_nodes
        nw = np.zeros(g, np.float32) if nw is None else nw
        enter = node_costs(jnp.asarray(dgraph), jnp.asarray(nw),
                           inscribed_radius=INSCRIBED,
                           inflation_descending_rate=RATE)
        return wavefront_distances(
            jnp.asarray(graph.nbr_idx), jnp.asarray(graph.nbr_dist),
            jnp.asarray(graph.nbr_valid), enter,
            jnp.asarray(graph.avg_intensity), jnp.asarray(goal),
            dist0=dist0)

    def test_warm_after_cost_drop_matches_cold(self, small_world):
        ground, graph = small_world
        blocked = dgraph_with_wall(ground)
        open_d = np.full(len(ground), 9999.0, np.float32)
        wf_blocked = self._solve(graph, blocked, goal=0)
        warm = self._solve(graph, open_d, goal=0, dist0=wf_blocked.dist)
        cold = self._solve(graph, open_d, goal=0)
        np.testing.assert_array_equal(np.asarray(warm.dist),
                                      np.asarray(cold.dist))

    def test_warm_after_cost_rise_matches_cold(self, small_world):
        """A wall APPEARS: stale-low values behind it must rise to the
        detour cost. The monotone-clamped operator would freeze them."""
        ground, graph = small_world
        open_d = np.full(len(ground), 9999.0, np.float32)
        blocked = dgraph_with_wall(ground)
        wf_open = self._solve(graph, open_d, goal=0)
        warm = self._solve(graph, blocked, goal=0, dist0=wf_open.dist)
        cold = self._solve(graph, blocked, goal=0)
        w, c = np.asarray(warm.dist), np.asarray(cold.dist)
        assert np.array_equal(np.isfinite(w), np.isfinite(c))
        np.testing.assert_allclose(w[np.isfinite(c)], c[np.isfinite(c)],
                                   rtol=1e-5, atol=1e-5)

    def test_warm_identical_field_converges_fast(self, small_world):
        ground, graph = small_world
        d = dgraph_with_wall(ground)
        cold = self._solve(graph, d, goal=0)
        warm = self._solve(graph, d, goal=0, dist0=cold.dist)
        # fixpoint verification only: one sweep + the no-change exit
        assert int(warm.iters) <= 2
        assert int(cold.iters) > int(warm.iters)
        np.testing.assert_array_equal(np.asarray(warm.dist),
                                      np.asarray(cold.dist))

    def test_plan_on_graph_warm_resets_on_goal_change(self, small_world):
        ground, graph = small_world
        cfg = GlobalPlannerConfig(max_long_edges=0)
        d = np.full(len(ground), 9999.0, np.float32)
        args = (jnp.asarray(graph.nbr_idx), jnp.asarray(graph.nbr_dist),
                jnp.asarray(graph.nbr_valid), jnp.asarray(ground),
                jnp.ones(len(ground), bool), jnp.asarray(d),
                jnp.zeros(len(ground)), jnp.asarray(graph.avg_intensity))
        start = jnp.asarray([-3.0, -3.0, 0.0])
        goal_a = jnp.asarray([3.0, 3.0, 0.0])
        goal_b = jnp.asarray([3.0, -3.0, 0.0])
        kw = dict(inscribed_radius=INSCRIBED,
                  inflation_descending_rate=RATE)
        r1 = plan_on_graph(cfg, *args, start, goal_a, **kw)
        # same goal, warm: near-instant, same path
        r2 = plan_on_graph(cfg, *args, start, goal_a, **kw,
                           warm_dist=r1.dist_carry, warm_goal_idx=r1.goal_idx)
        assert int(r2.iters) <= 2
        np.testing.assert_array_equal(np.asarray(r1.node_ids),
                                      np.asarray(r2.node_ids))
        # goal changed: the warm field must be discarded, not descended
        r3 = plan_on_graph(cfg, *args, start, goal_b, **kw,
                           warm_dist=r1.dist_carry, warm_goal_idx=r1.goal_idx)
        r3_cold = plan_on_graph(cfg, *args, start, goal_b, **kw)
        assert bool(r3.ok)
        np.testing.assert_array_equal(np.asarray(r3.node_ids),
                                      np.asarray(r3_cold.node_ids))


def test_warm_carry_resets_after_enclosure(small_world):
    """Review finding: once a region becomes unreachable, the un-clamped
    warm field can only creep upward and every warm tick would burn the
    full max_relax_iters forever. plan_on_graph resets the carry to the
    inf-init whenever the relaxation hit its bound, so the NEXT tick pays
    one bounded cold solve and warm ticks resume."""
    ground, graph = small_world
    cfg = GlobalPlannerConfig(max_long_edges=0, max_relax_iters=48)
    open_d = np.full(len(ground), 9999.0, np.float32)
    # seal the right half: a full lethal wall, goal inside the sealed part
    sealed = open_d.copy()
    sealed[np.abs(ground[:, 0]) < 0.5] = 0.0
    args_open = (jnp.asarray(graph.nbr_idx), jnp.asarray(graph.nbr_dist),
                 jnp.asarray(graph.nbr_valid), jnp.asarray(ground),
                 jnp.ones(len(ground), bool), jnp.asarray(open_d),
                 jnp.zeros(len(ground)), jnp.asarray(graph.avg_intensity))
    args_sealed = args_open[:5] + (jnp.asarray(sealed),) + args_open[6:]
    start = jnp.asarray([-3.0, 0.0, 0.0])
    goal = jnp.asarray([3.0, 0.0, 0.0])
    kw = dict(inscribed_radius=INSCRIBED, inflation_descending_rate=RATE)

    r_open = plan_on_graph(cfg, *args_open, start, goal, **kw)
    assert bool(r_open.ok)
    # wall appears: warm start from the stale field hits the bound
    r_seal = plan_on_graph(cfg, *args_sealed, start, goal, **kw,
                           warm_dist=r_open.dist_carry,
                           warm_goal_idx=r_open.goal_idx)
    assert int(r_seal.iters) == cfg.max_relax_iters
    # the carry must have been reset: the next tick is a bounded cold
    # solve that CONVERGES (unreachable start side settles at inf)
    r_next = plan_on_graph(cfg, *args_sealed, start, goal, **kw,
                           warm_dist=r_seal.dist_carry,
                           warm_goal_idx=r_seal.goal_idx)
    assert int(r_next.iters) < cfg.max_relax_iters
    assert not bool(r_next.ok)          # genuinely unreachable
    # and the tick after that is warm again
    r_warm = plan_on_graph(cfg, *args_sealed, start, goal, **kw,
                           warm_dist=r_next.dist_carry,
                           warm_goal_idx=r_next.goal_idx)
    assert int(r_warm.iters) <= 2
