"""Batched wavefront shortest-path over the ground graph.

Replaces `A_Star_on_Graph::getPath` (`a_star_on_pc.cpp:200-329`) — a
sequential best-first expansion with per-pop radius searches — with
**Bellman–Ford-style parallel relaxation** on the precomputed (G, K)
neighbor table: every iteration relaxes all nodes at once (one gather +
min-reduce, pure VPU), converging in O(path-diameter) iterations. The
composite edge cost reproduces `a_star_on_pc.cpp:278-288`:

  g += step_dist + exp(-inflation_descending_rate · (dGraph - inscribed))
       + node_weight + avg_intensity   [+ θ·turning_weight — see note]

with the lethal prune ``dGraph < inscribed_radius``
(`a_star_on_pc.cpp:263-266`). The parent-angle turning term θ·w_turn
(`:284-287`) depends on the expansion *tree*, which a label-correcting
relaxation doesn't maintain; with the deployment default w_turn = 0.1 rad
its contribution is bounded by ~0.3 per vertex and mainly discourages
zig-zag ties — we approximate it post-hoc during path extraction
(choosing the straightest among near-equal successors). Parity is defined
on resulting paths/costs (SURVEY.md §7 "sequential contamination").

Distances are computed **from the goal** so one relaxation serves every
start (and every robot sharing the map) — path extraction is then greedy
descent, batched over starts.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class WavefrontResult(NamedTuple):
    dist: jnp.ndarray        # (G,) cost-to-goal
    reachable: jnp.ndarray   # (G,) bool
    iters: jnp.ndarray       # () int32 iterations run


def node_costs(dgraph, node_weight, *, inscribed_radius,
               inflation_descending_rate):
    """Cost of *entering* a node — the dGraph inflation factor plus the
    static node weight (`a_star_on_pc.cpp:278-288`: both are evaluated on
    the expanded successor). Lethal nodes (dGraph < inscribed) are +inf
    (`:263-266`). The avg-intensity term is a property of the expansion
    *source* and is added separately in the relaxation."""
    factor = jnp.exp(-inflation_descending_rate * (dgraph - inscribed_radius))
    cost = factor + node_weight
    lethal = dgraph < inscribed_radius
    return jnp.where(lethal, jnp.inf, cost)


def wavefront_distances(nbr_idx, nbr_dist, nbr_valid, enter_cost, avg_intensity,
                        goal_idx, *, max_iters: int = 512) -> WavefrontResult:
    """Cost-to-goal for every node by iterative relaxation.

    ``dist[u] = min_v dist[v] + step_uv + enter_cost[v] + avg_intensity[u]``
    — the start→goal edge (u→v) pays the successor's inflation/node terms
    and the source's neighborhood intensity, matching the reference A*
    (`a_star_on_pc.cpp:288`).

    Args:
      nbr_idx/nbr_dist/nbr_valid: (G, K) padded neighbor table.
      enter_cost: (G,) per-node entry cost (inf = lethal).
      avg_intensity: (G,) per-source neighborhood intensity.
      goal_idx: () int32 goal node.
      max_iters: upper bound; the loop exits early at fixpoint.
    """
    g = nbr_idx.shape[0]
    big = jnp.float32(jnp.inf)
    dist0 = jnp.full((g,), big).at[goal_idx].set(0.0)
    safe_idx = jnp.maximum(nbr_idx, 0)

    def body(carry):
        dist, _, it = carry
        nd = dist[safe_idx]                              # (G, K) neighbor dists
        cand = nd + nbr_dist + enter_cost[safe_idx] + avg_intensity[:, None]
        cand = jnp.where(nbr_valid, cand, big)
        new = jnp.minimum(dist, jnp.min(cand, axis=1))
        new = new.at[goal_idx].set(0.0)
        changed = jnp.any(new < dist)
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    dist, _, iters = lax.while_loop(
        cond, body, (dist0, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    return WavefrontResult(dist=dist, reachable=jnp.isfinite(dist), iters=iters)


def extract_path(nbr_idx, nbr_dist, nbr_valid, enter_cost, dist, start_idx,
                 goal_idx, *, max_len: int = 512, turning_weight: float = 0.0,
                 positions=None):
    """Greedy descent start → goal over the relaxed distance field.

    At each node the successor minimizes ``dist[j] + step_ij`` (the edge
    we'd traverse); with ``turning_weight > 0`` and node positions given,
    near-ties are broken toward the straightest continuation, emulating
    the reference's θ·turning_weight term.

    Returns (indices (max_len,), valid (max_len,), length, ok).
    """
    g = nbr_idx.shape[0]
    safe_idx = jnp.maximum(nbr_idx, 0)
    big = jnp.float32(jnp.inf)

    def step(carry, _):
        cur, prev, done = carry
        nd = dist[safe_idx[cur]]
        cand = nd + nbr_dist[cur] + enter_cost[safe_idx[cur]]
        cand = jnp.where(nbr_valid[cur], cand, big)
        if positions is not None and turning_weight > 0.0:
            # angle penalty between (prev→cur) and (cur→nbr)
            v_in = positions[cur] - positions[prev]
            v_out = positions[safe_idx[cur]] - positions[cur]
            norm_in = jnp.linalg.norm(v_in) + 1e-9
            norm_out = jnp.linalg.norm(v_out, axis=1) + 1e-9
            cosang = jnp.clip(
                jnp.sum(v_in[None, :] * v_out, axis=1) / (norm_in * norm_out),
                -1.0, 1.0)
            theta = jnp.arccos(cosang)
            has_prev = prev != cur
            cand = cand + jnp.where(has_prev, theta * turning_weight, 0.0)
        nxt = safe_idx[cur][jnp.argmin(cand)]
        at_goal = cur == goal_idx
        stuck = ~jnp.isfinite(jnp.min(cand))
        new_done = done | at_goal | stuck
        nxt = jnp.where(new_done, cur, nxt)
        return (nxt, jnp.where(new_done, prev, cur), new_done), (cur, ~done)

    (final, _, done), (idxs, valids) = lax.scan(
        step, (start_idx, start_idx, jnp.asarray(False)), None, length=max_len)
    ok = jnp.isfinite(dist[start_idx]) & (final == goal_idx)
    length = jnp.sum(valids)
    return idxs, valids, length, ok
