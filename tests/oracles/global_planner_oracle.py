"""Dijkstra oracle over the ground graph with the reference's composite
edge cost (`a_star_on_pc.cpp:278-288`, minus the turning term — see
wavefront.py). Validates the wavefront relaxation's admissibility."""
import heapq
import math

import numpy as np


def enter_cost(dgraph, node_weight, inscribed, rate):
    factor = np.exp(-rate * (dgraph - inscribed))
    cost = factor + node_weight
    return np.where(dgraph < inscribed, np.inf, cost)


def dijkstra(nbr_idx, nbr_dist, nbr_valid, enter, avg_int, goal):
    """Cost-to-goal over the *directed* graph where node u's outgoing
    edges are u's own neighbor list (reference A*: successors come from
    the pop's radius search, `a_star_on_pc.cpp:238-245` — the kNN orphan
    fallback makes the table asymmetric at sparse nodes). Dijkstra from
    the goal therefore walks reversed edges."""
    g = len(nbr_idx)
    # reversed adjacency: in_edges[u] = [(w, step) for w with u in w's list]
    in_edges = [[] for _ in range(g)]
    for w in range(g):
        for k in range(nbr_idx.shape[1]):
            if nbr_valid[w, k]:
                in_edges[nbr_idx[w, k]].append((w, nbr_dist[w, k]))
    dist = np.full(g, np.inf)
    dist[goal] = 0.0
    heap = [(0.0, goal)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        for (w, step) in in_edges[u]:
            # walking start→goal, w steps to u: pays enter(u) + avg_int(w)
            nd = d + step + enter[u] + avg_int[w]
            if nd < dist[w]:
                dist[w] = nd
                heapq.heappush(heap, (nd, w))
    return dist


def theta_parent2expanding(p_parent, p_cur, p_exp):
    """`getThetaFromParent2Expanding` (`a_star_on_pc.cpp:142-166`) incl.
    its quirks: zero when either XY vector vanishes, when the |x|
    components match within 1e-4, or when the angle is under the 0.345
    rad cap."""
    vx1 = p_cur[0] - p_parent[0]
    vy1 = p_cur[1] - p_parent[1]
    vx2 = p_exp[0] - p_cur[0]
    vy2 = p_exp[1] - p_cur[1]
    n1 = math.sqrt(vx1 * vx1 + vy1 * vy1)
    n2 = math.sqrt(vx2 * vx2 + vy2 * vy2)
    if n1 == 0.0 or n2 == 0.0:
        return 0.0
    cos_t = (vx1 * vx2 + vy1 * vy2) / (n1 * n2)
    cos_t = max(-1.0, min(1.0, cos_t))
    theta = math.acos(cos_t)
    if vx1 == 0 and vy1 == 0:
        theta = 0.0
    elif vx2 == 0 and vy2 == 0:
        theta = 0.0
    elif abs(abs(vx1) - abs(vx2)) <= 0.0001:
        theta = 0.0
    if abs(theta) <= 0.345:
        theta = 0.0
    return theta


def astar_reference(nbr_idx, nbr_dist, nbr_valid, enter, avg_int, positions,
                    start, goal, turning_weight=0.0):
    """Reference-faithful A* (`a_star_on_pc.cpp:200-329`) WITH the
    in-search parent-angle turning term. Returns (path node list, g-cost)
    or (None, inf)."""
    g_count = len(nbr_idx)
    gval = np.full(g_count, np.inf)
    parent = np.full(g_count, -1, np.int64)
    closed = np.zeros(g_count, bool)
    gval[start] = 0.0
    parent[start] = start
    heap = [(float(np.linalg.norm(positions[start] - positions[goal])),
             0.0, start)]
    while heap:
        f, gu, u = heapq.heappop(heap)
        if closed[u]:
            continue
        closed[u] = True
        if u == goal:
            break
        pu = positions[u]
        pp = positions[parent[u]]
        for k in range(nbr_idx.shape[1]):
            if not nbr_valid[u, k]:
                continue
            v = int(nbr_idx[u, k])
            if closed[v] or not np.isfinite(enter[v]):
                continue
            theta = theta_parent2expanding(pp, pu, positions[v])
            ng = (gval[u] + nbr_dist[u, k] + enter[v]
                  + theta * turning_weight + avg_int[u])
            if ng < gval[v]:
                gval[v] = ng
                parent[v] = u
                h = float(np.linalg.norm(positions[v] - positions[goal]))
                heapq.heappush(heap, (ng + h, ng, v))
    if not np.isfinite(gval[goal]):
        return None, np.inf
    path = [goal]
    while path[-1] != start:
        path.append(int(parent[path[-1]]))
    return path[::-1], float(gval[goal])


def path_reference_cost(path, positions, enter, avg_int, turning_weight):
    """Total reference g-cost of an arbitrary node path (the parity
    yardstick: wavefront-extracted paths are scored with the SAME formula
    the reference A* minimizes, turning term included)."""
    total = 0.0
    for i in range(1, len(path)):
        u, v = path[i - 1], path[i]
        step = float(np.linalg.norm(positions[v] - positions[u]))
        pp = positions[path[i - 2]] if i >= 2 else positions[u]
        theta = theta_parent2expanding(pp, positions[u], positions[v])
        total += step + enter[v] + theta * turning_weight + avg_int[u]
    return total
