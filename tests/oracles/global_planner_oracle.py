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
