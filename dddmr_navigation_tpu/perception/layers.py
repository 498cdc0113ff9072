"""Auxiliary perception layers: path-blocked strategy, speed-limit zones,
no-entry zones.

Reference plugins: `path_blocked_strategy.cpp`, `speed_limit_layer.cpp`,
`no_entry_layer.cpp` — each re-expressed as a pure masked reduction
instead of KD-tree searches.
"""
from __future__ import annotations

import jax.numpy as jnp

from dddmr_navigation_tpu.planning.local.critics import PrunePlan


def path_blocked(prune: PrunePlan, obstacles, obs_valid,
                 check_radius: float = 0.3):
    """`PathBlockedStrategy::selfMark` (`path_blocked_strategy.cpp:56-101`):
    the opinion is PATH_BLOCKED_WAIT when any aggregated-observation point
    lies within ``check_radius`` of a *forward* prune-plan pose
    (intensity ≥ 0). Returns a () bool."""
    fwd = prune.valid & (prune.intensity >= 0.0)
    d = prune.positions[:, None, :] - obstacles[None, :, :]
    d2 = jnp.sum(d * d, axis=-1)
    ok = fwd[:, None] & obs_valid[None, :]
    hit = jnp.any(jnp.where(ok, d2, jnp.inf) <= check_radius ** 2)
    return hit & (jnp.sum(prune.valid) > 0)


def speed_limit_at(robot_pos, zone_points, zone_valid, zone_speed,
                   match_radius: float = 0.5):
    """`SpeedLimitLayer::selfMark` (`speed_limit_layer.cpp:222-300`): when
    the robot stands inside a speed zone (a zone point within
    ``match_radius``), the allowed max linear speed becomes the zone's;
    -1 = unlimited.

    Args:
      zone_points: (Z, 3) padded points across all speed zones.
      zone_speed: (Z,) speed attached to each point.
    """
    d2 = jnp.sum((zone_points - robot_pos) ** 2, axis=-1)
    d2 = jnp.where(zone_valid, d2, jnp.inf)
    i = jnp.argmin(d2)
    inside = d2[i] <= match_radius ** 2
    return jnp.where(inside, zone_speed[i], -1.0)


def no_entry_dgraph(ground, ground_valid, zone_points, zone_valid,
                    inflation_distance: float, max_obstacle_distance: float):
    """`NoEntryLayer::selfMark` (`no_entry_layer.cpp:225-290`): writes the
    XY distance-to-zone into a per-node distance field for all ground
    nodes within ``inflation_distance`` of any zone point (lethal
    semantics — consumed via min with the dynamic layer's dGraph).

    Returns (G,) distance field (max_obstacle_distance where untouched).
    """
    d = ground[:, None, :2] - zone_points[None, :, :2]
    d2 = jnp.sum(d * d, axis=-1)
    ok = ground_valid[:, None] & zone_valid[None, :]
    dmin = jnp.sqrt(jnp.min(jnp.where(ok, d2, jnp.inf), axis=1))
    within = dmin <= inflation_distance
    return jnp.where(within, dmin, max_obstacle_distance)


def min_dgraph(*dgraphs):
    """`StackedPerception::get_min_dGraphValue`
    (`stacked_perception.cpp:114-126`): the effective distance field is the
    elementwise min over layers."""
    out = dgraphs[0]
    for d in dgraphs[1:]:
        out = jnp.minimum(out, d)
    return out
