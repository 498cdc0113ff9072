"""Recovery behaviors: rotate-in-place.

`RotateInPlaceBehavior::runBehavior`
(`rotate_inplace_behavior.cpp:123-310`): rotate a full revolution —
tracked as "reach 180° from start, then return home within tolerance" —
re-scoring rotate-in-place trajectories against fresh observations every
iteration; a collision (all rotate trajectories rejected) fails the
recovery. The per-iteration work is a pure jittable step; the loop lives
in the host driver (or a `lax.while_loop` for fully-on-device fleets).
"""
from __future__ import annotations

import dataclasses

import enum
from typing import NamedTuple

import jax.numpy as jnp

from dddmr_navigation_tpu.config import LocalPlannerConfig
from dddmr_navigation_tpu.geometry import yaw_from_quat, shortest_angular_distance
from dddmr_navigation_tpu.planning.local.sampler import rotate_inplace_samples
from dddmr_navigation_tpu.planning.local.rollout import rollout
from dddmr_navigation_tpu.planning.local.critics import (
    PrunePlan, score_rollouts, best_trajectory)


class RecoveryState(enum.IntEnum):
    """`dddmr_enum_states.h:56-62`."""
    RECOVERY_BEHAVIOR_NOT_FOUND = 0
    INTERRUPT_BY_CANCEL = 1
    INTERRUPT_BY_NEW_GOAL = 2
    RECOVERY_DONE = 3
    RECOVERY_FAIL = 4


class RotateRecoveryState(NamedTuple):
    start_yaw: jnp.ndarray   # () f32
    got_180: jnp.ndarray     # () bool
    active: jnp.ndarray      # () bool


def start_rotate_recovery(robot_quat) -> RotateRecoveryState:
    return RotateRecoveryState(
        start_yaw=yaw_from_quat(robot_quat),
        got_180=jnp.asarray(False), active=jnp.asarray(True))


def rotate_recovery_step(cfg: LocalPlannerConfig, rec: RotateRecoveryState,
                         robot_pos, robot_quat, obstacles, obs_valid,
                         tolerance: float = 0.3):
    """One recovery iteration. Returns (rec', wz_cmd, done, failed)."""
    gen = cfg.rotate_generator
    samples, valid = rotate_inplace_samples(gen, cfg.generator.limits)
    sim_t = 6.28 / jnp.maximum(jnp.abs(samples[:, 1]), 1e-6)
    r = rollout(samples, valid, robot_pos, robot_quat,
                sim_time=0.0, sim_granularity=gen.sim_granularity,
                angular_sim_granularity=gen.angular_sim_granularity,
                min_vel_x=-1.0, min_vel_theta=-1.0, max_vel_x=-1.0,
                max_steps=gen.max_num_steps, sim_time_per_sample=sim_t)
    # empty prune plan: only the collision critic is bound to the rotate
    # generator during recovery (`recovery_behaviors` config)
    p = cfg.max_prune_len
    empty_plan = PrunePlan(
        positions=jnp.zeros((p, 3)), quats=jnp.zeros((p, 4)),
        intensity=jnp.zeros((p,)), valid=jnp.zeros((p,), bool),
        count=jnp.asarray(0, jnp.int32))
    costs, rejected = score_rollouts(
        dataclasses.replace(cfg.rotate_critics, shortest_angle=None),
        gen.cuboid, r,
        empty_plan, obstacles, obs_valid,
        obstacle_chunk=cfg.collision_obstacle_chunk,
        collision_near_k=cfg.collision_near_k)
    idx, cost, found = best_trajectory(costs, rejected)
    failed = ~found

    yaw = yaw_from_quat(robot_quat)
    to_180 = jnp.abs(shortest_angular_distance(yaw, rec.start_yaw + jnp.pi))
    got_180 = rec.got_180 | (to_180 < tolerance)
    home = jnp.abs(shortest_angular_distance(yaw, rec.start_yaw))
    done = got_180 & (home < tolerance)

    wz = jnp.where(found & (~done), r.samples[idx, -1], 0.0)
    rec2 = RotateRecoveryState(start_yaw=rec.start_yaw, got_180=got_180,
                               active=rec.active & (~done) & (~failed))
    return rec2, wz, done, failed
