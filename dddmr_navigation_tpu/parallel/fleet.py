"""Multi-robot / multi-scenario batching and sharding.

The reference runs ONE robot per process tree (ROS nodes + DDS). The TPU
build's scaling axis is data-parallel **scenarios**: every per-robot pytree
gains a leading batch axis via `vmap`, and the batch is sharded across
chips with `jax.sharding` (BASELINE.json configs 4-5: 64 robots on one
host, 4096 scenarios across hosts). Cost/argmin reductions ride ICI via
XLA collectives inside `shard_map` (SURVEY.md §2.12).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from dddmr_navigation_tpu.config import LocalPlannerConfig
from dddmr_navigation_tpu.planning.local.planner import (
    GlobalPlan, compute_velocity_command)


class FleetState(NamedTuple):
    """Per-robot dynamic state, batched on axis 0."""
    pos: jnp.ndarray     # (B, 3)
    quat: jnp.ndarray    # (B, 4)
    v: jnp.ndarray       # (B,)
    w: jnp.ndarray       # (B,)


def fleet_tick(cfg: LocalPlannerConfig, plans: GlobalPlan, state: FleetState,
               obstacles, obs_valid, allowed_max_speed=None,
               heading_deviation=None):
    """One control tick for a batch of robots: vmapped
    `compute_velocity_command`. All args carry a leading robot axis except
    the static config.

    Returns (cmd_vx (B,), cmd_wz (B,), state_code (B,), best_cost (B,)).
    """
    b = state.pos.shape[0]
    if allowed_max_speed is None:
        allowed_max_speed = jnp.full((b,), -1.0, jnp.float32)
    if heading_deviation is None:
        heading_deviation = jnp.zeros((b,), jnp.float32)

    def one(plan, pos, quat, v, w, obs, obs_m, cap, hd):
        cmd = compute_velocity_command(cfg, plan, pos, quat, v, w, obs, obs_m,
                                       cap, hd)
        return cmd.vx, cmd.wz, cmd.state, cmd.best_cost

    return jax.vmap(one)(plans, state.pos, state.quat, state.v, state.w,
                         obstacles, obs_valid, allowed_max_speed,
                         heading_deviation)


def integrate_fleet(state: FleetState, vx, wz, dt: float) -> FleetState:
    """Perfect-execution unicycle integration of the commanded twist
    (host-free closed-loop stepping for benchmarks/sim)."""
    from dddmr_navigation_tpu.geometry import (
        yaw_from_quat, quat_from_yaw, quat_multiply)
    yaw = yaw_from_quat(state.quat)
    dx = vx * jnp.cos(yaw) * dt
    dy = vx * jnp.sin(yaw) * dt
    pos = state.pos + jnp.stack([dx, dy, jnp.zeros_like(dx)], axis=-1)
    quat = quat_multiply(state.quat, quat_from_yaw(wz * dt))
    return FleetState(pos=pos, quat=quat, v=vx, w=wz)


def make_fleet_mesh(n_devices: int | None = None, axis: str = "scenarios"):
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], axis_names=(axis,))


def sharded_fleet_tick(cfg: LocalPlannerConfig, mesh: Mesh,
                       axis: str = "scenarios"):
    """Build a jitted fleet tick with the robot batch sharded over the mesh.

    The returned callable maps sharded per-robot inputs to sharded
    commands plus a *replicated* fleet health scalar (mean best cost over
    non-rejected robots) — the cross-chip `psum` exercising ICI, the
    analogue of the reference's central move-base monitoring.
    """
    from jax import shard_map

    def tick(plans, state, obstacles, obs_valid):
        out_vx, out_wz, codes, costs = fleet_tick(
            cfg, plans, state, obstacles, obs_valid)
        ok = costs >= 0
        local_sum = jnp.sum(jnp.where(ok, costs, 0.0))
        local_cnt = jnp.sum(ok.astype(jnp.float32))
        total = jax.lax.psum(local_sum, axis)
        cnt = jax.lax.psum(local_cnt, axis)
        return out_vx, out_wz, codes, costs, total / jnp.maximum(cnt, 1.0)

    spec = P(axis)
    rep = P()
    sharded = shard_map(
        tick, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec, rep),
        check_vma=False)
    return jax.jit(sharded)


def shard_fleet_arrays(mesh: Mesh, tree, axis: str = "scenarios"):
    """Place a robot-batched pytree with axis 0 sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


# ---------------------------------------------------------------------------
# Fused-vertical fleet: the ENTIRE perception→replan→rollout loop
# (control/fused.py) vmapped over robots and sharded over the mesh
# ---------------------------------------------------------------------------

def fused_fleet_tick(nav_cfg, spec, ri_spec, params, fmap, states,
                     scans, scan_masks, positions, quats, sensor_offset,
                     goals, v_now, w_now):
    """One full-vertical tick for a fleet: each robot runs its own
    mark/clear → composed dGraph → wavefront replan → path extraction →
    interpolation → rollouts → critics chain over the SHARED map
    (`fmap` broadcasts; per-robot state/scan/goal batch on axis 0).

    Scenario-DP over the whole vertical — the reference runs one ROS
    process tree per robot; here the full stack is one vmapped program.

    Returns (new_states, vx (B,), wz (B,), state_codes (B,),
    plan_ok (B,)).
    """
    from dddmr_navigation_tpu.control.fused import fused_tick

    def one(state, scan, smask, pos, quat, goal, v, w):
        s2, out = fused_tick(nav_cfg, spec, ri_spec, params,
                             "differential_drive_simple", fmap, state,
                             scan, smask, pos, quat, sensor_offset, goal,
                             v, w)
        return s2, out.vx, out.wz, out.state, out.plan_ok

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
        states, scans, scan_masks, positions, quats, goals, v_now, w_now)


def sharded_fused_fleet_tick(nav_cfg, spec, ri_spec, params, mesh: Mesh,
                             axis: str = "scenarios"):
    """Jitted fused-vertical fleet tick with robots sharded over the mesh
    and the map replicated; the fleet-health psum rides the mesh axis
    like `sharded_fleet_tick`."""
    from jax import shard_map

    def tick(fmap, states, scans, scan_masks, positions, quats,
             sensor_offset, goals, v_now, w_now):
        s2, vx, wz, codes, ok = fused_fleet_tick(
            nav_cfg, spec, ri_spec, params, fmap, states, scans,
            scan_masks, positions, quats, sensor_offset, goals, v_now,
            w_now)
        found = jnp.sum((codes == 4).astype(jnp.float32))
        total = jax.lax.psum(found, axis)
        return s2, vx, wz, codes, ok, total

    spec_b = P(axis)
    rep = P()
    sharded = shard_map(
        tick, mesh=mesh,
        in_specs=(rep, spec_b, spec_b, spec_b, spec_b, spec_b, rep, spec_b,
                  spec_b, spec_b),
        out_specs=(spec_b, spec_b, spec_b, spec_b, spec_b, rep),
        check_vma=False)
    return jax.jit(sharded)
