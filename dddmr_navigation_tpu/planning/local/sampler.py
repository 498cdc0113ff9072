"""Velocity-sample generation (the DWA dynamic window), batched & static-shape.

Reproduces `DDSimpleTrajectoryGeneratorTheory::initialise`
(`dd_simple_trajectory_generator_theory.cpp:236-295`) and
`VelocityIterator` (`velocity_iterator.h:42-66`):

  * window: vx ∈ [max(min_vel_x, v/deceleration_ratio),
                  min(max_vel_x*, v + acc_x/controller_frequency)]
            (collapsed to v/deceleration_ratio when inverted by a speed
            zone), ω ∈ [max(-max_θ, ω-acc_θ/f), min(max_θ, ω+acc_θ/f)];
    *max_vel_x is capped by the perception speed-limit zone.
  * per-axis: n evenly spaced samples with a 0 inserted when the range
    spans it (and no sample is exactly 0) — hence n+1 padded slots;
  * motor-RPM feasibility: rpm_{r,l} = (v ± R·ω)·gear·60/π/d must stay
    below max_motor_shaft_rpm.

And `DDRotateInplaceTheory::initialise` (`dd_rotate_inplace_theory.cpp:
229-276`): exactly two samples (±rotation_speed), full-revolution horizon.
"""
from __future__ import annotations

import jax.numpy as jnp

from dddmr_navigation_tpu.config import (
    DDSimpleGeneratorConfig, OmniSimpleGeneratorConfig, DDRotateInplaceConfig,
    TrajectoryGeneratorLimits)


def velocity_axis_samples(vmin, vmax, num_samples: int):
    """Padded VelocityIterator: returns (num_samples+1,) values + valid mask,
    in ascending (reference iteration) order."""
    n = max(2, int(num_samples))
    step = (vmax - vmin) / (n - 1)
    base = vmin + step * jnp.arange(n, dtype=jnp.float32)
    base = base.at[-1].set(vmax)  # avoid rounding error at max
    degenerate = vmin == vmax     # single sample at vmin
    valid = jnp.where(degenerate, jnp.arange(n) == 0, jnp.ones(n, bool))
    base = jnp.where(degenerate, vmin, base)

    zero_present = jnp.any(jnp.where(valid, base == 0.0, False))
    insert_zero = (vmin < 0.0) & (vmax > 0.0) & (~zero_present) & (~degenerate)
    vals = jnp.concatenate([base, jnp.zeros((1,), jnp.float32)])
    mask = jnp.concatenate([valid, insert_zero[None]])
    # Ascending sort with invalid slots at the end (stable for ties).
    key = jnp.where(mask, vals, jnp.inf)
    order = jnp.argsort(key)
    return vals[order], mask[order]


def motor_constraint_ok(limits: TrajectoryGeneratorLimits, vx, w):
    """`isMotorConstraintSatisfied` (`dd_simple_...cpp:297-312`)."""
    if not limits.use_motor_constraint:
        return jnp.ones(jnp.broadcast_shapes(jnp.shape(vx), jnp.shape(w)), bool)
    vr = vx + limits.robot_radius * w
    vl = vx - limits.robot_radius * w
    k = limits.gear_ratio * 60.0 / 3.1415926 / limits.wheel_diameter
    return (jnp.abs(vr * k) < limits.max_motor_shaft_rpm) & (
        jnp.abs(vl * k) < limits.max_motor_shaft_rpm)


def dd_simple_samples(cfg: DDSimpleGeneratorConfig, v_now, w_now,
                      allowed_max_speed):
    """The (vx, ω) sample grid for the current robot state.

    Args:
      v_now, w_now: current linear/angular velocity.
      allowed_max_speed: perception speed-limit (≤0 means unlimited).

    Returns:
      samples: (S, 2) f32 [vx, ω] with S = (nx+1)*(nw+1) padded slots,
        ordered vx-major then ω (reference loop order).
      valid: (S,) bool.
    """
    lim = cfg.limits
    sim_period = 1.0 / cfg.controller_frequency

    max_vx_cap = jnp.where(allowed_max_speed > 0.0,
                           jnp.minimum(lim.max_vel_x, allowed_max_speed),
                           lim.max_vel_x)
    max_vx = jnp.minimum(max_vx_cap, v_now + lim.acc_lim_x * sim_period)
    min_vx = jnp.maximum(lim.min_vel_x, v_now / lim.deceleration_ratio)
    inverted = max_vx < min_vx
    collapsed = v_now / lim.deceleration_ratio
    min_vx = jnp.where(inverted, collapsed, min_vx)
    max_vx = jnp.where(inverted, collapsed, max_vx)

    max_w = jnp.minimum(lim.max_vel_theta, w_now + lim.acc_lim_theta * sim_period)
    min_w = jnp.maximum(-lim.max_vel_theta, w_now - lim.acc_lim_theta * sim_period)

    vx_vals, vx_mask = velocity_axis_samples(min_vx, max_vx, cfg.linear_x_sample)
    w_vals, w_mask = velocity_axis_samples(min_w, max_w, cfg.angular_z_sample)

    vx_g = jnp.repeat(vx_vals, w_vals.shape[0])
    w_g = jnp.tile(w_vals, vx_vals.shape[0])
    mask = jnp.repeat(vx_mask, w_vals.shape[0]) & jnp.tile(w_mask, vx_vals.shape[0])
    mask = mask & motor_constraint_ok(lim, vx_g, w_g)
    return jnp.stack([vx_g, w_g], axis=-1), mask


def _omni_axis_window(v_now, vmin_lim, vmax_lim, acc, sim_period, decel):
    """One linear-axis dynamic window of the omni sampler
    (`omni_simple_trajectory_generator_theory.cpp:283-309`): symmetric
    ±acc·T around v_now, with the deceleration_ratio branch when the robot
    rides a speed extreme."""
    vmax = jnp.minimum(vmax_lim, v_now + acc * sim_period)
    vmin = jnp.maximum(vmin_lim, v_now - acc * sim_period)
    at_max = v_now >= vmax_lim / decel
    at_min = v_now <= vmin_lim / decel
    vmin = jnp.where(at_max, jnp.maximum(vmin_lim, v_now / decel), vmin)
    vmax = jnp.where(~at_max & at_min,
                     jnp.minimum(vmax_lim, v_now / decel), vmax)
    return vmin, vmax


def omni_simple_samples(cfg: OmniSimpleGeneratorConfig, v_now, vy_now, w_now):
    """The (vx, vy, ω) sample grid for the current robot state
    (`OmniSimpleTrajectoryGeneratorTheory::initialise`,
    `omni_simple_trajectory_generator_theory.cpp:259-332`).

    The reference's omni motor constraint is a stub returning true
    (`:334-343`), so no RPM gate is applied.

    Returns:
      samples: (S, 3) f32 [vx, vy, ω], S = (nx+1)(ny+1)(nw+1) padded slots,
        vx-major then vy then ω (reference loop order).
      valid: (S,) bool.
    """
    lim = cfg.limits
    sim_period = 1.0 / cfg.controller_frequency

    min_vx, max_vx = _omni_axis_window(
        v_now, lim.min_vel_x, lim.max_vel_x, lim.acc_lim_x, sim_period,
        lim.deceleration_ratio)
    min_vy, max_vy = _omni_axis_window(
        vy_now, lim.min_vel_y, lim.max_vel_y, lim.acc_lim_y, sim_period,
        lim.deceleration_ratio)
    max_w = jnp.minimum(lim.max_vel_theta,
                        w_now + lim.acc_lim_theta * sim_period)
    min_w = jnp.maximum(-lim.max_vel_theta,
                        w_now - lim.acc_lim_theta * sim_period)

    vx_vals, vx_mask = velocity_axis_samples(min_vx, max_vx,
                                             cfg.linear_x_sample)
    vy_vals, vy_mask = velocity_axis_samples(min_vy, max_vy,
                                             cfg.linear_y_sample)
    w_vals, w_mask = velocity_axis_samples(min_w, max_w, cfg.angular_z_sample)

    nx, ny, nw = vx_vals.shape[0], vy_vals.shape[0], w_vals.shape[0]
    vx_g = jnp.repeat(vx_vals, ny * nw)
    vy_g = jnp.tile(jnp.repeat(vy_vals, nw), nx)
    w_g = jnp.tile(w_vals, nx * ny)
    mask = (jnp.repeat(vx_mask, ny * nw)
            & jnp.tile(jnp.repeat(vy_mask, nw), nx)
            & jnp.tile(w_mask, nx * ny))
    return jnp.stack([vx_g, vy_g, w_g], axis=-1), mask


def rotate_inplace_samples(cfg: DDRotateInplaceConfig,
                           limits: TrajectoryGeneratorLimits):
    """±rotation_speed, motor-gated (`dd_rotate_inplace_theory.cpp:259-268`)."""
    w = jnp.asarray([cfg.rotation_speed, -cfg.rotation_speed], jnp.float32)
    vx = jnp.zeros((2,), jnp.float32)
    valid = motor_constraint_ok(limits, vx, w)
    return jnp.stack([vx, w], axis=-1), valid
