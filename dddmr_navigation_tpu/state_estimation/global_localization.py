"""Global localization: recover the pose from an unknown start.

Re-designs the reference's particle-overflow machinery
(`mcl_3dl.cpp:661-679` + `pf.h:387-430` resizeParticle): while the filter
carries MORE than ``num_particles`` particles, every measurement tick
shrinks the set by ×0.75 (systematic resampling, so mass concentrates on
well-matching hypotheses), and once the runtime size is reached a fix
countdown of ``1 + ceil(lpf_step)·3`` ticks (three LPF sigmas) must drain
before the estimate is declared fixed.

Seeding differs deliberately: the reference resizes + relies on expansion
noise; here the big-N seed is explicit — particles spread over the ground
nodes × a yaw grid (the natural "anywhere on the walkable map" prior for
a point-cloud-graph stack). Ticks run with ``global_mode=True`` (uniform
bias, LPF resets) until handoff.

Shapes: each shrink changes the particle count, so the ladder of sizes
compiles one program per size — bounded at ⌈log₀.₇₅(num/num_start)⌉
programs, all tiny.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from dddmr_navigation_tpu.config import MCLConfig
from dddmr_navigation_tpu.state_estimation import pf as pflib
from dddmr_navigation_tpu.state_estimation.mcl import (
    MCLState, init_mcl, mcl_update, lpf_set)
from dddmr_navigation_tpu.geometry import rpy_from_quat


def seed_global_state(key, cfg: MCLConfig, ground_pts: np.ndarray,
                      num_start: int, z_offset: float = 0.0,
                      yaw_samples: int = 8) -> MCLState:
    """Big-N seed: ``num_start`` particles at uniformly drawn ground nodes
    with a uniform yaw grid."""
    key, k_node, k_yaw = jax.random.split(jax.random.PRNGKey(key)
                                          if isinstance(key, int) else key, 3)
    g = len(ground_pts)
    node_idx = jax.random.randint(k_node, (num_start,), 0, g)
    yaw_grid = jnp.linspace(-jnp.pi, jnp.pi, yaw_samples, endpoint=False)
    yaws = yaw_grid[jax.random.randint(k_yaw, (num_start,), 0, yaw_samples)]
    pos = jnp.asarray(ground_pts, jnp.float32)[node_idx] + jnp.asarray(
        [0.0, 0.0, z_offset], jnp.float32)
    particles = pflib.seed_particles_at(pos, yaws)
    center = jnp.mean(pos, axis=0)
    idq = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    return MCLState(
        particles=particles, state_prev_pos=center, state_prev_quat=idq,
        f_pos=lpf_set(cfg.lpf_step, center),
        f_ang=lpf_set(cfg.lpf_step, jnp.zeros(3)),
        key=key)


class GlobalLocalization:
    """Host-side routine: feed odometry + feature scans tick by tick;
    reports fixed=True once the shrink schedule lands on the runtime
    particle count and the three-sigma countdown drains. The converged
    :class:`MCLState` (at ``cfg.num_particles``) is the handoff to the
    runtime filter."""

    def __init__(self, cfg: MCLConfig, ctx, key, ground_pts: np.ndarray,
                 num_start: int | None = None, z_offset: float = 0.0,
                 yaw_samples: int = 16, shrink_every: int = 1):
        """``yaw_samples`` controls the seed yaw grid — the likelihood's
        yaw basin is a few tenths of a radian, so ≥16 is advised.
        ``shrink_every`` spaces the ×0.75 shrinks over N measure ticks
        (the reference shrinks per *motion-gated* measure,
        `mcl_3dl.cpp:196,661` — callers stepping every control tick
        should pace shrinks accordingly so expansion resetting gets time
        to explore before mass is committed)."""
        self.cfg = cfg
        self.ctx = ctx
        n0 = num_start or cfg.num_particles * 16
        self.state = seed_global_state(key, cfg, ground_pts, n0,
                                       z_offset=z_offset,
                                       yaw_samples=yaw_samples)
        self.fix_cnt = 0
        self.shrink_every = max(int(shrink_every), 1)
        self._ticks_since_shrink = 0
        self._step_global = jax.jit(functools.partial(
            mcl_update, cfg, global_mode=True))
        self._step_runtime = jax.jit(functools.partial(mcl_update, cfg))
        self._resize = {}

    @property
    def size(self) -> int:
        return self.state.particles.prob.shape[0]

    @property
    def fixed(self) -> bool:
        return self.size <= self.cfg.num_particles and self.fix_cnt == 0

    def step(self, odom_prev_pos, odom_prev_quat, odom_pos, odom_quat, dt,
             flat_pts, flat_mask, sharp_pts, sharp_mask, sharp_weight):
        """One measurement tick + shrink schedule. Returns the MCLOutput."""
        step = (self._step_global if self.size > self.cfg.num_particles
                else self._step_runtime)
        self.state, out = step(
            self.ctx, self.state, odom_prev_pos, odom_prev_quat,
            odom_pos, odom_quat, dt, flat_pts, flat_mask, sharp_pts,
            sharp_mask, sharp_weight)

        n = self.size
        self._ticks_since_shrink += 1
        if (n > self.cfg.num_particles
                and self._ticks_since_shrink >= self.shrink_every):
            self._ticks_since_shrink = 0
            reduced = int(n * 0.75)
            target = (reduced if reduced > self.cfg.num_particles
                      else self.cfg.num_particles)
            if target not in self._resize:
                self._resize[target] = jax.jit(functools.partial(
                    pflib.resize_particles, m=target))
            self.state = self.state._replace(
                particles=self._resize[target](self.state.particles))
            # three-sigma LPF settle (`mcl_3dl.cpp:674`)
            self.fix_cnt = 1 + int(math.ceil(self.cfg.lpf_step)) * 3
        elif self.fix_cnt:
            self.fix_cnt -= 1
        return out
