"""Headline benchmark: multi-robot sampling-MPC throughput on one chip.

Scenario (BASELINE.json configs 1+4 hybrid): a fleet of diff-drive robots,
each scoring a dense dynamic-window rollout grid against its own obstacle
cloud and plan, closed-loop, 2 s horizon. Reference comparison point: the
C++ stack evaluates ~50 rollouts per 10 Hz control tick per robot
(≈500 rollouts/s/process, `p2p_move_base_localization.yaml:200-204`).

Prints ONE JSON line:
  {"metric": "rollouts_per_s", "value": N, "unit": "rollouts/s",
   "vs_baseline": N / 500, ...extras}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", type=int, default=64)
    ap.add_argument("--ticks", type=int, default=30)
    ap.add_argument("--obstacles", type=int, default=512)
    ap.add_argument("--linear-samples", type=int, default=16)
    ap.add_argument("--angular-samples", type=int, default=16)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dddmr_navigation_tpu.config import (
        LocalPlannerConfig, DDSimpleGeneratorConfig)
    from dddmr_navigation_tpu.geometry import quat_from_yaw
    from dddmr_navigation_tpu.planning.local.planner import make_global_plan
    from dddmr_navigation_tpu.parallel.fleet import (
        FleetState, fleet_tick, integrate_fleet)

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    cfg = LocalPlannerConfig(
        generator=DDSimpleGeneratorConfig(
            linear_x_sample=args.linear_samples,
            angular_z_sample=args.angular_samples,
            max_num_steps=40),
        max_obstacle_points=args.obstacles,
        collision_obstacle_chunk=16,
        collision_near_k=128,
    )
    b = args.robots
    s_padded = cfg.generator.n_samples_padded

    # per-robot sine plans offset in y so robots don't coincide
    xs = np.arange(0, 8.0, 0.1, dtype=np.float32)
    plans_np = []
    for i in range(b):
        ys = 0.4 * np.sin(xs + i * 0.3) + 0.02 * i
        plans_np.append(np.stack([xs, ys, np.zeros_like(xs)], 1))
    plan_leaves = [make_global_plan(p, max_len=cfg.max_plan_len)
                   for p in plans_np]
    plans = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *plan_leaves)

    rng = np.random.default_rng(0)
    obstacles = rng.uniform([1.0, -2, 0], [8, 2, 0.5],
                            size=(b, args.obstacles, 3)).astype(np.float32)
    obs_valid = jnp.ones((b, args.obstacles), bool)
    obstacles = jnp.asarray(obstacles)

    state = FleetState(
        pos=jnp.asarray(np.stack([np.zeros(b), 0.02 * np.arange(b),
                                  np.zeros(b)], 1), jnp.float32),
        quat=jnp.broadcast_to(quat_from_yaw(jnp.float32(0.0)), (b, 4)),
        v=jnp.zeros((b,)), w=jnp.zeros((b,)))

    dt = 1.0 / cfg.controller_frequency

    # NOTE: plans must be an ARGUMENT, not a closure capture — jit'd
    # closure constants of this size cost ~30 ms per dispatch (measured
    # 277x slowdown on this stack).
    @jax.jit
    def step(plans, state, obstacles, obs_valid):
        vx, wz, codes, costs = fleet_tick(cfg, plans, state, obstacles,
                                          obs_valid)
        new_state = integrate_fleet(state, vx, wz, dt)
        return new_state, codes, costs

    # warmup / compile
    t0 = time.perf_counter()
    st, codes, costs = step(plans, state, obstacles, obs_valid)
    jax.block_until_ready(costs)
    compile_s = time.perf_counter() - t0
    print(f"compile+first: {compile_s:.1f}s", file=sys.stderr)

    lat = []
    all_costs = []
    for i in range(args.ticks):
        t0 = time.perf_counter()
        st, codes, costs = step(plans, st, obstacles, obs_valid)
        jax.block_until_ready(costs)
        lat.append(time.perf_counter() - t0)
        all_costs.append(costs)  # host readback deferred: a D2H transfer
        # inside the loop rides the device tunnel (~30 ms RTT) and stalls
        # the next tick
    found_total = int(sum(int(jnp.sum(c >= 0)) for c in all_costs))

    lat = np.asarray(lat)
    p50 = float(np.percentile(lat, 50))
    p99 = float(np.percentile(lat, 99))
    rollouts_per_tick = b * s_padded
    rps = rollouts_per_tick / p50
    print(f"robots={b} samples/robot={s_padded} rollouts/tick={rollouts_per_tick}",
          file=sys.stderr)
    print(f"p50={1e3*p50:.2f}ms p99={1e3*p99:.2f}ms rollouts/s={rps:,.0f}",
          file=sys.stderr)

    out = {
        "metric": "rollouts_per_s",
        "value": round(rps),
        "unit": "rollouts/s",
        "vs_baseline": round(rps / 500.0, 2),
        "p50_tick_ms": round(1e3 * p50, 3),
        "p99_tick_ms": round(1e3 * p99, 3),
        "rollouts_per_tick": rollouts_per_tick,
        "robots": b,
        "tick_budget_ms": 50.0,
        "p99_under_budget": bool(1e3 * p99 < 50.0),
        "device": f"{dev.platform}:{dev.device_kind}",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
