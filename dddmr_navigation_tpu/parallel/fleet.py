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


def track_twist(v_now, w_now, vx_cmd, wz_cmd, dt, limits):
    """Acceleration-limited twist tracking — the physics the perfect-
    execution integrators ignored (round-3 review: the closed-loop demos
    assumed commanded == achieved). The reachable-velocity window is the
    SAME one the dynamic-window sampler offers per control period
    (`dd_simple_trajectory_generator_theory.cpp:236-295`,
    sampler.dd_simple_samples): up to ``v + acc_lim_x·dt`` speeding up
    and down to ``v / deceleration_ratio`` braking (multiplicative, NOT
    an additive decel bound — a prior version used acc·ratio·dt, which
    let the sim overshoot every braking rollout the critics had scored).
    When the window inverts (speed-cap below the braking floor) it
    collapses to the braking floor, exactly like the sampler. So the sim
    executes only velocities the sampler could have offered — the
    closed loop holds the critics' collision guarantees.

    Returns (v_achieved, w_achieved)."""
    hi = v_now + limits.acc_lim_x * dt
    lo = v_now / limits.deceleration_ratio
    v = jnp.where(lo > hi, lo, jnp.clip(vx_cmd, lo, hi))
    aw = limits.acc_lim_theta * dt
    w = jnp.clip(wz_cmd, w_now - aw, w_now + aw)
    return v, w


def integrate_fleet(state: FleetState, vx, wz, dt: float,
                    limits=None) -> FleetState:
    """Unicycle integration of the commanded twist. With ``limits`` (a
    DD limits config) the command is first tracked through the
    acceleration-limited base model (:func:`track_twist`); without, the
    legacy perfect-execution stepping is kept for kernel benchmarks."""
    from dddmr_navigation_tpu.geometry import (
        yaw_from_quat, quat_from_yaw, quat_multiply)
    if limits is not None:
        vx, wz = track_twist(state.v, state.w, vx, wz, dt, limits)
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
        from dddmr_navigation_tpu.planning.local.planner import PlannerState
        found = jnp.sum((codes == int(PlannerState.TRAJECTORY_FOUND))
                        .astype(jnp.float32))
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


# ---------------------------------------------------------------------------
# FULL-FIDELITY fleet vertical: per robot, ONE device program runs
# localize (MCL on drifting odometry) → perceive (mark/clear) → replan
# (turning-aware wavefront + LOS) → FSM (d_initial…d_succeed) → generator
# selection (simple / rotate-shortest-angle) → rotate-in-place recovery —
# the complete per-robot stack of the reference
# (`p2p_move_base.cpp:265-658` + `mcl_3dl.cpp:143-234` +
# `rotate_inplace_behavior.cpp:123-310`), vmapped over the fleet.
# ---------------------------------------------------------------------------

class FleetFullState(NamedTuple):
    """Everything one robot carries tick→tick, batched on axis 0."""
    fused: object            # FusedState (perception + warm wavefront)
    fsm: object              # FSMState
    recovery: object         # RotateRecoveryState
    recovery_succeed: jnp.ndarray  # (B,) bool — last completed result
    pos: jnp.ndarray         # (B, 3) TRUE pose (sim ground truth)
    quat: jnp.ndarray        # (B, 4)
    v: jnp.ndarray           # (B,)
    w: jnp.ndarray           # (B,)
    mcl: object              # MCLState or None (localization off)
    odom_prev_pos: jnp.ndarray   # (B, 3) previous odom sample
    odom_prev_quat: jnp.ndarray  # (B, 4)


def init_fleet_full_state(nav_cfg, num_ground_nodes: int, positions, quats,
                          localize: bool = False, mcl_cfg=None, seed: int = 0):
    """Stack per-robot initial states. ``positions``/``quats`` are (B,3)/
    (B,4) numpy arrays; with ``localize`` the MCL filters start at the
    true poses (the localization demo then has to HOLD them against the
    injected odometry drift)."""
    import numpy as np
    from dddmr_navigation_tpu.control.fused import init_fused_state
    from dddmr_navigation_tpu.control.fsm import init_fsm_state
    from dddmr_navigation_tpu.control.recovery import RotateRecoveryState
    from dddmr_navigation_tpu.state_estimation.mcl import init_mcl

    b = len(positions)
    fused = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x),
        *[init_fused_state(nav_cfg, num_ground_nodes, robot_xyz=positions[i])
          for i in range(b)])
    fsm = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x), *[init_fsm_state() for _ in range(b)])
    rec = RotateRecoveryState(
        start_yaw=jnp.zeros((b,)), got_180=jnp.zeros((b,), bool),
        active=jnp.zeros((b,), bool))
    mcl = None
    if localize:
        mcl = jax.tree_util.tree_map(
            lambda *x: jnp.stack(x),
            *[init_mcl(jax.random.PRNGKey(seed + i), mcl_cfg, positions[i],
                       quats[i]) for i in range(b)])
    pos = jnp.asarray(positions, jnp.float32)
    quat = jnp.asarray(quats, jnp.float32)
    return FleetFullState(
        fused=fused, fsm=fsm, recovery=rec,
        recovery_succeed=jnp.zeros((b,), bool),
        pos=pos, quat=quat, v=jnp.zeros((b,)), w=jnp.zeros((b,)),
        mcl=mcl, odom_prev_pos=pos, odom_prev_quat=quat)


def device_features_from_map(map_pts, ground_pts, pose_pos, pose_quat,
                             n_sharp: int = 512, n_flat: int = 256,
                             radius: float = 8.0):
    """Per-tick MCL feature clouds ON DEVICE: the nearest map points
    (sharp/less-sharp analogue) and ground points (flat analogue) around
    the TRUE pose, expressed in the robot base frame — the fleet bench's
    stand-in for the lego-loam feature front-end
    (`mcl_feature_node.cpp:15-35`), so localization consumes features
    consistent with where the robot actually is while the filter itself
    only sees the drifting odometry."""
    from dddmr_navigation_tpu.geometry import quat_conjugate, quat_rotate

    def pick(pts, n):
        # deterministic pseudo-random subsample of ALL in-radius points
        # (Knuth-hash order), NOT nearest-n: a nearest-n cloud collapses
        # onto the closest wall face and loses the along-wall direction
        # entirely (measured: the likelihood went flat in y and the
        # filter random-walked away) — a real sweep sees structure all
        # around, and so must its stand-in.
        d2 = jnp.sum((pts - pose_pos) ** 2, axis=-1)
        inr = d2 <= radius * radius
        key = (jnp.arange(pts.shape[0], dtype=jnp.uint32)
               * jnp.uint32(2654435761)) >> 12
        key = jnp.where(inr, key.astype(jnp.int32), jnp.int32(2 ** 30))
        k = min(n, pts.shape[0])
        neg, idx = jax.lax.top_k(-key, k)
        ok = -neg < 2 ** 30
        sel = pts[idx]
        rel = quat_rotate(quat_conjugate(pose_quat)[None, :],
                          sel - pose_pos[None, :])
        rel = jnp.where(ok[:, None], rel, 0.0)
        if k < n:                       # pad to the static budget
            rel = jnp.pad(rel, ((0, n - k), (0, 0)))
            ok = jnp.pad(ok, (0, n - k))
        return rel, ok

    sharp, sharp_ok = pick(map_pts, n_sharp)
    flat, flat_ok = pick(ground_pts, n_flat)
    return flat, flat_ok, sharp, sharp_ok


def fleet_full_tick(nav_cfg, mb_cfg, spec, ri_spec, params, fmap, state,
                    scans, scan_masks, sensor_offset, goals, now, dt,
                    mcl_cfg=None, submap_ctx=None, odom_drift_pos=None,
                    odom_drift_yaw=None, feature_map_pts=None,
                    feature_ground_pts=None):
    """One FULL per-robot vertical tick for the fleet (vmapped).

    With ``mcl_cfg``/``submap_ctx`` given, each robot first runs its MCL
    update against the drifting odometry (true pose ∘ drift) and PLANS
    FROM THE ESTIMATE — map→localize→navigate per robot, the fleet
    counterpart of `go2_localization`. Otherwise planning uses ground
    truth (the round-3 config-4 behavior).

    Returns (new_state, diag dict of (B,) arrays).

    Structure: the per-robot pre-plan stage (MCL + mark/clear + compose +
    snap/LOS) and the post-plan stage (extract + rollouts + FSM +
    recovery) are vmapped; the wavefront relaxation between them runs
    ONCE for the whole fleet in node-major layout over the shared graph
    (`fleet_wavefront_distances_turning`) — all robots' fields ride one
    gather per edge instead of R separate gather passes.
    """
    from dddmr_navigation_tpu.control.fused import (
        fused_pre_plan, fused_post_plan, fleet_interpolate_path_device)
    from dddmr_navigation_tpu.control.fsm import (
        FSMInputs, fsm_step, Decision, CmdSource)
    from dddmr_navigation_tpu.control.recovery import (
        rotate_recovery_step, start_rotate_recovery, RotateRecoveryState)
    from dddmr_navigation_tpu.planning.local.planner import (
        compute_velocity_command, initial_heading_deviation,
        goal_heading_deviation, goal_reached)
    from dddmr_navigation_tpu.planning.global_.planner import plan_finish
    from dddmr_navigation_tpu.planning.global_.wavefront import (
        fleet_wavefront_distances, fleet_wavefront_distances_turning)
    from dddmr_navigation_tpu.state_estimation.mcl import mcl_update
    from dddmr_navigation_tpu.geometry import (
        yaw_from_quat, quat_from_yaw, quat_multiply)

    lp_cfg = nav_cfg.local_planner
    gp = nav_cfg.global_planner
    localize = mcl_cfg is not None and state.mcl is not None

    def pre_one(s, scan, smask, goal, drift_pos, drift_yaw):
        # --- 1. localization (optional): odom = true ∘ drift -------------
        if localize:
            odom_pos = s.pos + drift_pos
            odom_quat = quat_multiply(s.quat, quat_from_yaw(drift_yaw))
            flat, flat_ok, sharp, sharp_ok = device_features_from_map(
                feature_map_pts, feature_ground_pts, s.pos, s.quat)
            mcl2, mout = mcl_update(
                mcl_cfg, submap_ctx, s.mcl, s.odom_prev_pos,
                s.odom_prev_quat, odom_pos, odom_quat, dt,
                flat, flat_ok, sharp, sharp_ok,
                jnp.ones(sharp.shape[0], jnp.float32))
            plan_pos, plan_quat = mout.pose_pos, mout.pose_quat
            mcl_err = jnp.linalg.norm(mout.pose_pos - s.pos)
            match_ratio = mout.match_ratio_max
        else:
            odom_pos, odom_quat = s.pos, s.quat
            mcl2 = s.mcl
            plan_pos, plan_quat = s.pos, s.quat
            mcl_err = match_ratio = jnp.float32(0.0)

        # --- 2. perceive → compose → snap/LOS (pre-relaxation half) ------
        pre = fused_pre_plan(
            nav_cfg, spec, ri_spec, params, fmap, s.fused, scan, smask,
            plan_pos, plan_quat, sensor_offset, goal)
        return (pre, mcl2, odom_pos, odom_quat, plan_pos, plan_quat,
                mcl_err, match_ratio)

    def post_one(s, pre, res, smask, plan_pos, plan_quat, mcl2, odom_pos,
                 odom_quat, mcl_err, match_ratio, wf_stall, plan):
        # --- 2b. extract + rollouts (simple generator) -------------------
        fused2, out = fused_post_plan(
            nav_cfg, "differential_drive_simple", fmap, pre, res, smask,
            plan_pos, plan_quat, s.v, s.w, wf_stall=wf_stall, plan=plan)

        # --- 3. predicates + rotate-generator command --------------------
        init_dev, init_aligned, _ = initial_heading_deviation(
            lp_cfg, out.plan, plan_pos, plan_quat)
        goal_dev, goal_aligned = goal_heading_deviation(
            lp_cfg, out.plan, plan_quat)
        hd = jnp.where(s.fsm.decision == Decision.D_ALIGN_GOAL_HEADING,
                       goal_dev, init_dev)
        cmd_rot = compute_velocity_command(
            lp_cfg, out.plan, plan_pos, plan_quat, s.v, s.w, out.obs,
            out.obs_mask, heading_deviation=hd,
            generator="differential_drive_rotate_shortest_angle")
        reached = goal_reached(lp_cfg, out.plan, plan_pos)

        # --- 4. recovery progress (before the FSM reads it) --------------
        was_active = s.recovery.active
        rec_step, wz_rec, rec_done, rec_failed = rotate_recovery_step(
            lp_cfg, s.recovery, plan_pos, plan_quat, out.obs, out.obs_mask)
        rec2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(was_active, a, b), rec_step, s.recovery)
        rec_succeed = jnp.where(
            was_active & rec_done, True,
            jnp.where(was_active & rec_failed, False, s.recovery_succeed))
        rec_active = was_active & (~rec_done) & (~rec_failed)

        # --- 5. decision FSM (`p2p_fsm.cpp` semantics) --------------------
        # has_new_plan is True: the fused vertical replans every tick (the
        # device-resident analogue of the 5 Hz GPM query loop).
        x = FSMInputs(
            now=now, robot_pos=plan_pos, robot_yaw=yaw_from_quat(plan_quat),
            has_new_plan=jnp.asarray(True), plan_empty=~out.plan_ok,
            goal_reached=reached, initial_heading_aligned=init_aligned,
            goal_heading_aligned=goal_aligned, ps_simple=out.state,
            ps_rotate=cmd_rot.state, recovery_active=rec_active,
            recovery_succeed=rec_succeed)
        fsm2, fout = fsm_step(mb_cfg, s.fsm, x)

        # start a recovery the FSM just requested
        fresh = start_rotate_recovery(plan_quat)
        start_now = fout.request_recovery & (~rec_active)
        rec3 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(start_now, a, b), fresh, rec2)

        # --- 6. command mux (generator selection per FSM state) ----------
        vx = jnp.where(fout.cmd_source == CmdSource.SIMPLE, out.vx,
                       jnp.where(fout.cmd_source == CmdSource.ROTATE,
                                 cmd_rot.vx, 0.0))
        wz = jnp.where(fout.cmd_source == CmdSource.SIMPLE, out.wz,
                       jnp.where(fout.cmd_source == CmdSource.ROTATE,
                                 cmd_rot.wz, 0.0))
        # an active recovery owns cmd_vel (`recovery_behaviors_ros.cpp`)
        vx = jnp.where(rec_active, 0.0, vx)
        wz = jnp.where(rec_active, wz_rec, wz)

        # --- 7. integrate the TRUE pose: the base TRACKS the commanded
        # twist under the sampler's own acceleration limits (track_twist)
        # instead of executing it perfectly
        v_ach, w_ach = track_twist(s.v, s.w, vx, wz, dt,
                                   lp_cfg.generator.limits)
        yaw = yaw_from_quat(s.quat)
        pos2 = s.pos + jnp.stack([v_ach * jnp.cos(yaw) * dt,
                                  v_ach * jnp.sin(yaw) * dt,
                                  jnp.zeros_like(v_ach)])
        quat2 = quat_multiply(s.quat, quat_from_yaw(w_ach * dt))

        s2 = FleetFullState(
            fused=fused2, fsm=fsm2, recovery=rec3,
            recovery_succeed=rec_succeed, pos=pos2, quat=quat2, v=v_ach,
            w=w_ach, mcl=mcl2, odom_prev_pos=odom_pos,
            odom_prev_quat=odom_quat)
        diag = {
            "vx": vx, "wz": wz, "v_achieved": v_ach, "w_achieved": w_ach,
            "decision": fsm2.decision,
            "cmd_source": fout.cmd_source, "ps_simple": out.state,
            "ps_rotate": cmd_rot.state, "plan_ok": out.plan_ok,
            "recovery_active": rec_active, "recovery_succeed": rec_succeed,
            "wf_iters": out.wf_iters,
            "init_aligned": init_aligned, "goal_aligned": goal_aligned,
            "goal_reached": reached, "plan_empty": ~out.plan_ok,
            "plan_pos": plan_pos, "plan_yaw": yaw_from_quat(plan_quat),
        }
        if localize:
            diag["mcl_err"] = mcl_err
            diag["match_ratio"] = match_ratio
        return s2, diag

    b = state.pos.shape[0]
    if odom_drift_pos is None:
        odom_drift_pos = jnp.zeros((b, 3))
    if odom_drift_yaw is None:
        odom_drift_yaw = jnp.zeros((b,))

    # stage A (vmapped): localize + perceive + snap/LOS
    (pre, mcl2, odom_pos, odom_quat, plan_pos, plan_quat, mcl_err,
     match_ratio) = jax.vmap(pre_one)(state, scans, scan_masks, goals,
                                      odom_drift_pos, odom_drift_yaw)

    # stage B: ONE node-major relaxation + extraction for the whole fleet
    # over the shared graph (the per-robot operators, element for element)
    from dddmr_navigation_tpu.control.fused import budget_stall_update
    from dddmr_navigation_tpu.planning.global_.planner import (
        fleet_plan_finish)
    prep = pre.prep
    budget = gp.relax_iters_per_tick
    max_it = budget if budget > 0 else gp.max_relax_iters
    if gp.turning_weight > 0.0:
        dist_r, iters = fleet_wavefront_distances_turning(
            fmap.nbr_idx, fmap.nbr_dist, prep.graph_valid, prep.enter,
            fmap.avg_intensity, prep.goal_idx, gp.turning_weight,
            az=fmap.wf_az, bin_of_edge=fmap.wf_bins,
            n_dir_bins=gp.turning_dir_bins, max_iters=max_it,
            dist0_r=prep.warm_dist)
    else:
        dist_r, iters = fleet_wavefront_distances(
            fmap.nbr_idx, fmap.nbr_dist, prep.graph_valid, prep.enter,
            fmap.avg_intensity, prep.goal_idx,
            max_iters=max_it, dist0_r=prep.warm_dist)
    # stall bookkeeping per robot (the relax iteration count is shared —
    # the joint loop runs to the slowest robot, exactly like the vmapped
    # form — so the counters advance in lockstep)
    stall_reset, wf_stall = budget_stall_update(gp, state.fused.wf_stall,
                                                iters)
    if stall_reset is None:
        stall_reset = jnp.broadcast_to(iters >= gp.max_relax_iters,
                                       (state.pos.shape[0],))
    res = fleet_plan_finish(
        gp, fmap.nbr_idx, fmap.nbr_dist, fmap.ground, prep, dist_r, iters,
        turn_pen=fmap.turn_pen, wf_bins=fmap.wf_bins,
        stall_reset=stall_reset)
    # fleet path interpolation with a flat output scatter (the per-robot
    # scatter is pathological under vmap)
    plans = fleet_interpolate_path_device(
        fmap.ground, res, max_plan_len=lp_cfg.max_plan_len)

    # stage C (vmapped): extraction consumers — rollouts, FSM, recovery
    return jax.vmap(post_one)(state, pre, res, scan_masks, plan_pos,
                              plan_quat, mcl2, odom_pos, odom_quat,
                              mcl_err, match_ratio, wf_stall, plans)


def sharded_fleet_full_tick(nav_cfg, mb_cfg, spec, ri_spec, params,
                            mesh: Mesh, axis: str = "scenarios",
                            mcl_cfg=None, localize: bool = False):
    """Jitted full-vertical fleet tick with robots sharded over the mesh,
    the map/submap context replicated, and a psum'd fleet-health scalar
    (robots currently holding TRAJECTORY_FOUND) riding the mesh axis."""
    from jax import shard_map

    def tick(fmap, submap_ctx, feat_map, feat_ground, state, scans,
             scan_masks, sensor_offset, goals, now, dt, drift_pos,
             drift_yaw):
        s2, diag = fleet_full_tick(
            nav_cfg, mb_cfg, spec, ri_spec, params, fmap, state, scans,
            scan_masks, sensor_offset, goals, now, dt,
            mcl_cfg=mcl_cfg if localize else None,
            submap_ctx=submap_ctx, odom_drift_pos=drift_pos,
            odom_drift_yaw=drift_yaw, feature_map_pts=feat_map,
            feature_ground_pts=feat_ground)
        from dddmr_navigation_tpu.planning.local.planner import PlannerState
        found = jnp.sum((diag["ps_simple"]
                         == int(PlannerState.TRAJECTORY_FOUND))
                        .astype(jnp.float32))
        total = jax.lax.psum(found, axis)
        return s2, diag, total

    sp = P(axis)
    rep = P()
    sharded = shard_map(
        tick, mesh=mesh,
        in_specs=(rep, rep, rep, rep, sp, sp, sp, rep, sp, rep, rep, sp,
                  sp),
        out_specs=(sp, sp, rep),
        check_vma=False)
    return jax.jit(sharded)
