"""FULL-STACK demo: map the world with SLAM, then NAVIGATE while
LOCALIZING against the saved pose graph with drifting odometry.

The reference's flagship composition (`go2_localization.launch` +
`p2p_move_base_localization.yaml`): lego_loam maps offline → mcl_3dl
localizes against the pose-graph artifact and publishes map→odom →
the navigation vertical consumes the corrected pose. Here:

  1. MappingSession drives the room, saves the reference-format
     pose-graph directory.
  2. The navigation loop runs on the ESTIMATED pose only: simulated
     odometry drifts (yaw-rate bias + scale error); the MCL tick
     (particle filter over the submap features, motion-gated) corrects
     it; NavigationSession plans/marks/rolls out from the estimate.
  3. Ground truth is used only to simulate sensors and to score the
     run at the end.

Run: python examples/run_full_stack.py [--ticks 250]
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(n_ticks=250, out_dir="/tmp/dddmr_full_stack_pg", verbose=True,
        drift_yaw=0.001, drift_scale=1.015):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import dataclasses

    from dddmr_navigation_tpu.config import (
        NavigationConfig, PerceptionConfig, SpinningLidarConfig,
        LocalPlannerConfig, DDSimpleGeneratorConfig, SlamConfig, MCLConfig)
    from dddmr_navigation_tpu.slam import MappingSession
    from dddmr_navigation_tpu.utils import BoxWorld, simulate_scan
    from dddmr_navigation_tpu.state_estimation import (
        read_pose_graph, SubmapManager, init_mcl, mcl_update, motion_gate)
    from dddmr_navigation_tpu.geometry import quat_from_yaw, quat_multiply
    from dddmr_navigation_tpu.io.maps import flat_ground_map
    from dddmr_navigation_tpu.control.session import NavigationSession

    world = BoxWorld.room(half=6.0).add_box([2.5, -1.0, 0], [3.1, 1.0, 1.8])
    t0 = np.array([-3.0, -3.0, 0.8], np.float32)   # mapping start (sensor)

    # ---- 1. mapping pass (the slam test suite's known-good shapes) ----
    slam_cfg = SlamConfig(num_vertical_scans=16, num_horizontal_scans=250,
                          max_sharp=64, max_less_sharp=256, max_flat=128,
                          max_less_flat=1024, scan_match_iters=10,
                          max_keyframes=32, max_edges=64)
    mapper = MappingSession(cfg=slam_cfg)
    pos = t0.copy()
    yaw = 0.0
    # a sweeping arc through the interior: covers the corridor the robot
    # will navigate so the submap features are dense where it matters
    for t in range(22):
        pts, mask = simulate_scan(world, pos, yaw, n_rings=16, n_cols=250)
        mapper.process_scan(pts, mask)
        pos = pos + np.array([0.45 * np.cos(yaw), 0.45 * np.sin(yaw), 0.0],
                             np.float32)
        yaw += 0.06 if t < 11 else 0.12
    mapper.save(out_dir)
    if verbose:
        print(f"mapped: {mapper.n_keyframes} keyframes -> {out_dir}")

    # ---- 2. navigation-while-localizing ------------------------------
    # All navigation state lives in the MAP frame (first keyframe =
    # origin, at sensor height): ground plane sits at z = -0.8.
    sensor_h = 0.8
    ground = flat_ground_map(11, 11, 0.25, z=-sensor_h)
    ground[:, 0] += 3.0
    ground[:, 1] += 3.0
    lidar = SpinningLidarConfig(
        xy_resolution=0.1, height_resolution=0.1,
        range_image_rows=16, range_image_cols=250,
        vertical_FOV_bottom=-30.0, vertical_FOV_top=30.0,
        scan_effective_positive_start=0.0,
        scan_effective_negative_start=0.0)
    nav_cfg = NavigationConfig(
        perception=PerceptionConfig(lidar=lidar, voxel_window_cells_xy=48,
                                    voxel_window_cells_z=24,
                                    max_marked_voxels=512),
        local_planner=LocalPlannerConfig(
            generator=DDSimpleGeneratorConfig(
                linear_x_sample=6, angular_z_sample=10, max_num_steps=30),
            # goal tolerance sized to the MCL accuracy class (~0.5 m with
            # 48 particles on this feature density), like the reference's
            # localization-mode deployments widen it vs odom-only runs
            xy_goal_tolerance=0.6,
            max_obstacle_points=512, collision_obstacle_chunk=16,
            collision_near_k=64))
    sess = NavigationSession(nav_cfg, ground,
                             sensor_offset=(0.0, 0.0, sensor_h))
    # world (2.5, -3.5): down the open south corridor — even with ~1 m
    # of estimate error the TRUE robot stays clear of the box's
    # inflation ring (the box occupies map x 5.5-6.1, y 2-4)
    goal = np.array([5.5, -0.5, -sensor_h], np.float32)
    sess.set_goal(goal)

    mcl_cfg = MCLConfig(num_particles=48)
    graph = read_pose_graph(out_dir)
    mgr = SubmapManager(graph=graph, cfg=mcl_cfg)
    mgr.initialize([0.0, 0.0, 0.0])
    mcl_state = init_mcl(jax.random.PRNGKey(0), mcl_cfg,
                         jnp.asarray([0.05, -0.05, 0.0]),
                         jnp.asarray([0.0, 0.0, 0.0, 1.0]))
    mcl_step = jax.jit(functools.partial(mcl_update, mcl_cfg))
    # live feature frontend — the reference's mcl_feature_node runs
    # ImageProjection+FeatureAssociation on the scan so the live features
    # match the submap feature clouds' extraction (SURVEY §3.4)
    from dddmr_navigation_tpu.slam.pipeline import _frontend

    def pad(p, m, n=512):
        out = np.zeros((n, 3), np.float32)
        mm = np.zeros((n,), bool)
        sel = np.nonzero(m)[0][:n]
        out[:len(sel)] = p[sel]
        mm[:len(sel)] = True
        return jnp.asarray(out), jnp.asarray(mm)

    from dddmr_navigation_tpu.geometry import yaw_from_quat

    # truth state (base, map frame); odometry state (drifting)
    true_base = np.array([0.0, 0.0, -sensor_h], np.float32)
    true_yaw = 0.0
    odom_pos = np.zeros(3, np.float32)
    odom_yaw = 0.0
    prev_odom_yaw = 0.0
    prev_odom = (jnp.asarray(odom_pos), quat_from_yaw(jnp.float32(0.0)))
    gate_pos, gate_quat = prev_odom
    est_pos = np.array([0.0, 0.0, 0.0], np.float32)    # mcl pose (sensor)
    est_yaw = 0.0
    last_mcl_t = 0.0
    v = w = 0.0
    dt = 0.1
    done = ok = False
    max_drift = 0.0
    i = 0

    # acceleration-limited base: the SAME track_twist the fleet uses
    # (single source for the feasibility model)
    from dddmr_navigation_tpu.parallel.fleet import track_twist
    lim = nav_cfg.local_planner.generator.limits
    v_ex = w_ex = 0.0

    for i in range(n_ticks):
        now = i * dt
        v_a, w_a = track_twist(jnp.float32(v_ex), jnp.float32(w_ex),
                               jnp.float32(v), jnp.float32(w),
                               jnp.float32(dt), lim)
        v_ex, w_ex = float(v_a), float(w_a)
        true_base[0] += v_ex * np.cos(true_yaw) * dt
        true_base[1] += v_ex * np.sin(true_yaw) * dt
        true_yaw += w_ex * dt
        # odometry drifts: scale on translation + yaw-rate bias
        odom_yaw += w_ex * dt + drift_yaw
        odom_pos[0] += drift_scale * v_ex * np.cos(odom_yaw) * dt
        odom_pos[1] += drift_scale * v_ex * np.sin(odom_yaw) * dt

        # simulate_scan takes the WORLD sensor pose; map → world = + t0
        sensor_world = true_base + [0, 0, sensor_h] + t0
        pts, mask = simulate_scan(world, sensor_world, true_yaw,
                                  n_rings=16, n_cols=250,
                                  v_bottom=-30.0, v_top=30.0)
        cur_odom = (jnp.asarray(odom_pos.copy()),
                    quat_from_yaw(jnp.float32(odom_yaw)))

        # MCL at the motion gate (`mcl_3dl.cpp:196`)
        if bool(motion_gate(mcl_cfg, gate_pos, gate_quat, cur_odom[0],
                            cur_odom[1])):
            feats = _frontend(slam_cfg, jnp.asarray(pts), jnp.asarray(mask))
            lf = np.asarray(feats.less_flat)
            lfm = np.asarray(feats.less_flat_mask)
            lfg = np.asarray(feats.less_flat_ground)
            ls = np.asarray(feats.less_sharp)
            lsm = np.asarray(feats.less_sharp_mask)
            flat, fm = pad(lf, lfm & lfg)
            sharp, sm = pad(np.concatenate([ls, lf]),
                            np.concatenate([lsm, lfm & ~lfg]))
            ctx = mgr.current(np.asarray(est_pos))
            mcl_state, out = mcl_step(ctx, mcl_state, prev_odom[0],
                                      prev_odom[1], cur_odom[0],
                                      cur_odom[1], jnp.asarray(dt), flat,
                                      fm, sharp, sm, jnp.ones(512))
            est_pos = np.asarray(out.pose_pos).copy()
            est_yaw = float(yaw_from_quat(out.pose_quat))
            gate_pos, gate_quat = cur_odom
            last_mcl_t = now
        else:
            # dead-reckon the estimate with the odom delta (map→odom TF
            # held, odom advances — the reference's between-update motion)
            est_pos = est_pos + (np.asarray(cur_odom[0])
                                 - np.asarray(prev_odom[0]))
            est_yaw += odom_yaw - prev_odom_yaw
        prev_odom = cur_odom
        prev_odom_yaw = odom_yaw

        est_base = est_pos.astype(np.float32).copy()
        est_base[2] = -sensor_h
        quat = np.asarray(quat_from_yaw(jnp.float32(est_yaw)))
        # ground removal: world z of a return = sensor_world_z + pt_z
        smask = mask & (pts[:, 2] + sensor_world[2] >= 0.15)
        vx, wz, dec, done, ok = sess.tick(
            pts, smask, est_base, quat, v, w, now=now,
            tf_age=now - last_mcl_t)
        max_drift = max(max_drift,
                        float(np.linalg.norm(odom_pos[:2] - true_base[:2])))
        if verbose and i % 25 == 0:
            err = np.linalg.norm(est_base[:2] - true_base[:2])
            print(f"t={i} true={true_base[:2]} est_err={err:.2f} "
                  f"odom_drift={max_drift:.2f} dec={dec}", flush=True)
        if done:
            break
        v, w = vx, wz

    err_final = float(np.linalg.norm(est_base[:2] - true_base[:2]))
    true_goal_err = float(np.linalg.norm(true_base[:2] - goal[:2]))
    if verbose:
        print(f"done={done} ok={ok} ticks={i} est_err={err_final:.2f} "
              f"true_goal_err={true_goal_err:.2f} max_odom_drift="
              f"{max_drift:.2f}")
    return {"done": done, "ok": ok, "ticks": i, "est_err": err_final,
            "true_goal_err": true_goal_err, "max_odom_drift": max_drift}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=250)
    ap.add_argument("--out", default="/tmp/dddmr_full_stack_pg")
    args = ap.parse_args()
    run(args.ticks, args.out)


if __name__ == "__main__":
    main()
