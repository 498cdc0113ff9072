"""Sequential NumPy oracle of the reference local planner semantics.

An independent straight-line re-implementation of the C++ behavior
(dd_simple generator + critics + selection + prune plan) used to validate
the batched JAX kernels. Mirrors:
  * VelocityIterator (`velocity_iterator.h:42-66`)
  * DDSimpleTrajectoryGeneratorTheory (`dd_simple_trajectory_generator_theory.cpp`)
  * CollisionModel / StickPathModel / PurePursuitModel / TowardGlobalPlanModel
  * StackedScoringModel short-circuit + getBestTrajectory `<=` tie-break
  * Local_Planner::prunePlan walk loops
"""
from __future__ import annotations

import math

import numpy as np


def quat_to_mat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def velocity_iterator(vmin, vmax, num_samples):
    if vmin == vmax:
        return [vmin]
    n = max(2, num_samples)
    step = (vmax - vmin) / (n - 1)
    samples = []
    nxt = vmin
    for _ in range(n - 1):
        cur = nxt
        nxt += step
        samples.append(cur)
        if cur < 0 and nxt > 0:
            samples.append(0.0)
    samples.append(vmax)
    return samples


def motor_ok(lim, v, w):
    if not lim.use_motor_constraint:
        return True
    vr = v + lim.robot_radius * w
    vl = v - lim.robot_radius * w
    k = lim.gear_ratio * 60.0 / 3.1415926 / lim.wheel_diameter
    return abs(vr * k) < lim.max_motor_shaft_rpm and abs(vl * k) < lim.max_motor_shaft_rpm


def dd_simple_sample_list(gen, v_now, w_now, allowed_max_speed=-1.0):
    lim = gen.limits
    sim_period = 1.0 / gen.controller_frequency
    max_vx_lim = lim.max_vel_x
    if allowed_max_speed > 0.0:
        max_vx_lim = min(max_vx_lim, allowed_max_speed)
    max_vx = min(max_vx_lim, v_now + lim.acc_lim_x * sim_period)
    min_vx = max(lim.min_vel_x, v_now / lim.deceleration_ratio)
    if max_vx < min_vx:
        min_vx = max_vx = v_now / lim.deceleration_ratio
    max_w = min(lim.max_vel_theta, w_now + lim.acc_lim_theta * sim_period)
    min_w = max(-lim.max_vel_theta, w_now - lim.acc_lim_theta * sim_period)
    out = []
    for vx in velocity_iterator(min_vx, max_vx, gen.linear_x_sample):
        for w in velocity_iterator(min_w, max_w, gen.angular_z_sample):
            if motor_ok(lim, vx, w):
                out.append((vx, w))
    return out


def generate_trajectory(gen, robot_pos, robot_quat, vx, w):
    """Returns (poses list of (pos3, yaw_local), dt) or None when invalid."""
    lim = gen.limits
    vmag = abs(vx)
    eps = 1e-4
    if (lim.min_vel_x >= 0 and vmag + eps < lim.min_vel_x) and (
            lim.min_vel_theta >= 0 and abs(w) + eps < lim.min_vel_theta):
        return None
    if lim.max_vel_x >= 0 and vmag - eps > lim.max_vel_x:
        return None
    num_steps = math.ceil(max(vmag * gen.sim_time / gen.sim_granularity,
                              abs(w) * gen.sim_time / gen.angular_sim_granularity))
    if num_steps == 0:
        return None
    dt = gen.sim_time / num_steps
    rot = quat_to_mat(robot_quat)
    poses = []
    x = y = th = 0.0
    for _ in range(num_steps):
        x += vx * math.cos(th) * dt
        y += vx * math.sin(th) * dt
        th += w * dt
        p_global = rot @ np.array([x, y, 0.0]) + robot_pos
        poses.append((p_global, th))
    return poses, dt


def cuboid_world(cuboid_corners, robot_pos, robot_quat, p_local_xyth):
    """8 corners in global frame for a rollout step."""
    x, y, th = p_local_xyth
    rot = quat_to_mat(robot_quat)
    c, s = math.cos(th), math.sin(th)
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    out = []
    for corner in cuboid_corners:
        pl = rz @ np.asarray(corner) + np.array([x, y, 0.0])
        out.append(rot @ pl + robot_pos)
    return np.array(out)


def collision_score(cuboid_corners, robot_pos, robot_quat, traj_local,
                    obstacles):
    if len(obstacles) < 5:
        return 0.0
    for (x, y, th) in traj_local:
        corners = cuboid_world(cuboid_corners, robot_pos, robot_quat, (x, y, th))
        center = corners.mean(axis=0)
        dx = corners[3] - corners[0]
        dy = corners[1] - corners[0]
        dz = corners[2] - corners[0]
        hx, hy, hz = np.linalg.norm(dx) / 2, np.linalg.norm(dy) / 2, np.linalg.norm(dz) / 2
        dx, dy, dz = dx / (2 * hx), dy / (2 * hy), dz / (2 * hz)
        # 1 m radius pre-gate like the reference
        pose_pos = corners.mean(axis=0)
        for p in obstacles:
            if np.linalg.norm(p - pose_pos) > 1.0 + hx + hy + hz:
                continue
            d = p - center
            if (abs(d @ dx) <= hx and abs(d @ dy) <= hy and abs(d @ dz) <= hz):
                return -1.0
    return 0.0


def stick_path_score(traj_pts, prune_pts):
    if len(prune_pts) < 3:
        return 10.0
    total = 0.0
    for p in traj_pts:
        total += float(np.min(np.linalg.norm(prune_pts - p, axis=1)))
    return total / len(prune_pts)


def yaw_from_mat(m):
    return math.atan2(m[1, 0], m[0, 0])


def pure_pursuit_score(traj_end_pos, traj_end_rot, prune_end_pos,
                       prune_end_rot, tw, ow):
    rel_rot = traj_end_rot.T @ prune_end_rot
    rel_t = traj_end_rot.T @ (prune_end_pos - traj_end_pos)
    # tf2 getEulerYPR yaw
    yaw = math.atan2(rel_rot[1, 0], rel_rot[0, 0])
    yaw = math.fmod(yaw + 3.1416, 3.1416)
    dist = float(np.linalg.norm(rel_t))
    return tw * dist + ow * yaw


def toward_plan_score(traj_end_pos, prune_pts, weight):
    if len(prune_pts) < 3:
        return 10.0
    return float(np.min(np.linalg.norm(prune_pts - traj_end_pos, axis=1))) * weight


def prune_plan_oracle(plan_pts, robot_pos, forward, backward):
    """Returns (indices list ascending, ok)."""
    if len(plan_pts) < 3:
        return [], False
    d = np.linalg.norm(plan_pts - robot_pos, axis=1)
    i0 = int(np.argmin(d))
    if d[i0] > 1.0:
        return [], False
    out_back = []
    bd = backward
    last = plan_pts[i0]
    for i in range(i0, -1, -1):
        out_back.append(i)
        if i < i0:
            bd -= float(np.linalg.norm(last - plan_pts[i]))
        last = plan_pts[i]
        if bd < 0:
            break
    out_back.reverse()
    out_fwd = []
    fd = forward
    last = plan_pts[i0]
    for j in range(i0, len(plan_pts)):
        out_fwd.append(j)
        if j > i0:
            fd -= float(np.linalg.norm(last - plan_pts[j]))
        last = plan_pts[j]
        if fd < 0:
            break
    return out_back + out_fwd[1:], True


def compute_velocity_command_oracle(cfg, plan_pts, plan_quats, robot_pos,
                                    robot_quat, v_now, w_now, obstacles,
                                    allowed_max_speed=-1.0):
    """Full tick: returns (vx, w, best_cost, per-sample costs)."""
    gen = cfg.generator
    prune_idx, ok = prune_plan_oracle(plan_pts, robot_pos,
                                      cfg.forward_prune, cfg.backward_prune)
    if not ok:
        return 0.0, 0.0, -1.0, []
    prune_pts = plan_pts[prune_idx]
    prune_end_rot = quat_to_mat(plan_quats[prune_idx[-1]])
    prune_end_pos = plan_pts[prune_idx[-1]]

    cuboid_corners = cfg.generator.cuboid.corners()
    rot_robot = quat_to_mat(robot_quat)

    best = None
    best_cost = 9999999.0
    costs = []
    for (vx, w) in dd_simple_sample_list(gen, v_now, w_now, allowed_max_speed):
        traj = generate_trajectory(gen, robot_pos, robot_quat, vx, w)
        if traj is None:
            continue
        poses, dt = traj
        # rebuild local states for cuboid transforms
        traj_local = []
        x = y = th = 0.0
        for _ in range(len(poses)):
            x += vx * math.cos(th) * dt
            y += vx * math.sin(th) * dt
            th += w * dt
            traj_local.append((x, y, th))
        traj_pts = np.array([p for p, _ in poses])

        cost = 0.0
        rejected = False
        if cfg.critics.collision is not None:
            c = collision_score(cuboid_corners, robot_pos, robot_quat,
                                traj_local, obstacles) * cfg.critics.collision.weight
            if c < 0:
                costs.append((vx, w, c))
                continue
            cost += c
        if cfg.critics.stick_path is not None:
            c = stick_path_score(traj_pts, prune_pts) * cfg.critics.stick_path.weight
            if c < 0:
                costs.append((vx, w, c))
                continue
            cost += c
        if cfg.critics.pure_pursuit is not None:
            if len(prune_idx) == 0 or len(poses) < 2:
                costs.append((vx, w, -4.0))
                continue
            th_end = traj_local[-1][2]
            ce, se = math.cos(th_end), math.sin(th_end)
            rz = np.array([[ce, -se, 0], [se, ce, 0], [0, 0, 1]])
            c = pure_pursuit_score(
                traj_pts[-1], rot_robot @ rz, prune_end_pos, prune_end_rot,
                cfg.critics.pure_pursuit.translation_weight,
                cfg.critics.pure_pursuit.orientation_weight)
            if c < 0:
                costs.append((vx, w, c))
                continue
            cost += c
        if cfg.critics.toward_global_plan is not None:
            c = toward_plan_score(traj_pts[-1], prune_pts,
                                  cfg.critics.toward_global_plan.weight)
            if c < 0:
                costs.append((vx, w, c))
                continue
            cost += c
        costs.append((vx, w, cost))
        if cost >= 0 and cost <= best_cost:
            best = (vx, w)
            best_cost = cost

    if best is None:
        return 0.0, 0.0, -1.0, costs
    return best[0], best[1], best_cost, costs


def _omni_axis_window(v_now, vmin_lim, vmax_lim, acc, sim_period, decel):
    vmax = min(vmax_lim, v_now + acc * sim_period)
    vmin = max(vmin_lim, v_now - acc * sim_period)
    if v_now >= vmax_lim / decel:
        vmin = max(vmin_lim, v_now / decel)
    elif v_now <= vmin_lim / decel:
        vmax = min(vmax_lim, v_now / decel)
    return vmin, vmax


def omni_sample_list(gen, v_now, vy_now, w_now):
    """Mirrors `OmniSimpleTrajectoryGeneratorTheory::initialise`
    (`omni_simple_trajectory_generator_theory.cpp:259-332`); the omni motor
    constraint is a stub returning true (`:334-343`)."""
    lim = gen.limits
    sim_period = 1.0 / gen.controller_frequency
    min_vx, max_vx = _omni_axis_window(
        v_now, lim.min_vel_x, lim.max_vel_x, lim.acc_lim_x, sim_period,
        lim.deceleration_ratio)
    min_vy, max_vy = _omni_axis_window(
        vy_now, lim.min_vel_y, lim.max_vel_y, lim.acc_lim_y, sim_period,
        lim.deceleration_ratio)
    max_w = min(lim.max_vel_theta, w_now + lim.acc_lim_theta * sim_period)
    min_w = max(-lim.max_vel_theta, w_now - lim.acc_lim_theta * sim_period)
    out = []
    for vx in velocity_iterator(min_vx, max_vx, gen.linear_x_sample):
        for vy in velocity_iterator(min_vy, max_vy, gen.linear_y_sample):
            for w in velocity_iterator(min_w, max_w, gen.angular_z_sample):
                out.append((vx, vy, w))
    return out


def generate_trajectory_omni(gen, robot_pos, robot_quat, vx, vy, w,
                             allowed_max_speed=-1.0):
    """Mirrors `OmniSimpleTrajectoryGeneratorTheory::generateTrajectory`
    (`omni_simple_...cpp:487-545`). Returns (poses, dt) or None."""
    lim = gen.limits
    vmag = math.hypot(vx, vy)
    eps = 1e-4
    if (lim.min_vel_trans >= 0 and vmag + eps < lim.min_vel_trans) and (
            lim.min_vel_theta >= 0 and abs(w) + eps < lim.min_vel_theta):
        return None
    if lim.max_vel_trans >= 0 and vmag - eps > lim.max_vel_trans:
        return None
    if allowed_max_speed > 0.0 and vmag - eps > allowed_max_speed:
        return None
    num_steps = math.ceil(max(vmag * gen.sim_time / gen.sim_granularity,
                              abs(w) * gen.sim_time / gen.angular_sim_granularity))
    if num_steps == 0:
        return None
    dt = gen.sim_time / num_steps
    rot = quat_to_mat(robot_quat)
    poses = []
    x = y = th = 0.0
    half_pi = math.pi / 2.0
    for _ in range(num_steps):
        x += (vx * math.cos(th) + vy * math.cos(half_pi + th)) * dt
        y += (vx * math.sin(th) + vy * math.sin(half_pi + th)) * dt
        th += w * dt
        p_global = rot @ np.array([x, y, 0.0]) + robot_pos
        poses.append((p_global, th))
    return poses, dt
