"""SE(3) / quaternion math, batched and jit-friendly.

Conventions mirror tf2/Eigen as used by the reference stack
(`dddmr_navigation`): quaternions are stored ``(x, y, z, w)`` (tf2 layout),
poses are ``(translation[3], quaternion[4])`` tuples. All functions are
pure jnp and broadcast over leading batch dimensions.

Reference parity notes:
  * ``quat_from_rpy`` matches ``tf2::Quaternion::setRPY``.
  * ``slope_aware_quat`` reproduces the global planner's slope-orientation
    construction (reference ``global_planner.cpp:334-363``).
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_multiply(q1, q2):
    """Hamilton product, (x,y,z,w) layout: rotation q1 followed-by... (q1*q2
    rotates by q2 first then q1, matching tf2 ``q1*q2``)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_inverse_rotate(q, v):
    return quat_rotate(quat_conjugate(q), v)


def quat_from_axis_angle(axis, angle):
    """tf2::Quaternion(axis, angle); axis need not be normalized (tf2
    normalizes internally)."""
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = angle[..., None] * 0.5
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def quat_exp(w):
    """Rotation-vector exponential → quaternion, smooth at ‖w‖ = 0 (safe
    under jacfwd/jacrev at the origin — the GN solvers linearize there)."""
    ang2 = jnp.sum(w * w, axis=-1, keepdims=True)
    ang = jnp.sqrt(ang2 + 1e-16)
    half = 0.5 * ang
    # sin(half)/ang is smooth; series fallback keeps the derivative exact
    k = jnp.where(ang2 > 1e-12, jnp.sin(half) / ang, 0.5 - ang2 / 48.0)
    return jnp.concatenate([w * k, jnp.cos(half)], axis=-1)


def quat_from_rpy(roll, pitch, yaw):
    """tf2 setRPY: R_z(yaw) * R_y(pitch) * R_x(roll)."""
    hr, hp, hy = roll * 0.5, pitch * 0.5, yaw * 0.5
    cr, sr = jnp.cos(hr), jnp.sin(hr)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_from_yaw(yaw):
    yaw = jnp.asarray(yaw)
    z = jnp.zeros_like(yaw)
    return quat_from_rpy(z, z, yaw)


def yaw_from_quat(q):
    """Yaw (rotation about z) from quaternion; matches tf2 getEulerYPR yaw."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def rpy_from_quat(q):
    """(roll, pitch, yaw) matching tf2 Matrix3x3::getEulerYPR."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    sp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return roll, pitch, yaw


def quat_to_matrix(q):
    """3x3 rotation matrix from quaternion, batched."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """Quaternion (x,y,z,w) from rotation matrix. Branch-free Shepperd-style
    selection (jit friendly)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate formulations; pick the numerically best.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], -1) / (4.0 * qw0[..., None])

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    q1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], -1) / (4.0 * qx1[..., None])

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    q2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], -1) / (4.0 * qy2[..., None])

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    q3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], -1) / (4.0 * qz3[..., None])

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SE(3) poses: (t[...,3], q[...,4])
# ---------------------------------------------------------------------------

def se3_identity(dtype=jnp.float32):
    return jnp.zeros((3,), dtype), quat_identity(dtype)


def se3_from_xyzq(x, y, z, q):
    return jnp.stack([x, y, z], axis=-1), q


def se3_compose(pose_a, pose_b):
    """pose_a ∘ pose_b (apply b in a's frame), like Eigen Affine a*b."""
    ta, qa = pose_a
    tb, qb = pose_b
    return ta + quat_rotate(qa, tb), quat_normalize(quat_multiply(qa, qb))


def se3_inverse(pose):
    t, q = pose
    qi = quat_conjugate(q)
    return -quat_rotate(qi, t), qi


def se3_apply(pose, pts):
    """Transform points (...,3) by pose; broadcasts over points."""
    t, q = pose
    return quat_rotate(q[..., None, :], pts) + t[..., None, :]


def normalize_angle(a):
    """Wrap to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def shortest_angular_distance(a_from, a_to):
    return normalize_angle(a_to - a_from)


def slope_aware_quat(v):
    """Orientation of a path segment with direction v=(vx,vy,vz) (...,3).

    Reproduces the reference global planner's pose construction
    (``global_planner.cpp:334-363``): for vz != 0 build a quaternion from
    axis = normalize(v) x (1,0,0) and angle = -acos(v_hat . x_hat); else a
    pure-yaw quaternion atan2(vy, vx).
    """
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    unit = jnp.linalg.norm(v, axis=-1)
    unit = jnp.where(unit < 1e-9, 1.0, unit)
    axis_vec = v / unit[..., None]
    up = jnp.zeros_like(v).at[..., 0].set(1.0)
    right = jnp.cross(axis_vec, up)
    right_norm = jnp.linalg.norm(right, axis=-1, keepdims=True)
    safe_right = jnp.where(right_norm < 1e-9, jnp.zeros_like(right).at[..., 2].set(1.0), right)
    ang = -jnp.arccos(jnp.clip(axis_vec[..., 0], -1.0, 1.0))
    q_slope = quat_from_axis_angle(safe_right, ang)
    q_flat = quat_from_yaw(jnp.arctan2(vy, vx))
    return jnp.where((vz != 0.0)[..., None], q_slope, q_flat)
