import numpy as np
import jax.numpy as jnp
import pytest

from dddmr_navigation_tpu import geometry as geo


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quat_rotate_matches_matrix():
    qs = random_quats(32)
    vs = np.random.default_rng(1).normal(size=(32, 3)).astype(np.float32)
    r1 = np.asarray(geo.quat_rotate(jnp.asarray(qs), jnp.asarray(vs)))
    m = np.asarray(geo.quat_to_matrix(jnp.asarray(qs)))
    r2 = np.einsum("nij,nj->ni", m, vs)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_quat_multiply_is_rotation_composition():
    qa, qb = random_quats(8, 2), random_quats(8, 3)
    v = np.random.default_rng(4).normal(size=(8, 3)).astype(np.float32)
    lhs = geo.quat_rotate(geo.quat_multiply(jnp.asarray(qa), jnp.asarray(qb)), jnp.asarray(v))
    rhs = geo.quat_rotate(jnp.asarray(qa), geo.quat_rotate(jnp.asarray(qb), jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_rpy_roundtrip():
    rng = np.random.default_rng(5)
    roll = rng.uniform(-1.0, 1.0, 16).astype(np.float32)
    pitch = rng.uniform(-1.0, 1.0, 16).astype(np.float32)
    yaw = rng.uniform(-3.0, 3.0, 16).astype(np.float32)
    q = geo.quat_from_rpy(jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw))
    r2, p2, y2 = geo.rpy_from_quat(q)
    np.testing.assert_allclose(np.asarray(r2), roll, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p2), pitch, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y2), yaw, atol=1e-4)


def test_yaw_from_quat():
    yaw = jnp.asarray([0.0, 1.2, -2.5], dtype=jnp.float32)
    q = geo.quat_from_yaw(yaw)
    np.testing.assert_allclose(np.asarray(geo.yaw_from_quat(q)), np.asarray(yaw), atol=1e-5)


def test_matrix_quat_roundtrip():
    qs = random_quats(64, 7)
    m = geo.quat_to_matrix(jnp.asarray(qs))
    q2 = np.asarray(geo.matrix_to_quat(m))
    # q and -q are the same rotation
    dot = np.abs(np.sum(q2 * qs, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_se3_compose_inverse():
    qs = random_quats(8, 8)
    ts = np.random.default_rng(9).normal(size=(8, 3)).astype(np.float32)
    pose = (jnp.asarray(ts), jnp.asarray(qs))
    inv = geo.se3_inverse(pose)
    t_id, q_id = geo.se3_compose(pose, inv)
    np.testing.assert_allclose(np.asarray(t_id), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(q_id)[..., 3]), 1.0, atol=1e-5)


def test_se3_apply():
    yaw = jnp.asarray(np.pi / 2, dtype=jnp.float32)
    pose = (jnp.asarray([1.0, 0.0, 0.0]), geo.quat_from_yaw(yaw))
    pts = jnp.asarray([[1.0, 0.0, 0.0]])
    out = np.asarray(geo.se3_apply(pose, pts))
    np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-6)


def test_slope_aware_quat_flat_matches_yaw():
    v = jnp.asarray([[1.0, 1.0, 0.0]])
    q = geo.slope_aware_quat(v)
    np.testing.assert_allclose(
        np.asarray(geo.yaw_from_quat(q)), [np.pi / 4], atol=1e-5)


def test_shortest_angular_distance():
    assert abs(float(geo.shortest_angular_distance(3.0, -3.0)) - 0.2831853) < 1e-4
