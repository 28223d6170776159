import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu.ops import quat as Q


def rand_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_rotate_matches_matrix(rng):
    q = rand_quat(rng, (32,))
    v = rng.normal(size=(32, 3))
    R = Q.quat_to_rotmat(jnp.asarray(q))
    out = Q.quat_rotate(jnp.asarray(q), jnp.asarray(v))
    np.testing.assert_allclose(out, np.einsum("bij,bj->bi", np.asarray(R), v),
                               atol=1e-5)


def test_rotate_inverse_roundtrip(rng):
    q = rand_quat(rng, (16,))
    v = rng.normal(size=(16, 3))
    w = Q.quat_rotate(jnp.asarray(q), jnp.asarray(v))
    back = Q.quat_rotate_inverse(jnp.asarray(q), w)
    np.testing.assert_allclose(back, v, atol=1e-5)


def test_mul_compose(rng):
    a, b = rand_quat(rng, (8,)), rand_quat(rng, (8,))
    v = rng.normal(size=(8, 3))
    lhs = Q.quat_rotate(Q.quat_mul(jnp.asarray(a), jnp.asarray(b)), jnp.asarray(v))
    rhs = Q.quat_rotate(jnp.asarray(a), Q.quat_rotate(jnp.asarray(b), jnp.asarray(v)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_axis_angle_basic():
    # 90 deg about z maps x to y
    q = Q.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(np.pi / 2))
    v = Q.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_projected_gravity_identity():
    # level pose: gravity projects to -z in body frame
    q = jnp.array([0.0, 0.0, 0.0, 1.0])
    g = Q.quat_rotate_inverse(q, jnp.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(g, [0.0, 0.0, -1.0], atol=1e-6)


def test_quat_apply_yaw():
    # yaw-only rotation of a quaternion with pitch+yaw
    q = Q.quat_mul(
        Q.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(0.7)),
        Q.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.asarray(0.3)),
    )
    v = jnp.array([1.0, 0.0, 0.0])
    out = Q.quat_apply_yaw(q, v)
    np.testing.assert_allclose(out, [np.cos(0.7), np.sin(0.7), 0.0], atol=1e-5)


def test_wrap_to_pi():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi + 0.5])
    out = np.asarray(Q.wrap_to_pi(a))
    np.testing.assert_allclose(out, [0.0, -np.pi + 0.1, np.pi - 0.1, 0.5],
                               atol=1e-5)


def test_integrate_constant_omega():
    # integrating omega_z = pi/2 rad/s for 1s in small steps ~ 90 deg yaw
    q = jnp.array([0.0, 0.0, 0.0, 1.0])
    omega = jnp.array([0.0, 0.0, np.pi / 2])
    for _ in range(1000):
        q = Q.quat_integrate(q, omega, 1e-3)
    expected = Q.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]),
                                      jnp.asarray(np.pi / 2))
    assert min(np.linalg.norm(np.asarray(q - expected)),
               np.linalg.norm(np.asarray(q + expected))) < 1e-3


def test_yaw_from_quat():
    q = Q.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(1.1))
    np.testing.assert_allclose(float(Q.yaw_from_quat(q)), 1.1, atol=1e-6)
