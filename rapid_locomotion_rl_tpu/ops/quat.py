"""Quaternion math (xyzw convention, matching the reference state layout).

TPU-native replacement for `isaacgym.torch_utils` quaternion helpers used at
reference legged_robot.py:160-162, mini_gym/utils/math_utils.py:12-38.

All functions are pure, operate on the trailing axis, and broadcast over any
leading batch axes — `vmap`-free batching.

Convention: q = [x, y, z, w]; rotation of vector v by quaternion q is
R(q) v where R is the rotation matrix of the unit quaternion q.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b (xyzw)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        (
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ),
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate((-q[..., :3], q[..., 3:4]), axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by q: world = R(q) body (same as isaacgym quat_apply)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


# isaacgym name used throughout the reference
quat_apply = quat_rotate


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by q⁻¹ (world -> body frame), cf. legged_robot.py:160-162."""
    return quat_rotate(quat_conjugate(q), v)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix, batched on leading axes."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        (
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ),
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * angle
    s = jnp.sin(half)
    xyz = axis * s[..., None]
    return jnp.concatenate((xyz, jnp.cos(half)[..., None]), axis=-1)


def quat_from_euler_xyz(roll, pitch, yaw) -> jnp.ndarray:
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        (
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ),
        axis=-1,
    )


def yaw_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Heading angle of the body x-axis in the world xy-plane."""
    fwd = quat_rotate(q, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), q.shape[:-1] + (3,)))
    return jnp.arctan2(fwd[..., 1], fwd[..., 0])


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw component of q (math_utils.py:12-16)."""
    yaw_q = jnp.zeros_like(q).at[..., 2].set(q[..., 2]).at[..., 3].set(q[..., 3])
    return quat_rotate(normalize(yaw_q), v)


def wrap_to_pi(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle to (-pi, pi] (math_utils.py:20-23)."""
    a = jnp.mod(angle, 2.0 * jnp.pi)
    return jnp.where(a > jnp.pi, a - 2.0 * jnp.pi, a)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by world-frame angular velocity over dt.

    q' = normalize(q + 0.5 * dt * ω ⊗ q) — first-order, matching the
    regime (|ω| dt ≪ 1) in which the sim operates.
    """
    omega_quat = jnp.concatenate(
        (omega_world, jnp.zeros_like(omega_world[..., :1])), axis=-1
    )
    dq = 0.5 * quat_mul(omega_quat, q)
    return normalize(q + dt * dq)
