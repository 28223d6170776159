"""Reward term registry — pure functions over a step context.

Re-creates every active reward of the reference env
(reference legged_robot.py:1506-1646) with the same names, so that the
scale-gated selection (`_prepare_reward_function`, legged_robot.py:1074-1093)
and the logged metric names (`train/episode/rew_<name>`) line up exactly.

Each function maps a :class:`RewardContext` to a per-env [N] tensor. Terms
are summed with their (dt-scaled) weights at trace time — only nonzero-scale
terms appear in the compiled graph.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax.numpy as jnp


class RewardContext(NamedTuple):
    # body-frame base kinematics (legged_robot.py:159-162)
    base_lin_vel: jnp.ndarray        # [N,3]
    base_ang_vel: jnp.ndarray        # [N,3]
    projected_gravity: jnp.ndarray   # [N,3]
    base_height: jnp.ndarray         # [N] root z minus mean measured height
    # joints
    dof_pos: jnp.ndarray             # [N,nv]
    default_dof_pos: jnp.ndarray     # [nv]
    dof_vel: jnp.ndarray             # [N,nv]
    last_dof_vel: jnp.ndarray        # [N,nv]
    torques: jnp.ndarray             # [N,nv]
    dof_pos_limits: jnp.ndarray      # [nv,2] soft limits
    dof_vel_limits: jnp.ndarray      # [nv]
    torque_limits: jnp.ndarray       # [nv]
    # actions
    actions: jnp.ndarray             # [N,na]
    last_actions: jnp.ndarray        # [N,na]
    # commands
    commands: jnp.ndarray            # [N,>=3]
    # contacts (report-body forces, world frame)
    contact_forces: jnp.ndarray      # [N,nr,3]
    feet_indices: tuple              # static
    penalised_contact_indices: tuple
    # gait bookkeeping (computed by the env before reward evaluation)
    feet_air_time_reward: jnp.ndarray  # [N] precomputed feet_air_time term
    # termination flags
    reset_buf: jnp.ndarray           # [N] bool
    time_out_buf: jnp.ndarray        # [N] bool
    # cfg scalars
    tracking_sigma: float
    tracking_sigma_yaw: float
    base_height_target: float
    soft_dof_vel_limit: float
    soft_torque_limit: float
    max_contact_force: float
    dt: float
    global_reference: bool
    root_lin_vel_world: jnp.ndarray  # [N,3] for global_reference tracking


def _sq(x):
    return jnp.square(x)


def lin_vel_z(c):       # penalize vertical base velocity
    return _sq(c.base_lin_vel[:, 2])


def ang_vel_xy(c):      # penalize base roll/pitch rates
    return jnp.sum(_sq(c.base_ang_vel[:, :2]), axis=1)


def orientation(c):     # penalize non-flat base
    return jnp.sum(_sq(c.projected_gravity[:, :2]), axis=1)


def base_height(c):
    return _sq(c.base_height - c.base_height_target)


def torques(c):
    return jnp.sum(_sq(c.torques), axis=1)


def energy(c):
    return jnp.sum(c.torques * c.dof_vel, axis=1)


def energy_expenditure(c):
    return jnp.sum(jnp.clip(c.torques * c.dof_vel, 0.0, 1e30), axis=1)


def dof_vel(c):
    return jnp.sum(_sq(c.dof_vel), axis=1)


def dof_acc(c):
    return jnp.sum(_sq((c.last_dof_vel - c.dof_vel) / c.dt), axis=1)


def action_rate(c):
    return jnp.sum(_sq(c.last_actions - c.actions), axis=1)


def collision(c):
    f = c.contact_forces[:, list(c.penalised_contact_indices), :]
    return jnp.sum(
        (jnp.linalg.norm(f, axis=-1) > 0.1).astype(jnp.float32), axis=1)


def termination(c):
    return (c.reset_buf & ~c.time_out_buf).astype(jnp.float32)


def survival(c):
    return (~(c.reset_buf & ~c.time_out_buf)).astype(jnp.float32)


def dof_pos_limits(c):
    below = -jnp.clip(c.dof_pos - c.dof_pos_limits[:, 0], None, 0.0)
    above = jnp.clip(c.dof_pos - c.dof_pos_limits[:, 1], 0.0, None)
    return jnp.sum(below + above, axis=1)


def dof_vel_limits(c):
    return jnp.sum(
        jnp.clip(jnp.abs(c.dof_vel) - c.dof_vel_limits * c.soft_dof_vel_limit,
                 0.0, 1.0), axis=1)


def torque_limits(c):
    return jnp.sum(
        jnp.clip(jnp.abs(c.torques) - c.torque_limits * c.soft_torque_limit,
                 0.0, None), axis=1)


def tracking_lin_vel(c):
    vel = c.root_lin_vel_world[:, :2] if c.global_reference else c.base_lin_vel[:, :2]
    err = jnp.sum(_sq(c.commands[:, :2] - vel), axis=1)
    return jnp.exp(-err / c.tracking_sigma)


def tracking_ang_vel(c):
    err = _sq(c.commands[:, 2] - c.base_ang_vel[:, 2])
    return jnp.exp(-err / c.tracking_sigma_yaw)


def tracking_lin_vel_lat(c):
    err = _sq(c.commands[:, 1] - c.base_lin_vel[:, 1])
    return jnp.exp(-err / c.tracking_sigma)


def tracking_lin_vel_long(c):
    err = _sq(c.commands[:, 0] - c.base_lin_vel[:, 0])
    return jnp.exp(-err / c.tracking_sigma)


def feet_air_time(c):
    # computed statefully by the env (contact filtering + air-time buffers,
    # legged_robot.py:1619-1631); passed through the context
    return c.feet_air_time_reward


def feet_stumble(c):
    f = c.contact_forces[:, list(c.feet_indices), :]
    lateral = jnp.linalg.norm(f[..., :2], axis=-1)
    return jnp.any(lateral > 5.0 * jnp.abs(f[..., 2]), axis=1).astype(jnp.float32)


def stand_still(c):
    still = jnp.linalg.norm(c.commands[:, :2], axis=1) < 0.1
    return jnp.sum(jnp.abs(c.dof_pos - c.default_dof_pos), axis=1) * still


def feet_contact_forces(c):
    f = c.contact_forces[:, list(c.feet_indices), :]
    return jnp.sum(
        jnp.clip(jnp.linalg.norm(f, axis=-1) - c.max_contact_force, 0.0, None),
        axis=1)


REWARD_REGISTRY: Dict[str, Callable[[RewardContext], jnp.ndarray]] = {
    "lin_vel_z": lin_vel_z,
    "ang_vel_xy": ang_vel_xy,
    "orientation": orientation,
    "base_height": base_height,
    "torques": torques,
    "energy": energy,
    "energy_expenditure": energy_expenditure,
    "dof_vel": dof_vel,
    "dof_acc": dof_acc,
    "action_rate": action_rate,
    "collision": collision,
    "termination": termination,
    "survival": survival,
    "dof_pos_limits": dof_pos_limits,
    "dof_vel_limits": dof_vel_limits,
    "torque_limits": torque_limits,
    "tracking_lin_vel": tracking_lin_vel,
    "tracking_ang_vel": tracking_ang_vel,
    "tracking_lin_vel_lat": tracking_lin_vel_lat,
    "tracking_lin_vel_long": tracking_lin_vel_long,
    "feet_air_time": feet_air_time,
    "feet_stumble": feet_stumble,
    "stand_still": stand_still,
    "feet_contact_forces": feet_contact_forces,
}
