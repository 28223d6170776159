"""Pluggable evaluation metric probes.

Re-creates the reference registry (reference
mini_gym_learn/eval_metrics/metrics.py:8-99): each probe maps
(env, env_state, ac, params) -> scalar/array, evaluated on live rollout
state. Names and semantics match the reference METRICS_FNS.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from ..models.networks import ActorCritic
from ..ops import quat as Q


def _base_lin_vel(env_state):
    return Q.quat_rotate_inverse(env_state.sim.base_quat,
                                 env_state.sim.base_lin_vel)


def _base_ang_vel(env_state):
    return Q.quat_rotate_inverse(env_state.sim.base_quat,
                                 env_state.sim.base_ang_vel)


def lin_vel_rmsd(env, env_state, ac=None, params=None):
    """RMS deviation of commanded vs achieved planar velocity (metrics.py:8)."""
    err = env_state.commands[:, :2] - _base_lin_vel(env_state)[:, :2]
    return jnp.sqrt(jnp.mean(jnp.sum(err ** 2, axis=-1)))


def ang_vel_rmsd(env, env_state, ac=None, params=None):
    err = env_state.commands[:, 2] - _base_ang_vel(env_state)[:, 2]
    return jnp.sqrt(jnp.mean(err ** 2))


def mechanical_power(env, env_state, ac=None, params=None):
    """Positive mechanical power P = Σ max(τ·q̇, 0) [W]."""
    return jnp.mean(jnp.sum(
        jnp.clip(env_state.torques * env_state.sim.qd, 0.0, None), axis=-1))


def cost_of_transport(env, env_state, ac=None, params=None):
    """CoT = P / (m g v) (metrics.py:40-47)."""
    p = jnp.sum(jnp.clip(env_state.torques * env_state.sim.qd, 0.0, None),
                axis=-1)
    v = jnp.linalg.norm(_base_lin_vel(env_state)[:, :2], axis=-1)
    mg = env.model.total_mass() * 9.81
    return jnp.mean(p / (mg * jnp.maximum(v, 0.1)))


def froude_number(env, env_state, ac=None, params=None):
    """Fr = v^2 / (g h) (metrics.py:50-55)."""
    v = jnp.linalg.norm(_base_lin_vel(env_state)[:, :2], axis=-1)
    h = jnp.maximum(env_state.sim.base_pos[:, 2] - env_state.env_origins[:, 2],
                    0.05)
    return jnp.mean(v ** 2 / (9.81 * h))


def adaptation_loss(env, env_state, ac: ActorCritic, params):
    """MSE(adaptation(obs_hist), encoder(priv_obs)) (metrics.py:58-63)."""
    pred = ac.apply(params, env_state.obs_history,
                    method=ActorCritic.student_latent)
    target = ac.apply(params, env_state.privileged_obs,
                      method=ActorCritic.teacher_latent)
    return jnp.mean((pred - target) ** 2)


def base_height(env, env_state, ac=None, params=None):
    return jnp.mean(env_state.sim.base_pos[:, 2]
                    - env_state.env_origins[:, 2])


def contact_rate(env, env_state, ac=None, params=None):
    """Fraction of feet in ground contact."""
    f = env_state.contact_report[:, list(env.feet_indices), 2]
    return jnp.mean((f > 1.0).astype(jnp.float32))


METRICS_FNS: Dict[str, Callable] = {
    "lin_vel_rmsd": lin_vel_rmsd,
    "ang_vel_rmsd": ang_vel_rmsd,
    "mechanical_power": mechanical_power,
    "cost_of_transport": cost_of_transport,
    "froude_number": froude_number,
    "adaptation_loss": adaptation_loss,
    "base_height": base_height,
    "contact_rate": contact_rate,
}
