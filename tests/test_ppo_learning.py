"""Learner correctness on a synthetic task: if PPO can't solve a trivial
bandit-style env, nothing downstream can learn."""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu.learn.ppo import (PPOArgs, init_ppo_state,
                                               make_train_iteration)
from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic


class _ToyState(NamedTuple):
    obs: jnp.ndarray
    privileged_obs: jnp.ndarray
    obs_history: jnp.ndarray
    key: jnp.ndarray


class ToyEnv:
    """reward = -(a - target)^2 summed over dims; fixed obs. The optimal
    deterministic policy is a == target."""
    num_envs = 64
    num_train_envs = 64
    num_eval_envs = 0
    num_obs = 4
    num_privileged_obs = 3
    num_obs_history = 8
    num_actions = 2
    target = 0.7

    def initial_state(self, key):
        n = self.num_envs
        return _ToyState(
            obs=jnp.ones((n, self.num_obs)),
            privileged_obs=jnp.zeros((n, self.num_privileged_obs)),
            obs_history=jnp.zeros((n, self.num_obs_history)),
            key=key)

    def step(self, state, actions):
        rew = -jnp.sum((actions - self.target) ** 2, axis=-1)
        done = jnp.zeros(self.num_envs, bool)
        info = {"time_outs": done, "env_bins": jnp.zeros(self.num_envs,
                                                         jnp.int32),
                "dummy_count": jnp.zeros(())}
        return state, type("R", (), dict(
            obs=state.obs, privileged_obs=state.privileged_obs,
            obs_history=state.obs_history, rew=rew, done=done, info=info))()


@pytest.mark.slow
def test_ppo_solves_toy_bandit():
    env = ToyEnv()
    args = ACArgs(actor_hidden_dims=[32, 32], critic_hidden_dims=[32, 32],
                  env_factor_encoder_branch_hidden_dims=[16],
                  env_factor_encoder_branch_latent_dims=4,
                  adaptation_module_branch_hidden_dims=[16])
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, args)
    ppo_args = PPOArgs(desired_kl=0.03)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ppo_state = init_ppo_state(k1, ac, ppo_args, env.num_obs,
                               env.num_privileged_obs, env.num_obs_history)
    env_state = env.initial_state(k2)
    train_it = jax.jit(make_train_iteration(env, ac, ppo_args, 16))

    rewards = []
    for i in range(150):
        k3, k = jax.random.split(k3)
        env_state, ppo_state, m = train_it(env_state, ppo_state, k)
        rewards.append(float(m["mean_reward"]))

    mean_action = ac.apply(ppo_state.params, env_state.obs,
                           env_state.privileged_obs,
                           method=ActorCritic.act_teacher)
    # policy mean converged toward the target
    np.testing.assert_allclose(np.asarray(mean_action),
                               env.target, atol=0.25)
    # reward improved substantially
    assert np.mean(rewards[-10:]) > np.mean(rewards[:10]) + 0.5, \
        (np.mean(rewards[:10]), np.mean(rewards[-10:]))
    # std shrank (policy concentrating), not exploding
    std = np.asarray(ppo_state.params["params"]["std"])
    assert np.all(std < 1.0), std
