"""Multi-device sharding on the 8-device virtual CPU mesh (SURVEY.md §2.3):
the full train step partitions over the env axis and matches single-device
numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
from rapid_locomotion_rl_tpu.learn.ppo import (PPOArgs, init_ppo_state,
                                               make_train_iteration)
from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic
from rapid_locomotion_rl_tpu.parallel.sharding import (make_mesh,
                                                       place_env_state,
                                                       place_train_state)


def build(num_envs):
    cfg = config_mini_cheetah()
    cfg.env.num_envs = num_envs
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.teleport_robots = False
    env = LeggedRobotEnv(cfg)
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    key = jax.random.PRNGKey(0)
    ppo_args = PPOArgs()
    ppo_state = init_ppo_state(key, ac, ppo_args, env.num_obs,
                               env.num_privileged_obs, env.num_obs_history)
    env_state = env.initial_state(key)
    train_it = jax.jit(make_train_iteration(env, ac, ppo_args,
                                            num_steps_per_env=4))
    return env, env_state, ppo_state, train_it


@pytest.mark.slow
def test_sharded_matches_single_device():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    env, env_state, ppo_state, train_it = build(16)
    key = jax.random.PRNGKey(7)

    # single device
    _, ppo1, m1 = train_it(env_state, ppo_state, key)

    # sharded over 8 devices
    mesh = make_mesh(jax.devices()[:8])
    es = place_env_state(env_state, env.num_envs, mesh)
    ps = place_train_state(ppo_state, mesh)
    _, ppo8, m8 = train_it(es, ps, key)

    np.testing.assert_allclose(float(m1["kl"]), float(m8["kl"]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        float(m1["mean_value_loss"]), float(m8["mean_value_loss"]),
        rtol=1e-3, atol=1e-5)
    l1 = jax.tree.leaves(ppo1.params)[0]
    l8 = jax.tree.leaves(ppo8.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_graft_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
