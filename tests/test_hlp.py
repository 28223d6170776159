"""Hierarchical HLP env: frozen low-level policy driven by velocity
commands, goal rewards/terminations, trainable with the shared PPO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.hlp import HighLevelControlEnv
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
from rapid_locomotion_rl_tpu.learn.ppo import (PPOArgs, init_ppo_state,
                                               make_train_iteration)
from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic


@pytest.fixture(scope="module")
def hlp_env():
    cfg = config_mini_cheetah()
    cfg.env.num_envs = 8
    cfg.env.auto_reset = False
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.teleport_robots = False
    cfg.noise.add_noise = False
    ll_env = LeggedRobotEnv(cfg)
    ll_ac = ActorCritic(ll_env.num_obs, ll_env.num_privileged_obs,
                        ll_env.num_obs_history, ll_env.num_actions, ACArgs())
    ll_params = ll_ac.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, ll_env.num_obs)),
                           jnp.zeros((1, ll_env.num_privileged_obs)),
                           jnp.zeros((1, ll_env.num_obs_history)))
    return HighLevelControlEnv(ll_env, ll_params)


def test_hlp_obs_layout(hlp_env):
    state = hlp_env.initial_state(jax.random.PRNGKey(0))
    assert state.obs.shape == (8, 14)
    # goal is the last 2 dims
    np.testing.assert_allclose(np.asarray(state.obs[:, 12:14]),
                               np.tile([3.0, 0.0], (8, 1)), atol=1e-5)


def test_hlp_step_runs(hlp_env):
    state = hlp_env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(hlp_env.step)
    for _ in range(5):
        state, res = step(state, jnp.zeros((8, 3)))
    assert np.all(np.isfinite(np.asarray(res.obs)))
    assert np.all(np.isfinite(np.asarray(res.rew)))
    # per-step distance penalty active: rewards negative at distance 3
    assert np.all(np.asarray(res.rew) < 0)


def test_hlp_action_clamping(hlp_env):
    state = hlp_env.initial_state(jax.random.PRNGKey(0))
    state, res = jax.jit(hlp_env.step)(state, jnp.full((8, 3), 10.0))
    # clamped to 2.0 -> ll commands == 2
    np.testing.assert_allclose(
        np.asarray(state.ll.commands[:, :3]), 2.0, atol=1e-6)
    # small xy zeroed
    state, res = jax.jit(hlp_env.step)(
        state, jnp.asarray([[0.05, 0.05, 1.0]] * 8))
    np.testing.assert_allclose(np.asarray(state.ll.commands[:, :2]), 0.0)


def test_hlp_timeout_termination(hlp_env):
    state = hlp_env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(hlp_env.step)
    max_len = hlp_env.max_episode_length
    saw_done = False
    state = state._replace(episode_length=jnp.full(
        (8,), max_len - 1, jnp.int32))
    state, res = step(state, jnp.zeros((8, 3)))
    state, res = step(state, jnp.zeros((8, 3)))
    assert bool(np.any(np.asarray(res.done)))
    assert np.all(np.asarray(state.episode_length) <= 2)


def test_hlp_progress_shaping_and_visible_terminals(hlp_env):
    """Round-5 HLP levers: (a) potential-based progress shaping telescopes
    to dist_start - dist_end; (b) zero_reward_on_reset=False makes the
    terminal bonuses visible to the learner (+5 goal / -2 fall / -1
    timeout; the reference quirk at high_level_play.py:222 erases them)."""
    from rapid_locomotion_rl_tpu.envs.hlp import HLPRewardScales

    class Shaped(HLPRewardScales):
        progress = 1.0

    env = HighLevelControlEnv(hlp_env.ll_env, hlp_env.ll_params,
                              zero_reward_on_reset=False, scales=Shaped)
    assert "progress" in env.step_scales
    # progress is NOT dt-scaled (it telescopes)
    assert env.step_scales["progress"] == 1.0

    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    d0 = float(jnp.linalg.norm(
        state.obs[0, 0:2] - state.obs[0, 12:14]))
    total_progress = 0.0
    for _ in range(4):
        prev = np.asarray(state.last_pos[:, :2])
        state, res = step(state, jnp.zeros((8, 3)))
        now = np.asarray(state.last_pos[:, :2])
        goal = np.asarray(state.goal_position)
        if not np.any(np.asarray(res.done)):
            total_progress += (np.linalg.norm(prev - goal, axis=-1)
                               - np.linalg.norm(now - goal, axis=-1))
    d1 = float(jnp.linalg.norm(state.obs[0, 0:2] - state.obs[0, 12:14]))
    sums = np.asarray(state.episode_sums["progress"])
    # telescoped: episode progress sum == dist_start - dist_now
    np.testing.assert_allclose(sums[0], d0 - d1, atol=1e-4)

    # visible terminal rewards: force a timeout and check -1 lands in rew
    state = state._replace(episode_length=jnp.full(
        (8,), env.max_episode_length, jnp.int32))
    state, res = step(state, jnp.zeros((8, 3)))
    done = np.asarray(res.done)
    assert np.any(done)
    # every timed-out env's reward includes the -1 terminal bonus
    assert np.all(np.asarray(res.rew)[done] < -0.9)


def test_hlp_dead_zone_and_goal_radius(hlp_env):
    """Round-5 demonstration levers: dead_zone=0 passes small xy commands
    through to the LL env (default 0.2 zeroes them, reference
    high_level_play.py:133), and goal_radius widens the success disc
    (reference 0.1, :191) so the +5 bonus is sampleable under
    exploration from the ~1.1 m stall (EXPERIMENTS.md §28)."""
    env = HighLevelControlEnv(hlp_env.ll_env, hlp_env.ll_params,
                              dead_zone=0.0, goal_radius=0.5,
                              zero_reward_on_reset=False)
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    # small xy commands are NOT zeroed with the dead zone off
    state, res = step(state, jnp.asarray([[0.05, 0.05, 0.0]] * 8))
    np.testing.assert_allclose(np.asarray(state.ll.commands[:, :2]), 0.05,
                               atol=1e-6)
    # a robot inside the 0.5 m disc terminates with the +5 goal bonus
    near = state._replace(
        last_pos=state.last_pos,
        goal_position=np.asarray(state.last_pos[:, :2]) + 0.3)
    near, res = step(near, jnp.zeros((8, 3)))
    assert bool(np.all(np.asarray(res.done)))
    assert np.all(np.asarray(res.rew) > 3.0)  # +5 dominates step penalties
    # the reference-tolerance env does NOT terminate at 0.3 m
    state2 = hlp_env.initial_state(jax.random.PRNGKey(0))
    far = state2._replace(
        goal_position=np.asarray(state2.last_pos[:, :2]) + 0.3)
    _, res2 = jax.jit(hlp_env.step)(far, jnp.zeros((8, 3)))
    assert not bool(np.any(np.asarray(res2.done)))


@pytest.mark.slow
def test_hlp_trains(hlp_env):
    env = hlp_env
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions,
                     ACArgs(activation="tanh", use_latent=False))
    ppo_args = PPOArgs()
    key = jax.random.PRNGKey(1)
    ppo_state = init_ppo_state(key, ac, ppo_args, env.num_obs,
                               env.num_privileged_obs, env.num_obs_history)
    env_state = env.initial_state(key)
    train_it = jax.jit(make_train_iteration(env, ac, ppo_args, 8))
    env_state, ppo_state, m = train_it(env_state, ppo_state, key)
    assert np.isfinite(float(m["kl"]))
    assert np.isfinite(float(m["mean_value_loss"]))
