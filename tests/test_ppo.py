"""PPO stack: shapes, GAE correctness, one fused train iteration end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
from rapid_locomotion_rl_tpu.learn.ppo import (PPOArgs, Transition,
                                               compute_gae, init_ppo_state,
                                               make_train_iteration)
from rapid_locomotion_rl_tpu.models.networks import (ACArgs, ActorCritic,
                                                     normal_entropy,
                                                     normal_kl,
                                                     normal_log_prob)


def tiny_cfg(num_envs=8):
    c = config_mini_cheetah()
    c.env.num_envs = num_envs
    c.terrain.mesh_type = "plane"
    c.terrain.teleport_robots = False
    return c


def test_normal_math():
    mean = jnp.zeros((4, 3))
    std = jnp.ones((4, 3))
    x = jnp.zeros((4, 3))
    lp = normal_log_prob(mean, std, x)
    np.testing.assert_allclose(np.asarray(lp),
                               3 * -0.5 * np.log(2 * np.pi), rtol=1e-5)
    ent = normal_entropy(std)
    np.testing.assert_allclose(np.asarray(ent),
                               3 * 0.5 * (1 + np.log(2 * np.pi)), rtol=1e-5)
    # reference KL carries a +1e-5 epsilon inside the log (ppo.py:113)
    kl = normal_kl(mean, std, mean, std)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-4)


def test_gae_matches_reference_recursion():
    """GAE reverse scan vs a hand-rolled python loop
    (rollout_storage.py:76-90)."""
    rng = np.random.default_rng(0)
    T, N = 6, 3
    rewards = rng.normal(size=(T, N)).astype(np.float32)
    values = rng.normal(size=(T, N)).astype(np.float32)
    dones = (rng.random(size=(T, N)) < 0.2)
    last_values = rng.normal(size=(N,)).astype(np.float32)
    gamma, lam = 0.99, 0.95

    traj = Transition(
        obs=jnp.zeros((T, N, 1)), privileged_obs=jnp.zeros((T, N, 1)),
        obs_history=jnp.zeros((T, N, 1)), actions=jnp.zeros((T, N, 1)),
        rewards=jnp.asarray(rewards), dones=jnp.asarray(dones),
        values=jnp.asarray(values), log_prob=jnp.zeros((T, N)),
        mu=jnp.zeros((T, N, 1)), sigma=jnp.ones((T, N, 1)),
        env_bins=jnp.zeros((T, N), jnp.int32))
    adv, ret = compute_gae(traj, jnp.asarray(last_values), gamma, lam)

    expected = np.zeros((T, N), np.float32)
    a = np.zeros(N, np.float32)
    for t in reversed(range(T)):
        nv = last_values if t == T - 1 else values[t + 1]
        nd = 1.0 - dones[t].astype(np.float32)
        delta = rewards[t] + nd * gamma * nv - values[t]
        a = delta + nd * gamma * lam * a
        expected[t] = a
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), expected + values,
                               rtol=1e-4, atol=1e-5)


def test_actor_critic_shapes():
    ac = ActorCritic(num_obs=42, num_privileged_obs=18,
                     num_obs_history=630, num_actions=12, args=ACArgs())
    params = ac.init(jax.random.PRNGKey(0), jnp.zeros((5, 42)),
                     jnp.zeros((5, 18)), jnp.zeros((5, 630)))
    mean, std = ac.apply(params, jnp.zeros((5, 42)), jnp.zeros((5, 18)),
                         method=ActorCritic.distribution)
    assert mean.shape == (5, 12) and std.shape == (5, 12)
    np.testing.assert_allclose(np.asarray(std), 1.0)
    v = ac.apply(params, jnp.zeros((5, 42)), jnp.zeros((5, 18)),
                 method=ActorCritic.evaluate)
    assert v.shape == (5,)
    a = ac.apply(params, jnp.zeros((5, 42)), jnp.zeros((5, 630)),
                 method=ActorCritic.act_student)
    assert a.shape == (5, 12)
    # parameter count sanity: actor 60->512->256->128->12
    n_params = sum(x.size for x in jax.tree.leaves(params))
    assert 400_000 < n_params < 800_000, n_params


def test_min_std_floor():
    """ACArgs.min_std clamps the sampled-policy std from below (the
    sigma^2 adaptive-LR ratchet guard, EXPERIMENTS.md §13); 0.0 keeps
    reference semantics (clamp only at the 1e-4 numerical floor)."""
    ac = ActorCritic(num_obs=8, num_privileged_obs=4, num_obs_history=16,
                     num_actions=3, args=ACArgs(min_std=0.3))
    params = ac.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)),
                     jnp.zeros((2, 4)), jnp.zeros((2, 16)))
    # force the learned std parameter below the floor
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.full_like(x, 0.05)
        if p[-1].key == "std" else x, params)
    _, std = ac.apply(params, jnp.zeros((2, 8)), jnp.zeros((2, 4)),
                      method=ActorCritic.distribution)
    np.testing.assert_allclose(np.asarray(std), 0.3)


@pytest.mark.slow
def test_train_iteration_runs():
    env = LeggedRobotEnv(tiny_cfg())
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    ppo_args = PPOArgs()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ppo_state = init_ppo_state(k1, ac, ppo_args, env.num_obs,
                               env.num_privileged_obs, env.num_obs_history)
    env_state = env.initial_state(k2)
    train_it = jax.jit(make_train_iteration(env, ac, ppo_args,
                                            num_steps_per_env=8))
    for i in range(2):
        k3, k = jax.random.split(k3)
        env_state, ppo_state, metrics = train_it(env_state, ppo_state, k)
    m = jax.device_get(metrics)
    assert np.isfinite(m["mean_value_loss"])
    assert np.isfinite(m["mean_surrogate_loss"])
    assert np.isfinite(m["mean_adaptation_loss"])
    assert np.isfinite(m["kl"]) and m["kl"] >= 0
    assert 1e-5 <= m["lr"] <= 1e-2
    # params actually moved
    assert np.all(np.isfinite(np.asarray(
        jax.tree.leaves(ppo_state.params)[0], dtype=np.float32)))


def test_rollout_without_sim_state():
    """Regression: envs whose state has no .sim field (e.g. HLPState) must
    roll out without the env-0 pose-capture piggyback crashing at trace
    time (round-4 r4_hlp failure)."""
    from typing import NamedTuple

    from rapid_locomotion_rl_tpu.envs.legged_robot import StepResult
    from rapid_locomotion_rl_tpu.learn.ppo import rollout

    N, n_obs = 6, 5

    class MiniState(NamedTuple):
        obs: jnp.ndarray
        privileged_obs: jnp.ndarray
        obs_history: jnp.ndarray

    class MiniEnv:
        num_train_envs = N
        num_eval_envs = 0

        def step(self, state, actions):
            obs = state.obs + 0.1 * actions.mean(axis=-1, keepdims=True)
            nxt = MiniState(obs, state.privileged_obs, state.obs_history)
            info = {"time_outs": jnp.zeros(N),
                    "env_bins": jnp.zeros(N, jnp.int32)}
            return nxt, StepResult(obs, nxt.privileged_obs, nxt.obs_history,
                                   rew=obs.sum(-1), done=jnp.zeros(N, bool),
                                   info=info)

    ac = ActorCritic(n_obs, n_obs, n_obs, 3,
                     ACArgs(activation="tanh", use_latent=False))
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((N, n_obs))
    params = ac.init(key, z, z, z)
    state = MiniState(z, z, z)
    new_state, traj, infos, poses = rollout(
        MiniEnv(), ac, PPOArgs(), params, state, key, num_steps=4)
    assert poses == ()          # no sim state -> no pose log
    assert traj.obs.shape == (4, N, n_obs)
    assert np.isfinite(np.asarray(traj.rewards)).all()


def test_entropy_warmup_coefficient():
    """Round-5 entropy warmup: ppo_update takes a per-iteration traced
    entropy coefficient; coef=0.0 matches the baked entropy_coef=0.0
    default exactly, and a large coef moves the std parameter upward
    (entropy bonus wants sigma large)."""
    from rapid_locomotion_rl_tpu.learn.ppo import (PPOArgs, Transition,
                                                   init_ppo_state,
                                                   ppo_update)
    ac = ActorCritic(num_obs=8, num_privileged_obs=4, num_obs_history=16,
                     num_actions=3, args=ACArgs())
    ppo_args = PPOArgs()
    key = jax.random.PRNGKey(0)
    st = init_ppo_state(key, ac, ppo_args, 8, 4, 16)
    T, N = 4, 4
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)  # noqa
    traj = Transition(
        obs=r(T, N, 8), privileged_obs=r(T, N, 4), obs_history=r(T, N, 16),
        actions=r(T, N, 3), rewards=r(T, N),
        dones=jnp.zeros((T, N), bool), values=r(T, N),
        log_prob=r(T, N), mu=r(T, N, 3), sigma=jnp.ones((T, N, 3)),
        env_bins=jnp.zeros((T, N), jnp.int32))
    adv, ret = r(T, N), r(T, N)

    def std_of(params):
        leaves = jax.tree_util.tree_map_with_path(
            lambda p, x: x if p[-1].key == "std" else None, params,
            is_leaf=lambda x: x is None)
        return float(np.mean([np.mean(x) for x in jax.tree.leaves(leaves)]))

    s_none, _ = ppo_update(ac, ppo_args, st, traj, adv, ret, key, N)
    s_same, _ = ppo_update(ac, ppo_args, st, traj, adv, ret, key, N,
                           entropy_coef=jnp.float32(ppo_args.entropy_coef))
    np.testing.assert_allclose(std_of(s_none.params),
                               std_of(s_same.params), rtol=1e-6)
    s_zero, _ = ppo_update(ac, ppo_args, st, traj, adv, ret, key, N,
                           entropy_coef=jnp.float32(0.0))
    s_big, _ = ppo_update(ac, ppo_args, st, traj, adv, ret, key, N,
                          entropy_coef=jnp.float32(5.0))
    assert std_of(s_big.params) > std_of(s_zero.params)
