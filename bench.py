"""Throughput benchmark: full PPO training iterations at the reference's
flagship configuration (Mini Cheetah, 4000 envs, 24 steps/env/iter,
5x4 minibatch PPO — BASELINE.md).

Prints ONE JSON line:
  {"metric": "env_steps_per_sec", "value": N, "unit": "env-steps/s",
   "vs_baseline": N / 50000}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.learn.ppo import (PPOArgs, init_ppo_state,
                                                   make_train_iteration)
    from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic

    num_envs = 4000
    steps_per_env = 24

    cfg = config_mini_cheetah()
    cfg.env.num_envs = num_envs
    env = LeggedRobotEnv(cfg)
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    ppo_args = PPOArgs()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ppo_state = init_ppo_state(k1, ac, ppo_args, env.num_obs,
                               env.num_privileged_obs, env.num_obs_history)
    env_state = env.initial_state(k2)
    train_it = make_train_iteration(env, ac, ppo_args, steps_per_env,
                                    split=True)

    # warmup/compile: two iterations, so any signature change after the
    # first call (weak-type promotion) has also been compiled
    for _ in range(2):
        k3, k = jax.random.split(k3)
        env_state, ppo_state, metrics = train_it(env_state, ppo_state, k)
    jax.block_until_ready(metrics["kl"])

    n_iter = 5
    t0 = time.time()
    for _ in range(n_iter):
        k3, k = jax.random.split(k3)
        env_state, ppo_state, metrics = train_it(env_state, ppo_state, k)
    jax.block_until_ready(metrics["kl"])
    dt = (time.time() - t0) / n_iter

    steps_per_sec = num_envs * steps_per_env / dt
    baseline = 50_000.0  # BASELINE.md north-star (~45-50k env-steps/s, 1 GPU)
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(steps_per_sec),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
