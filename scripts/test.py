"""Smoke test / install verification (reference scripts/test.py:14-53):
a few envs, fixed dynamics, zero actions for 1000 steps — verifies the sim
builds and steps without NaN."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_env(num_envs=3, steps=1000):
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv

    cfg = config_mini_cheetah()
    cfg.env.num_envs = num_envs
    # fixed dynamics, as in the reference smoke test (test.py:20-29)
    cfg.domain_rand.randomize_friction = True
    cfg.domain_rand.friction_range = [1.0, 1.01]
    cfg.domain_rand.randomize_base_mass = True
    cfg.domain_rand.added_mass_range = [0.0, 6.0]
    cfg.terrain.num_rows = 3
    cfg.terrain.num_cols = 3
    cfg.terrain.border_size = 5.0

    env = LeggedRobotEnv(cfg)
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    actions = jnp.zeros((num_envs, env.num_actions))
    for i in range(steps):
        state, res = step(state, actions)
        if i % 100 == 0:
            rew = float(jnp.mean(res.rew))
            z = float(jnp.mean(state.sim.base_pos[:, 2]
                               - state.env_origins[:, 2]))
            assert np.isfinite(rew), f"NaN reward at step {i}"
            print(f"step {i:4d} | mean rew {rew:7.4f} | mean height {z:.3f}")
    print("smoke test passed")


if __name__ == "__main__":
    run_env()
