"""Stateful VecEnv adapter — the reference env contract for interactive use.

The reference Runner consumes an abstract VecEnv
(reference mini_gym_learn/env/vec_env.py:10-39) with mutable buffers and
``step``/``reset``/``get_observations``. The TPU-native stack is purely
functional; this adapter wraps (env, EnvState) behind that interface for
scripts, notebooks and ports of reference code. Training itself uses the
functional API (learn/ppo.py) — this class is interop, not the hot path.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .legged_robot import LeggedRobotEnv


class VecEnvAdapter:
    def __init__(self, env: LeggedRobotEnv, seed: int = 0):
        self.env = env
        self.num_envs = env.num_envs
        self.num_train_envs = env.num_train_envs
        self.num_eval_envs = env.num_eval_envs
        self.num_obs = env.num_obs
        self.num_privileged_obs = env.num_privileged_obs
        self.num_obs_history = env.num_obs_history
        self.num_actions = env.num_actions
        self.dt = env.dt
        self.max_episode_length = env.derived.max_episode_length

        self._step = jax.jit(env.step)
        self.state = env.initial_state(jax.random.PRNGKey(seed))
        self.extras: Dict = {}

    # -- VecEnv interface (vec_env.py:10-39) ----------------------------
    def step(self, actions):
        """obs_dict, rew, done, info — HistoryWrapper-style dict obs
        (history_wrapper.py:18-24)."""
        self.state, res = self._step(self.state, jnp.asarray(actions))
        self.extras = dict(res.info)
        obs = {"obs": res.obs, "privileged_obs": res.privileged_obs,
               "obs_history": res.obs_history}
        return obs, res.rew, res.done, self.extras

    def reset(self):
        mask = jnp.ones(self.num_envs, bool)
        self.state = self.env.reset_envs(self.state, mask)
        obs, _, _, _ = self.step(jnp.zeros((self.num_envs,
                                            self.num_actions)))
        return obs

    def reset_idx(self, env_ids):
        mask = jnp.zeros(self.num_envs, bool).at[jnp.asarray(env_ids)].set(True)
        self.state = self.env.reset_envs(self.state, mask)

    def reset_evaluation_envs(self):
        mask = jnp.arange(self.num_envs) >= self.num_train_envs
        self.state = self.env.reset_envs(self.state, mask)

    def get_observations(self):
        return {"obs": self.state.obs,
                "privileged_obs": self.state.privileged_obs,
                "obs_history": self.state.obs_history}

    def get_privileged_observations(self):
        return self.state.privileged_obs

    # -- convenience attributes mirrored from state ----------------------
    @property
    def episode_length_buf(self):
        return self.state.episode_length

    @episode_length_buf.setter
    def episode_length_buf(self, value):
        self.state = self.state._replace(episode_length=jnp.asarray(value))

    @property
    def commands(self):
        return self.state.commands

    @property
    def root_states(self):
        """IsaacGym-layout [N,13] root state view (legged_robot.py:950)."""
        s = self.state.sim
        return jnp.concatenate(
            [s.base_pos, s.base_quat, s.base_lin_vel, s.base_ang_vel],
            axis=-1)

    @property
    def dof_pos(self):
        return self.state.sim.q

    @property
    def dof_vel(self):
        return self.state.sim.qd
