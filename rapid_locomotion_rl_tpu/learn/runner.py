"""Training driver — the reference Runner re-imagined for jitted iterations.

Reference: mini_gym_learn/ppo/__init__.py:65-298. The hot loop (24-step
rollout + GAE + 5x4 minibatch update) is ONE jitted function with zero host
crossings (SURVEY.md §3.2); the host only receives a small dict of scalar
metrics per iteration and handles cadence work: metric summaries every
``log_freq``, checkpoints + deployment export every ``save_interval``,
eval-env resets + curriculum dumps every ``eval_freq``.
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Cfg
from ..models.networks import ACArgs, ActorCritic
from ..utils.checkpoint import (export_student_policy, load_pytree,
                                save_pytree)
from ..utils.logger import MetricsLogger
from .caches import DataCaches
from .ppo import PPOArgs, PPOState, init_ppo_state, make_train_iteration


@dataclass
class RunnerArgs:
    """Reference RunnerArgs (ppo/__init__.py:47-62)."""
    num_steps_per_env: int = 24
    max_iterations: int = 1500
    save_interval: int = 400
    save_video_interval: int = 100   # reference default (ppo/__init__.py:53)
    log_freq: int = 10
    resume: bool = False
    resume_path: Optional[str] = None


class Runner:
    def __init__(self, env, logdir: str,
                 ac_args: Optional[ACArgs] = None,
                 ppo_args: Optional[PPOArgs] = None,
                 runner_args: Optional[RunnerArgs] = None,
                 seed: int = 0, eval_expert: bool = False,
                 device=None):
        self.env = env
        self.ac_args = ac_args or ACArgs()
        self.ppo_args = ppo_args or PPOArgs()
        self.args = runner_args or RunnerArgs()
        self.logger = MetricsLogger(logdir)
        self.eval_expert = eval_expert

        self.ac = ActorCritic(
            num_obs=env.num_obs,
            num_privileged_obs=env.num_privileged_obs,
            num_obs_history=env.num_obs_history,
            num_actions=env.num_actions,
            args=self.ac_args)

        key = jax.random.PRNGKey(seed)
        self.key, k_net, k_env = jax.random.split(key, 3)
        self.ppo_state: PPOState = init_ppo_state(
            k_net, self.ac, self.ppo_args, env.num_obs,
            env.num_privileged_obs, env.num_obs_history)
        self.env_state = env.initial_state(k_env)
        # host-side ring buffer of env-0 poses (one [T,...] block per
        # training rollout) consumed by _log_video
        self._pose_buffer: list = []
        self._video_window = 10

        # split pipeline: two jitted halves, device-resident in between
        self._train_iter = make_train_iteration(
            env, self.ac, self.ppo_args, self.args.num_steps_per_env,
            eval_expert=eval_expert, split=True)
        self._reset_eval = jax.jit(
            lambda s: env.reset_envs(
                s, jnp.arange(env.num_envs) >= env.num_train_envs))

        self.tot_timesteps = 0
        self.current_learning_iteration = 0
        # per-curriculum-bin stat caches (reference DataCaches,
        # ppo/__init__.py:36-44, dumped to curriculum/info.pkl)
        nbins = (env.curriculum_grid.num_bins
                 if getattr(env, "curriculum_grid", None) is not None else 1)
        self.caches = DataCaches(nbins)

        # parameters.json snapshot (parameters.pkl analogue, train.py:26-27)
        self.logger.log_params({
            "Cfg": env.cfg.to_dict(),
            "PPO_Args": dataclasses.asdict(self.ppo_args),
            "AC_Args": dataclasses.asdict(self.ac_args),
            "RunnerArgs": dataclasses.asdict(self.args),
        })
        # dashboard spec (train.py:43-51 .charts.yml parity)
        with open(f"{self.logger.logdir}/.charts.yml", "w") as f:
            f.write(
                "charts:\n"
                "- yKey: train/episode/rew_total/mean\n"
                "  xKey: iterations\n"
                "- yKey: train/episode/rew_tracking_lin_vel/mean\n"
                "  xKey: iterations\n"
                "- yKey: train/episode/command_area/mean\n"
                "  xKey: iterations\n"
                "- type: video\n"
                "  glob: videos/*.gif\n")

    # ------------------------------------------------------------------
    def learn(self, num_learning_iterations: int,
              init_at_random_ep_len: bool = False, eval_freq: int = 100):
        logger = self.logger
        logger.start("start", "epoch")

        if init_at_random_ep_len:
            # (ppo/__init__.py:99-101)
            self.key, k = jax.random.split(self.key)
            ep = jax.random.randint(
                k, self.env_state.episode_length.shape, 0,
                self.env.derived.max_episode_length)
            self.env_state = self.env_state._replace(episode_length=ep)

        tot_iter = self.current_learning_iteration + num_learning_iterations
        for it in range(self.current_learning_iteration, tot_iter):
            self.key, k_it = jax.random.split(self.key)
            if self.ppo_args.entropy_warmup_iters > 0:
                # linear 0 -> entropy_coef ramp (traced scalar: one
                # compile, per-iteration value)
                frac = min(1.0, it / float(
                    self.ppo_args.entropy_warmup_iters))
                coef = jnp.float32(self.ppo_args.entropy_coef * frac)
                self.env_state, self.ppo_state, metrics = self._train_iter(
                    self.env_state, self.ppo_state, k_it,
                    entropy_coef=coef)
            else:
                self.env_state, self.ppo_state, metrics = self._train_iter(
                    self.env_state, self.ppo_state, k_it)

            if it % eval_freq == 0 and self.env.num_eval_envs > 0:
                self.env_state = self._reset_eval(self.env_state)
            if it % eval_freq == 0:
                self._dump_curriculum(it)

            self._log_iteration(it, metrics)

            # after _log_iteration so iteration `it`'s poses are buffered
            if (self.args.save_video_interval
                    and it % self.args.save_video_interval == 0):
                self._log_video(it)

            if it > 0 and it % self.args.save_interval == 0:
                self.save_checkpoint(it)
            self.current_learning_iteration = it + 1

        self.save_checkpoint(self.current_learning_iteration - 1, final=True)

    # ------------------------------------------------------------------
    def _log_iteration(self, it: int, metrics):
        logger = self.logger
        m = {k: np.asarray(v) for k, v in
             jax.device_get(metrics).items()}

        # env-0 pose log piggybacked on the training rollout -> host ring
        # buffer for offline video (no separate render rollout/compile)
        pose_keys = [k for k in m if k.startswith("_render/")]
        if pose_keys:
            self._pose_buffer.append(tuple(
                m.pop(f"_render/{n}") for n in ("pos", "quat", "q",
                                                "origin")))
            del self._pose_buffer[:-self._video_window]

        # per-bin sysid residual -> SlotCache (reference ppo.py:156-164 +
        # ppo/__init__.py:153-172, int32 bins)
        if "sysid_residual_sum" in m:
            self.caches.slot_cache.log_sums(
                "sysid_residual", m.pop("sysid_residual_sum"),
                m.pop("sysid_residual_count"))

        # episode metrics: masked means over reset envs
        # (Runner.learn store_metrics, ppo/__init__.py:145-151)
        n_rt = float(m.pop("train_reset_count", 0.0))
        n_re = float(m.pop("eval_reset_count", 0.0))
        store = {}
        for k in list(m.keys()):
            if k.startswith("train/episode/") and k.endswith("/sum"):
                if n_rt > 0:
                    store[k[: -len("/sum")]] = float(m.pop(k)) / n_rt
                else:
                    m.pop(k)
            elif k.startswith("eval/episode/") and k.endswith("/sum"):
                if n_re > 0:
                    store[k[: -len("/sum")]] = float(m.pop(k)) / n_re
                else:
                    m.pop(k)
        for k, v in m.items():
            if np.ndim(v) == 0:
                store[k] = float(v)
        logger.store_metrics(
            time_elapsed=logger.since("start"),
            time_iter=logger.split("epoch"),
            **store)

        self.tot_timesteps += (self.args.num_steps_per_env
                               * self.env.num_envs)
        if it % self.args.log_freq == 0:
            row = logger.log_metrics_summary(
                key_values={"timesteps": self.tot_timesteps,
                            "iterations": it})
            rew = row.get("train/episode/rew_total/mean", float("nan"))
            steps_s = (self.args.num_steps_per_env * self.env.num_envs
                       / max(row.get("time_iter/mean", 1e9), 1e-9))
            print(f"it {it:5d} | rew_total {rew:8.3f} | "
                  f"{steps_s:9.0f} env-steps/s | "
                  f"kl {row.get('kl/mean', float('nan')):.4f} | "
                  f"lr {row.get('lr/mean', float('nan')):.2e}")

    def _log_video(self, it: int):
        """Offline stick-figure video of env 0 over the last
        ~`_video_window` training rollouts (reference log_video,
        ppo/__init__.py:267-286 renders a separate deterministic rollout;
        here the poses ride the training rollout for free — a second
        rollout's jit signature cost a fresh multi-minute remote compile
        every video, EXPERIMENTS.md §15)."""
        if not self._pose_buffer:
            return
        try:
            from ..utils.render import render_trajectory
            pos, quat, q, origin = (
                np.concatenate([b[i] for b in self._pose_buffer])
                for i in range(4))
            out = render_trajectory(
                self.env.model, pos, quat, q, origin,
                f"{self.logger.logdir}/videos/{it:05d}.gif",
                stride=4, title=f"iter {it}",
                terrain=getattr(self.env, "terrain_grid", None))
            if out:
                print(f"video -> {out}")
        except Exception as e:  # noqa: BLE001 - video is best-effort
            print(f"[runner] video skipped: {e}")

    def _dump_curriculum(self, it: int):
        """curriculum/info.pkl dump (ppo/__init__.py:197-201): SlotCache/
        DistCache summaries plus the full per-bin curriculum logs (the
        reference's dump is truncated to bins 0-255 by its uint8 bin-index
        cast, ppo.py:161 — ours carries true int32 bins)."""
        if not hasattr(self.env_state, "curriculum"):
            return   # HLP env state has no command curriculum
        c = jax.device_get(self.env_state.curriculum)
        self.logger.save_pkl(
            {"iteration": it,
             **self.caches.slot_cache.get_summary(),
             **self.caches.dist_cache.get_summary(),
             "weights": np.asarray(c.weights),
             "episode_reward_lin": np.asarray(c.episode_reward_lin),
             "episode_reward_ang": np.asarray(c.episode_reward_ang),
             "episode_lin_vel_raw": np.asarray(c.episode_lin_vel_raw),
             "episode_ang_vel_raw": np.asarray(c.episode_ang_vel_raw),
             "episode_duration": np.asarray(c.episode_duration)},
            path="curriculum/info.pkl", append=True)

    # ------------------------------------------------------------------
    def save_checkpoint(self, it: int, final: bool = False):
        ckpt_dir = f"{self.logger.logdir}/checkpoints"
        payload = dict(
            ppo_state=self.ppo_state, env_state=self.env_state,
            key=self.key, iteration=self.current_learning_iteration,
            tot_timesteps=self.tot_timesteps)
        save_pytree(payload, f"{ckpt_dir}/train_state_{it:06d}.pkl")
        save_pytree(payload, f"{ckpt_dir}/train_state_last.pkl")
        # reference-parity weight files (ac_weights_*.pt analogues)
        save_pytree(self.ppo_state.params,
                    f"{ckpt_dir}/ac_weights_{it:06d}.pkl")
        save_pytree(self.ppo_state.params, f"{ckpt_dir}/ac_weights_last.pkl")
        export_student_policy(
            self.ac, self.ppo_state.params, self.env.num_obs,
            self.env.num_obs_history, f"{ckpt_dir}/student_policy_latest")

    def load_checkpoint(self, path: str):
        payload = load_pytree(path)
        self.ppo_state = PPOState(*payload["ppo_state"]) \
            if not isinstance(payload["ppo_state"], PPOState) \
            else payload["ppo_state"]
        self.env_state = payload["env_state"]
        self.key = payload["key"]
        self.current_learning_iteration = payload["iteration"]
        self.tot_timesteps = payload["tot_timesteps"]

    # ------------------------------------------------------------------
    def get_inference_policy(self):
        """Deployment policy fn (get_inference_policy,
        ppo/__init__.py:288-292): dict obs -> student actions."""
        params = self.ppo_state.params

        @jax.jit
        def policy(obs_dict):
            return self.ac.apply(params, obs_dict["obs"],
                                 obs_dict["obs_history"],
                                 method=ActorCritic.act_student)
        return policy

    def get_expert_policy(self):
        params = self.ppo_state.params

        @jax.jit
        def policy(obs_dict):
            return self.ac.apply(params, obs_dict["obs"],
                                 obs_dict["privileged_obs"],
                                 method=ActorCritic.act_teacher)
        return policy
