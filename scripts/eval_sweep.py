"""Domain-randomization evaluation sweep: run a trained policy under each
named DR preset and report the eval metric registry
(reference eval_metrics usage: DR_SETTINGS x METRICS_FNS,
mini_gym_learn/eval_metrics/{metrics,domain_randomization}.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def evaluate(logdir, preset_name, preset_fn, num_envs, steps):
    from rapid_locomotion_rl_tpu.config import Cfg
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.learn.metrics import METRICS_FNS
    from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic
    from rapid_locomotion_rl_tpu.utils.checkpoint import load_pytree

    with open(os.path.join(logdir, "parameters.json")) as f:
        cfg = Cfg.from_dict(json.load(f)["Cfg"])
    cfg = preset_fn(cfg)
    cfg.env.num_envs = num_envs
    cfg.noise.add_noise = False
    cfg.terrain.num_rows = 3
    cfg.terrain.num_cols = 3
    cfg.terrain.border_size = 5.0

    env = LeggedRobotEnv(cfg)
    payload = load_pytree(
        os.path.join(logdir, "checkpoints/train_state_last.pkl"))
    params = payload["ppo_state"].params
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())

    state = env.initial_state(jax.random.PRNGKey(0))

    @jax.jit
    def step(state):
        actions = ac.apply(params, state.obs, state.obs_history,
                           method=ActorCritic.act_student)
        return env.step(state, actions)

    dones = 0.0
    for _ in range(steps):
        state, res = step(state)
        dones += float(jnp.sum(res.done))

    out = {"done_rate": dones / (steps * num_envs)}
    for name, fn in METRICS_FNS.items():
        v = fn(env, state, ac, params)
        if isinstance(v, dict):
            # auxiliary_rewards: one scalar per active reward term
            for k, t in v.items():
                out[f"{name}/{k}"] = float(jnp.mean(t))
        elif getattr(v, "ndim", 0) > 0:
            # privileged_obs / latents: per-dimension mean over envs
            out[name] = np.asarray(jnp.mean(v, axis=0)).tolist()
        else:
            out[name] = float(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--num-envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--presets", nargs="*", default=None)
    args = ap.parse_args()

    from rapid_locomotion_rl_tpu.learn.dr_eval import DR_SETTINGS
    from play import latest_run
    logdir = args.logdir or latest_run()
    print(f"evaluating {logdir}")
    names = args.presets or list(DR_SETTINGS)
    results = {}
    for name in names:
        results[name] = evaluate(logdir, name, DR_SETTINGS[name],
                                 args.num_envs, args.steps)
        row = results[name]
        print(f"{name:16s} done%={row['done_rate']*100:5.2f} "
              f"vel_rmsd={row['lin_vel_rmsd']:.3f} "
              f"CoT={row['cost_of_transport']:.2f} "
              f"height={row['base_height']:.3f}")
    out = os.path.join(logdir, "eval_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"-> {out}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
