"""Deterministic rollout probe for a trained HLP: per-step distance to
goal, command magnitudes, achieved velocity and yaw drift — the numbers
that decide WHY goal reaches are(n't) happening (round-5 HLP arms)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlp-run", required=True)
    ap.add_argument("--ll-run", default="runs/r4_flagship_4000")
    ap.add_argument("--num-envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--dead-zone", type=float, default=0.2)
    ap.add_argument("--stochastic", action="store_true",
                    help="sample the policy (training behavior) instead "
                         "of the deterministic mean")
    args = ap.parse_args()

    import json

    from rapid_locomotion_rl_tpu.config import Cfg
    from rapid_locomotion_rl_tpu.envs.hlp import HighLevelControlEnv
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic
    from rapid_locomotion_rl_tpu.utils.checkpoint import load_pytree

    with open(os.path.join(args.ll_run, "parameters.json")) as f:
        blob = json.load(f)
    cfg = Cfg.from_dict(blob["Cfg"])
    cfg.env.num_envs = args.num_envs
    cfg.env.auto_reset = False
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    cfg.commands.command_curriculum = False
    ll_env = LeggedRobotEnv(cfg)
    ll_params = load_pytree(
        os.path.join(args.ll_run,
                     "checkpoints/train_state_last.pkl"))["ppo_state"].params

    env = HighLevelControlEnv(ll_env, ll_params, zero_reward_on_reset=False,
                              dead_zone=args.dead_zone)
    hlp_payload = load_pytree(
        os.path.join(args.hlp_run, "checkpoints/train_state_last.pkl"))
    hlp_params = hlp_payload["ppo_state"].params
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions,
                     ACArgs(activation="tanh", use_latent=False))

    state = env.initial_state(jax.random.PRNGKey(0))

    def step_fn(carry, k):
        st = carry
        priv = jnp.zeros((st.obs.shape[0], env.num_privileged_obs))
        if args.stochastic:
            mean, std = ac.apply(hlp_params, st.obs, priv,
                                 method=ActorCritic.distribution)
            a = mean + std * jax.random.normal(k, mean.shape)
        else:
            a = ac.apply(hlp_params, st.obs, priv,
                         method=ActorCritic.act_teacher)
        st2, res = env.step(st, a)
        ll = st2.ll
        from rapid_locomotion_rl_tpu.ops import quat as Q
        dist = jnp.linalg.norm(
            env._base_pos(ll)[:, :2] - st2.goal_position, axis=-1)
        # yaw from quaternion (z-rotation component)
        q = ll.sim.base_quat
        yaw = jnp.arctan2(2 * (q[:, 3] * q[:, 2] + q[:, 0] * q[:, 1]),
                          1 - 2 * (q[:, 1] ** 2 + q[:, 2] ** 2))
        vx_body = Q.quat_rotate_inverse(q, ll.sim.base_lin_vel)[:, 0]
        out = (dist, jnp.linalg.norm(a[:, :2], axis=-1), a[:, 2],
               vx_body, yaw, res.done.astype(jnp.float32))
        return st2, out

    keys = jax.random.split(jax.random.PRNGKey(1), args.steps)
    _, (dist, cmd, yawcmd, vx, yaw, done) = jax.lax.scan(
        step_fn, state, keys)
    dist, cmd, yawcmd, vx, yaw, done = map(np.asarray,
                                           (dist, cmd, yawcmd, vx, yaw, done))
    print(f"probe {args.hlp_run}: {args.num_envs} envs x {args.steps} steps "
          f"({'stochastic' if args.stochastic else 'deterministic'})")
    for t in range(0, args.steps, args.steps // 10):
        print(f"t={t:4d} dist {dist[t].mean():5.2f}+-{dist[t].std():4.2f} "
              f"min {dist[t].min():4.2f} | |cmd| {cmd[t].mean():4.2f} "
              f"| yawcmd {yawcmd[t].mean():+5.2f} | vx {vx[t].mean():4.2f} "
              f"| yaw {np.abs(yaw[t]).mean():4.2f}")
    reached = (dist < 0.1).any(axis=0)
    print(f"envs that ever got within 0.1 m: {reached.sum()}/{args.num_envs}")
    print(f"min distance ever per env: mean {dist.min(axis=0).mean():.3f}, "
          f"median {np.median(dist.min(axis=0)):.3f}, "
          f"best {dist.min():.3f}")
    print(f"dones total {done.sum():.0f}")


if __name__ == "__main__":
    main()
