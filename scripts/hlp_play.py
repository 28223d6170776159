"""Play a trained high-level policy (HLP): roll the goal-navigation
policy over the frozen low-level stack, report goal-reach statistics, and
render a navigation GIF with the goal marked (reference
scripts/high_level_play.py play path, :368-393).

Usage:
  python scripts/hlp_play.py --hlp-run runs/r5_hlp_visible \
      [--ll-run runs/r4_flagship_4000] [--num-envs 16] [--steps 500] \
      [--gif runs/r5_hlp_visible/videos/nav.gif]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlp-run", required=True)
    ap.add_argument("--ll-run", default="runs/r4_flagship_4000")
    ap.add_argument("--num-envs", type=int, default=16)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--gif", default=None)
    ap.add_argument("--dead-zone", type=float, default=0.2)
    ap.add_argument("--goal-radius", type=float, default=0.1)
    ap.add_argument("--stochastic", action="store_true",
                    help="sample the training distribution instead of "
                         "the deterministic mean")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rapid_locomotion_rl_tpu.config import Cfg
    from rapid_locomotion_rl_tpu.envs.hlp import HighLevelControlEnv
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic
    from rapid_locomotion_rl_tpu.utils.checkpoint import load_pytree

    with open(os.path.join(args.ll_run, "parameters.json")) as f:
        cfg = Cfg.from_dict(json.load(f)["Cfg"])
    cfg.env.num_envs = args.num_envs
    cfg.env.auto_reset = False
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    cfg.commands.command_curriculum = False
    ll_env = LeggedRobotEnv(cfg)
    ll_params = load_pytree(os.path.join(
        args.ll_run, "checkpoints/train_state_last.pkl"))["ppo_state"].params
    env = HighLevelControlEnv(ll_env, ll_params, dead_zone=args.dead_zone,
                              goal_radius=args.goal_radius)

    with open(os.path.join(args.hlp_run, "parameters.json")) as f:
        hlp_blob = json.load(f)
    ac_args = ACArgs(**hlp_blob["AC_Args"])
    hlp_ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                         env.num_obs_history, env.num_actions, ac_args)
    hlp_params = load_pytree(os.path.join(
        args.hlp_run, "checkpoints/train_state_last.pkl"))[
        "ppo_state"].params

    state = env.initial_state(jax.random.PRNGKey(0))

    @jax.jit
    def step(state, key):
        # deterministic policy mean (act_teacher == actor_body(obs) when
        # use_latent=False, the HLP configuration), or a sample from the
        # training distribution with --stochastic (the stochastic policy
        # is what reaches goals during training; the deterministic mean
        # can still sit at the approach stall, EXPERIMENTS.md §28)
        if args.stochastic:
            mean, std = hlp_ac.apply(hlp_params, state.obs,
                                     state.privileged_obs,
                                     method=ActorCritic.distribution)
            act = mean + std * jax.random.normal(key, mean.shape)
        else:
            act = hlp_ac.apply(hlp_params, state.obs, state.privileged_obs,
                               method=ActorCritic.act_teacher)
        state, res = env.step(state, act)
        dist = jnp.linalg.norm(
            env._base_pos(state.ll)[:, :2] - state.goal_position, axis=-1)
        return state, res, act, dist

    N = args.num_envs
    goals = 0
    timeouts = 0
    episodes = 0
    poses = []          # all-env trajectories for the GIF
    dists = []
    key = jax.random.PRNGKey(2)
    for t in range(args.steps):
        key, sub = jax.random.split(key)
        state, res, act, dist = step(state, sub)
        done = np.asarray(res.done)
        to = np.asarray(res.info["time_outs"])
        goals += int(res.info["goal_reached_count"])
        timeouts += int(to.sum())
        episodes += int(done.sum())
        dists.append(np.asarray(dist))
        if args.gif:
            ll = state.ll
            poses.append((np.asarray(ll.sim.base_pos),
                          np.asarray(ll.sim.base_quat),
                          np.asarray(ll.sim.q),
                          np.asarray(ll.env_origins)))
    falls = max(0, episodes - goals - timeouts)
    dists = np.stack(dists)                       # [T, N]
    best_env = int(np.argmin(dists.min(axis=0)))  # closest approach
    print(f"[hlp_play] per-env closest approach: "
          f"{np.round(dists.min(axis=0), 2)} (render env {best_env})")

    print(f"[hlp_play] {args.steps} steps x {N} envs: "
          f"episodes={episodes} goals={goals} timeouts={timeouts} "
          f"falls={falls}")
    if episodes:
        print(f"[hlp_play] goal rate {goals / episodes * 100:.1f}% of "
              f"episodes")

    if args.gif and poses:
        from rapid_locomotion_rl_tpu.utils.render import render_trajectory
        pos, quat, qq, origin = (np.stack([p[i][best_env] for p in poses])
                                 for i in range(4))
        init = np.asarray(cfg.init_state.pos)
        goal_w = origin[0] + init + np.array(
            [float(env.goal[0]), float(env.goal[1]), 0.0])
        goal_w[2] = origin[0][2]
        out = render_trajectory(
            ll_env.model, pos, quat, qq, origin, args.gif, stride=3,
            title="HLP goal navigation (goal = star)",
            terrain=getattr(ll_env, "terrain_grid", None),
            marker=goal_w, view_half=2.4)
        if out:
            print(f"[hlp_play] video -> {out}")


if __name__ == "__main__":
    main()
