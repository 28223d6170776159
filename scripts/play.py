"""Checkpoint evaluation / rollout (reference scripts/play.py:16-156):
load the latest run, build a 1-env deterministic env, roll the student
policy at a fixed forward command and dump velocity-tracking plots."""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def latest_run(root="runs/rapid-locomotion"):
    ckpts = sorted(glob.glob(f"{root}/**/checkpoints/train_state_last.pkl",
                             recursive=True), key=os.path.getmtime)
    assert ckpts, f"no runs under {root}"
    return os.path.dirname(os.path.dirname(ckpts[-1]))


def load_env(logdir, num_envs=1):
    """Rebuild the env from the logged config with DR off
    (reference play.py:16-92)."""
    import json

    from rapid_locomotion_rl_tpu.config import Cfg
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic
    from rapid_locomotion_rl_tpu.utils.checkpoint import load_pytree

    with open(os.path.join(logdir, "parameters.json")) as f:
        params_blob = json.load(f)
    cfg = Cfg.from_dict(params_blob["Cfg"])

    # deployment overrides (play.py:49-67)
    cfg.env.num_envs = num_envs
    cfg.terrain.num_rows = 3
    cfg.terrain.num_cols = 3
    cfg.terrain.border_size = 5.0
    cfg.terrain.curriculum = False
    cfg.noise.add_noise = False
    cfg.domain_rand.randomize_friction = False
    cfg.domain_rand.randomize_base_mass = False
    cfg.domain_rand.randomize_com_displacement = False
    cfg.domain_rand.randomize_motor_strength = False
    cfg.domain_rand.randomize_restitution = False
    cfg.domain_rand.push_robots = False
    cfg.init_state.dof_init_range = [1.0, 1.0]
    cfg.init_state.randomize_root_vel = False
    cfg.env.episode_length_s = 100.0
    cfg.commands.command_curriculum = False

    env = LeggedRobotEnv(cfg)
    payload = load_pytree(
        os.path.join(logdir, "checkpoints/train_state_last.pkl"))
    params = payload["ppo_state"].params
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    return env, ac, params


def play(logdir=None, steps=1000, cmd=(1.0, 0.0, 0.0), plot=True,
         gif=None):
    from rapid_locomotion_rl_tpu.models.networks import ActorCritic

    logdir = logdir or latest_run()
    print(f"loading {logdir}")
    env, ac, params = load_env(logdir)
    state = env.initial_state(jax.random.PRNGKey(0))

    @jax.jit
    def step(state):
        state = state._replace(commands=state.commands.at[:, :3].set(
            jnp.asarray(cmd)))
        actions = ac.apply(params, state.obs, state.obs_history,
                           method=ActorCritic.act_student)
        state, res = env.step(state, actions)
        return state, res

    vxs, qs, zs, poses = [], [], [], []
    for _ in range(steps):
        state, res = step(state)
        from rapid_locomotion_rl_tpu.ops import quat as Q
        v_body = Q.quat_rotate_inverse(state.sim.base_quat,
                                       state.sim.base_lin_vel)
        vxs.append(float(v_body[0, 0]))
        qs.append(np.asarray(state.sim.q[0]))
        zs.append(float(state.sim.base_pos[0, 2]))
        if gif:
            poses.append((np.asarray(state.sim.base_pos[0]),
                          np.asarray(state.sim.base_quat[0]),
                          qs[-1], np.asarray(state.env_origins[0])))

    if gif:
        from rapid_locomotion_rl_tpu.utils.render import render_trajectory
        pos, quat, qq, origin = (np.stack([p[i] for p in poses])
                                 for i in range(4))
        out = render_trajectory(
            env.model, pos, quat, qq, origin, gif, stride=2,
            title=f"deterministic eval, cmd vx={cmd[0]:+.1f}",
            terrain=getattr(env, "terrain_grid", None))
        if out:
            print(f"video -> {out}")

    print(f"mean vx over last 500 steps: {np.mean(vxs[-500:]):.3f} m/s "
          f"(command {cmd[0]})")
    if plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, axes = plt.subplots(3, 1, figsize=(8, 9))
            axes[0].plot(vxs); axes[0].axhline(cmd[0], ls="--", c="r")
            axes[0].set_ylabel("base vx [m/s]")
            axes[1].plot(np.asarray(qs)); axes[1].set_ylabel("joint pos [rad]")
            axes[2].plot(zs); axes[2].set_ylabel("base z [m]")
            out = os.path.join(logdir, "play.png")
            fig.savefig(out, dpi=110)
            print(f"plots -> {out}")
        except Exception as e:  # noqa: BLE001
            print(f"plotting skipped: {e}")
    return np.mean(vxs[-500:])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--vx", type=float, default=1.0)
    ap.add_argument("--gif", default=None,
                    help="render a camera-style GIF of the rollout here")
    a = ap.parse_args()
    play(a.logdir, a.steps, (a.vx, 0.0, 0.0), gif=a.gif)
