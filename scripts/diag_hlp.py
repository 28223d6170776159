"""HLP ground-truth diagnostic (round 5): can the frozen low-level policy
survive and reach the goal under SCRIPTED high-level commands?

r4_hlp2 telemetry showed rew_terminal_ll_reset ~ -2.0 (i.e. nearly every
HLP episode ends with the low-level robot falling, mean episode ~1 s), so
before training another HLP arm we establish what command profiles the
frozen policy tolerates:

  zero     : stand still (commands zeroed by the <0.2 norm gate)
  straight : vx=1.0 toward the goal (goal is at (3,0) -> dead ahead)
  pcontrol : P-controller: vx ~ clip(1.5*dist,0,2), yaw ~ heading error

Run CPU-only:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/diag_hlp.py \
      --ll-run runs/r4_flagship_4000 --num-envs 16 --steps 500
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ll-run", default="runs/r4_flagship_4000")
    ap.add_argument("--num-envs", type=int, default=16)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--arms", default="zero,straight,pcontrol")
    ap.add_argument("--vx", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rapid_locomotion_rl_tpu.config import Cfg
    from rapid_locomotion_rl_tpu.envs.hlp import HighLevelControlEnv
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
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
    payload = load_pytree(
        os.path.join(args.ll_run, "checkpoints/train_state_last.pkl"))
    ll_params = payload["ppo_state"].params
    env = HighLevelControlEnv(ll_env, ll_params)

    def controller(name, obs):
        # obs = base_pos(3) + lin_vel(3) + ang_vel(3) + actions(3) + goal(2)
        pos = obs[:, 0:2]
        goal = obs[:, 12:14]
        delta = goal - pos
        dist = jnp.linalg.norm(delta, axis=-1)
        if name == "zero":
            return jnp.zeros((obs.shape[0], 3))
        if name == "straight":
            return jnp.stack([jnp.full_like(dist, args.vx),
                              jnp.zeros_like(dist),
                              jnp.zeros_like(dist)], axis=-1)
        # pcontrol: command forward speed toward the goal; steer with yaw.
        heading = jnp.arctan2(delta[:, 1], delta[:, 0])
        vx = jnp.clip(1.5 * dist, 0.0, 2.0)
        return jnp.stack([vx, jnp.zeros_like(dist),
                          jnp.clip(2.0 * heading, -1.0, 1.0)], axis=-1)

    step = jax.jit(env.step)

    for arm in args.arms.split(","):
        state = env.initial_state(jax.random.PRNGKey(0))
        N = args.num_envs
        falls = np.zeros(N, int)       # ll_done count per env
        goals = np.zeros(N, int)
        timeouts = np.zeros(N, int)
        first_fall = np.full(N, -1, int)
        max_x = np.zeros(N)
        ep_len_hist = []
        cur_len = np.zeros(N, int)
        for t in range(args.steps):
            act = controller(arm, state.obs)
            state, res = step(state, act)
            done = np.asarray(res.done)
            gs = np.asarray(res.info["goal_reached_count"])
            # per-env terminal attribution comes from the info buffers:
            to = np.asarray(res.info["time_outs"])
            ll_done = done & ~to
            # goal flag: recompute from obs (pre-reset base pos is gone;
            # use counters only for the aggregate)
            falls += ll_done.astype(int)
            timeouts += to.astype(int)
            cur_len += 1
            for i in np.where(done)[0]:
                ep_len_hist.append(cur_len[i])
                cur_len[i] = 0
            newly = np.where(ll_done & (first_fall < 0))[0]
            first_fall[newly] = t
            max_x = np.maximum(max_x, np.asarray(state.obs[:, 0]))
            goals_total = int(gs)
            goals[0] += goals_total  # aggregate only
        ep_len = np.array(ep_len_hist) if ep_len_hist else np.array([args.steps])
        print(f"[{arm}] steps={args.steps} envs={N}")
        print(f"  ll falls total      : {falls.sum()}")
        print(f"  goals reached total : {goals[0]}")
        print(f"  timeouts total      : {timeouts.sum()}")
        print(f"  first-fall step     : med {np.median(first_fall[first_fall>=0]) if (first_fall>=0).any() else 'none'}")
        print(f"  episode len (steps) : med {np.median(ep_len):.0f} "
              f"p90 {np.percentile(ep_len, 90):.0f}")
        print(f"  max forward x       : med {np.median(max_x):.2f} "
              f"max {max_x.max():.2f}  (goal at 3.0)")


if __name__ == "__main__":
    main()
