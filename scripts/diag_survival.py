"""Early-episode survival forensics (VERDICT round-2 item: our random-policy
episodes die in ~30-60 steps while the reference's early metrics imply
hundreds — that gap forces the entropy_coef=0.0 deviation).

Measures, under the flagship training config with an untrained-policy action
distribution (zero-mean Gaussian, std=1.0 — what PPO produces at iteration 0):
  - episode-length distribution at termination,
  - termination cause breakdown: timeout / contact (per report body) /
    terminal body height,
  - the same for zero actions (a sanity floor: standing must survive).

Run CPU-only:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/diag_survival.py
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv


def build_env(num_envs: int, flat: bool, no_dr: bool):
    c = config_mini_cheetah()
    c.env.num_envs = num_envs
    if flat:
        c.terrain.mesh_type = "plane"
        c.terrain.teleport_robots = False
    if no_dr:
        c.noise.add_noise = False
        c.domain_rand.push_robots = False
        for f in ("randomize_friction", "randomize_base_mass",
                  "randomize_com_displacement", "randomize_motor_strength",
                  "randomize_Kp_factor", "randomize_Kd_factor",
                  "randomize_restitution"):
            setattr(c.domain_rand, f, False)
    return LeggedRobotEnv(c), c


def run(env, steps: int, action_std: float, seed: int = 0):
    state = env.initial_state(jax.random.PRNGKey(seed))
    term_idx = list(env.termination_contact_indices)

    def body(carry, _):
        state, key = carry
        key, k_act = jax.random.split(key)
        a = action_std * jax.random.normal(
            k_act, (env.num_envs, env.num_actions))
        ep_len_before = state.episode_length
        state, res = env.step(state, a)
        term_f = jnp.linalg.norm(
            state.contact_report[:, term_idx, :], axis=-1)  # [N, nterm]
        out = dict(
            done=res.done,
            timeout=state.time_out_buf,
            ep_len=ep_len_before + 1,
            term_body=term_f > 1.0,
            base_z=state.sim.base_pos[:, 2],
            height_term=(jnp.mean(
                state.sim.base_pos[:, 2:3] - state.measured_heights, axis=-1)
                < env.cfg.rewards.terminal_body_height)
            if env.cfg.rewards.use_terminal_body_height else
            jnp.zeros_like(res.done),
        )
        return (state, key), out

    (state, _), outs = jax.lax.scan(
        body, (state, jax.random.PRNGKey(seed + 1)), None, length=steps)
    return jax.tree.map(np.asarray, outs)


def summarize(env, outs, label):
    done = outs["done"]
    timeout = outs["timeout"]
    ep_len = outs["ep_len"]
    term_body = outs["term_body"]
    height_term = outs["height_term"]

    deaths = done & ~timeout
    lens = ep_len[done]
    if lens.size == 0:
        print(f"[{label}] no episode ended in {done.shape[0]} steps "
              f"(all surviving)")
        return
    print(f"\n[{label}] {int(done.sum())} episode ends over "
          f"{done.shape[0]} steps x {done.shape[1]} envs")
    print(f"  ep_len at end:   median {np.median(lens):6.0f}  "
          f"mean {lens.mean():6.1f}  p10 {np.percentile(lens, 10):5.0f}  "
          f"p90 {np.percentile(lens, 90):6.0f}")
    print(f"  cause: timeout {int((done & timeout).sum())}, "
          f"contact-term {int(deaths.sum())}, "
          f"height-term {int((deaths & height_term).sum())} (subset)")
    names = [env.model.report_body_names[i]
             for i in env.termination_contact_indices]
    counts = collections.Counter()
    tb = term_body[deaths]           # [n_deaths, nterm]
    for j, n in enumerate(names):
        counts[n] = int(tb[:, j].sum())
    top = counts.most_common(12)
    print("  termination bodies (contact > 1N at death):")
    for n, c in top:
        if c:
            print(f"    {n:18s} {c}")
    dlens = ep_len[deaths]
    if dlens.size:
        print(f"  death ep_len:    median {np.median(dlens):6.0f}  "
              f"mean {dlens.mean():6.1f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--no-dr", action="store_true")
    args = ap.parse_args()

    env, cfg = build_env(args.envs, args.flat, args.no_dr)
    print(f"config: mesh={cfg.terrain.mesh_type} dr={not args.no_dr} "
          f"envs={args.envs} steps={args.steps} "
          f"dof_init_range={cfg.init_state.dof_init_range} "
          f"randomize_root_vel={cfg.init_state.randomize_root_vel}")

    outs = run(env, args.steps, action_std=0.0, seed=0)
    summarize(env, outs, "zero actions")

    outs = run(env, args.steps, action_std=1.0, seed=7)
    summarize(env, outs, "random policy std=1.0")


if __name__ == "__main__":
    main()
