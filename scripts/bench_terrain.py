"""Terrain-sampling strategy micro-bench (round 5).

The rollout profile found terrain sampling at ~97% of the trimesh
flagship rollout (plane 31.5 ms vs trimesh 1135 ms per 24-step scan at
4000 envs). This times the env.step scan under each sampling strategy:

  mm      : per-env patch + gather-free einsum bilinear (the fix)
  take    : per-env patch + take_along_axis corner gathers
  direct  : per-geom random gathers into the full height grid
  plane   : no terrain (the floor the strategies race toward)

Usage (TPU): python scripts/bench_terrain.py [--num-envs 4000] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_envstep(cfg, iters, log, label):
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    env = LeggedRobotEnv(cfg)
    state = env.initial_state(jax.random.PRNGKey(0))
    zero = jnp.zeros((cfg.env.num_envs, env.num_actions))

    @jax.jit
    def scan(state):
        def body(s, _):
            s, res = env.step(s, zero)
            return s, res.rew
        return jax.lax.scan(body, state, None, length=24)

    out = scan(state)
    jax.block_until_ready(out[1])
    t0 = time.time()
    for _ in range(iters):
        out = scan(state)
    jax.block_until_ready(out[1])
    ms = (time.time() - t0) / iters * 1e3
    log(f"[terrain-bench] {label:8s} {ms:8.1f} ms  "
        f"({cfg.env.num_envs * 24 / (ms / 1e3):,.0f} env-steps/s envstep)")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--arms", default="mm,take,direct,plane")
    args = ap.parse_args()
    log = lambda s: print(s, flush=True)  # noqa: E731

    from rapid_locomotion_rl_tpu.config import config_mini_cheetah

    results = {}
    for arm in args.arms.split(","):
        cfg = config_mini_cheetah()
        cfg.env.num_envs = args.num_envs
        if arm == "plane":
            cfg.terrain.mesh_type = "plane"
            cfg.terrain.teleport_robots = False
        elif arm == "mm":
            cfg.sim.terrain_patch_size = 16
            cfg.sim.terrain_lookup = "mm"
        elif arm == "take":
            cfg.sim.terrain_patch_size = 16
            cfg.sim.terrain_lookup = "take"
        elif arm == "direct":
            cfg.sim.terrain_patch_size = 0
        results[arm] = time_envstep(cfg, args.iters, log, arm)
    if "plane" in results:
        for arm, ms in results.items():
            if arm != "plane":
                log(f"[terrain-bench] {arm}: terrain cost "
                    f"{ms - results['plane']:.1f} ms over plane")


if __name__ == "__main__":
    main()
