"""Rollout-phase profiler (round-5 task: attribute the ~690 ms rollout).

The bench shows the 4000-env iteration at ~751 ms = 690 rollout + 70
update; this script splits the rollout into its phases by timing ablated
variants that share the flagship signature where possible:

  full     : rollout + GAE exactly as bench.py / the Runner
  envstep  : 24-step scan of env.step alone (no policy, no storage/GAE)
  physics  : 24-step scan of ONLY the decimated PD+physics kernel
             (4 x _phys per control step, no obs/reward/reset epilogue)
  policy   : 24-step scan of the actor-critic act path on fixed obs

Derived attribution:
  physics kernel        = physics
  obs/reward/epilogue   = envstep - physics
  policy forward        = policy
  storage/GAE/rest      = full - envstep - policy

Usage (TPU):  python scripts/profile_rollout.py [--num-envs 4000]
              [--mode ablate|trace] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(num_envs, steps_per_env=24, plane=False):
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.learn.ppo import (PPOArgs, init_ppo_state,
                                                   make_train_functions)
    from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic

    cfg = config_mini_cheetah()
    cfg.env.num_envs = num_envs
    if plane:   # CPU smoke: trimesh compiles for minutes under LLVM
        cfg.terrain.mesh_type = "plane"
        cfg.terrain.teleport_robots = False
    env = LeggedRobotEnv(cfg)
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    ppo_state = init_ppo_state(k1, ac, PPOArgs(), env.num_obs,
                               env.num_privileged_obs, env.num_obs_history)
    env_state = env.initial_state(k2)
    rollout_gae, _ = make_train_functions(env, ac, PPOArgs(), steps_per_env)
    return env, ac, ppo_state, env_state, rollout_gae


def timeit(fn, args, n, label, log):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])  # compile
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    ms = (time.time() - t0) / n * 1e3
    log(f"[profile] {label:10s} {ms:8.1f} ms")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mode", default="ablate", choices=["ablate", "trace"])
    ap.add_argument("--trace-dir", default="/tmp/jax-trace")
    ap.add_argument("--plane", action="store_true",
                    help="plane terrain (CPU smoke; the flagship is trimesh)")
    args = ap.parse_args()
    log = lambda s: print(s, flush=True)  # noqa: E731

    env, ac, ppo_state, env_state, rollout_gae = build(
        args.num_envs, plane=args.plane)
    params = ppo_state.params
    key = jax.random.PRNGKey(1)
    T = 24

    if args.mode == "trace":
        from rapid_locomotion_rl_tpu.utils.debug import trace_iterations
        fn = jax.jit(rollout_gae)
        trace_iterations(fn, (env_state, params, key), 3,
                         logdir=args.trace_dir)
        return

    from rapid_locomotion_rl_tpu.models.networks import ActorCritic
    from rapid_locomotion_rl_tpu.ops.dynamics import PhysParams

    # ---- full rollout+GAE (the bench figure) ---------------------------
    full = timeit(jax.jit(rollout_gae), (env_state, params, key),
                  args.iters, "full", log)

    # ---- env.step only -------------------------------------------------
    zero_act = jnp.zeros((env.num_envs, env.num_actions))

    @jax.jit
    def envstep_scan(state):
        def body(s, _):
            s, res = env.step(s, zero_act)
            return s, res.rew
        return jax.lax.scan(body, state, None, length=T)

    envstep = timeit(envstep_scan, (env_state,), args.iters, "envstep", log)

    # ---- env.step with the command curriculum disabled ------------------
    # isolates the per-step Grid-Adaptive-Curriculum cost (scatter-adds +
    # stencil dilation over the 51x2x51 grid + categorical sampling over
    # 5202 logits x N envs — all dense every step because resampling is
    # staggered per env)
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    cfg_nc = config_mini_cheetah()
    cfg_nc.env.num_envs = args.num_envs
    if args.plane:
        cfg_nc.terrain.mesh_type = "plane"
        cfg_nc.terrain.teleport_robots = False
    cfg_nc.commands.command_curriculum = False
    env_nc = LeggedRobotEnv(cfg_nc)
    state_nc = env_nc.initial_state(jax.random.PRNGKey(2))

    @jax.jit
    def envstep_nc_scan(state):
        def body(s, _):
            s, res = env_nc.step(s, zero_act)
            return s, res.rew
        return jax.lax.scan(body, state, None, length=T)

    envstep_nc = timeit(envstep_nc_scan, (state_nc,), args.iters,
                        "env_nocurr", log)

    # ---- env.step on PLANE terrain (curriculum on) ----------------------
    # isolates the trimesh cost: heightfield gathers in the contact path
    # (ng x 4-corner bilinear per control step) + teleport checks. The
    # go1 plane config trains ~5x faster than the MC trimesh flagship at
    # matched env counts, so this is the prime suspect.
    cfg_pl = config_mini_cheetah()
    cfg_pl.env.num_envs = args.num_envs
    cfg_pl.terrain.mesh_type = "plane"
    cfg_pl.terrain.teleport_robots = False
    env_pl = LeggedRobotEnv(cfg_pl)
    state_pl = env_pl.initial_state(jax.random.PRNGKey(3))

    @jax.jit
    def envstep_pl_scan(state):
        def body(s, _):
            s, res = env_pl.step(s, zero_act)
            return s, res.rew
        return jax.lax.scan(body, state, None, length=T)

    envstep_pl = timeit(envstep_pl_scan, (state_pl,), args.iters,
                        "env_plane", log)

    # ---- bare physics kernel scan (PD + _phys x decimation, no epilogue)
    cfg = env.cfg
    decim = cfg.control.decimation
    imp = ((env.d_gains * env_state.dr.Kd_factors
            + env._dt_sub * env.p_gains * env_state.dr.Kp_factors)
           * env_state.dr.motor_strengths
           if getattr(cfg.sim, "implicit_pd", True)
           else jnp.zeros((env.num_envs, env.num_dof)))
    pp = PhysParams(
        friction=env_state.dr.friction, restitution=env_state.dr.restitution,
        payload=env_state.dr.payloads,
        com_displacement=env_state.dr.com_displacements)

    @jax.jit
    def physics_scan(sim):
        def control_step(carry, _):
            sim, torques = carry
            def decim_body(c, _):
                sim, torques = c
                torques, _t = env._compute_torques(
                    zero_act, sim, env_state.dr,
                    last_dof_vel=env_state.last_dof_vel)
                out = env._phys(sim, torques, pp, imp)
                return (out.state, torques), None
            (sim, torques), _ = jax.lax.scan(
                decim_body, (sim, torques), None, length=decim,
                unroll=decim if jax.default_backend() != "cpu" else 1)
            return (sim, torques), None
        (sim, _), _ = jax.lax.scan(control_step,
                                   (sim, env_state.torques), None, length=T)
        return sim

    physics = timeit(physics_scan, (env_state.sim,), args.iters,
                     "physics", log)

    # ---- policy forward ------------------------------------------------
    @jax.jit
    def policy_scan(obs, priv, k):
        def body(k, _):
            k, sk = jax.random.split(k)
            mean, std = ac.apply(params, obs, priv,
                                 method=ActorCritic.distribution)
            value = ac.apply(params, obs, priv,
                             method=ActorCritic.evaluate)
            a = mean + std * jax.random.normal(sk, mean.shape)
            return k, (a, value)
        return jax.lax.scan(body, k, None, length=T)

    policy = timeit(policy_scan,
                    (env_state.obs, env_state.privileged_obs, key),
                    args.iters, "policy", log)

    log("")
    log(f"[profile] === attribution at {args.num_envs} envs x {T} steps ===")
    log(f"[profile] physics kernel      {physics:8.1f} ms "
        f"({physics / full * 100:4.1f}%)")
    log(f"[profile] curriculum/resample {envstep - envstep_nc:8.1f} ms "
        f"({(envstep - envstep_nc) / full * 100:4.1f}%)")
    log(f"[profile] trimesh-vs-plane    {envstep - envstep_pl:8.1f} ms "
        f"({(envstep - envstep_pl) / full * 100:4.1f}%)")
    log(f"[profile] obs/reward epilogue {envstep_nc - physics:8.1f} ms "
        f"({(envstep_nc - physics) / full * 100:4.1f}%)")
    log(f"[profile] policy forward     {policy:8.1f} ms "
        f"({policy / full * 100:4.1f}%)")
    rest = full - envstep - policy
    log(f"[profile] storage/GAE/rest    {rest:8.1f} ms "
        f"({rest / full * 100:4.1f}%)")
    log(f"[profile] full rollout+GAE    {full:8.1f} ms")


if __name__ == "__main__":
    main()
