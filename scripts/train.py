"""Main training entry (reference scripts/train.py:1-54).

Usage:
    python scripts/train.py [--robot mini_cheetah|go1] [--num-envs 4000]
                            [--iterations 4000] [--logdir runs/...]
"""

import argparse
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="mini_cheetah",
                    choices=["mini_cheetah", "go1"])
    ap.add_argument("--num-envs", type=int, default=None)
    ap.add_argument("--iterations", type=int, default=4000)
    ap.add_argument("--eval-freq", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--resume", default=None,
                    help="path to a train_state checkpoint to resume from")
    ap.add_argument("--entropy-coef", type=float, default=None,
                    help="override PPOArgs.entropy_coef")
    ap.add_argument("--entropy-warmup", type=int, default=None,
                    help="linear entropy-coef ramp 0 -> entropy_coef over "
                         "this many iterations (survive the early only-"
                         "positive-clipped regime with 0, then get the "
                         "reference's sigma maintenance — EXPERIMENTS.md "
                         "§24-25)")
    ap.add_argument("--min-std", type=float, default=None,
                    help="exploration floor on the learned action std "
                         "(0 = off; ~0.2 caps the sigma^2 adaptive-LR "
                         "ratchet under entropy 0 — EXPERIMENTS.md §13)")
    ap.add_argument("--only-positive-rewards", type=int, default=None,
                    choices=[0, 1], help="override cfg.rewards.only_positive_rewards")
    ap.add_argument("--substeps", type=int, default=None,
                    help="override cfg.sim.num_substeps")
    ap.add_argument("--implicit-pd", type=int, default=None, choices=[0, 1],
                    help="override cfg.sim.implicit_pd")
    ap.add_argument("--torsional-patch-radius", type=float, default=None,
                    help="override cfg.sim.torsional_patch_radius")
    ap.add_argument("--mesh-sphere-fit", default=None,
                    choices=["legacy", "hull"],
                    help="override cfg.asset.mesh_sphere_fit (hull = calf "
                         "sphere chain fitted to the collision-mesh hull, "
                         "EXPERIMENTS.md §14)")
    ap.add_argument("--randomized-spawn", action="store_true",
                    help="legged_gym-style reset randomization (dof "
                         "0.5-1.5x default, root vel ±0.5) — the round-2 "
                         "default, kept for A/B")
    ap.add_argument("--physics-impl", default=None,
                    choices=["auto", "soa", "aos"],
                    help="override cfg.sim.physics_impl")
    ap.add_argument("--deterministic-spawn", action="store_true",
                    help="reset exactly at the default pose with zero root "
                         "velocity (the reference fork's literal "
                         "_reset_dofs/_reset_root_states semantics)")
    ap.add_argument("--num-eval-envs", type=int, default=None)
    ap.add_argument("--terrain", default=None,
                    choices=["plane", "heightfield", "trimesh"],
                    help="override cfg.terrain.mesh_type")
    ap.add_argument("--mesh", default="auto", choices=["auto", "data", "none"],
                    help="multi-chip data mesh over the env axis: 'auto' "
                         "shards when jax.device_count() > 1")
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() first "
                         "(multi-process / multi-host; reads "
                         "JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, "
                         "JAX_PROCESS_ID env vars)")
    args = ap.parse_args()

    if args.distributed or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None)

    from rapid_locomotion_rl_tpu.config import (config_go1,
                                                config_mini_cheetah)
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.learn.ppo import PPOArgs
    from rapid_locomotion_rl_tpu.learn.runner import Runner, RunnerArgs

    cfg = (config_mini_cheetah() if args.robot == "mini_cheetah"
           else config_go1())
    cfg.seed = args.seed
    if args.num_envs is not None:
        cfg.env.num_envs = args.num_envs
    if args.num_eval_envs is not None:
        cfg.env.num_eval_envs = args.num_eval_envs
    if args.terrain is not None:
        cfg.terrain.mesh_type = args.terrain
        if args.terrain == "plane":
            cfg.terrain.teleport_robots = False
    if args.only_positive_rewards is not None:
        cfg.rewards.only_positive_rewards = bool(args.only_positive_rewards)
    if args.deterministic_spawn:
        cfg.init_state.dof_init_range = [1.0, 1.0]
        cfg.init_state.randomize_root_vel = False
    if args.randomized_spawn:
        cfg.init_state.dof_init_range = [0.5, 1.5]
        cfg.init_state.randomize_root_vel = True
    if args.physics_impl is not None:
        cfg.sim.physics_impl = args.physics_impl
    if args.substeps is not None:
        cfg.sim.num_substeps = args.substeps
    if args.implicit_pd is not None:
        cfg.sim.implicit_pd = bool(args.implicit_pd)
    if args.torsional_patch_radius is not None:
        cfg.sim.torsional_patch_radius = args.torsional_patch_radius
    if args.mesh_sphere_fit is not None:
        cfg.asset.mesh_sphere_fit = args.mesh_sphere_fit
    ppo_args = PPOArgs()
    if args.entropy_coef is not None:
        ppo_args.entropy_coef = args.entropy_coef
    if args.entropy_warmup is not None:
        ppo_args.entropy_warmup_iters = args.entropy_warmup
    ac_args = None
    if args.min_std is not None:
        from rapid_locomotion_rl_tpu.models.networks import ACArgs
        ac_args = ACArgs(min_std=args.min_std)

    if args.logdir is None:
        stamp = datetime.now().strftime("%Y-%m-%d/%H%M%S.%f")
        args.logdir = f"runs/rapid-locomotion/{stamp}"

    env = LeggedRobotEnv(cfg)
    runner = Runner(env, logdir=args.logdir, seed=args.seed,
                    ac_args=ac_args, ppo_args=ppo_args,
                    runner_args=RunnerArgs(max_iterations=args.iterations,
                                           save_video_interval=400))
    if args.resume:
        runner.load_checkpoint(args.resume)

    import jax
    if args.mesh == "data" or (args.mesh == "auto"
                               and jax.device_count() > 1):
        from rapid_locomotion_rl_tpu.parallel.sharding import (
            make_sharded_runner_placement)
        mesh = make_sharded_runner_placement(runner)
        print(f"sharding env axis over {mesh.devices.size} devices "
              f"({jax.process_count()} process(es))")
    print(f"training {args.robot} x{cfg.env.num_envs} envs "
          f"-> {args.logdir}")
    runner.learn(args.iterations, init_at_random_ep_len=True,
                 eval_freq=args.eval_freq)


if __name__ == "__main__":
    main()
