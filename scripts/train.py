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
    args = ap.parse_args()

    from rapid_locomotion_rl_tpu.config import (config_go1,
                                                config_mini_cheetah)
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.learn.runner import Runner, RunnerArgs

    cfg = (config_mini_cheetah() if args.robot == "mini_cheetah"
           else config_go1())
    cfg.seed = args.seed
    if args.num_envs is not None:
        cfg.env.num_envs = args.num_envs

    if args.logdir is None:
        stamp = datetime.now().strftime("%Y-%m-%d/%H%M%S.%f")
        args.logdir = f"runs/rapid-locomotion/{stamp}"

    env = LeggedRobotEnv(cfg)
    runner = Runner(env, logdir=args.logdir, seed=args.seed,
                    runner_args=RunnerArgs(max_iterations=args.iterations,
                                           save_video_interval=400))
    if args.resume:
        runner.load_checkpoint(args.resume)
    print(f"training {args.robot} x{cfg.env.num_envs} envs "
          f"-> {args.logdir}")
    runner.learn(args.iterations, init_at_random_ep_len=True,
                 eval_freq=args.eval_freq)


if __name__ == "__main__":
    main()
