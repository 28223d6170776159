"""Hierarchical HLP training entry (reference scripts/high_level_play.py:368-393):
train a 3-action high-level goal-navigation policy on top of a frozen
low-level locomotion policy loaded from the latest run.

The reference's `high_level_policy/` package is a near-copy of the PPO stack
with tanh activation, USE_LATENT=False and 200 steps/env/iter
(high_level_policy/ppo/__init__.py:49, actor_critic.py:15,40-84); here those
are just parameters of the shared learner.
"""

import argparse
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--iterations", type=int, default=1000)
    ap.add_argument("--ll-run", default=None,
                    help="low-level run dir (default: latest under runs/)")
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--resume", default=None,
                    help="path to a HLP train_state checkpoint to resume from")
    ap.add_argument("--min-std", type=float, default=0.0,
                    help="exploration floor on the action std (the HLP hits "
                         "the same sigma^2 adaptive-LR ratchet as the "
                         "low-level flagship — EXPERIMENTS.md §13)")
    ap.add_argument("--zero-reward-on-reset", type=int, default=1,
                    choices=[0, 1],
                    help="1 (default) = the reference quirk: reset_idx "
                         "zeroes rew_buf AFTER terminal rewards were added "
                         "(high_level_play.py:222), so the learner never "
                         "sees the +5 goal / -2 fall / -1 timeout bonuses; "
                         "0 = terminal rewards visible")
    ap.add_argument("--progress-scale", type=float, default=0.0,
                    help="potential-based distance-progress shaping "
                         "(envs/hlp.py HLPRewardScales.progress; 0 = "
                         "reference parity)")
    ap.add_argument("--goal-radius", type=float, default=0.1,
                    help="goal tolerance in meters (reference 0.1, "
                         "high_level_play.py:191); relaxed values let "
                         "the +5 bonus be sampled under exploration")
    ap.add_argument("--dead-zone", type=float, default=0.2,
                    help="xy-command zeroing threshold (reference 0.2, "
                         "high_level_play.py:133); 0 disables the flat "
                         "spot that freezes the final approach")
    ap.add_argument("--action-magnitude-scale", type=float, default=0.0,
                    help="L2 penalty on commanded velocities (0 = "
                         "reference parity; the reference's action_rate "
                         "term lets saturated constant commands ride free)")
    ap.add_argument("--max-lr", type=float, default=None,
                    help="cap of the adaptive-KL LR ratchet (reference "
                         "1e-2; 1e-3 prevents the tanh policy's output "
                         "blow-up seen in r5_hlp_visible)")
    ap.add_argument("--entropy-coef", type=float, default=None,
                    help="override PPOArgs.entropy_coef (no warmup). The "
                         "r5_hlp2 arm showed the default 0.01 ratchets the "
                         "2-dim command std to 20+ (the sigma pathology of "
                         "EXPERIMENTS.md 24 in HLP form); 0.0 with "
                         "--min-std 0.2 is the proven recipe")
    args = ap.parse_args()

    from rapid_locomotion_rl_tpu.config import Cfg
    from rapid_locomotion_rl_tpu.envs.hlp import HighLevelControlEnv
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.learn.runner import Runner, RunnerArgs
    from rapid_locomotion_rl_tpu.models.networks import ACArgs
    from rapid_locomotion_rl_tpu.utils.checkpoint import load_pytree
    import json
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from play import latest_run

    ll_run = args.ll_run or latest_run()
    print(f"frozen low-level policy from {ll_run}")
    with open(os.path.join(ll_run, "parameters.json")) as f:
        blob = json.load(f)
    cfg = Cfg.from_dict(blob["Cfg"])

    # HLP low-level mode (fork semantics): no self resets, DR off for deploy
    cfg.env.num_envs = args.num_envs
    cfg.env.auto_reset = False
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    cfg.commands.command_curriculum = False
    ll_env = LeggedRobotEnv(cfg)
    payload = load_pytree(
        os.path.join(ll_run, "checkpoints/train_state_last.pkl"))
    ll_params = payload["ppo_state"].params

    from rapid_locomotion_rl_tpu.envs.hlp import HLPRewardScales

    class _Scales(HLPRewardScales):
        progress = args.progress_scale
        action_magnitude = args.action_magnitude_scale

    env = HighLevelControlEnv(
        ll_env, ll_params,
        zero_reward_on_reset=bool(args.zero_reward_on_reset),
        scales=_Scales, dead_zone=args.dead_zone,
        goal_radius=args.goal_radius)
    # runner shims: HLP env reuses the low-level config metadata
    env.cfg = ll_env.cfg
    env.derived = ll_env.derived

    if args.logdir is None:
        stamp = datetime.now().strftime("%Y-%m-%d/%H%M%S.%f")
        args.logdir = f"runs/rapid-locomotion/high_level/{stamp}"

    ppo_args = None
    if args.max_lr is not None or args.entropy_coef is not None:
        from rapid_locomotion_rl_tpu.learn.ppo import PPOArgs
        kw = {}
        if args.max_lr is not None:
            kw["max_lr"] = args.max_lr
        if args.entropy_coef is not None:
            kw["entropy_coef"] = args.entropy_coef
            kw["entropy_warmup_iters"] = 0
        ppo_args = PPOArgs(**kw)
    runner = Runner(
        env, logdir=args.logdir,
        ac_args=ACArgs(activation="tanh", use_latent=False,
                       min_std=args.min_std),
        ppo_args=ppo_args,
        runner_args=RunnerArgs(num_steps_per_env=200),
        eval_expert=True)
    if args.resume:
        runner.load_checkpoint(args.resume)
    runner.learn(args.iterations, eval_freq=200)


if __name__ == "__main__":
    main()
