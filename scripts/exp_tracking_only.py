"""Isolation experiment: can PPO learn velocity tracking when the reward is
ONLY the tracking terms (no penalties, no DR, no noise, flat ground)?

Separates learner health from reward-landscape/exploration effects."""
import sys
sys.path.insert(0, ".")

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
from rapid_locomotion_rl_tpu.learn.ppo import PPOArgs
from rapid_locomotion_rl_tpu.learn.runner import Runner, RunnerArgs

cfg = config_mini_cheetah()
cfg.env.num_envs = 2048
cfg.terrain.mesh_type = "plane"
cfg.terrain.teleport_robots = False
cfg.noise.add_noise = False
cfg.domain_rand.push_robots = False
for f in ["randomize_friction", "randomize_base_mass",
          "randomize_com_displacement", "randomize_motor_strength",
          "randomize_Kp_factor", "randomize_Kd_factor",
          "randomize_restitution"]:
    if hasattr(cfg.domain_rand, f):
        setattr(cfg.domain_rand, f, False)
# tracking-only reward
sc = cfg.rewards.scales
for name in list(vars(sc)):
    if not name.startswith("_") and name not in ("tracking_lin_vel",
                                                 "tracking_ang_vel"):
        try:
            setattr(sc, name, 0.0)
        except Exception:
            pass
cfg.rewards.only_positive_rewards = False

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300
ent = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
logdir = sys.argv[3] if len(sys.argv) > 3 else "runs/exp_tracking_only"
env = LeggedRobotEnv(cfg)
runner = Runner(env, logdir=logdir, seed=0,
                ppo_args=PPOArgs(entropy_coef=ent),
                runner_args=RunnerArgs(max_iterations=iters,
                                       save_video_interval=0))
runner.learn(iters, init_at_random_ep_len=True, eval_freq=100)
