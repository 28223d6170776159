"""rapid_locomotion_rl_tpu — a TPU-native (JAX/XLA/Pallas) legged-locomotion RL framework.

Re-implements the capabilities of the rapid-locomotion-rl reference stack
(massively-parallel PPO for quadruped velocity tracking, teacher–student
distillation, grid-adaptive command curriculum, hierarchical high-level
policies) as pure functions over PyTrees, designed for TPU:

- physics, env, rollout, GAE and PPO updates fuse into ONE jitted train step
- env axis shards over a 1-D ``data`` device mesh via ``shard_map``
- gradients / metric reductions ride ICI collectives (``psum``)

Layer map (cf. SURVEY.md §1):
  models/    robot model loading (URDF/MJCF -> static arrays) + flax networks
  ops/       quaternion/spatial math, articulated dynamics, contact, physics step
  envs/      task environment: obs/rewards/resets/DR/curriculum/terrain
  learn/     PPO actor-learner, rollout storage-as-scan, runner, metrics
  parallel/  device mesh construction + sharded train step
  utils/     logging, checkpointing
"""

import os

RLTPU_ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

__version__ = "0.1.0"
