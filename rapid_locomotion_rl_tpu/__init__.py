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


def _setup_compilation_cache():
    """Persistent XLA compilation cache, shared by every entry point.

    Training/bench signatures at flagship scale take minutes per compile
    (remote-compiled TPU signatures observed at ~25-55 min); without a
    persistent cache every process re-pays that for identical programs.
    Respects an explicit JAX_COMPILATION_CACHE_DIR; opt out with
    RLTPU_NO_COMPILATION_CACHE=1.
    """
    if os.environ.get("RLTPU_NO_COMPILATION_CACHE"):
        return
    import jax

    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(RLTPU_ROOT_DIR, ".jax_cache"))
    # only cache compilations that are actually expensive
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_setup_compilation_cache()
