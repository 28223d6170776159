"""Multi-chip scale-out over a 1-D ``data`` mesh.

The reference is strictly single-GPU/single-process (SURVEY.md §2.3, §5.8);
this module is the new first-class component that replaces "nothing" with
TPU-native data parallelism:

- the env axis of every :class:`EnvState` leaf shards over the mesh
  (``P('data')``); params, optimizer state, curriculum weights and PRNG
  keys replicate (``P()``);
- the train iteration itself is UNCHANGED — GSPMD partitions the jitted
  program from the input shardings, inserting psums for the global
  advantage normalization, gradient reduction (the replicated-param update
  becomes an all-reduce over ICI) and the curriculum scatter;
- numerics are bit-identical to single-device execution for any device
  count, because the PRNG keys are replicated and every random draw is a
  deterministic function of (key, global position).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
(``jax.devices()`` then spans all hosts; DCN links the slices).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def env_axis_sharding(tree: Any, num_envs: int, mesh: Mesh,
                      axis_name: str = "data") -> Any:
    """Sharding pytree: leaves with a leading env axis -> P(axis), rest
    replicated."""
    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and \
                leaf.shape[0] == num_envs:
            return NamedSharding(mesh, P(axis_name))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec, tree)


def place_env_state(env_state: Any, num_envs: int, mesh: Mesh,
                    axis_name: str = "data") -> Any:
    """device_put the env state with the env axis sharded over the mesh."""
    shardings = env_axis_sharding(env_state, num_envs, mesh, axis_name)
    return jax.tree.map(jax.device_put, env_state, shardings)


def place_train_state(ppo_state: Any, mesh: Mesh) -> Any:
    """Replicate params + optimizer state on every device."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), ppo_state)


def make_sharded_runner_placement(runner, mesh: Optional[Mesh] = None,
                                  axis_name: str = "data"):
    """Shard a Runner's live state over the mesh in-place; subsequent
    jitted iterations partition automatically (GSPMD)."""
    mesh = mesh or make_mesh()
    runner.env_state = place_env_state(
        runner.env_state, runner.env.num_envs, mesh, axis_name)
    runner.ppo_state = place_train_state(runner.ppo_state, mesh)
    return mesh
