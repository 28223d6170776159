"""Checkpoint / resume of the FULL training state (SURVEY.md §5.3-5.4).

Unlike the reference — which only saves `actor_critic.state_dict()`
(ppo/__init__.py:222-225) and has dead resume config — the whole train
carry is one PyTree here, so resume restores params, BOTH optimizer states,
the adaptive LR, the env state (including curriculum weights and DR
tensors) and the RNG key bit-exactly.

Deployment export mirrors the reference's TorchScript artifacts
(`adaptation_module_latest.jit` / `body_latest.jit`,
ppo/__init__.py:227-242): the student policy (adaptation module + actor
body) is exported as StableHLO via ``jax.export`` next to a raw param dump.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(tree: Any, path: str):
    if jax.process_count() > 1:
        # cross-process shards are not host-addressable; gather the full
        # arrays on every host, then let process 0 write
        from jax.experimental import multihost_utils
        tree = multihost_utils.process_allgather(tree, tiled=True)
        if jax.process_index() != 0:
            return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    host_tree = jax.device_get(tree)
    with open(path, "wb") as f:
        pickle.dump(host_tree, f)


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def export_student_policy(ac, params, num_obs: int, num_hist: int,
                          path_prefix: str):
    """Serialize the deployment policy (obs, obs_history) -> actions.

    Writes `<prefix>.params.pkl` (raw params) and, when supported,
    `<prefix>.stablehlo` (portable compiled artifact — the TorchScript
    export analogue)."""
    from ..models.networks import ActorCritic

    def student_fn(obs, hist):
        return ac.apply(params, obs, hist, method=ActorCritic.act_student)

    save_pytree(params, path_prefix + ".params.pkl")
    try:
        from jax import export as jax_export
        exported = jax_export.export(jax.jit(student_fn))(
            jax.ShapeDtypeStruct((1, num_obs), jnp.float32),
            jax.ShapeDtypeStruct((1, num_hist), jnp.float32))
        with open(path_prefix + ".stablehlo", "wb") as f:
            f.write(exported.serialize())
    except Exception as e:  # noqa: BLE001 - export is best-effort
        print(f"[checkpoint] stablehlo export skipped: {e}")
