"""Trajectory splitting/padding for recurrent PPO.

Re-creates the reference utility (reference
mini_gym_learn/utils/utils.py:5-43): split a [T, N, ...] rollout tensor at
done flags into per-episode trajectories, padded to the rollout length,
with validity masks — the input format of the recurrent minibatch
generator (rollout_storage.py:142-180). Kept dense and jittable: outputs
are [T, T*N-shaped-upper-bound..., ...]; consumers mask with `masks`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def split_and_pad_trajectories(tensor: jnp.ndarray, dones: jnp.ndarray
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split at dones and pad to the full rollout length.

    Args:
      tensor: [T, N, ...] rollout data.
      dones: [T, N] episode-termination flags.

    Returns:
      (padded [T, M, ...], masks [T, M]) where M = T*N is the static upper
      bound on trajectory count; masks[t, j] marks valid steps. Matches the
      reference semantics (utils.py:5-37) with a dense static layout.
    """
    T, N = dones.shape[:2]
    d = dones.astype(bool)
    # trajectory start flags: step 0 or the step after a done
    starts = jnp.concatenate(
        [jnp.ones((1, N), bool), d[:-1]], axis=0)          # [T,N]
    # global trajectory id per (t, n): cumulative starts (column-major in N)
    start_count = jnp.cumsum(starts.T.reshape(-1)) - 1      # [N*T]
    traj_id = start_count.reshape(N, T).T                   # [T,N]
    # position within trajectory
    t_idx = jnp.broadcast_to(jnp.arange(T)[:, None], (T, N))

    def start_time_of(tid_flat):
        # first t of each trajectory id
        M = T * N
        first_t = jnp.full((M,), T, jnp.int32)
        flat_tid = traj_id.T.reshape(-1)
        flat_t = t_idx.T.reshape(-1)
        return first_t.at[flat_tid].min(flat_t.astype(jnp.int32))

    first_t = start_time_of(None)                           # [M]
    pos = t_idx - first_t[traj_id]                          # [T,N]

    M = T * N
    out_shape = (T, M) + tensor.shape[2:]
    padded = jnp.zeros(out_shape, tensor.dtype)
    masks = jnp.zeros((T, M), bool)
    padded = padded.at[pos, traj_id].set(tensor)
    masks = masks.at[pos, traj_id].set(True)
    return padded, masks
