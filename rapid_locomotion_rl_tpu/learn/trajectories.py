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


def unpad_trajectories(padded: jnp.ndarray, dones: jnp.ndarray,
                       num_envs: int) -> jnp.ndarray:
    """Inverse of :func:`split_and_pad_trajectories` (reference
    utils.py:39-43): gather the per-(t, env) elements back out of the
    padded trajectory layout. ``dones`` is the SAME [T, N] array the
    forward pass used (it defines the trajectory mapping)."""
    T, N = dones.shape[:2]
    assert N == num_envs
    d = dones.astype(bool)
    starts = jnp.concatenate([jnp.ones((1, N), bool), d[:-1]], axis=0)
    start_count = jnp.cumsum(starts.T.reshape(-1)) - 1
    traj_id = start_count.reshape(N, T).T
    t_idx = jnp.broadcast_to(jnp.arange(T)[:, None], (T, N))
    first_t = jnp.full((T * N,), T, jnp.int32).at[
        traj_id.T.reshape(-1)].min(t_idx.T.reshape(-1).astype(jnp.int32))
    pos = t_idx - first_t[traj_id]
    return padded[pos, traj_id]


def recurrent_mini_batches(data: dict, dones: jnp.ndarray,
                           num_mini_batches: int) -> list:
    """The reference `reccurent_mini_batch_generator`
    (rollout_storage.py:142-180), jittable: the env axis is split into
    ``num_mini_batches`` STATIC groups (mini_batch_size = N //
    num_mini_batches, exactly the reference's start:stop slices); the
    observation-like keys (`obs`, `priv`, `hist`) are trajectory-split and
    padded PER GROUP (same trajectories the reference's data-dependent
    first_traj:last_traj slicing selects, in a dense static layout), the
    remaining keys stay [T, mb_envs, ...] flat slices. Returns a list of
    dicts with an extra ``masks`` entry per batch; iterate it once per
    epoch like the reference's generator. The reference never enables its
    recurrent path (dead code), so this exists for API completeness and
    is exercised by tests only."""
    T, N = dones.shape[:2]
    mb = N // num_mini_batches
    out = []
    for i in range(num_mini_batches):
        sl = slice(i * mb, (i + 1) * mb)
        d = dones[:, sl]
        batch = {}
        for k, v in data.items():
            if k in ("obs", "priv", "hist"):
                padded, masks = split_and_pad_trajectories(v[:, sl], d)
                batch[k] = padded
                batch["masks"] = masks
            else:
                batch[k] = v[:, sl]
        out.append(batch)
    return out
