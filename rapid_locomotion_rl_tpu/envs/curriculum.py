"""Grid Adaptive Curriculum over the (vx, vy, ωz) command space — on-device.

TPU-native redesign of the reference RewardThresholdCurriculum
(reference mini_gym/envs/base/curriculum.py:92-124, wired up at
legged_robot.py:1056-1072 and `_resample_commands` legged_robot.py:595-626):

- the 51x2x51 weight grid lives as a replicated jnp array updated with
  identical deterministic ops on every host (SURVEY.md §2.3, §7 step 6);
- the update rule reproduces the reference: an env's command bin is a
  *success* when both tracking rewards exceed their thresholds; successful
  bins and their L∞-neighborhood within ``local_range`` command-units gain
  +0.2 weight (saturating at 1) — the neighborhood is a static stencil
  because the grid is regular;
- sampling draws bins from the normalized weights and then uniformly within
  the bin cell, batched per env with folded RNG keys.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CurriculumGrid:
    """Static description of the command-space grid."""
    shape: Tuple[int, int, int]          # (nx, ny, nyaw)
    lows: np.ndarray                     # [3] first centroid per dim
    highs: np.ndarray                    # [3] last centroid per dim
    bin_sizes: np.ndarray                # [3] centroid spacing per dim
    stencil: Tuple[int, int, int]        # neighborhood half-extent per dim

    @property
    def num_bins(self) -> int:
        return int(np.prod(self.shape))

    def centroids(self) -> np.ndarray:
        """[L, 3] bin centroids in command space (x-major, like meshgrid ij)."""
        axes = [np.linspace(self.lows[d], self.highs[d], self.shape[d])
                for d in range(3)]
        g = np.stack(np.meshgrid(*axes, indexing="ij"))
        return g.reshape(3, -1).T

    def bin_of(self, commands: jnp.ndarray) -> jnp.ndarray:
        """Nearest-bin flat index of [..., 3] commands."""
        idx = []
        for d in range(3):
            step = self.bin_sizes[d]
            i = jnp.round((commands[..., d] - self.lows[d]) / step)
            idx.append(jnp.clip(i, 0, self.shape[d] - 1).astype(jnp.int32))
        return (idx[0] * self.shape[1] + idx[1]) * self.shape[2] + idx[2]


class CurriculumState(NamedTuple):
    weights: jnp.ndarray             # [L]
    # per-bin running logs (reference curriculum.py:96-100, :121-124)
    episode_reward_lin: jnp.ndarray  # [L]
    episode_reward_ang: jnp.ndarray  # [L]
    episode_lin_vel_raw: jnp.ndarray
    episode_ang_vel_raw: jnp.ndarray
    episode_duration: jnp.ndarray


def make_grid(cfg, local_range: float = 0.5) -> CurriculumGrid:
    """Build the grid from the command limit ranges
    (51 x 2 x 51 in the reference, legged_robot.py:1058-1064)."""
    shape = (cfg.commands.curriculum_x_bins, cfg.commands.curriculum_y_bins,
             cfg.commands.curriculum_yaw_bins)
    lows = np.array([cfg.commands.limit_vel_x[0], cfg.commands.limit_vel_y[0],
                     cfg.commands.limit_vel_yaw[0]])
    highs = np.array([cfg.commands.limit_vel_x[1], cfg.commands.limit_vel_y[1],
                      cfg.commands.limit_vel_yaw[1]])
    sizes = np.array([(highs[d] - lows[d]) / max(shape[d] - 1, 1)
                      for d in range(3)])
    stencil = tuple(int(np.floor(local_range / sizes[d] + 1e-9))
                    if sizes[d] > 0 else 0 for d in range(3))
    return CurriculumGrid(shape=shape, lows=lows, highs=highs,
                          bin_sizes=sizes, stencil=stencil)


def init_state(grid: CurriculumGrid, cfg) -> CurriculumState:
    """Seed the weights inside the initial command ranges
    (reference set_to, curriculum.py:17-23 via legged_robot.py:1066-1072)."""
    cent = grid.centroids()
    low = np.array([cfg.commands.lin_vel_x[0], cfg.commands.lin_vel_y[0],
                    cfg.commands.ang_vel_yaw[0]])
    high = np.array([cfg.commands.lin_vel_x[1], cfg.commands.lin_vel_y[1],
                     cfg.commands.ang_vel_yaw[1]])
    inside = np.all((cent >= low) & (cent <= high), axis=-1)
    L = grid.num_bins
    z = jnp.zeros(L, jnp.float32)
    return CurriculumState(
        weights=jnp.asarray(inside.astype(np.float32)),
        episode_reward_lin=z, episode_reward_ang=z,
        episode_lin_vel_raw=z, episode_ang_vel_raw=z, episode_duration=z)


def update(grid: CurriculumGrid, state: CurriculumState,
           env_bins: jnp.ndarray,        # [N] current bin of every env
           lin_rewards: jnp.ndarray,     # [N] normalized tracking_lin reward
           ang_rewards: jnp.ndarray,     # [N]
           update_mask: jnp.ndarray,     # [N] bool: train envs being resampled
           lin_threshold: float, ang_threshold: float,
           lin_vel_raw=None,             # [N] mean body-frame vx this episode
           ang_vel_raw=None,             # [N] mean yaw rate this episode
           ep_duration=None) -> CurriculumState:
    """Reference update semantics (curriculum.py:110-119): success bins get
    +0.2 once (unique), plus +0.2 per success env over the L∞ stencil
    (which includes the bin itself), all saturating at 1.

    The raw-velocity/duration per-bin logs reproduce RewardThresholdCurriculum
    .log (reference curriculum.py:121-124). NOTE: the reference never calls
    .log from the training loop (its fields stay zero in the dumps); here they
    are written on every curriculum update so the curriculum/info.pkl dump is
    actually usable for expansion-direction forensics."""
    L = grid.num_bins
    success = update_mask & (lin_rewards > lin_threshold) & (ang_rewards > ang_threshold)
    hit = jnp.zeros(L, jnp.float32).at[env_bins].add(
        jnp.where(success, 1.0, 0.0))

    nx, ny, nz = grid.shape
    hit3 = hit.reshape(grid.shape)
    dil = jnp.zeros_like(hit3)
    sx, sy, sz = grid.stencil
    for dx in range(-sx, sx + 1):
        for dy in range(-sy, sy + 1):
            for dz in range(-sz, sz + 1):
                shifted = hit3
                if dx:
                    shifted = jnp.roll(shifted, dx, axis=0)
                    # zero the wrapped slice
                    idx = jnp.arange(nx)
                    edge = (idx < dx) if dx > 0 else (idx >= nx + dx)
                    shifted = jnp.where(edge[:, None, None], 0.0, shifted)
                if dy:
                    shifted = jnp.roll(shifted, dy, axis=1)
                    idx = jnp.arange(ny)
                    edge = (idx < dy) if dy > 0 else (idx >= ny + dy)
                    shifted = jnp.where(edge[None, :, None], 0.0, shifted)
                if dz:
                    shifted = jnp.roll(shifted, dz, axis=2)
                    idx = jnp.arange(nz)
                    edge = (idx < dz) if dz > 0 else (idx >= nz + dz)
                    shifted = jnp.where(edge[None, None, :], 0.0, shifted)
                dil = dil + shifted
    increments = 0.2 * ((hit > 0).astype(jnp.float32) + dil.reshape(-1))
    weights = jnp.clip(state.weights + increments, 0.0, 1.0)

    # per-bin reward logs (last-writer-wins scatter, masked)
    def scatter(dst, vals):
        return dst.at[jnp.where(update_mask, env_bins, L)].set(
            vals, mode="drop")

    state = state._replace(
        weights=weights,
        episode_reward_lin=scatter(state.episode_reward_lin, lin_rewards),
        episode_reward_ang=scatter(state.episode_reward_ang, ang_rewards),
    )
    if lin_vel_raw is not None:
        state = state._replace(
            episode_lin_vel_raw=scatter(state.episode_lin_vel_raw,
                                        lin_vel_raw))
    if ang_vel_raw is not None:
        state = state._replace(
            episode_ang_vel_raw=scatter(state.episode_ang_vel_raw,
                                        ang_vel_raw))
    if ep_duration is not None:
        state = state._replace(
            episode_duration=scatter(state.episode_duration, ep_duration))
    return state


def sample(grid: CurriculumGrid, state: CurriculumState, key: jnp.ndarray,
           n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw n commands: weighted bin choice + uniform within the bin cell
    (reference sample_bins/sample_uniform_from_cell, curriculum.py:55-68).

    Returns (commands [n,3], bin_indices [n])."""
    kb, ku = jax.random.split(key)
    logits = jnp.where(state.weights > 0, jnp.log(state.weights + 1e-12),
                       -jnp.inf)
    bins = jax.random.categorical(kb, logits, shape=(n,))
    cent = jnp.asarray(grid.centroids(), jnp.float32)[bins]      # [n,3]
    u = jax.random.uniform(ku, (n, 3), minval=-0.5, maxval=0.5)
    cmds = cent + u * jnp.asarray(grid.bin_sizes, jnp.float32)
    return cmds, bins
