"""RMA-style teacher-student actor-critic (flax.linen).

Re-creates the reference network family (reference
mini_gym_learn/ppo/actor_critic.py:9-173):

- ``env_factor_encoder``: privileged obs (18) -> [256,128] -> latent (18)
- ``adaptation_module``: obs history (630) -> [256,32] -> latent (18)
- ``actor_body`` / ``critic_body``: [obs ‖ latent] -> [512,256,128] -> out
- state-independent learned std (init 1.0)

All activations ELU. The teacher path (encoder) feeds actor+critic during
PPO; the student path (adaptation module) is distilled via MSE and used at
deployment (act_inference). Widths/dims are config so the HLP variant
(high_level_policy/ppo/actor_critic.py, tanh + USE_LATENT=False) reuses the
same module.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class ACArgs:
    """Reference AC_Args (actor_critic.py:9-20)."""
    init_noise_std: float = 1.0
    actor_hidden_dims: List[int] = field(default_factory=lambda: [512, 256, 128])
    critic_hidden_dims: List[int] = field(default_factory=lambda: [512, 256, 128])
    activation: str = "elu"
    adaptation_module_branch_hidden_dims: List[int] = field(
        default_factory=lambda: [256, 32])
    env_factor_encoder_branch_hidden_dims: List[int] = field(
        default_factory=lambda: [256, 128])
    env_factor_encoder_branch_latent_dims: int = 18
    use_latent: bool = True   # HLP copy gates all latent machinery off
    # Exploration floor on the learned std (0.0 = off = reference parity).
    # Default 0.2 (round 5): a safety floor under the entropy-warmup
    # schedule — with the warmed-up 0.01 entropy bonus sigma settles ~0.5
    # and the floor is inactive, but it caps the sigma^2 adaptive-LR
    # ratchet during the zero-entropy warmup window (EXPERIMENTS.md
    # §13, §24-25).
    min_std: float = 0.2


def _activation(name: str):
    return {
        "elu": nn.elu, "relu": nn.relu, "selu": nn.selu,
        "crelu": nn.relu, "lrelu": nn.leaky_relu, "tanh": nn.tanh,
        "sigmoid": nn.sigmoid,
    }[name]


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int
    act: str = "elu"

    @nn.compact
    def __call__(self, x):
        a = _activation(self.act)
        for h in self.hidden:
            x = a(nn.Dense(h)(x))
        return nn.Dense(self.out)(x)


class ActorCritic(nn.Module):
    num_obs: int
    num_privileged_obs: int
    num_obs_history: int
    num_actions: int
    args: ACArgs

    def setup(self):
        a = self.args
        if a.use_latent:
            self.env_factor_encoder = MLP(
                a.env_factor_encoder_branch_hidden_dims,
                a.env_factor_encoder_branch_latent_dims, a.activation)
            self.adaptation_module = MLP(
                a.adaptation_module_branch_hidden_dims,
                a.env_factor_encoder_branch_latent_dims, a.activation)
        self.actor_body = MLP(a.actor_hidden_dims, self.num_actions,
                              a.activation)
        self.critic_body = MLP(a.critic_hidden_dims, 1, a.activation)
        # explicit dtype: a weak-typed std changes the jit input signature
        # after the first update and forces a full recompile
        self.std = self.param(
            "std", lambda key, shape: jnp.full(shape, a.init_noise_std,
                                               dtype=jnp.float32),
            (self.num_actions,))

    # -- latent paths ----------------------------------------------------
    def teacher_latent(self, privileged_obs):
        return self.env_factor_encoder(privileged_obs)

    def student_latent(self, obs_history):
        return self.adaptation_module(obs_history)

    def _actor_in(self, obs, latent):
        if self.args.use_latent:
            return jnp.concatenate([obs, latent], axis=-1)
        return obs

    # -- heads -----------------------------------------------------------
    def act_teacher(self, obs, privileged_obs):
        """Deterministic teacher action mean (actor_critic.py:164-168)."""
        latent = (self.teacher_latent(privileged_obs)
                  if self.args.use_latent else None)
        return self.actor_body(self._actor_in(obs, latent))

    def act_student(self, obs, obs_history):
        """Deployment path: adaptation-module latent (actor_critic.py:158-162)."""
        latent = (self.student_latent(obs_history)
                  if self.args.use_latent else None)
        return self.actor_body(self._actor_in(obs, latent))

    def distribution(self, obs, privileged_obs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(mean, std) of the teacher policy (update_distribution,
        actor_critic.py:137-140)."""
        mean = self.act_teacher(obs, privileged_obs)
        std = jnp.maximum(self.std, max(1e-4, self.args.min_std))
        return mean, jnp.broadcast_to(std, mean.shape)

    def evaluate(self, obs, privileged_obs):
        latent = (self.teacher_latent(privileged_obs)
                  if self.args.use_latent else None)
        return self.critic_body(self._actor_in(obs, latent))[..., 0]

    def __call__(self, obs, privileged_obs, obs_history):
        """Init-time touch of every submodule."""
        mean, std = self.distribution(obs, privileged_obs)
        value = self.evaluate(obs, privileged_obs)
        if self.args.use_latent:
            student = self.act_student(obs, obs_history)
        else:
            student = mean
        return mean, std, value, student


# ---------------------------------------------------------------------------
def normal_log_prob(mean, std, x):
    """Diagonal Normal log-likelihood summed over the action axis."""
    var = std * std
    return jnp.sum(
        -0.5 * ((x - mean) ** 2) / var - jnp.log(std)
        - 0.5 * np.log(2.0 * np.pi), axis=-1)


def normal_entropy(std):
    """Diagonal Normal entropy summed over the action axis."""
    return jnp.sum(0.5 + 0.5 * np.log(2.0 * np.pi) + jnp.log(std), axis=-1)


def normal_kl(mu0, sig0, mu1, sig1):
    """KL(N0 || N1) summed over the action axis — matches the reference's
    adaptive-LR estimate (ppo.py:112-115)."""
    return jnp.sum(
        jnp.log(sig1 / sig0 + 1e-5)
        + (sig0 ** 2 + (mu0 - mu1) ** 2) / (2.0 * sig1 ** 2) - 0.5,
        axis=-1)
