"""Full trot-parameter sweep per physics arm, batched over the env axis.

For each candidate physics config, every (freq, a_thigh, a_calf, lead)
combination — including NEGATIVE thigh amplitudes (reverse gaits) — runs as
its own env in one jitted rollout. Reports the best forward and best
backward net displacement: the round-4 flagship physics should keep forward
capability while making reverse gaits pay (EXPERIMENTS.md §14 — PhysX's
calf hull makes backward scuffing expensive; our legacy point feet don't).

CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/exp_drift_sweep.py
"""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv


def sweep_params() -> np.ndarray:
    pts = []
    for freq in (1.5, 2.0, 2.5):
        for ath in (-1.2, -0.8, -0.5, 0.5, 0.8, 1.2):
            for acf in (0.6, 1.0):
                for lead in (0.5, 1.2):
                    pts.append((freq, ath, acf, lead))
    return np.asarray(pts, np.float32)          # [P,4]


def build_env(fit: str, patch: float, num_envs: int) -> LeggedRobotEnv:
    c = config_mini_cheetah()
    c.env.num_envs = num_envs
    c.terrain.mesh_type = "plane"
    c.terrain.teleport_robots = False
    c.noise.add_noise = False
    c.domain_rand.push_robots = False
    for f in ("randomize_friction", "randomize_base_mass",
              "randomize_com_displacement", "randomize_motor_strength",
              "randomize_Kp_factor", "randomize_Kd_factor",
              "randomize_restitution"):
        setattr(c.domain_rand, f, False)
    c.commands.command_curriculum = False
    c.init_state.dof_init_range = [1.0, 1.0]
    c.init_state.randomize_root_vel = False
    c.env.episode_length_s = 100.0
    c.asset.mesh_sphere_fit = fit
    c.sim.torsional_patch_radius = patch
    return LeggedRobotEnv(c)


def trot_actions_batch(env, t, P):
    """Per-env trot targets; P is [N,4] = (freq, a_thigh, a_calf, lead)."""
    freq, ath, acf, lead = P[:, 0], P[:, 1], P[:, 2], P[:, 3]
    phase = 2.0 * jnp.pi * freq * t                       # [N]
    jn = list(env.model.joint_names)
    a = jnp.zeros((env.num_envs, env.num_dof))
    for leg, ph in (("FL", 0.0), ("RR", 0.0), ("FR", jnp.pi), ("RL", jnp.pi)):
        s = jnp.sin(phase + ph)
        sw = jnp.sin(phase + ph + lead)
        a = a.at[:, jn.index(f"{leg}_thigh_joint")].set(ath * s)
        a = a.at[:, jn.index(f"{leg}_calf_joint")].set(
            -acf * jnp.maximum(sw, 0.0))
    return a


def run_arm(fit: str, patch: float, P: np.ndarray, steps=300):
    env = build_env(fit, patch, num_envs=P.shape[0])
    Pj = jnp.asarray(P)

    @jax.jit
    def run(state):
        x0 = state.sim.base_pos[:, 0]

        def body(state, i):
            t = i.astype(jnp.float32) * env.dt
            a = trot_actions_batch(env, t, Pj)
            state, res = env.step(state, a)
            return state, res.done

        state, dones = jax.lax.scan(body, state, jnp.arange(steps))
        return (state.sim.base_pos[:, 0] - x0,
                jnp.sum(dones.astype(jnp.int32), axis=0),
                state.sim.base_pos[:, 2])

    state0 = env.initial_state(jax.random.PRNGKey(0))
    dx, nd, z = run(state0)
    dx, nd, z = np.asarray(dx), np.asarray(nd), np.asarray(z)
    ok = (nd == 0) & (z > 0.1)                 # alive, not collapsed
    fwd = np.where(ok, dx, -np.inf)
    bwd = np.where(ok, dx, np.inf)
    i_f, i_b = int(np.argmax(fwd)), int(np.argmin(bwd))
    print(f"{fit:7s} r={patch:5.3f}  best_fwd {dx[i_f]:+.3f} m "
          f"@ {tuple(P[i_f])}   best_bwd {dx[i_b]:+.3f} m @ {tuple(P[i_b])}  "
          f"(alive {int(ok.sum())}/{len(ok)})", flush=True)
    return dx, nd, z, ok


def main():
    P = sweep_params()
    print(f"{P.shape[0]} sweep points x 300 steps per arm")
    for fit, patch in (("legacy", 0.01), ("hull", 0.01), ("hull", 0.02),
                       ("hull", 0.03)):
        run_arm(fit, patch, P)


if __name__ == "__main__":
    main()
