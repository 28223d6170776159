"""Tune an open-loop scripted trot (used by the locomotion-capability gate).

Sweeps a small grid of (frequency, thigh amplitude, calf amplitude, phase
lead) over the real env on flat ground and reports net +x displacement —
the physics must let a hand-scripted diagonal trot travel forward, or RL
has no gait to find (EXPERIMENTS.md §8; the round-2 gate that caught the
1x5ms implicit-PD over-damping regression).

CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/tune_trot.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv


def trot_actions(env, t, p):
    """Open-loop diagonal trot in ACTION space (P-control targets are
    default + 0.25 * action, hips x0.5). p = [freq, a_thigh, a_calf, lead]
    as a traced array so every sweep point shares one compilation."""
    freq, a_thigh, a_calf, lead = p[0], p[1], p[2], p[3]
    phase = 2.0 * jnp.pi * freq * t
    jn = list(env.model.joint_names)
    a = jnp.zeros(env.num_dof)
    # diagonal pairs: (FL, RR) at phase 0, (FR, RL) at pi
    for leg, ph in (("FL", 0.0), ("RR", 0.0), ("FR", jnp.pi), ("RL", jnp.pi)):
        s = jnp.sin(phase + ph)
        sw = jnp.sin(phase + ph + lead)
        # thigh swings fore-aft; calf retracts (shortens) during swing
        a = a.at[jn.index(f"{leg}_thigh_joint")].set(a_thigh * s)
        a = a.at[jn.index(f"{leg}_calf_joint")].set(
            -a_calf * jnp.maximum(sw, 0.0))
    return a


def make_runner(env, steps=300):
    @jax.jit
    def run(state, p):
        x0 = state.sim.base_pos[:, 0]

        def body(carry, i):
            state = carry
            t = i.astype(jnp.float32) * env.dt
            a = trot_actions(env, t, p)
            a = jnp.broadcast_to(a, (env.num_envs, env.num_dof))
            state, res = env.step(state, a)
            return state, (state.sim.base_pos[:, 0], res.done)

        state, (xs, dones) = jax.lax.scan(body, state, jnp.arange(steps))
        return (xs[-1] - x0, jnp.sum(dones.astype(jnp.int32)),
                jnp.mean(state.sim.base_pos[:, 2]))
    return run


def run_trot(env, runner, state0, freq, a_thigh, a_calf, lead):
    p = jnp.asarray([freq, a_thigh, a_calf, lead], jnp.float32)
    dx, nd, z = runner(state0, p)
    return float(np.mean(np.asarray(dx))), float(nd), float(z)


def main():
    c = config_mini_cheetah()
    c.env.num_envs = 4
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
    c.env.episode_length_s = 100.0
    env = LeggedRobotEnv(c)

    runner = make_runner(env)
    state0 = env.initial_state(jax.random.PRNGKey(0))
    best = None
    for freq in (1.5, 2.0, 2.5):
        for a_thigh in (0.5, 0.8, 1.2):
            for a_calf in (0.6, 1.0):
                for lead in (0.5, 1.2):
                    dx, nd, z = run_trot(env, runner, state0,
                                         freq, a_thigh, a_calf, lead)
                    tag = f"f={freq} ath={a_thigh} acf={a_calf} lead={lead}"
                    print(f"{tag:42s} dx={dx:+.3f} m dones={nd:.0f} z={z:.3f}",
                          flush=True)
                    if nd == 0 and (best is None or dx > best[0]):
                        best = (dx, tag)
    print("\nBEST:", best)


if __name__ == "__main__":
    main()
