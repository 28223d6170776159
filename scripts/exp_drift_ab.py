"""Physics-config A/B for the round-4 flagship: does the calf hull
sphere-chain (AssetCfg.mesh_sphere_fit="hull") plus a wider torsional
patch make backward scuffing COST what it costs PhysX?

Round-3 forensics (EXPERIMENTS.md §14): every scripted trot drifts
robot-backward because the legacy point-foot decomposition makes shin/heel
scuffing and knee grounding free, and the curriculum exploits it by
expanding into the -vx corner. This experiment runs matched FORWARD and
BACKWARD open-loop trots under each candidate config and reports net dx:
the config is good when forward gaits keep (or gain) displacement while
backward gaits lose it.

CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/exp_drift_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv

from tune_trot import make_runner, run_trot  # noqa: E402  (same dir)


def build_env(fit: str, patch: float) -> LeggedRobotEnv:
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
    c.asset.mesh_sphere_fit = fit
    c.sim.torsional_patch_radius = patch
    return LeggedRobotEnv(c)


# (freq, a_thigh, a_calf, lead) — forward trots from the round-3 sweep plus
# their mirrored (backward) counterparts: a negative thigh amplitude swings
# the legs the other way, producing the reverse gait RL exploits.
GAITS = {
    "fwd_slow": (1.5, 0.8, 1.0, 1.2),
    "fwd_fast": (2.5, 1.2, 1.0, 1.2),
    "bwd_slow": (1.5, -0.8, 1.0, 1.2),
    "bwd_fast": (2.5, -1.2, 1.0, 1.2),
    "shuffle": (2.0, 0.3, 0.3, 0.5),     # low clearance — scuffing regime
}


def main():
    arms = [("legacy", 0.01),           # round-3 flagship physics
            ("legacy", 0.025),
            ("hull", 0.01),
            ("hull", 0.02),
            ("hull", 0.03)]
    steps = 300                          # 6 s at dt=0.02
    print(f"{'arm':18s} " + " ".join(f"{g:>10s}" for g in GAITS)
          + "   (net dx [m] over 6 s; dones flagged *)")
    for fit, patch in arms:
        env = build_env(fit, patch)
        runner = make_runner(env, steps=steps)
        state0 = env.initial_state(jax.random.PRNGKey(0))
        row = []
        for g, (freq, ath, acf, lead) in GAITS.items():
            dx, nd, z = run_trot(env, runner, state0, freq, ath, acf, lead)
            row.append(f"{dx:+9.3f}{'*' if nd else ' '}")
        print(f"{fit:7s} r={patch:5.3f}  " + " ".join(f"{v:>10s}" for v in row),
              flush=True)


if __name__ == "__main__":
    main()
