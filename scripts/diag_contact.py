"""Contact-model diagnostic: measure stance slip, penetration and achieved
velocity of the trained flagship policy at fixed commanded speeds.

Hypothesis under test (round-2, VERDICT #2): the implicit per-geom contact
solve discounts forces by 1/(1 + c*dt/m_eff) with m_eff = calf mass (64 g),
which (a) softens static normal stiffness ~11x and (b) caps tangential force
transfer at ~m_eff/dt N per (m/s of slip), so the policy cannot transmit the
propulsion forces fast tracking needs without large foot slip.

Usage (CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/diag_contact.py \
      [checkpoint.pkl]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic
from rapid_locomotion_rl_tpu.ops.dynamics import fk, geom_world_positions
from rapid_locomotion_rl_tpu.utils.checkpoint import load_pytree

CKPT = (sys.argv[1] if len(sys.argv) > 1
        else "runs/flagship4000/checkpoints/ac_weights_003999.pkl")
SPEEDS = [0.4, 0.7, 1.0, 1.5]
N_PER = 16
STEPS = 300


def main():
    cfg = config_mini_cheetah()
    cfg.env.num_envs = N_PER * len(SPEEDS)
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.teleport_robots = False
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    cfg.domain_rand.randomize_friction = False
    cfg.domain_rand.randomize_base_mass = False
    cfg.domain_rand.randomize_com_displacement = False
    cfg.domain_rand.randomize_motor_strength = False
    cfg.domain_rand.randomize_Kp_factor = False
    cfg.domain_rand.randomize_Kd_factor = False
    cfg.commands.command_curriculum = False
    env = LeggedRobotEnv(cfg)
    m = env.model

    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    params = load_pytree(CKPT)

    key = jax.random.PRNGKey(0)
    state = env.initial_state(key)
    cmds = jnp.repeat(jnp.asarray(SPEEDS), N_PER)
    commands = state.commands.at[:, 0].set(cmds).at[:, 1].set(0.0) \
        .at[:, 2].set(0.0)
    state = state._replace(commands=commands)

    feet_geoms = np.asarray(
        [g for g in range(m.ng)
         if m.geom_report_body[g] in env.feet_indices])
    print(f"feet geoms: {len(feet_geoms)}; "
          f"calf masses: {np.asarray(m.mass)[np.asarray(m.geom_body)[feet_geoms]]}")

    def policy(state):
        return ac.apply(params, state.obs, state.privileged_obs,
                        method=ActorCritic.act_teacher)

    def diag(sim):
        frames = jax.vmap(lambda s: fk(m, s))(sim)
        gp, gv = jax.vmap(lambda f: geom_world_positions(m, f))(frames)
        fz = gp[:, feet_geoms, 2]
        r = jnp.asarray(m.geom_radius)[feet_geoms]
        pen = jnp.maximum(r - fz, 0.0)            # plane at z=0
        in_c = pen > 0.0
        slip = jnp.linalg.norm(gv[:, feet_geoms, :2], axis=-1)
        return pen, in_c, slip

    @jax.jit
    def run(state):
        def step(carry, _):
            state = carry
            a = policy(state)
            state, res = env.step(state, a)
            # re-pin commands (resampling is off but resets zero them)
            state = state._replace(commands=commands)
            pen, in_c, slip = diag(state.sim)
            out = dict(
                vx=state.sim.base_lin_vel[:, 0],
                pen_sum=jnp.sum(pen * in_c, axis=1),
                slip_sum=jnp.sum(slip * in_c, axis=1),
                nc=jnp.sum(in_c, axis=1),
                fn=jnp.sum(state.contact_report[:, list(env.feet_indices), 2],
                           axis=1),
                done=res.done,
            )
            return state, out

        return jax.lax.scan(step, state, None, length=STEPS)

    _, out = run(state)
    out = jax.device_get(out)
    half = STEPS // 2
    for i, v in enumerate(SPEEDS):
        sl = slice(i * N_PER, (i + 1) * N_PER)
        vx = out["vx"][half:, sl].mean()
        nc = out["nc"][half:, sl]
        pen = out["pen_sum"][half:, sl].sum() / max(nc.sum(), 1)
        slip = out["slip_sum"][half:, sl].sum() / max(nc.sum(), 1)
        fn = out["fn"][half:, sl].mean()
        dones = out["done"][:, sl].sum()
        print(f"cmd vx={v:4.1f}: achieved {vx:6.3f} m/s "
              f"(err {v - vx:+.3f}) | stance pen {pen * 1000:5.1f} mm | "
              f"stance slip {slip:5.3f} m/s | feet Fz sum {fn:6.1f} N | "
              f"dones {dones}")


if __name__ == "__main__":
    main()
