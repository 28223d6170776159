"""Propulsion forensics: run the REFERENCE's PhysX-trained policy (teacher
path, true privileged obs) at a fixed forward command and measure, per
control step, where the propulsion goes:

- base vx (the outcome)
- per-foot normal force f_n and fore-aft tangential force f_t,x (from the
  contact report — propulsion must show up as positive mean f_t,x during
  stance-leg push-off)
- stance-foot slip: tangential speed of the foot contact point while loaded
  (stiction should pin this near zero; round-1's bug showed 0.4-0.85 m/s)
- torque saturation fraction (are the actuators even asked to push hard?)

CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/diag_propulsion.py [cmd_vx]
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic
from rapid_locomotion_rl_tpu.ops.dynamics import fk, geom_world_positions

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
_argv = sys.argv
sys.argv = sys.argv[:1]   # sim2sim reads argv[1] as a ckpt path at import
from sim2sim import REF_CKPT, load_reference_params  # noqa: E402
sys.argv = _argv

N = 8
STEPS = 300


def main(cmd_vx=1.0):
    cfg = config_mini_cheetah()
    cfg.env.num_envs = N
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.teleport_robots = False
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    for f in ("randomize_friction", "randomize_base_mass",
              "randomize_com_displacement", "randomize_motor_strength",
              "randomize_Kp_factor", "randomize_Kd_factor",
              "randomize_restitution"):
        setattr(cfg.domain_rand, f, False)
    cfg.commands.command_curriculum = False
    if os.environ.get("DIAG_BASE_SPLIT"):
        cfg.sim.contact_base_split = float(os.environ["DIAG_BASE_SPLIT"])
        print(f"contact_base_split={cfg.sim.contact_base_split}")
    if os.environ.get("DIAG_ITERS"):
        cfg.sim.contact_iterations = int(os.environ["DIAG_ITERS"])
        print(f"contact_iterations={cfg.sim.contact_iterations}")
    if os.environ.get("DIAG_FIT"):
        cfg.asset.mesh_sphere_fit = os.environ["DIAG_FIT"]
        print(f"mesh_sphere_fit={cfg.asset.mesh_sphere_fit}")
    env = LeggedRobotEnv(cfg)
    m = env.model

    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    params = load_reference_params(REF_CKPT)

    feet = list(env.feet_indices)
    # foot-tip geoms: lowest sphere per calf
    foot_geoms = []
    for b in range(m.nb):
        if "calf" in m.body_names[b]:
            gs = [g for g in range(m.ng) if int(m.geom_body[g]) == b]
            foot_geoms.append(min(gs, key=lambda g: m.geom_offset[g][2]))
    foot_geoms = jnp.asarray(foot_geoms)

    state = env.initial_state(jax.random.PRNGKey(0))
    cmd = jnp.asarray([cmd_vx, 0.0, 0.0], jnp.float32)

    @jax.jit
    def run(state):
        def step(carry, _):
            st = carry
            st = st._replace(commands=st.commands.at[:, :3].set(cmd))
            a = ac.apply(params, st.obs, st.privileged_obs,
                         method=ActorCritic.act_teacher)
            st, res = env.step(st, a)
            # post-step foot kinematics
            frames = jax.vmap(lambda s: fk(m, s))(st.sim)
            gp, gv = jax.vmap(
                lambda fr: geom_world_positions(m, fr))(frames)
            fg = gp[:, foot_geoms]                       # [N,4,3]
            fv = gv[:, foot_geoms]
            # contact-point velocity: v + w x (p_c - p_center), n = +z
            w = frames.w[:, jnp.asarray(m.geom_body)[foot_geoms]]
            r = jnp.asarray(m.geom_radius)[foot_geoms]
            nvec = jnp.array([0.0, 0.0, 1.0])
            v_c = fv + jnp.cross(w, -nvec * r[None, :, None])
            rep = st.contact_report[:, jnp.asarray(feet)]  # [N,4,3]
            return st, dict(
                vx=st.sim.base_lin_vel[:, 0],
                fn=rep[..., 2], ftx=rep[..., 0],
                slip=jnp.linalg.norm(v_c[..., :2], axis=-1),
                foot_z=fg[..., 2],
                tau_sat=jnp.mean(
                    jnp.abs(st.torques) / jnp.asarray(m.dof_effort), -1),
                done=res.done)
        return jax.lax.scan(step, state, None, length=STEPS)

    _, out = run(state)
    out = {k: np.asarray(v) for k, v in jax.device_get(out).items()}
    half = STEPS // 2
    loaded = out["fn"][half:] > 5.0                     # stance mask
    print(f"reference teacher @ cmd vx={cmd_vx} ({N} envs, "
          f"steps {half}..{STEPS}):")
    print(f"  base vx        mean {out['vx'][half:].mean():+.3f} m/s")
    print(f"  dones          {out['done'].sum()}")
    print(f"  stance frac    {loaded.mean():.2f}  (per-foot share of time "
          f"with f_n>5N)")
    print(f"  f_n (stance)   mean {out['fn'][half:][loaded].mean():6.1f} N  "
          f"(4 feet x ~22 N = weight 88 N)")
    print(f"  sum f_n / env-step  {out['fn'][half:].sum(-1).mean():6.1f} N")
    print(f"  f_t,x (stance) mean {out['ftx'][half:][loaded].mean():+6.2f} N "
          f" p10 {np.percentile(out['ftx'][half:][loaded], 10):+6.2f} "
          f" p90 {np.percentile(out['ftx'][half:][loaded], 90):+6.2f}")
    print(f"  slip (stance)  mean {out['slip'][half:][loaded].mean():.3f} m/s"
          f"  p90 {np.percentile(out['slip'][half:][loaded], 90):.3f}")
    print(f"  torque sat     mean {out['tau_sat'][half:].mean():.2f} "
          f"(|tau|/limit)")
    print(f"  foot clearance (swing) p90 "
          f"{np.percentile(out['foot_z'][half:][~loaded], 90):.3f} m")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 1.0)
