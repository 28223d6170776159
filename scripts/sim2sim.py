"""Sim2sim transfer check: run the REFERENCE's trained torch policy
(reference runs/.../checkpoints/ac_weights_last.pt, trained in
IsaacGym/PhysX) inside THIS framework's physics.

This is the decisive physics-validation experiment: if a policy trained in
PhysX walks here at commanded speed, the dynamics are RL-equivalent and
any learning gap is on the algorithm side; if it face-plants, the physics
differs materially.

Usage (CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/sim2sim.py [ckpt.pt]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

REF_CKPT = (sys.argv[1] if len(sys.argv) > 1 else
            "/root/reference/runs/rapid-locomotion/example/train/"
            "201852.132488/checkpoints/ac_weights_last.pt")
SPEEDS = [0.4, 0.7, 1.0, 1.5, 2.0]
N_PER = 8
STEPS = 400


def load_reference_params(path):
    """Torch state_dict -> flax ActorCritic param tree (transposed)."""
    import torch
    sd = torch.load(path, map_location="cpu")

    def dense(prefix, i):
        w = np.asarray(sd[f"{prefix}.{2 * i}.weight"].T, np.float32)
        b = np.asarray(sd[f"{prefix}.{2 * i}.bias"], np.float32)
        return {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}

    def mlp(prefix, n_layers):
        return {f"Dense_{i}": dense(prefix, i) for i in range(n_layers)}

    return {"params": {
        "env_factor_encoder": mlp("env_factor_encoder", 3),
        "adaptation_module": mlp("adaptation_module", 3),
        "actor_body": mlp("actor_body", 4),
        "critic_body": mlp("critic_body", 4),
        "std": jnp.asarray(np.asarray(sd["std"], np.float32)),
    }}


def main():
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic

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
    import os as _os
    if _os.environ.get("SIM2SIM_BASE_SPLIT"):
        cfg.sim.contact_base_split = float(_os.environ["SIM2SIM_BASE_SPLIT"])
        print(f"contact_base_split={cfg.sim.contact_base_split}")
    if _os.environ.get("SIM2SIM_ITERS"):
        cfg.sim.contact_iterations = int(_os.environ["SIM2SIM_ITERS"])
        print(f"contact_iterations={cfg.sim.contact_iterations}")
    if _os.environ.get("SIM2SIM_FIT"):
        cfg.asset.mesh_sphere_fit = _os.environ["SIM2SIM_FIT"]
        print(f"mesh_sphere_fit={cfg.asset.mesh_sphere_fit}")
    if _os.environ.get("SIM2SIM_PATCH"):
        cfg.sim.torsional_patch_radius = float(_os.environ["SIM2SIM_PATCH"])
        print(f"torsional_patch_radius={cfg.sim.torsional_patch_radius}")
    env = LeggedRobotEnv(cfg)

    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    params = load_reference_params(REF_CKPT)
    # sanity: shapes must match an init tree
    ref = jax.eval_shape(lambda k: ac.init(k, jnp.zeros((1, env.num_obs)),
                                           jnp.zeros((1, env.num_privileged_obs)),
                                           jnp.zeros((1, env.num_obs_history))),
                         jax.random.PRNGKey(0))
    jax.tree.map(lambda a, b: None if a.shape == b.shape
                 else (_ for _ in ()).throw(
                     ValueError(f"shape {a.shape} vs {b.shape}")),
                 jax.tree.map(lambda x: x, ref), params)

    state = env.initial_state(jax.random.PRNGKey(0))
    cmds = jnp.repeat(jnp.asarray(SPEEDS), N_PER)
    commands = state.commands.at[:, 0].set(cmds).at[:, 1].set(0.0) \
        .at[:, 2].set(0.0)
    state = state._replace(commands=commands)

    import os
    use_teacher = os.environ.get("SIM2SIM_TEACHER", "0") == "1"
    if use_teacher:
        print("policy path: act_teacher (true privileged obs; bypasses "
              "the obs-history/adaptation layout)")

    @jax.jit
    def run(state):
        def step(carry, _):
            st = carry
            if use_teacher:
                a = ac.apply(params, st.obs, st.privileged_obs,
                             method=ActorCritic.act_teacher)
            else:
                a = ac.apply(params, st.obs, st.obs_history,
                             method=ActorCritic.act_student)
            st, res = env.step(st, a)
            st = st._replace(commands=commands)
            return st, dict(vx=st.sim.base_lin_vel[:, 0],
                            done=res.done,
                            h=st.sim.base_pos[:, 2])
        return jax.lax.scan(step, state, None, length=STEPS)

    _, out = run(state)
    out = jax.device_get(out)
    half = STEPS // 2
    print(f"reference policy ({REF_CKPT.split('/')[-1]}) in our sim:")
    for i, v in enumerate(SPEEDS):
        sl = slice(i * N_PER, (i + 1) * N_PER)
        vx = out["vx"][half:, sl].mean()
        falls = out["done"][:, sl].sum()
        h = out["h"][half:, sl].mean()
        track = np.exp(-((v - out["vx"][half:, sl]) ** 2) / 0.25).mean()
        print(f"cmd vx={v:4.1f}: achieved {vx:6.3f} m/s "
              f"(err {v - vx:+.3f}) | h {h:.3f} | falls {falls:3d} | "
              f"per-step tracking {track:.2f}")


if __name__ == "__main__":
    main()
