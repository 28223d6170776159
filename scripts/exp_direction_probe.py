"""Directional-asymmetry probe on a trained checkpoint: command matched
±vx (and ±yaw) and compare what the policy actually achieves, plus the
torque cost of achieving it. Quantifies the backward-preference at the
POLICY level (EXPERIMENTS.md §14 measures it at the scripted-gait level).

CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/exp_direction_probe.py [logdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from play import load_env  # noqa: E402


def main(logdir="runs/r3_flagship", steps=250, settle=100):
    from rapid_locomotion_rl_tpu.models.networks import ActorCritic
    from rapid_locomotion_rl_tpu.ops import quat as Q

    env, ac, params = load_env(logdir, num_envs=4)
    state0 = env.initial_state(jax.random.PRNGKey(0))
    use_teacher = os.environ.get("PROBE_TEACHER", "0") == "1"

    @jax.jit
    def rollout(state, cmd):
        def body(state, i):
            state = state._replace(
                commands=state.commands.at[:, :3].set(cmd))
            if use_teacher:
                actions = ac.apply(params, state.obs, state.privileged_obs,
                                   method=ActorCritic.act_teacher)
            else:
                actions = ac.apply(params, state.obs, state.obs_history,
                                   method=ActorCritic.act_student)
            state, res = env.step(state, actions)
            v_body = Q.quat_rotate_inverse(state.sim.base_quat,
                                           state.sim.base_lin_vel)
            return state, (v_body[:, 0], state.sim.base_ang_vel[:, 2],
                           jnp.mean(jnp.abs(state.torques), axis=-1),
                           res.done)

        state, (vx, wz, tq, done) = jax.lax.scan(
            body, state, jnp.arange(steps))
        sl = slice(settle, None)
        return (jnp.mean(vx[sl]), jnp.mean(wz[sl]), jnp.mean(tq[sl]),
                jnp.sum(done.astype(jnp.int32)))

    print(f"checkpoint: {logdir}  (robot-frame means over steps "
          f"{settle}..{steps})")
    print(f"{'command':>22s} {'vx_ach':>8s} {'wz_ach':>8s} "
          f"{'mean|tau|':>9s} {'dones':>6s}")
    for cmd in ((1.0, 0, 0), (-1.0, 0, 0), (2.0, 0, 0), (-2.0, 0, 0),
                (0.5, 0, 0), (-0.5, 0, 0), (0, 0, 2.0), (0, 0, -2.0)):
        vx, wz, tq, nd = rollout(state0, jnp.asarray(cmd, jnp.float32))
        print(f"{str(cmd):>22s} {float(vx):+8.3f} {float(wz):+8.3f} "
              f"{float(tq):9.3f} {int(nd):6d}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:2])
