"""Locomotion-capability gate: the physics must permit forward travel.

Round-1's contact model silently capped propulsion (slip-limited force
transfer) and an intermediate round-2 state blocked stance-foot pivoting
— both passed every numeric unit test while making walking physically
impossible (EXPERIMENTS.md §1-2). This gate drives the committed
1500-iteration policy (runs/ab7_ent0_fixedphys2, trained on the round-2
physics) through the real env at a commanded speed and asserts the robot
actually travels. Any future contact/dynamics change that breaks
locomotion — or policy transfer onto it — fails loudly."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic
from rapid_locomotion_rl_tpu.utils.checkpoint import load_pytree

CKPT = "runs/ab7_ent0_fixedphys2/checkpoints/ac_weights_last.pkl"
# Directional gate target: the NEWEST flagship trained on the current
# physics. (The gate originally pinned the round-3 checkpoint; round-4's
# contact changes — torsional patch, hull fit, deterministic spawn —
# invalidated that policy's transfer, which is expected for a policy
# trained on older dynamics and says nothing about current physics.)
_FLAGSHIPS = (
    "runs/r5_warmup/checkpoints/ac_weights_last.pkl",
    "runs/r4_flagship_4000/checkpoints/ac_weights_last.pkl",
    "runs/r3_flagship/checkpoints/ac_weights_last.pkl",
)
CKPT_R3 = next((p for p in _FLAGSHIPS if os.path.exists(p)),
               _FLAGSHIPS[-1])


def _clean_cfg(num_envs=8):
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
        if hasattr(c.domain_rand, f):
            setattr(c.domain_rand, f, False)
    c.commands.command_curriculum = False
    c.init_state.dof_init_range = [1.0, 1.0]
    c.init_state.randomize_root_vel = False
    c.env.episode_length_s = 100.0
    return c


@pytest.mark.slow
def test_scripted_trot_propels():
    """Physics-only propulsion gate (no checkpoint): an open-loop diagonal
    trot must move the robot ≥0.6 m in 6 s without terminations. Round-2's
    1x5 ms implicit-PD over-damping killed exactly this (EXPERIMENTS.md §8)
    while every numeric unit test stayed green."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.tune_trot import make_runner, run_trot

    env = LeggedRobotEnv(_clean_cfg(4))
    runner = make_runner(env, steps=300)
    state0 = env.initial_state(jax.random.PRNGKey(0))
    # strongest mover of the tune_trot sweep (scripts/tune_trot.py)
    dx, dones, z = run_trot(env, runner, state0,
                            freq=2.0, a_thigh=0.8, a_calf=1.0, lead=0.5)
    assert dones == 0, "trot must not trigger terminations"
    assert abs(dx) >= 0.6, f"trot travelled only {dx:+.3f} m"
    assert 0.15 < z < 0.45, f"unphysical final height {z:.3f}"


@pytest.mark.slow
def test_flagship_policy_tracks_forward():
    """Directional gate (VERDICT round-2 weak #3): the newest flagship must
    make real net displacement along a commanded +vx — a spin-circling
    policy fails this."""
    if not os.path.exists(CKPT_R3):
        pytest.skip("no flagship checkpoint present yet")
    env = LeggedRobotEnv(_clean_cfg(8))
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    params = load_pytree(CKPT_R3)
    state = env.initial_state(jax.random.PRNGKey(0))
    cmd = state.commands.at[:, 0].set(1.0).at[:, 1].set(0.0).at[:, 2].set(0.0)
    state = state._replace(commands=cmd)
    x0 = state.sim.base_pos[:, 0]

    @jax.jit
    def run(state):
        def body(s, _):
            a = ac.apply(params, s.obs, s.privileged_obs,
                         method=ActorCritic.act_teacher)
            s, res = env.step(s, a)
            s = s._replace(commands=cmd)
            return s, None
        return jax.lax.scan(body, state, None, length=300)[0]

    state = run(state)
    dx = np.asarray(state.sim.base_pos[:, 0] - x0)
    # cmd vx=1.0 for 6 s => 6 m perfect; demand >=60% net forward on median
    assert np.median(dx) >= 3.6, dx


@pytest.mark.slow
def test_trained_policy_walks():
    if not os.path.exists(CKPT):
        pytest.skip("flagship checkpoint not present")
    c = config_mini_cheetah()
    c.env.num_envs = 8
    c.terrain.mesh_type = "plane"
    c.terrain.teleport_robots = False
    c.noise.add_noise = False
    c.domain_rand.push_robots = False
    for f in ("randomize_friction", "randomize_base_mass",
              "randomize_com_displacement", "randomize_motor_strength",
              "randomize_Kp_factor", "randomize_Kd_factor",
              "randomize_restitution"):
        if hasattr(c.domain_rand, f):
            setattr(c.domain_rand, f, False)
    c.commands.command_curriculum = False
    c.init_state.dof_init_range = [1.0, 1.0]
    c.init_state.randomize_root_vel = False
    env = LeggedRobotEnv(c)
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    params = load_pytree(CKPT)

    state = env.initial_state(jax.random.PRNGKey(0))
    # a command from the policy's trained (curriculum-expanded) region
    cmd = state.commands.at[:, 0].set(-1.5).at[:, 1].set(0.0) \
        .at[:, 2].set(2.5)
    state = state._replace(commands=cmd)
    step = jax.jit(env.step)

    @jax.jit
    def run(state):
        def body(s, _):
            a = ac.apply(params, s.obs, s.privileged_obs,
                         method=ActorCritic.act_teacher)
            s, res = env.step(s, a)
            s = s._replace(commands=cmd)
            return s, jnp.linalg.norm(s.sim.base_lin_vel[:, :2], axis=-1)
        return jax.lax.scan(body, state, None, length=300)

    state, vx = run(state)
    vx = np.asarray(vx)
    assert np.all(np.isfinite(np.asarray(state.sim.q)))
    # The 1500-iter policy is a mover, not yet a precise straight-line
    # tracker (EXPERIMENTS.md §10): gate on sustained SPEED — locomotion
    # physically working — rather than directional tracking. Round-1
    # physics capped every env near zero here.
    per_env = vx[100:].mean(axis=0)
    assert np.sort(per_env)[-4:].mean() > 0.5, per_env
