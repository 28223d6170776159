"""Auxiliary subsystems: metric caches, world boxes, MJCF, trajectories,
eval metrics, VecEnv adapter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu import RLTPU_ROOT_DIR


def test_dist_cache_running_mean():
    from rapid_locomotion_rl_tpu.learn.caches import DistCache
    c = DistCache()
    c.log(x=np.array([1.0, 2.0]))
    c.log(x=np.array([3.0, 4.0]))
    s = c.get_summary()
    np.testing.assert_allclose(s["dist/x"], [2.0, 3.0])
    assert c.get_summary() == {}


def test_slot_cache_per_bin():
    from rapid_locomotion_rl_tpu.learn.caches import SlotCache
    c = SlotCache(4)
    c.log(np.array([0, 0, 2]), err=np.array([1.0, 3.0, 5.0]))
    s = c.get_summary()
    np.testing.assert_allclose(s["slot/err"], [2.0, 0.0, 5.0, 0.0])


def test_world_box_forces():
    from rapid_locomotion_rl_tpu.envs.world import (box_sphere_forces,
                                                    default_corridor)
    boxes = default_corridor()
    origin = jnp.zeros(3)
    # sphere pushed into the left wall (y=-0.8) from inside
    pos = jnp.asarray([[0.0, -0.67, 0.5]])
    vel = jnp.zeros((1, 3))
    f = box_sphere_forces(
        boxes, origin, pos, vel, jnp.asarray([0.05]), jnp.asarray([1.0]),
        stiffness=10000.0, damping=100.0, friction=1.0,
        friction_vel_eps=0.1, dt=0.005)
    f = np.asarray(f)
    assert f[0, 1] > 1.0          # pushed back toward +y
    # outside the walls: no force
    pos2 = jnp.asarray([[0.0, 0.0, 0.5]])
    f2 = box_sphere_forces(
        boxes, origin, pos2, vel, jnp.asarray([0.05]), jnp.asarray([1.0]),
        stiffness=10000.0, damping=100.0, friction=1.0,
        friction_vel_eps=0.1, dt=0.005)
    np.testing.assert_allclose(np.asarray(f2), 0.0, atol=1e-6)


def test_world_corridor_blocks_robot():
    """Integration: with cfg.world.enabled the corridor walls are real
    contact geometry in the env step — a robot launched sideways at the
    wall is stopped by it (y stays inside), the wall force shows up in the
    contact report, and a contact termination is raised (reference
    world.py:31-64 walls as actors; here wired through
    ops/physics.py extra_contact)."""
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv

    c = config_mini_cheetah()
    c.env.num_envs = 2
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
    c.env.auto_reset = False         # HLP low-level mode: report, don't reset
    c.world.enabled = True
    env = LeggedRobotEnv(c)
    assert env.world_boxes is not None

    state = env.initial_state(jax.random.PRNGKey(0))
    # launch both robots at the +y side wall (hy = width/2 = 0.8 m)
    sim = state.sim
    state = state._replace(sim=sim._replace(
        base_lin_vel=sim.base_lin_vel.at[:, 1].set(3.0)))
    step = jax.jit(env.step)
    hit = False
    for _ in range(40):              # 0.8 s
        state, res = step(state, jnp.zeros((2, 12)))
        hit = hit or bool(jnp.any(res.done))
    y_rel = np.asarray(state.sim.base_pos[:, 1] - state.env_origins[:, 1])
    assert np.all(np.isfinite(np.asarray(state.sim.base_pos)))
    # the wall inner face is at y=0.7; allow the base to lean into it a bit
    assert np.all(y_rel < 1.0), f"robot passed through the wall: y={y_rel}"
    assert hit, "wall contact should raise a contact termination"


def test_mjcf_go1():
    from rapid_locomotion_rl_tpu.models.mjcf import load_mjcf
    m = load_mjcf(f"{RLTPU_ROOT_DIR}/resources/robots/go1/xml/go1.xml")
    assert m.nb == 13 and m.nv == 12
    assert 10.0 < m.total_mass() < 14.0
    assert m.ng > 10
    assert all("joint" in n for n in m.joint_names)


def test_mjcf_urdf_parity_go1():
    """The MJCF-built Go1 must agree with the URDF-built one wherever the
    source assets agree: identical tree topology, joint order, position
    limits, effort limits, and frame geometry. Masses differ at the SOURCE
    level (the Unitree MJCF folds rotor masses into the hips: 0.679 vs
    0.510 kg; MJCF carries no velocity limits), so mass parity is
    tolerance-based. Reference loads either format through the same
    gym.load_asset (resources/robots/go1/xml/go1.xml:1-14)."""
    from rapid_locomotion_rl_tpu.models import load_mjcf, load_urdf
    mj = load_mjcf(f"{RLTPU_ROOT_DIR}/resources/robots/go1/xml/go1.xml")
    ur = load_urdf(f"{RLTPU_ROOT_DIR}/resources/robots/go1/urdf/go1.urdf")
    assert mj.nb == ur.nb and mj.nv == ur.nv
    assert list(mj.joint_names) == list(ur.joint_names)
    # base body is named 'trunk' in the MJCF, 'base' in the collapsed URDF
    assert list(mj.body_names)[1:] == list(ur.body_names)[1:]
    np.testing.assert_array_equal(np.asarray(mj.parent),
                                  np.asarray(ur.parent))
    np.testing.assert_allclose(mj.p_tree, ur.p_tree, atol=1e-6)
    np.testing.assert_allclose(mj.axis, ur.axis, atol=1e-6)
    np.testing.assert_allclose(mj.dof_lower, ur.dof_lower, atol=1e-5)
    np.testing.assert_allclose(mj.dof_upper, ur.dof_upper, atol=1e-5)
    np.testing.assert_allclose(mj.dof_effort, ur.dof_effort, atol=1e-6)
    # masses: identical except the 4 hips (rotor folding); total within 6%
    diff = np.abs(np.asarray(mj.mass) - np.asarray(ur.mass))
    assert np.sum(diff > 1e-3) <= 4
    assert diff.max() < 0.2
    assert abs(mj.total_mass() - ur.total_mass()) / ur.total_mass() < 0.07
    # principal inertias same order of magnitude everywhere
    di = np.abs(np.diagonal(mj.inertia, axis1=1, axis2=2))
    du = np.abs(np.diagonal(ur.inertia, axis1=1, axis2=2))
    assert np.all((di < 10 * du + 1e-5) & (du < 10 * di + 1e-5))


def test_mjcf_env_smoke():
    """config_go1 with asset.file pointed at the MJCF builds the same env
    and steps finitely on the full task path."""
    from rapid_locomotion_rl_tpu.config import config_go1
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv

    cfg = config_go1()
    cfg.asset.file = "{ROOT}/resources/robots/go1/xml/go1.xml"
    cfg.env.num_envs = 4
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.teleport_robots = False
    env = LeggedRobotEnv(cfg)
    assert env.model.name.startswith("go1")
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(3):
        state, res = step(state, jnp.zeros((4, 12)))
    assert np.all(np.isfinite(np.asarray(res.obs)))
    assert np.all(np.isfinite(np.asarray(state.sim.q)))


def test_mjcf_dynamics_step():
    """The MJCF model runs on the same physics stack."""
    from rapid_locomotion_rl_tpu.config import SimCfg
    from rapid_locomotion_rl_tpu.models.mjcf import load_mjcf
    from rapid_locomotion_rl_tpu.ops.dynamics import PhysParams
    from rapid_locomotion_rl_tpu.ops.physics import (default_sim_state,
                                                     physics_step)
    m = load_mjcf(f"{RLTPU_ROOT_DIR}/resources/robots/go1/xml/go1.xml")
    q0 = jnp.asarray([(0.1 if "hip" in n else (0.8 if "thigh" in n else -1.5))
                      for n in m.joint_names])
    s = default_sim_state(m, [0, 0, 0.4], [0, 0, 0, 1], q0)
    params = PhysParams(jnp.asarray(1.0), jnp.asarray(0.0),
                        jnp.asarray(0.0), jnp.zeros(3))
    out = physics_step(m, SimCfg(), s, jnp.zeros(12), params, None)
    assert np.all(np.isfinite(np.asarray(out.state.q)))


def test_split_and_pad_trajectories():
    from rapid_locomotion_rl_tpu.learn.trajectories import \
        split_and_pad_trajectories
    T_, N = 5, 2
    x = jnp.arange(T_ * N, dtype=jnp.float32).reshape(T_, N, 1)
    dones = jnp.asarray([[0, 0], [1, 0], [0, 0], [0, 1], [0, 0]], bool)
    padded, masks = split_and_pad_trajectories(x, dones)
    # env 0: traj [x0,x2] then [x4,x6,x8]; env 1: [x1,x3,x5,x7] then [x9]
    m = np.asarray(masks)
    lengths = sorted(m.sum(0)[m.sum(0) > 0].tolist())
    assert lengths == [1, 2, 3, 4]
    # first trajectory of env 0 contains steps 0,1 values (0, 2)
    p = np.asarray(padded)[..., 0]
    cols = [tuple(p[:k, j].tolist()) for j, k in enumerate(m.sum(0)) if k]
    assert (0.0, 2.0) in cols
    assert (1.0, 3.0, 5.0, 7.0) in cols


def test_eval_metrics_registry():
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.learn.metrics import METRICS_FNS
    from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic

    cfg = config_mini_cheetah()
    cfg.env.num_envs = 4
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.teleport_robots = False
    env = LeggedRobotEnv(cfg)
    state = env.initial_state(jax.random.PRNGKey(0))
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    params = ac.init(jax.random.PRNGKey(0), jnp.zeros((1, 42)),
                     jnp.zeros((1, 18)), jnp.zeros((1, 630)))
    # full reference registry (metrics.py:16-85) + repo extras
    for ref_name in ("lin_vel_rmsd", "ang_vel_rmsd", "lin_vel_x",
                     "ang_vel_yaw", "max_torques", "power_consumption",
                     "cost_of_transport", "froude_number",
                     "adaptation_loss", "auxiliary_rewards", "termination",
                     "privileged_obs", "latents", "base_height"):
        assert ref_name in METRICS_FNS, ref_name
    for name, fn in METRICS_FNS.items():
        v = fn(env, state, ac, params)
        if isinstance(v, dict):
            assert set(v) == set(env.reward_names)
            for k, t in v.items():
                assert np.all(np.isfinite(np.asarray(t))), f"{name}/{k}"
        else:
            assert np.all(np.isfinite(np.asarray(v))), name
    assert np.asarray(METRICS_FNS["privileged_obs"](
        env, state, ac, params)).shape == (4, 18)
    assert np.asarray(METRICS_FNS["latents"](
        env, state, ac, params)).shape == (4, 18)


def test_dr_eval_presets():
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.learn.dr_eval import DR_SETTINGS
    cfg = config_mini_cheetah()
    for name, fn in DR_SETTINGS.items():
        c = fn(cfg)
        assert c is not cfg
    c = DR_SETTINGS["static_high"](cfg)
    assert c.domain_rand.friction_range == [0.1, 0.1]


def test_vec_env_adapter():
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.envs.vec_env import VecEnvAdapter

    cfg = config_mini_cheetah()
    cfg.env.num_envs = 4
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.teleport_robots = False
    adapter = VecEnvAdapter(LeggedRobotEnv(cfg))
    obs = adapter.reset()
    assert obs["obs"].shape == (4, 42)
    obs, rew, done, info = adapter.step(np.zeros((4, 12)))
    assert obs["obs_history"].shape == (4, 630)
    assert adapter.root_states.shape == (4, 13)
    assert "time_outs" in info


def test_unpad_trajectories_roundtrip():
    """unpad(split_and_pad(x)) == x (reference utils.py:39-43)."""
    from rapid_locomotion_rl_tpu.learn.trajectories import (
        split_and_pad_trajectories, unpad_trajectories)
    T_, N = 6, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T_, N, 4)), jnp.float32)
    dones = jnp.asarray(rng.random((T_, N)) < 0.3)
    padded, masks = split_and_pad_trajectories(x, dones)
    back = unpad_trajectories(padded, dones, N)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_recurrent_mini_batches():
    """Recurrent minibatch generator (reference rollout_storage.py:142-180):
    env groups are static slices; padded obs trajectories cover exactly the
    group's transitions; flat keys slice through unchanged."""
    from rapid_locomotion_rl_tpu.learn.trajectories import (
        recurrent_mini_batches, unpad_trajectories)
    T_, N, nmb = 5, 8, 4
    rng = np.random.default_rng(1)
    data = {
        "obs": jnp.asarray(rng.normal(size=(T_, N, 3)), jnp.float32),
        "priv": jnp.asarray(rng.normal(size=(T_, N, 2)), jnp.float32),
        "hist": jnp.asarray(rng.normal(size=(T_, N, 6)), jnp.float32),
        "actions": jnp.asarray(rng.normal(size=(T_, N, 2)), jnp.float32),
        "adv": jnp.asarray(rng.normal(size=(T_, N)), jnp.float32),
    }
    dones = jnp.asarray(rng.random((T_, N)) < 0.25)
    batches = recurrent_mini_batches(data, dones, nmb)
    assert len(batches) == nmb
    mbe = N // nmb
    for i, b in enumerate(batches):
        sl = slice(i * mbe, (i + 1) * mbe)
        # flat keys are the reference's start:stop slices
        np.testing.assert_allclose(np.asarray(b["actions"]),
                                   np.asarray(data["actions"][:, sl]))
        np.testing.assert_allclose(np.asarray(b["adv"]),
                                   np.asarray(data["adv"][:, sl]))
        # padded obs unpack back to the group's transitions
        back = unpad_trajectories(b["obs"], dones[:, sl], mbe)
        np.testing.assert_allclose(np.asarray(back),
                                   np.asarray(data["obs"][:, sl]))
        # mask count equals the group's transition count
        assert int(np.asarray(b["masks"]).sum()) == T_ * mbe
    # jittable end-to-end
    f = jax.jit(lambda d, dn: recurrent_mini_batches(d, dn, nmb)[0]["obs"])
    assert np.all(np.isfinite(np.asarray(f(data, dones))))
