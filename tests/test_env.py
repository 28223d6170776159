"""Env-layer integration: obs layout, stepping under jit, resets,
determinism (the BASELINE smoke-config generalization, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu.config import config_mini_cheetah, config_go1
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv


def small_mc_cfg(num_envs=8):
    c = config_mini_cheetah()
    c.env.num_envs = num_envs
    c.terrain.num_rows = 2
    c.terrain.num_cols = 2
    c.terrain.border_size = 5.0
    return c


@pytest.fixture(scope="module")
def env():
    return LeggedRobotEnv(small_mc_cfg())


@pytest.fixture(scope="module")
def stepped(env):
    key = jax.random.PRNGKey(0)
    state = env.initial_state(key)
    step = jax.jit(env.step)
    results = []
    for _ in range(10):
        state, res = step(state, jnp.zeros((env.num_envs, env.num_actions)))
        results.append(res)
    return state, results


def test_obs_shapes(env, stepped):
    state, results = stepped
    assert results[-1].obs.shape == (8, 42)
    assert results[-1].privileged_obs.shape == (8, 18)
    assert results[-1].obs_history.shape == (8, 15 * 42)


def test_finite(stepped):
    state, results = stepped
    for leaf in jax.tree.leaves(state):
        assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float32)))
    assert np.all(np.isfinite(np.asarray(results[-1].rew)))


def test_obs_layout(env, stepped):
    """gravity(3) + cmd(3) + dof_pos(12) + dof_vel(12) + actions(12)."""
    state, results = stepped
    obs = np.asarray(results[-1].obs)
    # last 12 entries = actions = zeros
    np.testing.assert_allclose(obs[:, 30:42], 0.0, atol=1e-6)
    # gravity part roughly unit-norm (plus noise)
    g = obs[:, :3]
    assert np.all(np.abs(np.linalg.norm(g, axis=-1) - 1.0) < 0.3)


def test_history_rolls(env, stepped):
    state, results = stepped
    hist = np.asarray(results[-1].obs_history)
    obs = np.asarray(results[-1].obs)
    np.testing.assert_allclose(hist[:, -42:], obs, atol=1e-6)
    prev_obs = np.asarray(results[-2].obs)
    np.testing.assert_allclose(hist[:, -84:-42], prev_obs, atol=1e-6)


def test_episode_accounting(env, stepped):
    state, _ = stepped
    ep = np.asarray(state.episode_length)
    assert np.all(ep >= 0) and np.all(ep <= 10)
    assert int(state.common_step_counter) == 10


def test_determinism(env):
    key = jax.random.PRNGKey(42)
    step = jax.jit(env.step)

    def rollout():
        state = env.initial_state(key)
        for i in range(5):
            state, res = step(state, jnp.zeros((env.num_envs,
                                                env.num_actions)))
        return res

    r1, r2 = rollout(), rollout()
    np.testing.assert_array_equal(np.asarray(r1.obs), np.asarray(r2.obs))
    np.testing.assert_array_equal(np.asarray(r1.rew), np.asarray(r2.rew))


def test_standing_survives(env):
    """Zero actions = PD to default pose: most envs should not terminate
    early; robot heights stay plausible."""
    key = jax.random.PRNGKey(1)
    cfg = small_mc_cfg()
    cfg.init_state.dof_init_range = [1.0, 1.0]
    cfg.init_state.randomize_root_vel = False
    e = LeggedRobotEnv(cfg)
    state = e.initial_state(key)
    step = jax.jit(e.step)
    dones = 0
    for _ in range(50):  # 1 second
        state, res = step(state, jnp.zeros((e.num_envs, e.num_actions)))
        dones += int(np.sum(np.asarray(res.done)))
    z = np.asarray(state.sim.base_pos[:, 2]) - np.asarray(state.env_origins[:, 2])
    assert np.all(z > 0.1) and np.all(z < 0.6), z
    assert dones <= e.num_envs  # no repeated insta-resets


def test_timeout_resets(env):
    """Envs reset at max_episode_length and report time_outs."""
    cfg = small_mc_cfg(4)
    cfg.env.episode_length_s = 0.2  # 10 steps
    e = LeggedRobotEnv(cfg)
    state = e.initial_state(jax.random.PRNGKey(3))
    step = jax.jit(e.step)
    saw_timeout = False
    for _ in range(12):
        state, res = step(state, jnp.zeros((4, 12)))
        saw_timeout |= bool(np.any(np.asarray(res.info["time_outs"])))
    assert saw_timeout
    assert np.all(np.asarray(state.episode_length) <= 11)


def test_go1_plane_env():
    c = config_go1()
    c.env.num_envs = 4
    e = LeggedRobotEnv(c)
    assert e.terrain_grid is None  # plane
    assert len(e.feet_indices) == 4
    state = e.initial_state(jax.random.PRNGKey(0))
    state, res = jax.jit(e.step)(state, jnp.zeros((4, 12)))
    assert res.obs.shape == (4, 42)
    assert np.all(np.isfinite(np.asarray(res.obs)))


def test_curriculum_weights_grow():
    """Feeding success rewards at resample boundaries expands the grid."""
    from rapid_locomotion_rl_tpu.envs import curriculum as curr
    cfg = small_mc_cfg()
    grid = curr.make_grid(cfg)
    state = curr.init_state(grid, cfg)
    w0 = float(jnp.sum(state.weights))
    assert w0 > 0
    bins = jnp.asarray([grid.num_bins // 2] * 4)
    state2 = curr.update(grid, state, bins,
                         jnp.full(4, 10.0), jnp.full(4, 10.0),
                         jnp.ones(4, bool), 0.1, 0.1)
    assert float(jnp.sum(state2.weights)) > w0
    # neighborhood: 3x1x3 stencil around the success bin has weight now
    w3 = state2.weights.reshape(grid.shape)
    cx = grid.shape[0] // 2
    assert float(w3[cx, :, :].max()) == 1.0


def test_curriculum_sampling_respects_weights():
    from rapid_locomotion_rl_tpu.envs import curriculum as curr
    cfg = small_mc_cfg()
    grid = curr.make_grid(cfg)
    state = curr.init_state(grid, cfg)
    cmds, bins = curr.sample(grid, state, jax.random.PRNGKey(0), 1000)
    w = np.asarray(state.weights)
    assert np.all(w[np.asarray(bins)] > 0)  # only active bins sampled
    # initial range is [-0.6, 0.6] for vx: samples within cell margin
    assert np.all(np.abs(np.asarray(cmds[:, 0])) < 0.6 + 0.5 * grid.bin_sizes[0])


def test_control_type_v():
    """Velocity PD control (reference _compute_torques 'V' branch,
    legged_robot.py:671-673): tau = p*(cmd_vel - qd) - d*(qd - last_qd)/dt,
    times motor strength, clipped to effort limits."""
    c = small_mc_cfg(num_envs=2)
    c.terrain.mesh_type = "plane"
    c.terrain.teleport_robots = False
    c.control.control_type = "V"
    c.control.stiffness = {"joint": 5.0}
    c.control.damping = {"joint": 0.01}
    env = LeggedRobotEnv(c)
    state = env.initial_state(jax.random.PRNGKey(0))
    sim = state.sim._replace(
        qd=0.3 * jnp.ones_like(state.sim.qd))
    last = 0.1 * jnp.ones_like(state.sim.qd)
    act = 0.5 * jnp.ones((2, env.num_actions))
    tau, _ = env._compute_torques(act, sim, state.dr, last_dof_vel=last)
    scaled = 0.5 * c.control.action_scale * np.where(
        np.asarray(env.hip_mask) > 0, c.control.hip_scale_reduction, 1.0)
    expect = (5.0 * (scaled - 0.3) - 0.01 * (0.3 - 0.1) / c.sim.dt)
    expect = np.clip(expect * np.asarray(state.dr.motor_strengths),
                     -np.asarray(env.torque_limits),
                     np.asarray(env.torque_limits))
    np.testing.assert_allclose(np.asarray(tau), expect, rtol=1e-5, atol=1e-6)
