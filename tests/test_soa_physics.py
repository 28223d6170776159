"""SoA physics step equivalence against the AoS (vmap) implementation."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu import RLTPU_ROOT_DIR
from rapid_locomotion_rl_tpu.config import SimCfg
from rapid_locomotion_rl_tpu.models import load_urdf
from rapid_locomotion_rl_tpu.ops.dynamics import PhysParams, SimState
from rapid_locomotion_rl_tpu.ops.physics import physics_step
from rapid_locomotion_rl_tpu.ops.soa_physics import physics_step_soa

MC = f"{RLTPU_ROOT_DIR}/resources/robots/mini_cheetah/urdf/mini_cheetah.urdf"


@pytest.fixture(scope="module")
def model():
    return load_urdf(MC)


def batched_state(model, n, seed, airborne=False):
    rng = np.random.default_rng(seed)
    z0 = 1.5 if airborne else 0.28
    return SimState(
        base_pos=jnp.asarray(
            rng.normal([0, 0, z0], [0.5, 0.5, 0.02], (n, 3)), jnp.float32),
        base_quat=jnp.asarray(
            (lambda q: q / np.linalg.norm(q, axis=-1, keepdims=True))(
                rng.normal([0, 0, 0, 4.0], 0.3, (n, 4))), jnp.float32),
        base_lin_vel=jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32),
        base_ang_vel=jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32),
        # stay clear of the ±1.6 hip limit: the limit damping term is
        # discontinuous there and fp-level branch flips would defeat the
        # equivalence comparison
        q=jnp.asarray(rng.uniform(-1.3, 1.3, (n, 12)), jnp.float32),
        qd=jnp.asarray(rng.uniform(-4, 4, (n, 12)), jnp.float32))


def rand_params(n, seed):
    rng = np.random.default_rng(seed + 5)
    return PhysParams(
        friction=jnp.asarray(rng.uniform(0.1, 3.0, n), jnp.float32),
        restitution=jnp.asarray(rng.uniform(0, 1, n), jnp.float32),
        payload=jnp.asarray(rng.uniform(-1, 3, n), jnp.float32),
        com_displacement=jnp.asarray(rng.uniform(-0.1, 0.1, (n, 3)),
                                     jnp.float32))


@pytest.mark.parametrize("airborne", [False, True])
@pytest.mark.parametrize("contact_model", [
    "legacy",
    # the apparent-model variants compile the full OSIM/TGS pipeline twice
    # (~2-4 min each on this box) — slow-gated; the strict apparent check
    # below keeps fast-gate coverage of that solver
    pytest.param("apparent", marks=pytest.mark.slow),
])
def test_soa_matches_aos(model, airborne, contact_model):
    n = 16
    sim = SimCfg(contact_model=contact_model)
    state = batched_state(model, n, 0, airborne)
    params = rand_params(n, 0)
    # modest torques: +-10 Nm on a 2.5e-4 kg m^2 calf reaches the joint
    # limits (discontinuous damping) within one step — keep dynamics smooth
    tau = jnp.asarray(np.random.default_rng(9).uniform(-3, 3, (n, 12)),
                      jnp.float32)

    aos = jax.jit(jax.vmap(functools.partial(
        physics_step, model, sim, terrain=None)))
    soa = jax.jit(functools.partial(
        physics_step_soa, model, sim, terrain=None))

    o1 = aos(state, tau, params)
    o2 = soa(state, tau, params)

    # randomly penetrating grounded states sit ON contact-branch
    # boundaries; fp-level branch flips amplify through the stiff contact,
    # so agreement is statistical. A systematic bug shows ~0% agreement;
    # observed healthy levels are 87-99%.
    frac_req = 0.80 if not airborne else 0.90

    def mostly_close(a, b, atol, frac=frac_req):
        """Contact branch boundaries (in-contact toggles on ~1e-7 position
        differences) amplify through clamps on a few random penetrating
        states; require the bulk to agree tightly."""
        a, b = np.asarray(a), np.asarray(b)
        ok = np.abs(a - b) <= atol + 1e-3 * np.abs(b)
        assert ok.mean() >= frac, (ok.mean(), np.abs(a - b).max())

    np.testing.assert_allclose(np.asarray(o1.geom_pos),
                               np.asarray(o2.geom_pos), rtol=1e-4, atol=1e-4)
    # with random torques, airborne legs slam into joint limits within the
    # step (calf inertia ~2.5e-4 kg m² at ±10 N m) whose damping term is
    # discontinuous — so even contact-free comparisons are statistical
    mostly_close(o1.state.q, o2.state.q, 1e-3)
    mostly_close(o1.state.qd, o2.state.qd, 1e-2)
    mostly_close(o1.state.base_pos, o2.state.base_pos, 1e-3)
    mostly_close(o1.state.base_lin_vel, o2.state.base_lin_vel, 1e-2)
    if not airborne:
        mostly_close(o1.contact_report, o2.contact_report, 0.5)


@pytest.mark.parametrize("contact_model", ["legacy", "apparent"])
def test_soa_matches_aos_strict(model, contact_model):
    """Torque-free flight: no contact, no limit hits — bit-tight."""
    import dataclasses
    n = 16
    sim = SimCfg(contact_model=contact_model)
    state = batched_state(model, n, 3, airborne=True)
    params = rand_params(n, 3)
    tau = jnp.zeros((n, 12))
    o1 = jax.vmap(functools.partial(physics_step, model, sim,
                                    terrain=None))(state, tau, params)
    o2 = physics_step_soa(model, sim, state, tau, params, None)
    np.testing.assert_allclose(np.asarray(o1.state.q),
                               np.asarray(o2.state.q), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o1.state.qd),
                               np.asarray(o2.state.qd), atol=2e-3)
    np.testing.assert_allclose(np.asarray(o1.state.base_lin_vel),
                               np.asarray(o2.state.base_lin_vel), atol=1e-3)


@pytest.mark.parametrize("contact_model", [
    "legacy",
    pytest.param("apparent", marks=pytest.mark.slow),
])
def test_soa_multistep_stable(model, contact_model):
    """100 SoA steps of PD standing stay finite and settled."""
    n = 8
    sim = SimCfg(contact_model=contact_model)
    q0 = jnp.asarray([(-0.1 if nm.startswith(("FR", "RR")) else 0.1)
                      if "hip" in nm else (-0.8 if "thigh" in nm else 1.62)
                      for nm in model.joint_names])
    state = SimState(
        base_pos=jnp.tile(jnp.asarray([0, 0, 0.3], jnp.float32), (n, 1)),
        base_quat=jnp.tile(jnp.asarray([0, 0, 0, 1], jnp.float32), (n, 1)),
        base_lin_vel=jnp.zeros((n, 3)), base_ang_vel=jnp.zeros((n, 3)),
        q=jnp.tile(q0, (n, 1)), qd=jnp.zeros((n, 12)))
    params = PhysParams(jnp.ones(n), jnp.zeros(n), jnp.zeros(n),
                        jnp.zeros((n, 3)))

    @jax.jit
    def step(s):
        tau = jnp.clip(20.0 * (q0 - s.q) - 0.5 * s.qd, -30, 30)
        return physics_step_soa(model, sim, s, tau, params, None).state

    for _ in range(100):
        state = step(state)
    assert np.all(np.isfinite(np.asarray(state.q)))
    z = np.asarray(state.base_pos[:, 2])
    assert np.all(z > 0.15) and np.all(z < 0.4)


def test_soa_world_boxes_matches_aos(model):
    """World obstacle boxes on the SoA path: the in-chain _box_forces_soa
    must match the AoS extra_contact hook (envs/world.py
    box_sphere_forces) — round-5 un-forces physics_impl='aos' for
    cfg.world.enabled."""
    from rapid_locomotion_rl_tpu.envs.world import (box_sphere_forces,
                                                    default_corridor)
    n = 16
    sim = SimCfg(contact_model="legacy", num_substeps=1)
    boxes = default_corridor(3.5, 1.6, wall_height=3.0)
    state = batched_state(model, n, 7, airborne=True)
    # park the robots just brushing the inner face of the +y side wall
    # (y=0.7) with ZERO velocity: wall forces stay moderate, so the
    # comparison is not dominated by stiff-contact chaos
    state = state._replace(
        base_pos=state.base_pos.at[:, 1].set(
            0.45 + 0.2 * jnp.linspace(0, 1, n)),
        base_lin_vel=jnp.zeros((n, 3)), base_ang_vel=jnp.zeros((n, 3)),
        qd=jnp.zeros((n, 12)))
    params = rand_params(n, 7)
    tau = jnp.zeros((n, 12))
    origins = jnp.zeros((n, 3))
    radius = jnp.asarray(model.geom_radius, jnp.float32)

    def extra(origin, pos, vel, m_eff, dt):
        return box_sphere_forces(
            boxes, origin, pos, vel, radius, m_eff,
            stiffness=sim.contact_stiffness, damping=sim.contact_damping,
            friction=1.0, friction_vel_eps=sim.friction_vel_eps, dt=dt)

    o1 = jax.vmap(lambda s, t, p, o: physics_step(
        model, sim, s, t, p, terrain=None, extra_contact=extra,
        env_origin=o))(state, tau, params, origins)
    o2 = physics_step_soa(model, sim, state, tau, params, None,
                          world_boxes=boxes, env_origin=origins,
                          world_friction=1.0)

    # the wall must actually be touched (force magnitudes are meaningful)
    rep = np.asarray(o2.contact_report)
    assert np.abs(rep[..., 1]).max() > 1.0, "no wall contact in fixture"

    def mostly_close(a, b, atol, frac=0.85):
        a, b = np.asarray(a), np.asarray(b)
        ok = np.abs(a - b) <= atol + 1e-3 * np.abs(b)
        assert ok.mean() >= frac, (ok.mean(), np.abs(a - b).max())

    mostly_close(o1.state.q, o2.state.q, 1e-3)
    mostly_close(o1.state.qd, o2.state.qd, 1e-2)
    mostly_close(o1.state.base_pos, o2.state.base_pos, 1e-3)
    mostly_close(o1.state.base_lin_vel, o2.state.base_lin_vel, 1e-2)


def test_sample_geom_terrain_hoisted_patch_matches(model):
    """The round-5 hoist: _sample_geom_terrain fed a precomputed
    (patch, ix0, iy0) — sampled once per env step with +8 cells of
    drift slack — must agree with its own per-call patch sampling."""
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.ops.contact import TerrainGrid, sample_patch
    from rapid_locomotion_rl_tpu.ops.limb_dynamics import layout_for
    from rapid_locomotion_rl_tpu.ops.soa_physics import (_sample_geom_terrain,
                                                         _v3)

    layout = layout_for(model)
    assert layout is not None
    rng = np.random.default_rng(11)
    h = rng.normal(0, 0.15, (96, 96)).astype(np.float32)
    grid = TerrainGrid(height=jnp.asarray(h), horizontal_scale=0.1,
                       border_size=2.0, static_friction=1.0,
                       dynamic_friction=1.0, restitution=0.0)
    n = 9
    state = batched_state(model, n, seed=4)
    # keep bases over the grid interior
    state = state._replace(base_pos=state.base_pos + jnp.asarray([3.0, 3.0, 0.0]))
    sim_cfg = config_mini_cheetah().sim
    base_pos = _v3(state.base_pos)
    base_quat = tuple(state.base_quat[:, i] for i in range(4))
    q = [state.q[:, j] for j in range(model.nv)]

    g_h1, g_n1 = _sample_geom_terrain(model, layout, sim_cfg, grid,
                                      base_pos, base_quat, q)
    patch3 = sample_patch(grid, base_pos[0], base_pos[1],
                          int(sim_cfg.terrain_patch_size) + 8)
    g_h2, g_n2 = _sample_geom_terrain(model, layout, sim_cfg, grid,
                                      base_pos, base_quat, q, patch3=patch3)
    for a, b in zip(g_h1, g_h2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    for na, nb in zip(g_n1, g_n2):
        for ca, cb in zip(na, nb):
            np.testing.assert_allclose(np.asarray(ca), np.asarray(cb),
                                       rtol=1e-5, atol=1e-6)
