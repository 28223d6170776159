"""Round-3 contact features: torsional friction (contact patch) and the
slope-threshold wall correction of the collision grid.

- Torsion: a point contact must resist spin about the contact normal
  (spin-stiction clamped to the torsion cone mu*f_n*patch_radius) — without
  it yaw spin is frictionally free on sphere feet, the round-2 spin-circle
  curriculum exploit (EXPERIMENTS.md §10).
- Walls: the reference uploads a slope-corrected trimesh where faces steeper
  than slope_treshold become vertical (mini_gym/utils/terrain.py:36-40);
  colliding the raw bilinear grid turns stair risers into ramps.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu import RLTPU_ROOT_DIR
from rapid_locomotion_rl_tpu.config import SimCfg, TerrainCfg
from rapid_locomotion_rl_tpu.models import load_urdf
from rapid_locomotion_rl_tpu.ops.contact import contact_forces_implicit
from rapid_locomotion_rl_tpu.ops.dynamics import PhysParams, SimState
from rapid_locomotion_rl_tpu.ops.physics import physics_step
from rapid_locomotion_rl_tpu.ops.soa_physics import physics_step_soa

MC = f"{RLTPU_ROOT_DIR}/resources/robots/mini_cheetah/urdf/mini_cheetah.urdf"


@pytest.fixture(scope="module")
def model():
    return load_urdf(MC)


# ---------------------------------------------------------------------------
# torsional friction unit semantics
# ---------------------------------------------------------------------------
def _single_contact_inputs(model):
    ng = model.ng
    n = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (ng, 1))
    h = jnp.zeros(ng)
    r = jnp.asarray(model.geom_radius, jnp.float32)
    # every geom 1 mm into the ground, at rest, zero free acceleration
    pos = jnp.stack([jnp.zeros(ng), jnp.zeros(ng), r - 1e-3], -1)
    vel = jnp.zeros((ng, 3))
    acc = jnp.zeros((ng, 3))
    lam_inv = jnp.tile(jnp.eye(3) * 2.0, (ng, 1, 1))   # 0.5 kg apparent
    ang_inv = jnp.tile(jnp.eye(3) * 100.0, (ng, 1, 1))  # 0.01 kg m^2
    return pos, vel, acc, lam_inv, ang_inv, (h, n)


def test_torsion_opposes_spin(model):
    pos, vel, acc, lam_inv, ang_inv, hn = _single_contact_inputs(model)
    omega = jnp.tile(jnp.asarray([0.0, 0.0, 3.0]), (model.ng, 1))
    kw = dict(erp=0.2, max_depenetration_velocity=1.0,
              bounce_threshold_velocity=0.5, dt=0.0025,
              terrain_friction=1.0)
    f, rep, tq = contact_forces_implicit(
        model, pos, vel, acc, lam_inv,
        jnp.asarray(1.0), jnp.asarray(0.0), hn,
        geom_omega=omega, ang_inv=ang_inv,
        torsional_patch_radius=0.01, **kw)
    f, tq = np.asarray(f), np.asarray(tq)
    f_n = f[:, 2]
    assert (f_n > 0).all()                     # in contact, pushing up
    # torque opposes spin, clamped to the cone mu*f_n*a
    assert (tq[:, 2] < 0).all()
    np.testing.assert_allclose(-tq[:, 2], 1.0 * f_n * 0.01, rtol=1e-4)

    # sub-cone spin (tiny omega): stiction torque = I_eff * w / dt exactly
    omega_small = omega * 1e-4
    _, _, tq2 = contact_forces_implicit(
        model, pos, vel, acc, lam_inv,
        jnp.asarray(1.0), jnp.asarray(0.0), hn,
        geom_omega=omega_small, ang_inv=ang_inv,
        torsional_patch_radius=0.01, **kw)
    tq2 = np.asarray(tq2)
    # ang_inv split by 1 active contact per body... bodies with several
    # geoms split; just check direction & rough magnitude on single-geom rows
    assert (tq2[:, 2] < 0).all()

    # patch radius 0 -> no torsion
    _, _, tq0 = contact_forces_implicit(
        model, pos, vel, acc, lam_inv,
        jnp.asarray(1.0), jnp.asarray(0.0), hn,
        geom_omega=omega, ang_inv=ang_inv,
        torsional_patch_radius=0.0, **kw)
    assert np.allclose(np.asarray(tq0), 0.0)


def _standing_state(model, n, wz):
    default_q = np.array([0.1, -0.8, 1.62] * 0 + [0.0] * 0)  # placeholder
    q = {"FR_hip_joint": -0.1, "FR_thigh_joint": -0.8, "FR_calf_joint": 1.62,
         "FL_hip_joint": 0.1, "FL_thigh_joint": -0.8, "FL_calf_joint": 1.62,
         "RR_hip_joint": -0.1, "RR_thigh_joint": -0.8, "RR_calf_joint": 1.62,
         "RL_hip_joint": 0.1, "RL_thigh_joint": -0.8, "RL_calf_joint": 1.62}
    qv = np.array([q[j] for j in model.joint_names], np.float32)
    return SimState(
        base_pos=jnp.tile(jnp.asarray([0.0, 0.0, 0.298]), (n, 1)),
        base_quat=jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n, 1)),
        base_lin_vel=jnp.zeros((n, 3)),
        base_ang_vel=jnp.tile(jnp.asarray([0.0, 0.0, wz]), (n, 1)),
        q=jnp.tile(jnp.asarray(qv), (n, 1)),
        qd=jnp.zeros((n, 12)))


@pytest.mark.parametrize("impl", [
    "aos",
    # the SoA variant compiles for ~10 min under LLVM (CLAUDE.md: SoA is
    # a TPU fast path; CPU compiles of it are minutes per config)
    pytest.param("soa", marks=pytest.mark.slow),
])
def test_spin_decays_faster_with_torsion(model, impl):
    """A standing robot given a yaw spin must shed it faster with the
    contact patch than with point contacts."""
    n = 2
    params = PhysParams(friction=jnp.full(n, 1.0),
                        restitution=jnp.zeros(n),
                        payload=jnp.zeros(n),
                        com_displacement=jnp.zeros((n, 3)))
    tau = jnp.zeros((n, 12))

    def run(patch):
        sim_cfg = SimCfg(torsional_patch_radius=patch)
        if impl == "aos":
            step = jax.jit(jax.vmap(functools.partial(
                physics_step, model, sim_cfg, terrain=None)))
        else:
            step = jax.jit(functools.partial(
                physics_step_soa, model, sim_cfg, terrain=None))
        s = _standing_state(model, n, wz=3.0)
        for _ in range(40):     # 0.2 s
            s = step(s, tau, params).state
        return float(np.asarray(s.base_ang_vel)[:, 2].mean())

    wz_no = run(0.0)
    wz_patch = run(0.015)
    assert wz_patch < wz_no - 0.05, (wz_no, wz_patch)


# ---------------------------------------------------------------------------
# implicit-PD impedance parity between AoS (limb-batched legacy) and SoA
# (ADVICE round-2: aba_limb silently dropped joint_impedance)
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_soa_matches_aos_with_impedance(model):
    from tests.test_soa_physics import batched_state, rand_params
    n = 8
    sim = SimCfg(contact_model="legacy")
    state = batched_state(model, n, 3, airborne=True)
    params = rand_params(n, 3)
    tau = jnp.asarray(np.random.default_rng(4).uniform(-3, 3, (n, 12)),
                      jnp.float32)
    imp = jnp.tile(jnp.asarray(
        np.random.default_rng(5).uniform(0.3, 3.0, 12), jnp.float32), (n, 1))

    aos = jax.jit(jax.vmap(lambda s, t, p, i: physics_step(
        model, sim, s, t, p, terrain=None, implicit_damp=i)))
    soa = jax.jit(lambda s, t, p, i: physics_step_soa(
        model, sim, s, t, p, terrain=None, implicit_damp=i))
    o1 = aos(state, tau, params, imp)
    o2 = soa(state, tau, params, imp)
    a, b = np.asarray(o1.state.qd), np.asarray(o2.state.qd)
    ok = np.abs(a - b) <= 1e-2 + 1e-3 * np.abs(b)
    assert ok.mean() >= 0.9, (ok.mean(), np.abs(a - b).max())


# ---------------------------------------------------------------------------
# stair risers are walls on the collision grid
# ---------------------------------------------------------------------------
def test_collision_grid_stair_walls():
    from rapid_locomotion_rl_tpu.envs.terrain import Terrain
    from rapid_locomotion_rl_tpu.ops.contact import terrain_height_bilinear

    cfg = TerrainCfg()
    cfg.mesh_type = "trimesh"
    cfg.curriculum = False
    cfg.selected = True
    cfg.terrain_kwargs = {"type": "pyramid_stairs_terrain",
                          "step_width": 0.31, "step_height": 0.18,
                          "platform_size": 1.0}
    cfg.num_rows = 1
    cfg.num_cols = 1
    cfg.border_size = 1.0
    cfg.collision_upsample = 4
    terr = Terrain(cfg, 1, seed=0)
    raw = terr.as_grid(1.0, 1.0, 0.0)
    cor = terr.as_collision_grid(1.0, 1.0, 0.0, upsample=4,
                                 slope_threshold=0.75)

    hf = np.asarray(raw.height)
    # find a riser along x in the middle of the map
    mid = hf.shape[1] // 2
    col = hf[:, mid]
    steps = np.where(np.abs(np.diff(col)) > 0.1)[0]
    assert steps.size > 0, "no stairs found"
    i = int(steps[steps.size // 2])
    lo, hi = sorted((col[i], col[i + 1]))
    hs = cfg.horizontal_scale
    # query 0.4 cells into the steep cell from the LOW side
    low_side = i if col[i] < col[i + 1] else i + 1
    xq = (i + (0.4 if low_side == i else 0.6)) * hs - cfg.border_size
    yq = mid * hs - cfg.border_size
    h_raw = float(terrain_height_bilinear(raw, jnp.asarray(xq),
                                          jnp.asarray(yq)))
    h_cor = float(terrain_height_bilinear(cor, jnp.asarray(xq),
                                          jnp.asarray(yq)))
    # raw grid ramps ~40% up the riser; corrected stays on the low tread
    assert h_raw > lo + 0.3 * (hi - lo), (h_raw, lo, hi)
    assert h_cor < lo + 0.05 * (hi - lo) + 1e-6, (h_cor, lo, hi)
