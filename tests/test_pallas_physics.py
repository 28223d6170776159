"""Pallas fused-substep kernel vs the SoA XLA chain.

Both paths trace the SAME substep_chain (ops/soa_physics.py), so on CPU
(interpret mode) they must agree to float-roundoff — this gates the
channel pack/unpack, padding, and grid/block plumbing, not the physics
itself (that is tests/test_soa_physics.py's job)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu import RLTPU_ROOT_DIR
from rapid_locomotion_rl_tpu.config import SimCfg, TerrainCfg
from rapid_locomotion_rl_tpu.models import load_urdf
from rapid_locomotion_rl_tpu.ops.dynamics import PhysParams, SimState
from rapid_locomotion_rl_tpu.ops.pallas_physics import physics_step_pallas
from rapid_locomotion_rl_tpu.ops.soa_physics import physics_step_soa

MC = f"{RLTPU_ROOT_DIR}/resources/robots/mini_cheetah/urdf/mini_cheetah.urdf"

# 2-limb hopper: the smallest limb-decomposable tree (nb=3, nv=2, ng=3) —
# the chain is identical code to the full robot, so this exercises every
# channel group (state/tau/params/imp/terrain) in seconds where the
# MC-model eager comparison takes ~15 min
TINY = """<robot name="tiny">
  <link name="base">
    <inertial><mass value="2.0"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.02" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><geometry><sphere radius="0.05"/></geometry></collision>
  </link>
  <joint name="hipL" type="revolute">
    <parent link="base"/><child link="legL"/>
    <origin xyz="0.1 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-2" upper="2" effort="20" velocity="20"/>
  </joint>
  <link name="legL">
    <inertial><mass value="0.3"/>
      <origin xyz="0 0 -0.08"/>
      <inertia ixx="0.001" iyy="0.001" izz="0.0002" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><origin xyz="0 0 -0.15"/>
      <geometry><sphere radius="0.02"/></geometry></collision>
  </link>
  <joint name="hipR" type="revolute">
    <parent link="base"/><child link="legR"/>
    <origin xyz="-0.1 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-2" upper="2" effort="20" velocity="20"/>
  </joint>
  <link name="legR">
    <inertial><mass value="0.3"/>
      <origin xyz="0 0 -0.08"/>
      <inertia ixx="0.001" iyy="0.001" izz="0.0002" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><origin xyz="0 0 -0.15"/>
      <geometry><sphere radius="0.02"/></geometry></collision>
  </link>
</robot>"""


@pytest.fixture(scope="module")
def model():
    return load_urdf(MC)


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    p = tmp_path_factory.mktemp("tiny") / "tiny.urdf"
    p.write_text(TINY)
    return load_urdf(str(p))


def _state(model, n, seed=0):
    rng = np.random.default_rng(seed)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    return SimState(
        base_pos=jnp.asarray(
            np.concatenate([rng.uniform(-1, 1, (n, 2)),
                            rng.uniform(0.25, 0.4, (n, 1))], -1),
            jnp.float32),
        base_quat=jnp.asarray(quat),
        base_lin_vel=jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
        base_ang_vel=jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32),
        q=jnp.asarray(rng.uniform(-0.6, 0.6, (n, model.nv)), jnp.float32),
        qd=jnp.asarray(rng.uniform(-3, 3, (n, model.nv)), jnp.float32))


def _params(n, seed=1):
    rng = np.random.default_rng(seed)
    return PhysParams(
        friction=jnp.asarray(rng.uniform(0.3, 2.0, n), jnp.float32),
        restitution=jnp.asarray(rng.uniform(0.0, 0.4, n), jnp.float32),
        payload=jnp.asarray(rng.uniform(-0.5, 2.0, n), jnp.float32),
        com_displacement=jnp.asarray(
            rng.uniform(-0.05, 0.05, (n, 3)), jnp.float32))


def _flat_grid():
    from rapid_locomotion_rl_tpu.ops.contact import TerrainGrid
    h = np.zeros((48, 48), np.float32)
    h[24:, :] = 0.08      # a step so normals/heights are non-trivial
    return TerrainGrid(height=jnp.asarray(h), horizontal_scale=0.1,
                       border_size=2.0, static_friction=1.0,
                       dynamic_friction=1.0, restitution=0.0)


@pytest.mark.parametrize("with_terrain,with_imp", [
    (False, False),
    (True, True),
])
def test_pallas_matches_soa_tiny(tiny_model, with_terrain, with_imp):
    _parity_case(tiny_model, with_terrain, with_imp)


def test_round_sublanes():
    """Mosaic f32 blocks must tile (8, 128): any requested sublane count
    rounds UP to a multiple of 8 (sublanes=4 at 8192 envs failed to lower
    in round 4 — bench_r04_self.log)."""
    from rapid_locomotion_rl_tpu.ops.pallas_physics import round_sublanes
    assert round_sublanes(4) == 8
    assert round_sublanes(1) == 8
    assert round_sublanes(8) == 8
    assert round_sublanes(12) == 16
    assert round_sublanes(16) == 16


def test_pallas_odd_sublanes_and_env_counts(tiny_model):
    """A user-picked (num_envs, block_sublanes) combination must never
    hard-fail: sublanes=4 rounds to 8 and odd env counts edge-pad."""
    _parity_case(tiny_model, False, False, n=77, block_sublanes=4)


def test_pallas_world_boxes(tiny_model):
    """World obstacle boxes ride through the Pallas kernel (origin
    channels + in-chain box forces) identically to the SoA path."""
    _parity_case(tiny_model, False, False, with_world=True)


@pytest.mark.slow
def test_pallas_matches_soa_mc(model):
    """Full mini-cheetah model (42 geoms): ~15 min of eager execution —
    the tiny-model test covers the plumbing; this covers scale."""
    _parity_case(model, True, True)


def _parity_case(model, with_terrain, with_imp, n=200, block_sublanes=8,
                 with_world=False):
    # default n=200 is NOT a multiple of the env block: exercises padding
    sim = SimCfg()
    state = _state(model, n)
    params = _params(n)
    tau = jnp.asarray(np.random.default_rng(2).uniform(-3, 3, (n, model.nv)),
                      jnp.float32)
    imp = (jnp.asarray(np.random.default_rng(3).uniform(0.3, 3.0,
                                                        (n, model.nv)),
                       jnp.float32) if with_imp else None)
    grid = _flat_grid() if with_terrain else None
    wb, origins = None, None
    if with_world:
        from rapid_locomotion_rl_tpu.envs.world import default_corridor
        wb = default_corridor(1.2, 0.5, wall_height=1.0)
        origins = jnp.zeros((n, 3))

    # eager (no jit): the SoA chain takes minutes to COMPILE under LLVM
    # (CLAUDE.md) but runs fine op-by-op; interpret-mode pallas is eager too
    with jax.disable_jit():
        ref = physics_step_soa(model, sim, state, tau, params, grid,
                               implicit_damp=imp, world_boxes=wb,
                               env_origin=origins)
        out = physics_step_pallas(model, sim, state, tau, params, grid,
                                  implicit_damp=imp, interpret=True,
                                  block_sublanes=block_sublanes,
                                  world_boxes=wb, env_origin=origins)
    if with_world:
        # the 0.5 m-wide corridor must actually be hit by some sphere
        assert np.abs(np.asarray(ref.contact_report)[..., 1]).max() > 0.1

    for name in ("base_pos", "base_quat", "base_lin_vel", "base_ang_vel",
                 "q", "qd"):
        a = np.asarray(getattr(ref.state, name))
        b = np.asarray(getattr(out.state, name))
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(out.contact_report),
                               np.asarray(ref.contact_report),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.geom_pos),
                               np.asarray(ref.geom_pos),
                               rtol=1e-5, atol=1e-5)
