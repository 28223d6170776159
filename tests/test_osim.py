"""Operational-space (apparent) inertia at contact points: the OSIM
recursion in ops/dynamics.contact_inv_inertia must match the brute-force
acceleration response of the ABA to unit test forces.

At zero velocity and zero gravity, the world acceleration of a point on
body b under a world force f applied at that point is exactly
Lam^-1 @ f — so each column of Lam^-1 is one ABA call."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu.models import load_urdf
from rapid_locomotion_rl_tpu.ops import quat as Q
from rapid_locomotion_rl_tpu.ops.contact import spatial_forces_on_bodies
from rapid_locomotion_rl_tpu.ops.dynamics import (SimState, aba,
                                                  contact_inv_inertia, fk,
                                                  geom_world_positions)

URDF = "resources/robots/mini_cheetah/urdf/mini_cheetah.urdf"


@pytest.fixture(scope="module")
def model():
    return load_urdf(URDF)


def _rand_state(model, key):
    kq, kr = jax.random.split(key)
    q = jax.random.uniform(kq, (model.nv,), minval=-0.8, maxval=0.8)
    quat = jax.random.normal(kr, (4,))
    quat = quat / jnp.linalg.norm(quat)
    return SimState(
        base_pos=jnp.asarray([0.0, 0.0, 0.5]),
        base_quat=quat,
        base_lin_vel=jnp.zeros(3), base_ang_vel=jnp.zeros(3),
        q=q, qd=jnp.zeros(model.nv))


def _brute_force_lam_inv(model, state, g):
    """3x3 response matrix of geom g's world point acceleration to unit
    world forces at that point."""
    frames = fk(model, state)
    geom_pos, _ = geom_world_positions(model, frames)
    R0 = Q.quat_to_rotmat(state.base_quat)
    cols = []
    for k in range(3):
        forces = jnp.zeros((model.ng, 3)).at[g, k].set(1.0)
        f_ext = spatial_forces_on_bodies(model, frames, geom_pos, forces)
        qdd, a0 = aba(model, state, jnp.zeros(model.nv), f_ext,
                      gravity=jnp.zeros(3), payload=jnp.asarray(0.0),
                      com_offset=jnp.zeros(3))
        # at zero velocity the point-velocity map applied to accelerations
        # IS the point acceleration (no quadratic terms)
        acc_state = state._replace(
            base_lin_vel=R0 @ a0[3:], base_ang_vel=R0 @ a0[:3], qd=qdd)
        acc_frames = fk(model, acc_state)
        _, gv = geom_world_positions(model, acc_frames)
        cols.append(gv[g])
    return jnp.stack(cols, axis=-1)


def test_osim_matches_aba_response(model):
    state = _rand_state(model, jax.random.PRNGKey(3))
    frames = fk(model, state)
    lam = contact_inv_inertia(model, state, frames,
                              payload=jnp.asarray(0.0),
                              com_offset=jnp.zeros(3), base_split=1.0)
    assert lam.shape == (model.ng, 3, 3)
    for g in [0, model.ng // 2, model.ng - 1]:
        brute = _brute_force_lam_inv(model, state, g)
        np.testing.assert_allclose(np.asarray(lam[g]), np.asarray(brute),
                                   rtol=2e-3, atol=1e-4)


def test_apparent_mass_positive_definite(model):
    """Lam^-1 must be symmetric positive definite at every geom (it is a
    congruence of the SPD articulated-inertia inverse)."""
    state = _rand_state(model, jax.random.PRNGKey(9))
    frames = fk(model, state)
    lam = contact_inv_inertia(model, state, frames,
                              payload=jnp.asarray(0.0),
                              com_offset=jnp.zeros(3), base_split=4.0)
    lam = np.asarray(lam)
    np.testing.assert_allclose(lam, np.swapaxes(lam, -1, -2),
                               rtol=1e-4, atol=1e-6)
    eig = np.linalg.eigvalsh(lam)
    assert np.all(eig > 0.0), eig.min()
