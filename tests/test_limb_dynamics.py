"""Limb-batched ABA/FK equivalence against the generic tree implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu import RLTPU_ROOT_DIR
from rapid_locomotion_rl_tpu.models import load_urdf
from rapid_locomotion_rl_tpu.ops import dynamics as D
from rapid_locomotion_rl_tpu.ops import limb_dynamics as L

MC = f"{RLTPU_ROOT_DIR}/resources/robots/mini_cheetah/urdf/mini_cheetah.urdf"
GO1 = f"{RLTPU_ROOT_DIR}/resources/robots/go1/urdf/go1.urdf"


@pytest.fixture(scope="module", params=[MC, GO1])
def model(request):
    return load_urdf(request.param)


def rand_state(model, seed):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-1.0, 1.5, model.nv).astype(np.float32)
    quat = rng.normal(size=4).astype(np.float32)
    quat /= np.linalg.norm(quat)
    return D.SimState(
        base_pos=jnp.asarray(rng.normal(size=3), jnp.float32),
        base_quat=jnp.asarray(quat),
        base_lin_vel=jnp.asarray(rng.normal(size=3), jnp.float32),
        base_ang_vel=jnp.asarray(rng.normal(size=3), jnp.float32),
        q=jnp.asarray(q),
        qd=jnp.asarray(rng.uniform(-5, 5, model.nv), jnp.float32))


def test_layout_detected(model):
    lay = L.detect_limbs(model)
    assert lay is not None
    assert lay.K == 4 and lay.D == 3
    # every leg chain is hip -> thigh -> calf
    for k in range(4):
        names = [model.body_names[int(lay.body_index[d, k])]
                 for d in range(3)]
        assert "hip" in names[0] and "thigh" in names[1] and "calf" in names[2]


def test_fk_equivalence(model):
    lay = L.detect_limbs(model)
    for seed in range(3):
        s = rand_state(model, seed)
        f1 = D.fk(model, s)
        f2 = L.fk_limb(model, lay, s)
        np.testing.assert_allclose(np.asarray(f1.p), np.asarray(f2.p),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(f1.R), np.asarray(f2.R),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(f1.w), np.asarray(f2.w),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(f1.v), np.asarray(f2.v),
                                   atol=1e-4)


def test_aba_equivalence(model):
    lay = L.detect_limbs(model)
    g = jnp.asarray([0.0, 0.0, -9.81])
    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        s = rand_state(model, seed)
        tau = jnp.asarray(rng.uniform(-10, 10, model.nv), jnp.float32)
        f_ext = jnp.asarray(rng.normal(size=(model.nb, 6)) * 5.0,
                            jnp.float32)
        payload = jnp.asarray(rng.uniform(0, 2), jnp.float32)
        com = jnp.asarray(rng.uniform(-0.05, 0.05, 3), jnp.float32)
        qdd1, a01 = D.aba(model, s, tau, f_ext, g, payload, com)
        qdd2, a02 = L.aba_limb(model, lay, s, tau, f_ext, g, payload, com)
        np.testing.assert_allclose(np.asarray(qdd1), np.asarray(qdd2),
                                   rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(a01), np.asarray(a02),
                                   rtol=2e-3, atol=2e-2)


def test_aba_equivalence_fixed_base(model):
    lay = L.detect_limbs(model)
    g = jnp.asarray([0.0, 0.0, -9.81])
    s = rand_state(model, 7)
    tau = jnp.zeros(model.nv)
    qdd1, a01 = D.aba(model, s, tau, None, g, jnp.asarray(0.0),
                      jnp.zeros(3), fixed_base=True)
    qdd2, a02 = L.aba_limb(model, lay, s, tau, None, g, jnp.asarray(0.0),
                           jnp.zeros(3), fixed_base=True)
    np.testing.assert_allclose(np.asarray(qdd1), np.asarray(qdd2),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(a01), np.asarray(a02), atol=1e-5)
