"""Physics-core validation against analytic mechanics (SURVEY.md §7 step 3):
free fall, pendulum period, energy conservation, momentum conservation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapid_locomotion_rl_tpu import RLTPU_ROOT_DIR
from rapid_locomotion_rl_tpu.config import SimCfg
from rapid_locomotion_rl_tpu.models import load_urdf
from rapid_locomotion_rl_tpu.ops.dynamics import PhysParams, SimState, fk
from rapid_locomotion_rl_tpu.ops.physics import default_sim_state, physics_step

MC_URDF = f"{RLTPU_ROOT_DIR}/resources/robots/mini_cheetah/urdf/mini_cheetah.urdf"

PENDULUM_URDF = """<?xml version="1.0"?>
<robot name="pendulum">
  <link name="base">
    <inertial><mass value="10"/><origin xyz="0 0 0"/>
      <inertia ixx="1" ixy="0" ixz="0" iyy="1" iyz="0" izz="1"/></inertial>
  </link>
  <joint name="hinge" type="revolute">
    <origin xyz="0 0 0" rpy="0 0 0"/>
    <parent link="base"/><child link="rod"/>
    <axis xyz="0 1 0"/>
    <limit lower="-10" upper="10" effort="100" velocity="100"/>
  </joint>
  <link name="rod">
    <inertial><mass value="1"/><origin xyz="0 0 -0.5"/>
      <inertia ixx="0.08333333" ixy="0" ixz="0" iyy="0.08333333" iyz="0" izz="0.0001"/></inertial>
  </link>
</robot>
"""

DOUBLE_PENDULUM_URDF = """<?xml version="1.0"?>
<robot name="dpend">
  <link name="base">
    <inertial><mass value="10"/><origin xyz="0 0 0"/>
      <inertia ixx="1" ixy="0" ixz="0" iyy="1" iyz="0" izz="1"/></inertial>
  </link>
  <joint name="j1" type="revolute">
    <origin xyz="0 0 0" rpy="0 0 0"/>
    <parent link="base"/><child link="l1"/>
    <axis xyz="0 1 0"/>
    <limit lower="-100" upper="100" effort="100" velocity="100"/>
  </joint>
  <link name="l1">
    <inertial><mass value="1"/><origin xyz="0 0 -0.5"/>
      <inertia ixx="0.08333333" ixy="0" ixz="0" iyy="0.08333333" iyz="0" izz="0.0001"/></inertial>
  </link>
  <joint name="j2" type="revolute">
    <origin xyz="0 0 -1.0" rpy="0 0 0"/>
    <parent link="l1"/><child link="l2"/>
    <axis xyz="0 1 0"/>
    <limit lower="-100" upper="100" effort="100" velocity="100"/>
  </joint>
  <link name="l2">
    <inertial><mass value="1"/><origin xyz="0 0 -0.5"/>
      <inertia ixx="0.08333333" ixy="0" ixz="0" iyy="0.08333333" iyz="0" izz="0.0001"/></inertial>
  </link>
</robot>
"""


def _params():
    return PhysParams(
        friction=jnp.asarray(1.0), restitution=jnp.asarray(0.0),
        payload=jnp.asarray(0.0), com_displacement=jnp.zeros(3))


def _load(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return load_urdf(str(p))


def _roll(model, sim, state, steps, fixed_base, tau=None, terrain=None):
    tau = tau if tau is not None else jnp.zeros(model.nv)

    def body(s, _):
        out = physics_step(model, sim, s, tau, _params(), terrain,
                           fixed_base=fixed_base)
        return out.state, s

    final, traj = jax.lax.scan(body, state, None, length=steps)
    return final, traj


def total_energy(model, state, g=9.81):
    frames = fk(model, state)
    E = 0.0
    for i in range(model.nb):
        m = float(model.mass[i])
        if m == 0:
            continue
        com_w = frames.p[i] + frames.R[i] @ jnp.asarray(model.com[i], jnp.float32)
        # com velocity = v_origin + w x (com - origin)
        v_com = frames.v[i] + jnp.cross(frames.w[i], com_w - frames.p[i])
        I_w = frames.R[i] @ jnp.asarray(model.inertia[i], jnp.float32) @ frames.R[i].T
        E += 0.5 * m * jnp.dot(v_com, v_com)
        E += 0.5 * jnp.dot(frames.w[i], I_w @ frames.w[i])
        E += m * g * com_w[2]
    return float(E)


def test_free_fall(tmp_path):
    model = _load(tmp_path, "p.urdf", PENDULUM_URDF)
    sim = SimCfg(dt=0.005)
    state = default_sim_state(model, [0, 0, 100.0], [0, 0, 0, 1], jnp.zeros(1))
    steps = 100  # 0.5 s
    final, _ = _roll(model, sim, state, steps, fixed_base=False)
    t = steps * sim.dt
    np.testing.assert_allclose(float(final.base_lin_vel[2]), -9.81 * t, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(final.base_ang_vel), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(final.q[0]), 0.0, atol=1e-4)


def test_pendulum_period(tmp_path):
    model = _load(tmp_path, "p.urdf", PENDULUM_URDF)
    sim = SimCfg(dt=0.001)
    # small oscillation: T = 2*pi*sqrt(I_joint/(m g d)), I_joint = 1/12 + 1/4
    state = default_sim_state(model, [0, 0, 2.0], [0, 0, 0, 1],
                              jnp.asarray([0.05]))
    steps = 4000
    _, traj = _roll(model, sim, state, steps, fixed_base=True)
    qs = np.asarray(traj.q[:, 0])
    # measure period via zero crossings (downward)
    sign = np.sign(qs)
    crossings = np.where((sign[:-1] > 0) & (sign[1:] <= 0))[0]
    assert len(crossings) >= 2
    period = np.diff(crossings).mean() * sim.dt
    expected = 2 * np.pi * np.sqrt((1 / 12 + 0.25) / (9.81 * 0.5))
    np.testing.assert_allclose(period, expected, rtol=0.02)


def test_double_pendulum_energy(tmp_path):
    model = _load(tmp_path, "dp.urdf", DOUBLE_PENDULUM_URDF)
    sim = SimCfg(dt=0.0005)
    state = default_sim_state(model, [0, 0, 3.0], [0, 0, 0, 1],
                              jnp.asarray([1.2, 0.3]))
    e0 = total_energy(model, state)
    final, _ = _roll(model, sim, state, 4000, fixed_base=True)  # 2 s chaotic
    e1 = total_energy(model, final)
    # semi-implicit Euler: bounded energy error
    assert abs(e1 - e0) < 0.05 * abs(e0) + 0.05, (e0, e1)


def test_tumbling_momentum(tmp_path):
    model = _load(tmp_path, "p.urdf", PENDULUM_URDF)
    sim = SimCfg(dt=0.001, gravity=[0.0, 0.0, 0.0])
    state = SimState(
        base_pos=jnp.asarray([0.0, 0.0, 5.0]),
        base_quat=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.zeros(3),
        base_ang_vel=jnp.asarray([3.0, 0.5, 1.0]),
        q=jnp.zeros(1), qd=jnp.zeros(1))

    def ang_momentum(st):
        frames = fk(model, st)
        L = jnp.zeros(3)
        # about a fixed world point (origin)
        for i in range(model.nb):
            m = float(model.mass[i])
            com_w = frames.p[i] + frames.R[i] @ jnp.asarray(model.com[i], jnp.float32)
            v_com = frames.v[i] + jnp.cross(frames.w[i], com_w - frames.p[i])
            I_w = frames.R[i] @ jnp.asarray(model.inertia[i], jnp.float32) @ frames.R[i].T
            L = L + m * jnp.cross(com_w, v_com) + I_w @ frames.w[i]
        return np.asarray(L)

    L0 = ang_momentum(state)
    final, _ = _roll(model, sim, state, 1000, fixed_base=False)
    L1 = ang_momentum(final)
    np.testing.assert_allclose(L1, L0, rtol=0.02, atol=1e-3)


@pytest.mark.parametrize("dt", [0.005])
def test_mini_cheetah_standing(dt):
    """PD to default pose on flat ground: robot settles upright at a
    plausible height — the make-or-break stability check."""
    model = load_urdf(MC_URDF)
    sim = SimCfg(dt=dt)
    default_q = jnp.asarray(
        [-0.1, -0.8, 1.62, 0.1, -0.8, 1.62, -0.1, -0.8, 1.62, 0.1, -0.8, 1.62])
    # match joint order FR,FL,RR,RL x (hip,thigh,calf)
    angles = {"FR_hip_joint": -0.1, "FL_hip_joint": 0.1, "RR_hip_joint": -0.1,
              "RL_hip_joint": 0.1}
    q0 = []
    for name in model.joint_names:
        if "hip" in name:
            q0.append(angles[name])
        elif "thigh" in name:
            q0.append(-0.8)
        else:
            q0.append(1.62)
    q0 = jnp.asarray(q0)
    state = default_sim_state(model, [0, 0, 0.32], [0, 0, 0, 1], q0)

    kp, kd = 20.0, 0.5

    def body(s, _):
        tau = kp * (q0 - s.q) - kd * s.qd
        tau = jnp.clip(tau, -jnp.asarray(model.dof_effort, jnp.float32),
                       jnp.asarray(model.dof_effort, jnp.float32))
        out = physics_step(model, sim, s, tau, _params(), None)
        return out.state, out.state.base_pos[2]

    final, heights = jax.lax.scan(body, state, None, length=int(2.0 / dt))
    h = np.asarray(heights)
    assert np.all(np.isfinite(np.asarray(final.q)))
    # settles: last 100 steps height variation small, robot upright
    assert h[-100:].std() < 0.01, h[-100:].std()
    assert 0.2 < h[-1] < 0.4, h[-1]
    up = np.asarray(jax.device_get(final.base_quat))
    # quat close to identity (upright): |z of body z-axis| ~ 1
    from rapid_locomotion_rl_tpu.ops import quat as Q
    bz = Q.quat_rotate(jnp.asarray(up), jnp.array([0.0, 0.0, 1.0]))
    assert float(bz[2]) > 0.95
    # joints near the PD target (gravity sag under the soft Kp=20 gains)
    # with true stiction, feet stay where they land: the settled pose can
    # deviate from the PD target by the friction-held splay (the cone-
    # projected creep decays to zero; see round-2 contact redesign)
    np.testing.assert_allclose(np.asarray(final.q), np.asarray(q0), atol=0.5)


def test_mini_cheetah_drop():
    """Drop from 0.5 m: lands without NaN/explosion."""
    model = load_urdf(MC_URDF)
    sim = SimCfg(dt=0.005)
    q0 = jnp.asarray([(-0.1 if n.startswith(("FR", "RR")) else 0.1) if "hip" in n
                      else (-0.8 if "thigh" in n else 1.62)
                      for n in model.joint_names])
    state = default_sim_state(model, [0, 0, 0.5], [0, 0, 0, 1], q0)

    def body(s, _):
        tau = 20.0 * (q0 - s.q) - 0.5 * s.qd
        out = physics_step(model, sim, s, tau, _params(), None)
        return out.state, out.state.base_pos[2]

    final, hs = jax.lax.scan(body, state, None, length=400)
    assert np.all(np.isfinite(np.asarray(final.base_pos)))
    assert np.all(np.isfinite(np.asarray(final.qd)))
    assert 0.1 < float(final.base_pos[2]) < 0.45
    assert float(jnp.abs(final.qd).max()) < 5.0
