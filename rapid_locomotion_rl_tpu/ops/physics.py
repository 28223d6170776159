"""One physics substep: FK -> contact -> ABA -> semi-implicit integration.

This is the TPU equivalent of one ``gym.simulate`` call in the reference's
decimation loop (legged_robot.py:116-126). The env layer vmaps
:func:`physics_step` over the env axis and `lax.scan`s it over decimation —
the whole thing fuses into the single jitted train step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .contact import (TerrainGrid, _report_onehot, contact_forces,
                      contact_forces_implicit, sample_terrain,
                      spatial_forces_on_bodies)
from .dynamics import (PhysParams, SimState, aba, articulated_sweeps, fk,
                       geom_world_positions, integrate, joint_limit_torque,
                       osim_from_sweeps, point_accels)


class StepOutput(NamedTuple):
    state: SimState
    contact_report: jnp.ndarray   # [nr,3] world net contact force per report body
    geom_pos: jnp.ndarray         # [ng,3] world sphere centers (pre-step)


def physics_step(
    model,
    sim_cfg,                      # config.SimCfg (static)
    state: SimState,
    tau: jnp.ndarray,             # [nv] actuation torque (already limited)
    params: PhysParams,
    terrain: Optional[TerrainGrid],
    fixed_base: bool = False,
    implicit_damp: Optional[jnp.ndarray] = None,   # [nv] dt-free Kd_eff
    extra_contact=None,           # (origin, pos, vel, m_eff, dt) -> [ng,3]
    env_origin: Optional[jnp.ndarray] = None,      # [3] for extra_contact
) -> StepOutput:
    """Advance a single robot by ``sim_cfg.dt`` total, using
    ``sim_cfg.num_substeps`` inner integration steps with the applied torque
    held constant (vmap over envs outside)."""
    gravity = jnp.asarray(sim_cfg.gravity, jnp.float32)
    nsub = max(int(sim_cfg.num_substeps), 1)
    dt = sim_cfg.dt / nsub

    contact_model = getattr(sim_cfg, "contact_model", "apparent")

    # quadruped fast path: limb-batched FK/ABA (~K-fold fewer tensor ops)
    layout = None
    if getattr(sim_cfg, "use_limb_batching", True) \
            and contact_model != "apparent":
        from .limb_dynamics import aba_limb, fk_limb, layout_for
        layout = layout_for(model)
    if layout is not None:
        fk_fn = lambda m, s: fk_limb(m, layout, s)          # noqa: E731
        aba_fn = lambda *a, **k: aba_limb(model, layout, *a[1:], **k)  # noqa: E731
    else:
        fk_fn, aba_fn = fk, aba

    # implicit PD integration: the drive's dependence on the end-of-step
    # state enters the joint-space diagonal as dt*(Kd_eff + dt*Kp_eff)
    # (the caller passes Kd_eff + dt*Kp_eff; we scale by this substep's dt)
    joint_imp = None if implicit_damp is None else dt * implicit_damp

    terrain_mu = terrain.static_friction if terrain is not None else 1.0
    report = None
    geom_pos0 = None
    terrain_hn = None
    lam_inv = None
    for _ in range(nsub):
        frames = fk_fn(model, state)
        geom_pos, geom_vel = geom_world_positions(model, frames)
        if geom_pos0 is None:
            geom_pos0 = geom_pos
            # terrain gathers are the expensive primitive: sample height +
            # normal once per 5 ms control substep (xy drift ≪ grid cell)
            terrain_hn = sample_terrain(model, terrain, geom_pos)

        # passive joint terms: viscous damping, limit springs
        tau_total = (
            tau
            - jnp.asarray(model.dof_damping, jnp.float32) * state.qd
            - sim_cfg.joint_friction * jnp.tanh(state.qd / 0.1)
            + joint_limit_torque(model, state.q, state.qd)
        )

        # world obstacles (walls/boxes — envs/world.py, reference
        # mini_gym/envs/world/world.py:14-121): penalty forces on the same
        # collision spheres, applied at the sphere centers
        f_world = None
        if extra_contact is not None:
            m_eff = jnp.asarray(model.mass[model.geom_body], jnp.float32)
            f_world = extra_contact(env_origin, geom_pos, geom_vel,
                                    m_eff, dt)

        if contact_model == "apparent":
            # round-2 solver: free dynamics -> implicit contact against the
            # true articulated point response -> final dynamics.
            # The constraint acts at the CONTACT POINT on the sphere
            # surface, not the center: a stance foot pivoting about its
            # contact has v_contact = 0 while the center moves — friction
            # on the center velocity fights the pivot and makes walking
            # impossible (measured via scripts/sim2sim.py).
            gb = model.geom_body
            radius = jnp.asarray(model.geom_radius, jnp.float32)
            n_w = terrain_hn[1]
            p_c = geom_pos - n_w * radius[:, None]
            arm_w = p_c - frames.p[gb]
            v_c = geom_vel + jnp.cross(frames.w[gb], p_c - geom_pos)
            # ONE articulated-inertia sweep shared by the OSIM projection,
            # the free pass and the final pass
            sweeps, solve = articulated_sweeps(
                model, state, gravity, params.payload,
                params.com_displacement, fixed_base=fixed_base,
                joint_impedance=joint_imp)
            c_iters = int(getattr(sim_cfg, "contact_iterations", 1))
            phi0_w = None
            if lam_inv is None:   # q drifts ~nothing within one control step
                import numpy as _np
                n_limbs = float(max(
                    int(_np.sum(_np.asarray(model.parent) == 0)), 1))
                base_split = (float(getattr(sim_cfg, "contact_base_split",
                                            0.0)) or n_limbs)
                if c_iters > 1:
                    # iterated solve: true (unsplit) local response + the
                    # base mobility for explicit cross-contact coupling
                    lam_inv, ang_inv, phi0_w = osim_from_sweeps(
                        model, sweeps, frames, arm_w,
                        fixed_base=fixed_base, base_split=1.0,
                        return_ang=True, return_base=True)
                else:
                    lam_inv, ang_inv = osim_from_sweeps(
                        model, sweeps, frames, arm_w,
                        fixed_base=fixed_base, base_split=base_split,
                        return_ang=True)
            qdd_f, a0_f, a_body = solve(tau_total, None,
                                        return_body_accels=True)
            a_pt = point_accels(model, frames, a_body, arm_w=arm_w)
            forces, report, ctorques = contact_forces_implicit(
                model, geom_pos, v_c, a_pt, lam_inv,
                params.friction, params.restitution, terrain_hn,
                erp=sim_cfg.erp,
                max_depenetration_velocity=sim_cfg.max_depenetration_velocity,
                bounce_threshold_velocity=sim_cfg.bounce_threshold_velocity,
                dt=dt, terrain_friction=terrain_mu,
                geom_omega=frames.w[gb], ang_inv=ang_inv,
                torsional_patch_radius=getattr(
                    sim_cfg, "torsional_patch_radius", 0.0),
                iterations=c_iters, phi0_w=phi0_w,
                arm_base=(p_c - frames.p[0]) if c_iters > 1 else None)
            f_ext = spatial_forces_on_bodies(model, frames, p_c, forces,
                                             torques_w=ctorques)
            if f_world is not None:
                f_ext = f_ext + spatial_forces_on_bodies(
                    model, frames, geom_pos, f_world)
                report = report + jnp.einsum("rg,gc->rc",
                                             _report_onehot(model), f_world)
        else:
            forces, report = contact_forces(
                model, geom_pos, geom_vel,
                params.friction, params.restitution, terrain_hn,
                stiffness=sim_cfg.contact_stiffness,
                damping=sim_cfg.contact_damping,
                friction_vel_eps=sim_cfg.friction_vel_eps,
                dt=dt, terrain_friction=terrain_mu)
            if f_world is not None:
                forces = forces + f_world
                report = report + jnp.einsum("rg,gc->rc",
                                             _report_onehot(model), f_world)
            f_ext = spatial_forces_on_bodies(model, frames, geom_pos,
                                             forces)

        if contact_model == "apparent":
            qdd, a0 = solve(tau_total, f_ext)
        else:
            qdd, a0 = aba_fn(model, state, tau_total, f_ext, gravity,
                             params.payload, params.com_displacement,
                             fixed_base=fixed_base,
                             joint_impedance=joint_imp)
        state = integrate(state, qdd, a0, dt, fixed_base=fixed_base)
        # enforce the URDF per-DOF velocity limit, as IsaacGym does with
        # dof_props 'velocity' (legged_robot.py:509) — without this, free
        # flailing legs reach nonphysical speeds and destabilize training
        vel_lim = jnp.asarray(model.dof_velocity, jnp.float32)
        state = state._replace(qd=jnp.clip(state.qd, -vel_lim, vel_lim))
    return StepOutput(state, report, geom_pos0)


def make_batched_step(model, sim_cfg, terrain: Optional[TerrainGrid],
                      fixed_base: bool = False):
    """Returns step(states, taus, params) vmapped over the env axis."""
    fn = functools.partial(physics_step, model, sim_cfg,
                           terrain=terrain, fixed_base=fixed_base)
    return jax.vmap(lambda s, t, p: fn(s, t, p))


def default_sim_state(model, base_pos, base_quat, q) -> SimState:
    """Single-env rest state at the given pose."""
    return SimState(
        base_pos=jnp.asarray(base_pos, jnp.float32),
        base_quat=jnp.asarray(base_quat, jnp.float32),
        base_lin_vel=jnp.zeros(3, jnp.float32),
        base_ang_vel=jnp.zeros(3, jnp.float32),
        q=jnp.asarray(q, jnp.float32),
        qd=jnp.zeros(model.nv, jnp.float32),
    )
