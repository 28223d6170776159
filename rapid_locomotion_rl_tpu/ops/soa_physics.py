"""Physics substep in structure-of-arrays form — fully elementwise.

Drop-in alternative to ``vmap(physics_step)`` (:mod:`physics`): operates on
the batched [N, ...] state DIRECTLY, decomposed into per-component [N]
arrays (:mod:`soa`). Every operation in FK, contact, the three ABA sweeps
and integration is an elementwise op over [N] — no batched small matmuls,
no gathers/scatters in the hot path (per-geom/per-body loops are unrolled
at trace time against the static model). XLA fuses the resulting chains
into a handful of VPU kernels, where the AoS form emits hundreds of tiny
kernels.

Requires a limb layout (quadruped-class tree); semantics match
``physics_step`` (tests/test_soa_physics.py). Terrain height/normals are
sampled once per control step with the standard gather path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import soa as S
from .contact import TerrainGrid, terrain_height_and_normal
from .dynamics import PhysParams, SimState
from .limb_dynamics import LimbLayout, layout_for
from .physics import StepOutput


def _v3(a):  # [N,3] -> (x,y,z)
    return (a[:, 0], a[:, 1], a[:, 2])


def _stack_v3(v):
    return jnp.stack(v, axis=-1)


def _const_v3(arr):
    return (float(arr[0]), float(arr[1]), float(arr[2]))


def physics_step_soa(
    model,
    sim_cfg,
    state: SimState,               # batched [N,...]
    tau: jnp.ndarray,              # [N,nv]
    params: PhysParams,            # batched
    terrain: Optional[TerrainGrid],
    fixed_base: bool = False,
) -> StepOutput:
    layout = layout_for(model)
    assert layout is not None, "SoA path requires a limb-decomposable tree"
    D, K = layout.D, layout.K
    nsub = max(int(sim_cfg.num_substeps), 1)
    dt = sim_cfg.dt / nsub
    gz = float(sim_cfg.gravity[2])

    # static per-joint constants
    jidx = layout.joint_index            # [D,K]
    E_tree = [[S.m3_from_array(model.E_tree[jidx[d, k]]) for k in range(K)]
              for d in range(D)]
    p_tree = [[_const_v3(model.p_tree[jidx[d, k]]) for k in range(K)]
              for d in range(D)]
    axis_c = [[_const_v3(model.axis[jidx[d, k]]) for k in range(K)]
              for d in range(D)]
    # geoms grouped by body
    geoms_of_body = [[] for _ in range(model.nb)]
    for g in range(model.ng):
        geoms_of_body[int(model.geom_body[g])].append(g)

    # state components
    base_pos = _v3(state.base_pos)
    base_quat = tuple(state.base_quat[:, i] for i in range(4))
    base_v = _v3(state.base_lin_vel)
    base_w = _v3(state.base_ang_vel)
    q = [state.q[:, j] for j in range(model.nv)]
    qd = [state.qd[:, j] for j in range(model.nv)]

    report0 = None
    geom_pos_out = None
    terrain_h = None      # per-geom (h, n) tuples, sampled once
    terrain_n = None

    lim_lo = np.asarray(model.dof_lower)
    lim_hi = np.asarray(model.dof_upper)
    vel_lim = np.asarray(model.dof_velocity)
    eff = np.asarray(model.dof_effort)

    zeta = jnp.clip(1.0 - params.restitution, 0.08, 1.0)
    mu = 0.5 * (params.friction + (terrain.static_friction
                                   if terrain is not None else 1.0))

    for sub in range(nsub):
        # ---- FK (world frames per body, SoA) ---------------------------
        R0 = S.quat_to_m3(base_quat)
        R_b = [None] * model.nb
        p_b = [None] * model.nb
        w_b = [None] * model.nb
        v_b = [None] * model.nb
        R_b[0], p_b[0], w_b[0], v_b[0] = R0, base_pos, base_w, base_v
        R_pc = [[None] * K for _ in range(D)]
        for d in range(D):
            for k in range(K):
                b = int(layout.body_index[d, k])
                par = int(model.parent[b])
                j = int(jidx[d, k])
                Rj = S.m3_axis_angle(axis_c[d][k], q[j])
                Rpc = S.m3_mul(E_tree[d][k], Rj)
                R_pc[d][k] = Rpc
                R_b[b] = S.m3_mul(R_b[par], Rpc)
                p_b[b] = S.v3_add(S.m3_vec(R_b[par], p_tree[d][k]), p_b[par])
                w_b[b] = S.v3_add(
                    w_b[par],
                    S.m3_vec(R_b[b], S.v3_scale(axis_c[d][k], qd[j])))
                v_b[b] = S.v3_add(
                    v_b[par],
                    S.v3_cross(w_b[par], S.v3_sub(p_b[b], p_b[par])))

        # ---- geoms + contact (per geom, elementwise) --------------------
        g_pos = [None] * model.ng
        g_force = [None] * model.ng
        for g in range(model.ng):
            b = int(model.geom_body[g])
            off = _const_v3(model.geom_offset[g])
            pg = S.v3_add(S.m3_vec(R_b[b], off), p_b[b])
            vg = S.v3_add(v_b[b],
                          S.v3_cross(w_b[b], S.v3_sub(pg, p_b[b])))
            g_pos[g] = pg
            if sub == 0 and terrain is not None:
                if terrain_h is None:
                    terrain_h, terrain_n = [None] * model.ng, [None] * model.ng
                h, n = terrain_height_and_normal(terrain, pg[0], pg[1])
                terrain_h[g] = h
                terrain_n[g] = (n[..., 0], n[..., 1], n[..., 2])
            if terrain is not None:
                h = terrain_h[g]
                n = terrain_n[g]
            else:
                h = pg[2] * 0.0
                n = (pg[2] * 0.0, pg[2] * 0.0, pg[2] * 0.0 + 1.0)
            r = float(model.geom_radius[g])
            m_eff = float(model.mass[int(model.geom_body[g])])
            depth = jnp.maximum(h + r - pg[2], 0.0)
            in_c = depth > 0.0
            v_n = S.v3_dot(vg, n)
            v_t = S.v3_sub(vg, S.v3_scale(n, v_n))
            c_n = zeta * sim_cfg.contact_damping + sim_cfg.contact_stiffness * dt
            f_n = jnp.maximum(
                (sim_cfg.contact_stiffness * depth - c_n * v_n)
                / (1.0 + c_n * dt / m_eff), 0.0) * in_c
            vt_norm = S.v3_norm(v_t, 1e-12)
            c_t = mu * f_n / (vt_norm + sim_cfg.friction_vel_eps)
            ft_scale = -(c_t / (1.0 + c_t * dt / m_eff))
            g_force[g] = S.v3_add(S.v3_scale(n, f_n),
                                  S.v3_scale(v_t, ft_scale))

        # per-body spatial external forces (own frame): [torque; force]
        f_ext = [None] * model.nb
        for b in range(model.nb):
            if not geoms_of_body[b]:
                continue
            Fw = None
            Nw = None
            for g in geoms_of_body[b]:
                arm = S.v3_sub(g_pos[g], p_b[b])
                tq = S.v3_cross(arm, g_force[g])
                Fw = g_force[g] if Fw is None else S.v3_add(Fw, g_force[g])
                Nw = tq if Nw is None else S.v3_add(Nw, tq)
            f_ext[b] = (S.m3_tvec(R_b[b], Nw), S.m3_tvec(R_b[b], Fw))

        if sub == 0:
            # contact report per report body (world frame)
            rep = [None] * model.nr
            for g in range(model.ng):
                rb = int(model.geom_report_body[g])
                rep[rb] = (g_force[g] if rep[rb] is None
                           else S.v3_add(rep[rb], g_force[g]))
            zeros = state.base_pos[:, 0] * 0.0
            report0 = jnp.stack(
                [_stack_v3(r_) if r_ is not None
                 else jnp.stack([zeros] * 3, -1) for r_ in rep], axis=1)
            geom_pos_out = jnp.stack([_stack_v3(p) for p in g_pos], axis=1)

        # ---- total joint torques (PD input + passive) -------------------
        tau_t = [None] * model.nv
        for j in range(model.nv):
            below = jnp.minimum(q[j] - lim_lo[j], 0.0)
            above = jnp.maximum(q[j] - lim_hi[j], 0.0)
            viol = ((q[j] < lim_lo[j]) | (q[j] > lim_hi[j]))
            t = (tau[:, j]
                 - float(model.dof_damping[j]) * qd[j]
                 - sim_cfg.joint_friction * jnp.tanh(qd[j] / 0.1)
                 - 300.0 * (below + above) - 2.0 * qd[j] * viol)
            tau_t[j] = t

        # ---- ABA (limb form, SoA) ---------------------------------------
        base_mass = float(model.mass[0]) + params.payload
        com0 = _const_v3(model.com[0])
        base_com = (params.com_displacement[:, 0] + com0[0],
                    params.com_displacement[:, 1] + com0[1],
                    params.com_displacement[:, 2] + com0[2])
        scale = base_mass / float(model.mass[0])
        I0 = S.m3_from_array(np.asarray(model.inertia[0]))
        I0s = tuple(tuple(I0[i][j] * scale for j in range(3))
                    for i in range(3))
        IA = [None] * model.nb
        IA[0] = S.spatial_inertia(base_mass, base_com, I0s)
        for d in range(D):
            for k in range(K):
                b = int(layout.body_index[d, k])
                from .limb_dynamics import _np_spatial_inertia
                M6 = _np_spatial_inertia(float(model.mass[b]),
                                         np.asarray(model.com[b]),
                                         np.asarray(model.inertia[b]))
                IA[b] = tuple(tuple(S.m3_from_array(M6[i * 3:i * 3 + 3,
                                                       j * 3:j * 3 + 3])
                                    for j in range(2)) for i in range(2))

        # velocities in body coords + bias
        v0 = (S.m3_tvec(R0, base_w), S.m3_tvec(R0, base_v))
        v_sp = [None] * model.nb
        c_sp = [None] * model.nb
        E_up = [None] * model.nb
        v_sp[0] = v0
        for d in range(D):
            for k in range(K):
                b = int(layout.body_index[d, k])
                par = int(model.parent[b])
                j = int(jidx[d, k])
                E = S.m3_t(R_pc[d][k])
                E_up[b] = E
                Si = (axis_c[d][k], (0.0, 0.0, 0.0))
                Sqd = (S.v3_scale(axis_c[d][k], qd[j]), S.v3_zeros_like(qd[j]))
                vi = S.sv_add(S.xform_motion(E, p_tree[d][k], v_sp[par]), Sqd)
                v_sp[b] = vi
                c_sp[b] = S.crm(vi, Sqd)

        pA = [None] * model.nb
        for b in range(model.nb):
            bias = S.crf(v_sp[b], S.sm_vec(IA[b], v_sp[b]))
            if f_ext[b] is not None:
                bias = S.sv_sub(bias, f_ext[b])
            pA[b] = bias

        # backward sweep
        U = [None] * model.nb
        dinv = [None] * model.nb
        u = [None] * model.nb
        for d in range(D - 1, -1, -1):
            for k in range(K):
                b = int(layout.body_index[d, k])
                par = int(model.parent[b])
                j = int(jidx[d, k])
                Si = (axis_c[d][k], (0.0, 0.0, 0.0))
                Ub = S.sm_vec(IA[b], Si)
                db = jnp.maximum(S.sv_dot(Si, Ub)
                                 + float(model.dof_armature[j]), 1e-9)
                ub = tau_t[j] - S.sv_dot(Si, pA[b])
                U[b], dinv[b], u[b] = Ub, 1.0 / db, ub
                Ia = S.sm_add(IA[b], S.sm_scale(S.sm_outer(Ub, Ub), -1.0 / db))
                pa = S.sv_add(
                    S.sv_add(pA[b], S.sm_vec(Ia, c_sp[b])),
                    S.sv_scale(Ub, ub / db))
                IA[par] = S.sm_add(
                    IA[par],
                    S.xform_inertia_to_parent(E_up[b], p_tree[d][k], Ia))
                pA[par] = S.sv_add(
                    pA[par],
                    S.xform_force_to_parent(E_up[b], p_tree[d][k], pa))

        # base acceleration (freefall frame trick)
        g_b = S.m3_tvec(R0, (base_pos[0] * 0.0, base_pos[0] * 0.0,
                             base_pos[0] * 0.0 + gz))
        if fixed_base:
            a0 = (S.v3_zeros_like(base_pos[0]),
                  S.v3_scale(g_b, -1.0))
        else:
            sol = S.solve_psd6(IA[0], pA[0])
            a0 = (S.v3_scale(sol[0], -1.0), S.v3_scale(sol[1], -1.0))
        a_true0 = (a0[0], S.v3_add(a0[1], g_b))

        # forward sweep
        a_sp = [None] * model.nb
        a_sp[0] = a0
        qdd = [None] * model.nv
        for d in range(D):
            for k in range(K):
                b = int(layout.body_index[d, k])
                par = int(model.parent[b])
                j = int(jidx[d, k])
                ap = S.sv_add(
                    S.xform_motion(E_up[b], p_tree[d][k], a_sp[par]),
                    c_sp[b])
                qdd[j] = (u[b] - S.sv_dot(U[b], ap)) * dinv[b]
                Si = (axis_c[d][k], (0.0, 0.0, 0.0))
                a_sp[b] = S.sv_add(ap, S.sv_scale(Si, qdd[j]))

        # ---- integrate (semi-implicit, SoA) -----------------------------
        if fixed_base:
            base_w = S.v3_zeros_like(base_pos[0])
            base_v = S.v3_zeros_like(base_pos[0])
        else:
            wdot_w = S.m3_vec(R0, a_true0[0])
            acc_w = S.v3_add(S.m3_vec(R0, a_true0[1]),
                             S.v3_cross(base_w, base_v))
            base_w = S.v3_add(base_w, S.v3_scale(wdot_w, dt))
            base_v = S.v3_add(base_v, S.v3_scale(acc_w, dt))
            base_pos = S.v3_add(base_pos, S.v3_scale(base_v, dt))
            base_quat = S.quat_integrate(base_quat, base_w, dt)
        for j in range(model.nv):
            qd[j] = jnp.clip(qd[j] + dt * qdd[j], -vel_lim[j], vel_lim[j])
            q[j] = q[j] + dt * qd[j]

    new_state = SimState(
        base_pos=_stack_v3(base_pos),
        base_quat=jnp.stack(base_quat, axis=-1),
        base_lin_vel=_stack_v3(base_v),
        base_ang_vel=_stack_v3(base_w),
        q=jnp.stack(q, axis=-1),
        qd=jnp.stack(qd, axis=-1))
    return StepOutput(new_state, report0, geom_pos_out)
