"""Physics substep in structure-of-arrays form — fully elementwise.

Drop-in alternative to ``vmap(physics_step)`` (:mod:`physics`): operates on
the batched [N, ...] state DIRECTLY, decomposed into per-component [N]
arrays (:mod:`soa`). Every operation in FK, contact, the three ABA sweeps
and integration is an elementwise op over [N] — no batched small matmuls,
no gathers/scatters in the hot path (per-geom/per-body loops are unrolled
at trace time against the static model). XLA fuses the resulting chains
into a handful of VPU kernels, where the AoS form emits hundreds of tiny
kernels.

The hot chain is factored into :func:`substep_chain`, a pure function from
same-shaped component arrays to component arrays. The SAME trace runs
under plain XLA on [N] vectors (:func:`physics_step_soa`) and inside a
Pallas TPU kernel on (sublanes, 128) VMEM tiles
(:mod:`.pallas_physics`) — terrain sampling (the only gather) happens
outside, once per control step, exactly as before.

Requires a limb layout (quadruped-class tree); semantics match
``physics_step`` (tests/test_soa_physics.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import soa as S
from .contact import TerrainGrid, terrain_height_and_normal
from .dynamics import PhysParams, SimState
from .limb_dynamics import LimbLayout, layout_for, _np_spatial_inertia
from .physics import StepOutput


def _v3(a):  # [N,3] -> (x,y,z)
    return (a[:, 0], a[:, 1], a[:, 2])


def _stack_v3(v):
    return jnp.stack(v, axis=-1)


def _const_v3(arr):
    return (float(arr[0]), float(arr[1]), float(arr[2]))


def fk_geom_xy(model, layout: LimbLayout, base_pos, base_quat, q
               ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Positions-only FK: world (x, y) of every collision geom — the
    terrain-sampling coordinates for a control step (the gather that must
    stay OUTSIDE the fused elementwise chain). Inputs are SoA components
    (tuples / lists of same-shaped arrays)."""
    D, K = layout.D, layout.K
    jidx = layout.joint_index
    R_b = [None] * model.nb
    p_b = [None] * model.nb
    R_b[0] = S.quat_to_m3(base_quat)
    p_b[0] = base_pos
    for d in range(D):
        for k in range(K):
            b = int(layout.body_index[d, k])
            par = int(model.parent[b])
            j = int(jidx[d, k])
            Rj = S.m3_axis_angle(_const_v3(model.axis[j]), q[j])
            Rpc = S.m3_mul(S.m3_from_array(model.E_tree[j]), Rj)
            R_b[b] = S.m3_mul(R_b[par], Rpc)
            p_b[b] = S.v3_add(S.m3_vec(R_b[par], _const_v3(model.p_tree[j])),
                              p_b[par])
    out = []
    for g in range(model.ng):
        b = int(model.geom_body[g])
        off = _const_v3(model.geom_offset[g])
        pg = S.v3_add(S.m3_vec(R_b[b], off), p_b[b])
        out.append((pg[0], pg[1]))
    return out


def _box_forces_soa(world_boxes, origin, pg, vg, radius, m_eff, sim_cfg,
                    friction, dt):
    """World-box penalty force on one sphere, SoA v3-tuple form — the
    elementwise mirror of :func:`..envs.world.box_sphere_forces` (one geom
    row of it), so the SoA/Pallas world path matches the AoS one."""
    import numpy as _np
    centers = _np.asarray(world_boxes.centers, _np.float64)
    halfs = _np.asarray(world_boxes.half_extents, _np.float64)
    stiffness = sim_cfg.contact_stiffness
    c_n = sim_cfg.contact_damping + stiffness * dt
    total = None
    for i in range(centers.shape[0]):
        h = [float(halfs[i, a]) for a in range(3)]
        rel = tuple(pg[a] - (origin[a] + float(centers[i, a]))
                    for a in range(3))
        cl = tuple(jnp.clip(rel[a], -h[a], h[a]) for a in range(3))
        delta = tuple(rel[a] - cl[a] for a in range(3))
        dist = S.v3_norm(delta, 1e-18)
        inside = dist < 1e-6
        fd = tuple(h[a] - jnp.abs(rel[a]) for a in range(3))
        min_fd = jnp.minimum(fd[0], jnp.minimum(fd[1], fd[2]))
        # argmin tie-break = first minimal axis (matches jnp.argmin)
        a0 = (fd[0] <= fd[1]) & (fd[0] <= fd[2])
        a1 = ~a0 & (fd[1] <= fd[2])
        a2 = ~a0 & ~a1
        face_n = (jnp.sign(rel[0]) * a0, jnp.sign(rel[1]) * a1,
                  jnp.sign(rel[2]) * a2)
        inv_d = 1.0 / jnp.maximum(dist, 1e-6)
        n = tuple(jnp.where(inside, face_n[a], delta[a] * inv_d)
                  for a in range(3))
        depth = (jnp.maximum(radius - dist, 0.0) * ~inside
                 + (min_fd + radius) * inside)
        in_c = depth > 0.0
        v_n = S.v3_dot(vg, n)
        v_t = S.v3_sub(vg, S.v3_scale(n, v_n))
        f_n = jnp.maximum(
            (stiffness * depth - c_n * v_n) / (1.0 + c_n * dt / m_eff),
            0.0) * in_c
        vt_norm = S.v3_norm(v_t, 1e-18)
        c_t = friction * f_n / (vt_norm + sim_cfg.friction_vel_eps)
        ft_scale = -(c_t / (1.0 + c_t * dt / m_eff))
        f = S.v3_add(S.v3_scale(n, f_n), S.v3_scale(v_t, ft_scale))
        total = f if total is None else S.v3_add(total, f)
    return total


def substep_chain(model, sim_cfg, layout: LimbLayout,
                  comps: Dict, fixed_base: bool = False,
                  world_boxes=None, world_friction: float = 1.0) -> Dict:
    """``num_substeps`` physics substeps as one elementwise chain.

    ``comps`` is a dict of SAME-SHAPED arrays (any shape: [N] vectors under
    XLA, (sublanes, 128) tiles inside a Pallas kernel):

    - ``base_pos``/``base_v``/``base_w``: v3 tuples; ``base_quat``: 4-tuple
    - ``q``/``qd``/``tau``: lists of nv arrays
    - ``payload``, ``restitution``, ``mu``: arrays; ``com_disp``: v3 tuple
    - ``imp``: list of nv arrays (implicit-PD impedance Kd+dt*Kp) or None
    - ``g_h``: list of ng arrays, ``g_n``: list of ng v3 tuples — terrain
      height/normal under each geom, sampled ONCE at the entry state
      (:func:`fk_geom_xy`); None => flat ground at z=0.

    Returns the updated state components plus ``report`` (list of nr v3,
    world contact force per report body at substep 0) and ``geom_pos``
    (list of ng v3, world geom centers at substep 0).
    """
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

    base_pos = comps["base_pos"]
    base_quat = comps["base_quat"]
    base_v = comps["base_v"]
    base_w = comps["base_w"]
    q = list(comps["q"])
    qd = list(comps["qd"])
    tau = comps["tau"]
    imp = comps.get("imp")
    payload = comps["payload"]
    com_disp = comps["com_disp"]
    restitution = comps["restitution"]
    mu = comps["mu"]
    g_h_in = comps.get("g_h")
    g_n_in = comps.get("g_n")

    report0 = None
    geom_pos_out = None
    lam_w = None          # per-geom world 3x3 inverse apparent inertia
    phi_w = None

    lim_lo = np.asarray(model.dof_lower)
    lim_hi = np.asarray(model.dof_upper)
    vel_lim = np.asarray(model.dof_velocity)

    apparent = getattr(sim_cfg, "contact_model", "apparent") == "apparent"
    # Jacobi mass split of the base between the limbs that can load it
    # simultaneously (was a quadruped-only literal 4.0)
    base_split = float(max(int(np.sum(np.asarray(model.parent) == 0)), 1))

    zeta = jnp.clip(1.0 - restitution, 0.08, 1.0)

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

        # ---- geom world kinematics (per geom, elementwise) --------------
        g_pos = [None] * model.ng
        g_vel = [None] * model.ng
        g_h = [None] * model.ng
        g_n = [None] * model.ng
        for g in range(model.ng):
            b = int(model.geom_body[g])
            off = _const_v3(model.geom_offset[g])
            pg = S.v3_add(S.m3_vec(R_b[b], off), p_b[b])
            vg = S.v3_add(v_b[b],
                          S.v3_cross(w_b[b], S.v3_sub(pg, p_b[b])))
            g_pos[g] = pg
            g_vel[g] = vg
            if g_h_in is not None:
                g_h[g] = g_h_in[g]
                g_n[g] = g_n_in[g]
            else:
                g_h[g] = pg[2] * 0.0
                g_n[g] = (pg[2] * 0.0, pg[2] * 0.0, pg[2] * 0.0 + 1.0)

        def legacy_contact_force(g):
            pg, vg = g_pos[g], g_vel[g]
            h, n = g_h[g], g_n[g]
            r = float(model.geom_radius[g])
            m_eff = float(model.mass[int(model.geom_body[g])])
            depth = jnp.maximum(h + r - pg[2], 0.0)
            in_c = depth > 0.0
            v_n = S.v3_dot(vg, n)
            v_t = S.v3_sub(vg, S.v3_scale(n, v_n))
            c_n = (zeta * sim_cfg.contact_damping
                   + sim_cfg.contact_stiffness * dt)
            f_n = jnp.maximum(
                (sim_cfg.contact_stiffness * depth - c_n * v_n)
                / (1.0 + c_n * dt / m_eff), 0.0) * in_c
            vt_norm = S.v3_norm(v_t, 1e-12)
            c_t = mu * f_n / (vt_norm + sim_cfg.friction_vel_eps)
            ft_scale = -(c_t / (1.0 + c_t * dt / m_eff))
            return S.v3_add(S.v3_scale(n, f_n), S.v3_scale(v_t, ft_scale))

        def gather_f_ext(g_force, g_app=None, g_torque=None):
            """world sphere forces (applied at g_app[g], default sphere
            centers) plus optional pure torques -> per-body spatial force
            (own frame)."""
            f_ext = [None] * model.nb
            for b in range(model.nb):
                if not geoms_of_body[b]:
                    continue
                Fw = None
                Nw = None
                for g in geoms_of_body[b]:
                    at = g_pos[g] if g_app is None else g_app[g]
                    arm = S.v3_sub(at, p_b[b])
                    tq = S.v3_cross(arm, g_force[g])
                    if g_torque is not None and g_torque[g] is not None:
                        tq = S.v3_add(tq, g_torque[g])
                    Fw = (g_force[g] if Fw is None
                          else S.v3_add(Fw, g_force[g]))
                    Nw = tq if Nw is None else S.v3_add(Nw, tq)
                f_ext[b] = (S.m3_tvec(R_b[b], Nw), S.m3_tvec(R_b[b], Fw))
            return f_ext

        # ---- total joint torques (PD input + passive) -------------------
        tau_t = [None] * model.nv
        for j in range(model.nv):
            below = jnp.minimum(q[j] - lim_lo[j], 0.0)
            above = jnp.maximum(q[j] - lim_hi[j], 0.0)
            viol = ((q[j] < lim_lo[j]) | (q[j] > lim_hi[j]))
            t = (tau[j]
                 - float(model.dof_damping[j]) * qd[j]
                 - sim_cfg.joint_friction * jnp.tanh(qd[j] / 0.1)
                 - 300.0 * (below + above) - 2.0 * qd[j] * viol)
            tau_t[j] = t

        # ---- ABA (limb form, SoA) ---------------------------------------
        base_mass = float(model.mass[0]) + payload
        com0 = _const_v3(model.com[0])
        base_com = (com_disp[0] + com0[0],
                    com_disp[1] + com0[1],
                    com_disp[2] + com0[2])
        scale = base_mass / float(model.mass[0])
        I0 = S.m3_from_array(np.asarray(model.inertia[0]))
        I0s = tuple(tuple(I0[i][j] * scale for j in range(3))
                    for i in range(3))
        IA = [None] * model.nb
        IA[0] = S.spatial_inertia(base_mass, base_com, I0s)
        for d in range(D):
            for k in range(K):
                b = int(layout.body_index[d, k])
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

        # velocity bias per body (no external forces yet)
        pA_vel = [None] * model.nb
        for b in range(model.nb):
            pA_vel[b] = S.crf(v_sp[b], S.sm_vec(IA[b], v_sp[b]))

        # backward articulated-inertia sweep (force-independent): U, d, Ia
        U = [None] * model.nb
        dinv = [None] * model.nb
        Ia_s = [None] * model.nb
        for d in range(D - 1, -1, -1):
            for k in range(K):
                b = int(layout.body_index[d, k])
                par = int(model.parent[b])
                j = int(jidx[d, k])
                Si = (axis_c[d][k], (0.0, 0.0, 0.0))
                Ub = S.sm_vec(IA[b], Si)
                db = jnp.maximum(
                    S.sv_dot(Si, Ub) + float(model.dof_armature[j])
                    + (dt * imp[j] if imp is not None else 0.0), 1e-9)
                U[b], dinv[b] = Ub, 1.0 / db
                Ia = S.sm_add(IA[b],
                              S.sm_scale(S.sm_outer(Ub, Ub), -1.0 / db))
                Ia_s[b] = Ia
                IA[par] = S.sm_add(
                    IA[par],
                    S.xform_inertia_to_parent(E_up[b], p_tree[d][k], Ia))

        g_b = S.m3_tvec(R0, (base_pos[0] * 0.0, base_pos[0] * 0.0,
                             base_pos[0] * 0.0 + gz))

        def bias_and_accels(f_ext):
            """Bias backward sweep + base accel + forward sweep for a given
            external-force set (the inertia sweep above is shared)."""
            pA = [None] * model.nb
            for b in range(model.nb):
                pA[b] = (pA_vel[b] if f_ext is None or f_ext[b] is None
                         else S.sv_sub(pA_vel[b], f_ext[b]))
            u = [None] * model.nb
            for d in range(D - 1, -1, -1):
                for k in range(K):
                    b = int(layout.body_index[d, k])
                    par = int(model.parent[b])
                    j = int(jidx[d, k])
                    Si = (axis_c[d][k], (0.0, 0.0, 0.0))
                    ub = tau_t[j] - S.sv_dot(Si, pA[b])
                    u[b] = ub
                    pa = S.sv_add(
                        S.sv_add(pA[b], S.sm_vec(Ia_s[b], c_sp[b])),
                        S.sv_scale(U[b], ub * dinv[b]))
                    pA[par] = S.sv_add(
                        pA[par],
                        S.xform_force_to_parent(E_up[b], p_tree[d][k], pa))
            if fixed_base:
                a0 = (S.v3_zeros_like(base_pos[0]), S.v3_scale(g_b, -1.0))
            else:
                sol = S.solve_psd6(IA[0], pA[0])
                a0 = (S.v3_scale(sol[0], -1.0), S.v3_scale(sol[1], -1.0))
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
            return a0, a_sp, qdd

        if apparent:
            # ---- inverse apparent inertia per geom (once per control
            # step: q drift within 5 ms is negligible) -------------------
            if lam_w is None:
                Phi = [None] * model.nb
                if fixed_base:
                    zero3 = S.m3_scale(
                        S.m3_identity_like(base_pos[0]), 0.0)
                    Phi[0] = ((zero3, zero3), (zero3, zero3))
                else:
                    Phi[0] = S.sm_scale(S.inv_psd6(IA[0]), base_split)
                for d in range(D):
                    for k in range(K):
                        b = int(layout.body_index[d, k])
                        par = int(model.parent[b])
                        Si = (axis_c[d][k], (0.0, 0.0, 0.0))
                        Phi_x = S.xform_phi_to_child(
                            E_up[b], p_tree[d][k], Phi[par])
                        MU = S.sm_vec(Phi_x, U[b])
                        uMu = S.sv_dot(U[b], MU)
                        Phi_b = S.sm_add(
                            Phi_x,
                            S.sm_scale(S.sm_outer(Si, MU), -dinv[b]))
                        Phi_b = S.sm_add(
                            Phi_b,
                            S.sm_scale(S.sm_outer(MU, Si), -dinv[b]))
                        Phi_b = S.sm_add(
                            Phi_b,
                            S.sm_scale(S.sm_outer(Si, Si),
                                       dinv[b] + uMu * dinv[b] * dinv[b]))
                        Phi[b] = Phi_b
                # world-frame Phi blocks per body (projected per geom with
                # the dynamic contact-point arm below)
                phi_w = [None] * model.nb
                for b in set(int(model.geom_body[g])
                             for g in range(model.ng)):
                    (A_, B_), (C_, D_) = Phi[b]
                    Rt = S.m3_t(R_b[b])
                    phi_w[b] = (
                        S.m3_mul(S.m3_mul(R_b[b], A_), Rt),
                        S.m3_mul(S.m3_mul(R_b[b], B_), Rt),
                        S.m3_mul(S.m3_mul(R_b[b], D_), Rt))
                lam_w = [None] * model.ng

            # ---- free dynamics -> per-geom free point acceleration ------
            _, a_free, _ = bias_and_accels(None)
            # per-body active-contact counts for Jacobi mass splitting
            g_in_c = [None] * model.ng
            for g in range(model.ng):
                rad_g = float(model.geom_radius[g])
                g_in_c[g] = (g_h[g] + rad_g - g_pos[g][2] > 0.0
                             ).astype(g_pos[g][2].dtype)
            n_active = [None] * model.nb
            for b in range(model.nb):
                tot = None
                for g in geoms_of_body[b]:
                    tot = g_in_c[g] if tot is None else tot + g_in_c[g]
                n_active[b] = tot
            g_force = [None] * model.ng
            g_cp = [None] * model.ng
            g_tq = [None] * model.ng
            a_patch = float(getattr(sim_cfg, "torsional_patch_radius", 0.0))
            for g in range(model.ng):
                b = int(model.geom_body[g])
                pg, n = g_pos[g], g_n[g]
                rad = float(model.geom_radius[g])
                # contact point on the sphere surface: friction must act
                # where the material touches, or stance-foot pivoting is
                # misread as sliding (scripts/sim2sim.py)
                p_c = S.v3_sub(pg, S.v3_scale(n, rad))
                g_cp[g] = p_c
                r_w = S.v3_sub(p_c, p_b[b])
                v_c = S.v3_add(g_vel[g],
                               S.v3_cross(w_b[b], S.v3_sub(p_c, pg)))

                if lam_w[g] is None:
                    A_w, B_w, D_w = phi_w[b]
                    Sm = S.m3_scale(S.m3_skew(r_w), -1.0)
                    Smt = S.m3_t(Sm)
                    SmB = S.m3_mul(Sm, B_w)
                    lam_w[g] = S.m3_add(
                        S.m3_add(S.m3_mul(S.m3_mul(Sm, A_w), Smt),
                                 S.m3_add(SmB, S.m3_t(SmB))), D_w)

                a_ang, a_lin = a_free[b]
                a_lin_true = S.v3_add(a_lin, S.m3_tvec(R_b[b], (
                    base_pos[0] * 0.0, base_pos[0] * 0.0,
                    base_pos[0] * 0.0 + gz)))
                wdot_w = S.m3_vec(R_b[b], a_ang)
                a_org_w = S.v3_add(S.m3_vec(R_b[b], a_lin_true),
                                   S.v3_cross(w_b[b], v_b[b]))
                a_pt = S.v3_add(
                    S.v3_add(a_org_w, S.v3_cross(wdot_w, r_w)),
                    S.v3_cross(w_b[b], S.v3_cross(w_b[b], r_w)))

                # TGS-style velocity constraint solve against lam_w[g]
                # (see contact.contact_forces_implicit)
                depth = jnp.maximum(g_h[g] + rad - pg[2], 0.0)
                in_c = g_in_c[g]
                v_pred = S.v3_add(v_c, S.v3_scale(a_pt, dt))
                v_n_now = S.v3_dot(v_c, n)
                bias = jnp.minimum(sim_cfg.erp / dt * depth,
                                   sim_cfg.max_depenetration_velocity)
                bounce = jnp.where(
                    v_n_now < -sim_cfg.bounce_threshold_velocity,
                    -restitution * v_n_now, 0.0)
                v_tgt_n = jnp.maximum(bias, bounce)
                dv = S.v3_sub(S.v3_scale(n, v_tgt_n), v_pred)
                split = jnp.maximum(n_active[b], 1.0)
                lam_g = S.m3_scale(lam_w[g], split)
                f = S.m3_solve(lam_g, S.v3_scale(dv, 1.0 / dt))
                f_n = S.v3_dot(f, n)
                f_t = S.v3_sub(f, S.v3_scale(n, f_n))
                f_n = jnp.maximum(f_n, 0.0) * in_c
                ft_norm = S.v3_norm(f_t, 1e-18)
                scale = jnp.minimum(1.0, mu * f_n / (ft_norm + 1e-9)) * in_c
                g_force[g] = S.v3_add(S.v3_scale(n, f_n),
                                      S.v3_scale(f_t, scale))

                # torsional friction (contact patch; see
                # contact.contact_forces_implicit): spin-stiction about the
                # normal against the apparent angular inertia, clamped to
                # the torsion cone mu * f_n * patch_radius
                if a_patch > 0.0:
                    A_w = phi_w[b][0]
                    w_n = S.v3_dot(w_b[b], n)
                    r_ang = jnp.maximum(
                        S.v3_dot(n, S.m3_vec(A_w, n)) * split, 1e-6)
                    tau_max = mu * f_n * a_patch
                    tau_n = jnp.clip(-w_n / (dt * r_ang),
                                     -tau_max, tau_max)
                    g_tq[g] = S.v3_scale(n, tau_n)
        else:
            g_force = [legacy_contact_force(g) for g in range(model.ng)]

        f_ext = gather_f_ext(g_force, g_cp if apparent else None,
                             g_tq if apparent else None)

        # ---- world obstacles (envs/world.py; reference
        # mini_gym/envs/world/world.py:14-121): penalty forces on the same
        # spheres, applied at the sphere CENTERS (exactly like the AoS
        # extra_contact hook in ops/physics.py:94-175) -------------------
        g_wf = None
        if world_boxes is not None:
            origin = comps["origin"]
            g_wf = []
            for g in range(model.ng):
                m_eff = float(model.mass[int(model.geom_body[g])])
                g_wf.append(_box_forces_soa(
                    world_boxes, origin, g_pos[g], g_vel[g],
                    float(model.geom_radius[g]), m_eff, sim_cfg,
                    world_friction, dt))
            w_ext = gather_f_ext(g_wf)
            for b in range(model.nb):
                if w_ext[b] is None:
                    continue
                f_ext[b] = (w_ext[b] if f_ext[b] is None
                            else S.sv_add(f_ext[b], w_ext[b]))

        if sub == 0:
            # contact report per report body (world frame)
            rep = [None] * model.nr
            for g in range(model.ng):
                rb = int(model.geom_report_body[g])
                f_tot = (g_force[g] if g_wf is None
                         else S.v3_add(g_force[g], g_wf[g]))
                rep[rb] = (f_tot if rep[rb] is None
                           else S.v3_add(rep[rb], f_tot))
            zeros = base_pos[0] * 0.0
            report0 = [r_ if r_ is not None else (zeros, zeros, zeros)
                       for r_ in rep]
            geom_pos_out = list(g_pos)

        a0, _, qdd = bias_and_accels(f_ext)
        a_true0 = (a0[0], S.v3_add(a0[1], g_b))

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
            qd[j] = jnp.clip(qd[j] + dt * qdd[j],
                             -float(vel_lim[j]), float(vel_lim[j]))
            q[j] = q[j] + dt * qd[j]

    return dict(base_pos=base_pos, base_quat=base_quat, base_v=base_v,
                base_w=base_w, q=q, qd=qd,
                report=report0, geom_pos=geom_pos_out)


def _sample_geom_terrain(model, layout, sim_cfg, terrain,
                         base_pos, base_quat, q, patch3=None):
    """Per-geom terrain heights/normals as SoA lists: via one contiguous
    per-env patch (sim_cfg.terrain_patch_size > 0, the TPU fast path —
    see contact.sample_patch) or direct per-geom gathers (== 0).

    patch3: optional precomputed (patch, ix0, iy0) from sample_patch —
    the round-5 hoist: the patch gather's cost is per-ROW-fragment (N x
    P_rows DMA descriptors per call), so the env sampling it once per
    env step instead of once per control substep cuts the dominant
    rollout cost ~4x. The per-geom bilinear lookup below still runs at
    the current substep state."""
    from .contact import (patch_height_and_normal,
                          patch_height_and_normal_mm, sample_patch)
    xy = fk_geom_xy(model, layout, base_pos, base_quat, q)
    P = int(getattr(sim_cfg, "terrain_patch_size", 0) or 0)
    if patch3 is not None and P > 0:
        patch, ix0, iy0 = patch3
        xs = jnp.stack([x for x, _ in xy], axis=-1)       # [N, ng]
        ys = jnp.stack([y for _, y in xy], axis=-1)
        lookup = (patch_height_and_normal_mm
                  if getattr(sim_cfg, "terrain_lookup", "mm") == "mm"
                  else patch_height_and_normal)
        hh, nn = lookup(terrain, patch, ix0, iy0, xs, ys)
        g_h = [hh[:, g] for g in range(model.ng)]
        g_n = [(nn[:, g, 0], nn[:, g, 1], nn[:, g, 2])
               for g in range(model.ng)]
        return g_h, g_n
    if P > 0:
        xs = jnp.stack([x for x, _ in xy], axis=-1)       # [N, ng]
        ys = jnp.stack([y for _, y in xy], axis=-1)
        patch, ix0, iy0 = sample_patch(terrain, base_pos[0], base_pos[1], P)
        lookup = (patch_height_and_normal_mm
                  if getattr(sim_cfg, "terrain_lookup", "mm") == "mm"
                  else patch_height_and_normal)
        hh, nn = lookup(terrain, patch, ix0, iy0, xs, ys)
        g_h = [hh[:, g] for g in range(model.ng)]
        g_n = [(nn[:, g, 0], nn[:, g, 1], nn[:, g, 2])
               for g in range(model.ng)]
        return g_h, g_n
    g_h, g_n = [], []
    for (x, y) in xy:
        h, n = terrain_height_and_normal(terrain, x, y)
        g_h.append(h)
        g_n.append((n[..., 0], n[..., 1], n[..., 2]))
    return g_h, g_n


def physics_step_soa(
    model,
    sim_cfg,
    state: SimState,               # batched [N,...]
    tau: jnp.ndarray,              # [N,nv]
    params: PhysParams,            # batched
    terrain: Optional[TerrainGrid],
    fixed_base: bool = False,
    implicit_damp: Optional[jnp.ndarray] = None,   # [N,nv] Kd_eff+dt*Kp_eff
    world_boxes=None,              # envs.world.WorldBoxes (static consts)
    env_origin: Optional[jnp.ndarray] = None,      # [N,3] for world_boxes
    world_friction: float = 1.0,
    terrain_patch=None,            # optional hoisted (patch, ix0, iy0)
) -> StepOutput:
    layout = layout_for(model)
    assert layout is not None, "SoA path requires a limb-decomposable tree"

    base_pos = _v3(state.base_pos)
    base_quat = tuple(state.base_quat[:, i] for i in range(4))
    q = [state.q[:, j] for j in range(model.nv)]

    comps = dict(
        base_pos=base_pos,
        base_quat=base_quat,
        base_v=_v3(state.base_lin_vel),
        base_w=_v3(state.base_ang_vel),
        q=q,
        qd=[state.qd[:, j] for j in range(model.nv)],
        tau=[tau[:, j] for j in range(model.nv)],
        imp=(None if implicit_damp is None
             else [implicit_damp[:, j] for j in range(model.nv)]),
        payload=params.payload,
        com_disp=_v3(params.com_displacement),
        restitution=params.restitution,
        mu=0.5 * (params.friction + (terrain.static_friction
                                     if terrain is not None else 1.0)),
    )

    if terrain is not None:
        # terrain height/normal under every geom, sampled once per control
        # step at the entry state (the only gather; q drift within one
        # control step is negligible — same rule as lam_w)
        comps["g_h"], comps["g_n"] = _sample_geom_terrain(
            model, layout, sim_cfg, terrain, base_pos, base_quat, q,
            patch3=terrain_patch)

    if world_boxes is not None:
        comps["origin"] = _v3(env_origin)

    out = substep_chain(model, sim_cfg, layout, comps, fixed_base=fixed_base,
                        world_boxes=world_boxes,
                        world_friction=world_friction)

    new_state = SimState(
        base_pos=_stack_v3(out["base_pos"]),
        base_quat=jnp.stack(out["base_quat"], axis=-1),
        base_lin_vel=_stack_v3(out["base_v"]),
        base_ang_vel=_stack_v3(out["base_w"]),
        q=jnp.stack(out["q"], axis=-1),
        qd=jnp.stack(out["qd"], axis=-1))
    report0 = jnp.stack([_stack_v3(r_) for r_ in out["report"]], axis=1)
    geom_pos_out = jnp.stack([_stack_v3(p) for p in out["geom_pos"]], axis=1)
    return StepOutput(new_state, report0, geom_pos_out)
