"""Batched articulated rigid-body dynamics (Featherstone ABA) in JAX.

TPU-native replacement for the PhysX GPU simulation consumed by the reference
through ``gym.simulate``/``fetch_results`` (reference legged_robot.py:119-121;
SURVEY.md §2.1 N1, N3, N4, N6). Design:

- the robot is a floating-base kinematic tree with revolute joints only
  (what both supported assets are after fixed-joint collapsing);
- forward dynamics via the Articulated-Body Algorithm in body coordinates
  with the free-falling-frame gravity trick; O(nb) sweeps are unrolled
  Python loops over the (static, ~13-body) tree — every op inside is batched
  over the env axis by ``vmap``, which is where the parallelism lives;
- per-env physical parameters (payload mass, CoM displacement) enter the
  base spatial inertia as *tensor inputs*, so domain randomization is a
  cheap on-device update instead of a sim rebuild (SURVEY.md N6);
- integration is semi-implicit Euler at ``sim.dt`` (reference dt=0.005,
  legged_robot_config.py:238).

State lives in a :class:`SimState` PyTree; "indexed writes" (resets) are
masked ``jnp.where`` merges performed by the env layer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import quat as Q
from . import spatial as S


class SimState(NamedTuple):
    """Dynamic state of one robot (batched by the env layer via vmap).

    The reference packs this as root_states [13] + dof_state [nv,2]
    (legged_robot.py:950-960); here it is a typed PyTree.
    """
    base_pos: jnp.ndarray     # [3] world
    base_quat: jnp.ndarray    # [4] xyzw, body->world
    base_lin_vel: jnp.ndarray  # [3] world, velocity of base frame origin
    base_ang_vel: jnp.ndarray  # [3] world
    q: jnp.ndarray            # [nv] joint positions
    qd: jnp.ndarray           # [nv] joint velocities


class BodyFrames(NamedTuple):
    """World-frame kinematics of every dynamics body."""
    R: jnp.ndarray        # [nb,3,3] body->world rotation
    p: jnp.ndarray        # [nb,3] body frame origin, world
    w: jnp.ndarray        # [nb,3] angular velocity, world
    v: jnp.ndarray        # [nb,3] velocity of the body frame origin, world


def _axis_rotmat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation about a (constant, unit) axis; broadcasts over
    leading batch axes of both arguments."""
    K = S.skew(axis)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def fk(model, state: SimState) -> BodyFrames:
    """Forward kinematics + world-frame velocity propagation."""
    nb = model.nb
    R0 = Q.quat_to_rotmat(state.base_quat)
    Rs = [R0]
    ps = [state.base_pos]
    ws = [state.base_ang_vel]
    vs = [state.base_lin_vel]
    for i in range(1, nb):
        j = i - 1
        par = int(model.parent[i])
        E_tree = jnp.asarray(model.E_tree[j], dtype=jnp.float32)
        p_tree = jnp.asarray(model.p_tree[j], dtype=jnp.float32)
        axis = jnp.asarray(model.axis[j], dtype=jnp.float32)
        R_pc = E_tree @ _axis_rotmat(axis, state.q[j])
        R_w = Rs[par] @ R_pc
        p_w = Rs[par] @ p_tree + ps[par]
        w_w = ws[par] + R_w @ (axis * state.qd[j])
        v_w = vs[par] + jnp.cross(ws[par], p_w - ps[par])
        Rs.append(R_w)
        ps.append(p_w)
        ws.append(w_w)
        vs.append(v_w)
    return BodyFrames(jnp.stack(Rs), jnp.stack(ps), jnp.stack(ws), jnp.stack(vs))


def geom_world_positions(model, frames: BodyFrames) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World positions and point-velocities of all collision spheres."""
    gb = model.geom_body  # static numpy [ng]
    off = jnp.asarray(model.geom_offset, dtype=jnp.float32)  # [ng,3]
    Rg = frames.R[gb]                     # [ng,3,3]
    pg = jnp.einsum("gij,gj->gi", Rg, off) + frames.p[gb]
    vg = frames.v[gb] + jnp.cross(frames.w[gb], pg - frames.p[gb])
    return pg, vg


def aba(model, state: SimState, tau: jnp.ndarray,
        f_ext_body: Optional[jnp.ndarray], gravity: jnp.ndarray,
        payload: jnp.ndarray, com_offset: jnp.ndarray,
        fixed_base: bool = False,
        return_body_accels: bool = False,
        joint_impedance: Optional[jnp.ndarray] = None):
    """Articulated-Body Algorithm: forward dynamics of the tree.

    Args:
      tau: [nv] joint torques (actuation + passive terms already summed).
      f_ext_body: [nb,6] external spatial forces in each body's own frame
        ([torque-about-origin; force]), or None.
      gravity: [3] world gravity.
      payload: scalar added base mass (domain randomization, reference
        _process_rigid_body_props legged_robot.py:562-568).
      com_offset: [3] base CoM override offset.
      fixed_base: static flag; True pins the base (fix_base_link).
      joint_impedance: optional [nv] extra joint-space diagonal
        dt*(Kd_eff + dt*Kp_eff) — the IMPLICIT integration of the PD
        drive's dependence on the end-of-step state (the same damping a
        TGS iteration gives PhysX's joint drives). tau must still carry
        the drive torque evaluated at the step start.

    Returns:
      (qdd [nv], a0 [6]) — joint accelerations and the TRUE base spatial
      acceleration in base coordinates ([ang; lin]).
    """
    nb, nv = model.nb, model.nv
    f32 = jnp.float32

    # ---- per-body constants (base inertia is per-env due to DR) ---------
    base_mass = jnp.asarray(model.mass[0], f32) + payload
    # reference sets the base CoM to the sampled displacement outright and
    # rescales inertia with the new mass (recomputeInertia=True analogue)
    base_com = com_offset + jnp.asarray(model.com[0], f32)
    base_inertia = jnp.asarray(model.inertia[0], f32) * (
        base_mass / jnp.asarray(model.mass[0], f32))
    I_base = S.spatial_inertia(base_mass, base_com, base_inertia)

    I_body = [I_base]
    for i in range(1, nb):
        I_body.append(S.spatial_inertia(
            jnp.asarray(model.mass[i], f32),
            jnp.asarray(model.com[i], f32),
            jnp.asarray(model.inertia[i], f32)))

    # ---- pass 1: velocities & bias terms --------------------------------
    R0 = Q.quat_to_rotmat(state.base_quat)
    v0 = jnp.concatenate((R0.T @ state.base_ang_vel, R0.T @ state.base_lin_vel))
    v = [v0]
    c = [jnp.zeros(6, f32)]
    Xup_E = [None]   # E (3x3) of motion transform parent->child
    Xup_r = [None]   # r (3) of motion transform
    Ss = [None]
    for i in range(1, nb):
        j = i - 1
        E_tree = jnp.asarray(model.E_tree[j], f32)
        p_tree = jnp.asarray(model.p_tree[j], f32)
        axis = jnp.asarray(model.axis[j], f32)
        R_pc = E_tree @ _axis_rotmat(axis, state.q[j])
        E = R_pc.T            # parent coords -> child coords
        Si = jnp.concatenate((axis, jnp.zeros(3, f32)))
        par = int(model.parent[i])
        vi = S.xform_motion(E, p_tree, v[par]) + Si * state.qd[j]
        ci = S.crm(vi, Si * state.qd[j])
        v.append(vi)
        c.append(ci)
        Xup_E.append(E)
        Xup_r.append(p_tree)
        Ss.append(Si)

    IA = list(I_body)
    pA = []
    for i in range(nb):
        bias = S.crf(v[i], IA[i] @ v[i])
        if f_ext_body is not None:
            bias = bias - f_ext_body[i]
        pA.append(bias)

    # ---- pass 2: articulated inertia backward sweep ---------------------
    U = [None] * nb
    d = [None] * nb
    u = [None] * nb
    for i in range(nb - 1, 0, -1):
        j = i - 1
        Si = Ss[i]
        U[i] = IA[i] @ Si
        d[i] = jnp.maximum(Si @ U[i] + jnp.asarray(model.dof_armature[j], f32)
                           + (joint_impedance[j]
                              if joint_impedance is not None else 0.0),
                           1e-9)
        u[i] = tau[j] - Si @ pA[i]
        par = int(model.parent[i])
        Ia = IA[i] - jnp.outer(U[i], U[i]) / d[i]
        pa = pA[i] + Ia @ c[i] + U[i] * (u[i] / d[i])
        X = S.xmat_motion(Xup_E[i], Xup_r[i])
        IA[par] = IA[par] + X.T @ Ia @ X
        pA[par] = pA[par] + S.xform_force_to_parent(Xup_E[i], Xup_r[i], pa)

    # ---- base acceleration ---------------------------------------------
    # spatial gravity acceleration in base coords
    a_grav = jnp.concatenate((jnp.zeros(3, f32), R0.T @ gravity))
    if fixed_base:
        a0_rel = -a_grav                     # true accel == 0
    else:
        a0_rel = -S.solve_psd6(IA[0], pA[0])

    # ---- pass 3: accelerations forward ---------------------------------
    a = [a0_rel]
    qdd = [None] * nv
    for i in range(1, nb):
        j = i - 1
        par = int(model.parent[i])
        ap = S.xform_motion(Xup_E[i], Xup_r[i], a[par]) + c[i]
        qddi = (u[i] - U[i] @ ap) / d[i]
        qdd[j] = qddi
        a.append(ap + Ss[i] * qddi)

    a0_true = a0_rel + a_grav
    if return_body_accels:
        # true spatial accel of every body in its own coords: the forward
        # sweep runs in the gravity-accelerating frame, and a pure linear
        # acceleration field transforms with rotation only
        R_list = _body_rotations(model, state)
        a_true = [a[i] + jnp.concatenate(
            (jnp.zeros(3, f32), R_list[i].T @ gravity)) for i in range(nb)]
        return jnp.stack(qdd), a0_true, jnp.stack(a_true)
    return jnp.stack(qdd), a0_true


def _body_rotations(model, state: SimState):
    """World rotations of every body (the rotation part of fk)."""
    R0 = Q.quat_to_rotmat(state.base_quat)
    Rs = [R0]
    for i in range(1, model.nb):
        j = i - 1
        E_tree = jnp.asarray(model.E_tree[j], jnp.float32)
        axis = jnp.asarray(model.axis[j], jnp.float32)
        Rs.append(Rs[int(model.parent[i])]
                  @ (E_tree @ _axis_rotmat(axis, state.q[j])))
    return Rs


def point_accels(model, frames: BodyFrames, a_body: jnp.ndarray,
                 arm_w=None) -> jnp.ndarray:
    """Classical world-frame acceleration of a point on each collision
    sphere's body (default: the sphere center; pass ``arm_w`` [ng,3] world
    arms for the contact points), given the true per-body spatial
    accelerations from :func:`aba` (``return_body_accels=True``). Used as
    the contact solver's free acceleration: v_pred = v + dt * a_pt."""
    gb = model.geom_body
    Rg = frames.R[gb]                                      # [ng,3,3]
    wdot_w = jnp.einsum("gij,gj->gi", Rg, a_body[gb, :3])
    a_org_w = (jnp.einsum("gij,gj->gi", Rg, a_body[gb, 3:])
               + jnp.cross(frames.w[gb], frames.v[gb]))
    if arm_w is None:
        off = jnp.asarray(model.geom_offset, jnp.float32)  # [ng,3]
        arm_w = jnp.einsum("gij,gj->gi", Rg, off)
    return (a_org_w + jnp.cross(wdot_w, arm_w)
            + jnp.cross(frames.w[gb], jnp.cross(frames.w[gb], arm_w)))


def inv_psd6(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a symmetric positive-definite 6x6 via the same unrolled
    Cholesky as :func:`spatial.solve_psd6` (elementwise over batch axes)."""
    cols = [S.solve_psd6(A, jnp.broadcast_to(
        jnp.eye(6, dtype=A.dtype)[k], A.shape[:-2] + (6,)))
        for k in range(6)]
    return jnp.stack(cols, axis=-1)


def contact_inv_inertia(model, state: SimState, frames: BodyFrames,
                        payload: jnp.ndarray, com_offset: jnp.ndarray,
                        fixed_base: bool = False,
                        base_split: float = 4.0,
                        contact_arm_w=None,
                        joint_impedance=None) -> jnp.ndarray:
    """Per-geom 3x3 inverse apparent inertia (the diagonal of the Delassus
    operator) at every collision sphere, in world coordinates.

    This is Featherstone's operational-space-inertia recursion: the ABA
    backward sweep condenses the subtree articulated inertias IA_i, then the
    inverse inertia propagates root->leaf:

        Phi_0 = IA_0^-1
        Phi_i = S d^-1 S^T + P (X Phi_p X^T) P^T,   P = 1 - S d^-1 U^T

    and the world-point projection at a geom with body-frame offset r is
    Lam^-1 = R [ -r^ | 1 ] Phi [ -r^ | 1 ]^T R^T.

    This replaces the round-1 heuristic "m_eff = body mass" (a 64 g calf),
    which under-reported the force the articulated chain can bear along an
    extended stance leg by ~50x and capped tangential force transfer (the
    measured cause of the command-tracking gap, scripts/diag_contact.py).

    ``base_split`` mass-splits the BASE inverse-inertia contribution by the
    number of legs that can push the trunk simultaneously — the standard
    Jacobi stabilization for decoupled per-contact solves.
    """
    nb = model.nb
    f32 = jnp.float32

    base_mass = jnp.asarray(model.mass[0], f32) + payload
    base_com = com_offset + jnp.asarray(model.com[0], f32)
    base_inertia = jnp.asarray(model.inertia[0], f32) * (
        base_mass / jnp.asarray(model.mass[0], f32))
    I_body = [S.spatial_inertia(base_mass, base_com, base_inertia)]
    for i in range(1, nb):
        I_body.append(S.spatial_inertia(
            jnp.asarray(model.mass[i], f32),
            jnp.asarray(model.com[i], f32),
            jnp.asarray(model.inertia[i], f32)))

    # backward articulated-inertia sweep (force-independent half of ABA)
    IA = list(I_body)
    Xs = [None] * nb
    Ss = [None] * nb
    Us = [None] * nb
    ds = [None] * nb
    for i in range(nb - 1, 0, -1):
        j = i - 1
        E_tree = jnp.asarray(model.E_tree[j], f32)
        p_tree = jnp.asarray(model.p_tree[j], f32)
        axis = jnp.asarray(model.axis[j], f32)
        E = (E_tree @ _axis_rotmat(axis, state.q[j])).T
        Si = jnp.concatenate((axis, jnp.zeros(3, f32)))
        U = IA[i] @ Si
        d = jnp.maximum(Si @ U + jnp.asarray(model.dof_armature[j], f32)
                        + (joint_impedance[j]
                           if joint_impedance is not None else 0.0),
                        1e-9)
        par = int(model.parent[i])
        Ia = IA[i] - jnp.outer(U, U) / d
        X = S.xmat_motion(E, p_tree)
        IA[par] = IA[par] + X.T @ Ia @ X
        Xs[i], Ss[i], Us[i], ds[i] = X, Si, U, d

    # forward inverse-inertia propagation
    Phi = [None] * nb
    if fixed_base:
        Phi[0] = jnp.zeros((6, 6), f32)
    else:
        Phi[0] = base_split * inv_psd6(IA[0])
    for i in range(1, nb):
        par = int(model.parent[i])
        M = Xs[i] @ Phi[par] @ Xs[i].T
        P = jnp.eye(6, dtype=f32) - jnp.outer(Ss[i], Us[i]) / ds[i]
        Phi[i] = (jnp.outer(Ss[i], Ss[i]) / ds[i] + P @ M @ P.T)

    # project to world-frame point inverse inertia per geom.
    # contact_arm_w (optional, [ng,3]): world-frame arm from the body
    # origin to the CONTACT POINT (sphere surface, not center) — the
    # friction constraint must act where the material touches.
    if model.ng == 0:
        return jnp.zeros((0, 3, 3), f32)
    lam_inv = []
    for g in range(model.ng):
        b = int(model.geom_body[g])
        R = frames.R[b]
        if contact_arm_w is None:
            r = R @ jnp.asarray(model.geom_offset[g], f32)
        else:
            r = contact_arm_w[g]
        # world-frame Phi: T Phi T^T with T = blockdiag(R, R)
        A_w = R @ Phi[b][:3, :3] @ R.T
        B_w = R @ Phi[b][:3, 3:] @ R.T
        D_w = R @ Phi[b][3:, 3:] @ R.T
        Sm = -S.skew(r)
        lam_inv.append(Sm @ A_w @ Sm.T + Sm @ B_w + B_w.T @ Sm.T + D_w)
    return jnp.stack(lam_inv)         # [ng,3,3]


def articulated_sweeps(model, state: SimState, gravity: jnp.ndarray,
                       payload: jnp.ndarray, com_offset: jnp.ndarray,
                       fixed_base: bool = False,
                       joint_impedance: Optional[jnp.ndarray] = None):
    """Factor the ABA into its force-independent half (velocities, bias,
    articulated-inertia backward sweep) plus a reusable bias solver, so one
    physics substep shares ONE inertia sweep between the OSIM projection,
    the free-dynamics pass and the final contact pass (the split aba/
    contact_inv_inertia calls each redid it).

    Returns (sweeps dict, solve) where solve(tau, f_ext_body,
    return_body_accels) -> (qdd, a0_true[, a_body])."""
    nb, nv = model.nb, model.nv
    f32 = jnp.float32

    base_mass = jnp.asarray(model.mass[0], f32) + payload
    base_com = com_offset + jnp.asarray(model.com[0], f32)
    base_inertia = jnp.asarray(model.inertia[0], f32) * (
        base_mass / jnp.asarray(model.mass[0], f32))
    I_body = [S.spatial_inertia(base_mass, base_com, base_inertia)]
    for i in range(1, nb):
        I_body.append(S.spatial_inertia(
            jnp.asarray(model.mass[i], f32),
            jnp.asarray(model.com[i], f32),
            jnp.asarray(model.inertia[i], f32)))

    R0 = Q.quat_to_rotmat(state.base_quat)
    v0 = jnp.concatenate((R0.T @ state.base_ang_vel,
                          R0.T @ state.base_lin_vel))
    v = [v0]
    c = [jnp.zeros(6, f32)]
    Xup_E = [None]
    Xup_r = [None]
    Ss = [None]
    for i in range(1, nb):
        j = i - 1
        E_tree = jnp.asarray(model.E_tree[j], f32)
        p_tree = jnp.asarray(model.p_tree[j], f32)
        axis = jnp.asarray(model.axis[j], f32)
        E = (E_tree @ _axis_rotmat(axis, state.q[j])).T
        Si = jnp.concatenate((axis, jnp.zeros(3, f32)))
        par = int(model.parent[i])
        vi = S.xform_motion(E, p_tree, v[par]) + Si * state.qd[j]
        v.append(vi)
        c.append(S.crm(vi, Si * state.qd[j]))
        Xup_E.append(E)
        Xup_r.append(p_tree)
        Ss.append(Si)

    pA_vel = [S.crf(v[i], I_body[i] @ v[i]) for i in range(nb)]

    IA = list(I_body)
    U = [None] * nb
    d = [None] * nb
    Ia_s = [None] * nb
    for i in range(nb - 1, 0, -1):
        j = i - 1
        Si = Ss[i]
        U[i] = IA[i] @ Si
        d[i] = jnp.maximum(Si @ U[i] + jnp.asarray(model.dof_armature[j], f32)
                           + (joint_impedance[j]
                              if joint_impedance is not None else 0.0),
                           1e-9)
        Ia = IA[i] - jnp.outer(U[i], U[i]) / d[i]
        Ia_s[i] = Ia
        par = int(model.parent[i])
        X = S.xmat_motion(Xup_E[i], Xup_r[i])
        IA[par] = IA[par] + X.T @ Ia @ X

    a_grav = jnp.concatenate((jnp.zeros(3, f32), R0.T @ gravity))

    def solve(tau, f_ext_body, return_body_accels: bool = False):
        pA = [pA_vel[i] - (f_ext_body[i] if f_ext_body is not None else 0.0)
              for i in range(nb)]
        u = [None] * nb
        for i in range(nb - 1, 0, -1):
            j = i - 1
            u[i] = tau[j] - Ss[i] @ pA[i]
            pa = pA[i] + Ia_s[i] @ c[i] + U[i] * (u[i] / d[i])
            par = int(model.parent[i])
            pA[par] = pA[par] + S.xform_force_to_parent(
                Xup_E[i], Xup_r[i], pa)
        if fixed_base:
            a0_rel = -a_grav
        else:
            a0_rel = -S.solve_psd6(IA[0], pA[0])
        a = [a0_rel]
        qdd = [None] * nv
        for i in range(1, nb):
            j = i - 1
            par = int(model.parent[i])
            ap = S.xform_motion(Xup_E[i], Xup_r[i], a[par]) + c[i]
            qdd[j] = (u[i] - U[i] @ ap) / d[i]
            a.append(ap + Ss[i] * qdd[j])
        a0_true = a0_rel + a_grav
        if return_body_accels:
            R_list = _body_rotations(model, state)
            a_true = [a[i] + jnp.concatenate(
                (jnp.zeros(3, f32), R_list[i].T @ gravity))
                for i in range(nb)]
            return jnp.stack(qdd), a0_true, jnp.stack(a_true)
        return jnp.stack(qdd), a0_true

    sweeps = dict(IA=IA, U=U, d=d, Xs=[None] + [
        S.xmat_motion(Xup_E[i], Xup_r[i]) for i in range(1, nb)],
        Ss=Ss)
    return sweeps, solve


def osim_from_sweeps(model, sweeps, frames: BodyFrames,
                     contact_arm_w: jnp.ndarray,
                     fixed_base: bool = False,
                     base_split: float = 4.0,
                     return_ang: bool = False,
                     return_base: bool = False) -> jnp.ndarray:
    """Per-geom world 3x3 inverse apparent inertia from a completed
    articulated-inertia sweep (see contact_inv_inertia for semantics).

    With ``return_ang=True`` additionally returns the per-geom world
    ANGULAR inverse apparent inertia block A_w ([ng,3,3]): the body's
    angular-velocity response to a pure torque (application-point
    independent), used by the torsional-friction patch model.

    With ``return_base=True`` additionally returns the WORLD-frame base
    mobility Phi0_w ([6,6], spatial order [ang; lin], about the base
    origin, WITHOUT the Jacobi split): the dominant cross-contact
    coupling term for the iterated contact solve — feet on different
    limbs interact (to leading order) only through the floating base
    (contact_forces_implicit iterations > 1)."""
    nb = model.nb
    f32 = jnp.float32
    IA, U, d, Xs, Ss = (sweeps["IA"], sweeps["U"], sweeps["d"],
                        sweeps["Xs"], sweeps["Ss"])
    Phi = [None] * nb
    if fixed_base:
        Phi[0] = jnp.zeros((6, 6), f32)
    else:
        Phi[0] = base_split * inv_psd6(IA[0])
    phi0_w = None
    if return_base:
        R0 = frames.R[0]
        Z = jnp.zeros((3, 3), f32)
        blk = jnp.block([[R0, Z], [Z, R0]])
        phi0_w = blk @ (Phi[0] / (base_split if not fixed_base else 1.0)
                        ) @ blk.T
    for i in range(1, nb):
        par = int(model.parent[i])
        M = Xs[i] @ Phi[par] @ Xs[i].T
        P = jnp.eye(6, dtype=f32) - jnp.outer(Ss[i], U[i]) / d[i]
        Phi[i] = jnp.outer(Ss[i], Ss[i]) / d[i] + P @ M @ P.T

    if model.ng == 0:
        z = jnp.zeros((0, 3, 3), f32)
        out = [z] + ([z] if return_ang else [])
    else:
        lam_inv = []
        ang_inv = []
        for g in range(model.ng):
            b = int(model.geom_body[g])
            R = frames.R[b]
            r = contact_arm_w[g]
            A_w = R @ Phi[b][:3, :3] @ R.T
            B_w = R @ Phi[b][:3, 3:] @ R.T
            D_w = R @ Phi[b][3:, 3:] @ R.T
            Sm = -S.skew(r)
            lam_inv.append(Sm @ A_w @ Sm.T + Sm @ B_w + B_w.T @ Sm.T + D_w)
            ang_inv.append(A_w)
        out = [jnp.stack(lam_inv)] + ([jnp.stack(ang_inv)]
                                      if return_ang else [])
    if return_base:
        out.append(phi0_w if phi0_w is not None
                   else jnp.zeros((6, 6), f32))
    return out[0] if len(out) == 1 else tuple(out)


class PhysParams(NamedTuple):
    """Per-env physical properties entering the dynamics (SURVEY.md N6)."""
    friction: jnp.ndarray          # [] robot shape friction coeff
    restitution: jnp.ndarray       # []
    payload: jnp.ndarray           # [] added base mass [kg]
    com_displacement: jnp.ndarray  # [3] base CoM offset [m]


def joint_limit_torque(model, q: jnp.ndarray, qd: jnp.ndarray,
                       k: float = 300.0, damp: float = 2.0) -> jnp.ndarray:
    """Penalty torque enforcing URDF joint limits (PhysX limit analogue)."""
    lower = jnp.asarray(model.dof_lower, jnp.float32)
    upper = jnp.asarray(model.dof_upper, jnp.float32)
    below = jnp.minimum(q - lower, 0.0)
    above = jnp.maximum(q - upper, 0.0)
    viol = (below < 0) | (above > 0)
    return -k * (below + above) - damp * qd * viol


def integrate(state: SimState, qdd: jnp.ndarray, a0: jnp.ndarray,
              dt: float, fixed_base: bool = False) -> SimState:
    """Semi-implicit Euler update of the full state."""
    R0 = Q.quat_to_rotmat(state.base_quat)
    if fixed_base:
        new_w = jnp.zeros(3, jnp.float32)
        new_v = jnp.zeros(3, jnp.float32)
        new_pos = state.base_pos
        new_quat = state.base_quat
    else:
        # convert base spatial accel (body coords) to world-frame classical
        # accelerations: ω̇_w = R ω̇_b ;  r̈_w = R a_lin_b + ω_w × ṙ_w
        wdot_w = R0 @ a0[:3]
        acc_w = R0 @ a0[3:] + jnp.cross(state.base_ang_vel, state.base_lin_vel)
        new_w = state.base_ang_vel + dt * wdot_w
        new_v = state.base_lin_vel + dt * acc_w
        new_pos = state.base_pos + dt * new_v
        new_quat = Q.quat_integrate(state.base_quat, new_w, dt)
    new_qd = state.qd + dt * qdd
    new_q = state.q + dt * new_qd
    return SimState(new_pos, new_quat, new_v, new_w, new_q, new_qd)
