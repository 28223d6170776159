"""Limb-batched articulated dynamics — the quadruped fast path.

The generic ABA in :mod:`dynamics` unrolls the tree body-by-body: ~350
small tensor ops per substep, which is dispatch-bound on TPU. Quadrupeds
(and most legged robots) are a base plus K isomorphic chains, so the limb
axis can be *batched*: every per-body op becomes a per-level op over
``[K, ...]`` tensors, cutting op count ~K-fold while increasing op size
K-fold — exactly what the TPU wants.

:func:`detect_limbs` finds the (K limbs x D levels) layout from the generic
:class:`RobotModel`; when the tree does not decompose (or
``SimCfg.use_limb_batching`` is off), the generic path is used. Numerics
are equivalent to the generic ABA (see tests/test_limb_dynamics.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import quat as Q
from . import spatial as S
from .dynamics import BodyFrames, SimState, _axis_rotmat


@dataclass(frozen=True)
class LimbLayout:
    """K chains of depth D hanging off the base."""
    K: int
    D: int
    body_index: np.ndarray   # [D,K] dynamics body index of (level, limb)

    @property
    def joint_index(self) -> np.ndarray:
        return self.body_index - 1   # joint j connects body j+1


def detect_limbs(model) -> Optional[LimbLayout]:
    """Partition bodies 1..nb-1 into equal-depth single-child chains."""
    children: List[List[int]] = [[] for _ in range(model.nb)]
    for i in range(1, model.nb):
        children[int(model.parent[i])].append(i)
    roots = children[0]
    if not roots:
        return None
    chains = []
    for r in roots:
        chain = [r]
        cur = r
        while True:
            cs = children[cur]
            if len(cs) == 0:
                break
            if len(cs) != 1:
                return None
            cur = cs[0]
            chain.append(cur)
        chains.append(chain)
    depth = len(chains[0])
    if any(len(c) != depth for c in chains):
        return None
    if len(chains) * depth != model.nb - 1:
        return None
    body_index = np.asarray(chains, dtype=np.int32).T   # [D,K]
    return LimbLayout(K=len(chains), D=depth, body_index=body_index)


class _Packed(NamedTuple):
    """Per-level packed model constants (trace-time)."""
    E_tree: jnp.ndarray      # [D,K,3,3]
    p_tree: jnp.ndarray      # [D,K,3]
    axis: jnp.ndarray        # [D,K,3]
    armature: jnp.ndarray    # [D,K]
    damping: jnp.ndarray     # [D,K]
    inertia6: jnp.ndarray    # [D,K,6,6] spatial inertias
    jidx: np.ndarray         # [D,K] joint index (static)


def _np_spatial_inertia(mass: float, com: np.ndarray,
                        inertia: np.ndarray) -> np.ndarray:
    c = np.array([[0, -com[2], com[1]],
                  [com[2], 0, -com[0]],
                  [-com[1], com[0], 0]])
    out = np.zeros((6, 6))
    out[:3, :3] = inertia + mass * (c @ c.T)
    out[:3, 3:] = mass * c
    out[3:, :3] = mass * c.T
    out[3:, 3:] = mass * np.eye(3)
    return out


def _pack(model, layout: LimbLayout) -> _Packed:
    j = layout.joint_index
    f32 = jnp.float32
    I6 = np.zeros((layout.D, layout.K, 6, 6))
    for d in range(layout.D):
        for k in range(layout.K):
            b = int(layout.body_index[d, k])
            I6[d, k] = _np_spatial_inertia(
                float(model.mass[b]), np.asarray(model.com[b]),
                np.asarray(model.inertia[b]))
    return _Packed(
        E_tree=jnp.asarray(model.E_tree[j], f32),
        p_tree=jnp.asarray(model.p_tree[j], f32),
        axis=jnp.asarray(model.axis[j], f32),
        armature=jnp.asarray(model.dof_armature[j], f32),
        damping=jnp.asarray(model.dof_damping[j], f32),
        inertia6=jnp.asarray(I6, f32),
        jidx=j,
    )


def layout_for(model) -> Optional[LimbLayout]:
    """Host-side, trace-safe limb layout of a model. Deliberately uncached:
    an id()-keyed cache collides when model objects are collected, and
    detection is cheap trace-time-only work."""
    return detect_limbs(model)


def fk_limb(model, layout: LimbLayout, state: SimState) -> BodyFrames:
    """Forward kinematics with the limb axis batched; returns frames in the
    ORIGINAL body order (base + model order) for downstream geom code."""
    pk = _pack(model, layout)
    f32 = jnp.float32
    R0 = Q.quat_to_rotmat(state.base_quat)
    q_l = state.q[pk.jidx]                  # [D,K]
    qd_l = state.qd[pk.jidx]

    Rs = [R0]
    ps = [state.base_pos]
    ws = [state.base_ang_vel]
    vs = [state.base_lin_vel]
    R_par = jnp.broadcast_to(R0, (layout.K, 3, 3))
    p_par = jnp.broadcast_to(state.base_pos, (layout.K, 3))
    w_par = jnp.broadcast_to(state.base_ang_vel, (layout.K, 3))
    v_par = jnp.broadcast_to(state.base_lin_vel, (layout.K, 3))
    lvl_R, lvl_p, lvl_w, lvl_v = [], [], [], []
    for d in range(layout.D):
        R_pc = pk.E_tree[d] @ _axis_rotmat(pk.axis[d], q_l[d])  # [K,3,3]
        R_w = R_par @ R_pc
        p_w = jnp.einsum("kij,kj->ki", R_par, pk.p_tree[d]) + p_par
        w_w = w_par + jnp.einsum("kij,kj->ki", R_w,
                                 pk.axis[d] * qd_l[d][:, None])
        v_w = v_par + jnp.cross(w_par, p_w - p_par)
        lvl_R.append(R_w); lvl_p.append(p_w)
        lvl_w.append(w_w); lvl_v.append(v_w)
        R_par, p_par, w_par, v_par = R_w, p_w, w_w, v_w

    # scatter back to original body order (static permutation)
    nb = model.nb
    R_all = [None] * nb
    p_all = [None] * nb
    w_all = [None] * nb
    v_all = [None] * nb
    R_all[0], p_all[0], w_all[0], v_all[0] = Rs[0], ps[0], ws[0], vs[0]
    for d in range(layout.D):
        for k in range(layout.K):
            b = int(layout.body_index[d, k])
            R_all[b] = lvl_R[d][k]
            p_all[b] = lvl_p[d][k]
            w_all[b] = lvl_w[d][k]
            v_all[b] = lvl_v[d][k]
    return BodyFrames(jnp.stack(R_all), jnp.stack(p_all),
                      jnp.stack(w_all), jnp.stack(v_all))


def aba_limb(model, layout: LimbLayout, state: SimState, tau: jnp.ndarray,
             f_ext_body: Optional[jnp.ndarray], gravity: jnp.ndarray,
             payload: jnp.ndarray, com_offset: jnp.ndarray,
             fixed_base: bool = False,
             joint_impedance: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Limb-batched ABA; same contract as :func:`dynamics.aba` (including
    the implicit-PD ``joint_impedance`` diagonal term)."""
    pk = _pack(model, layout)
    f32 = jnp.float32
    D, K = layout.D, layout.K

    q_l = state.q[pk.jidx]
    qd_l = state.qd[pk.jidx]
    tau_l = tau[pk.jidx]
    imp_l = None if joint_impedance is None else joint_impedance[pk.jidx]

    base_mass = jnp.asarray(model.mass[0], f32) + payload
    base_com = com_offset + jnp.asarray(model.com[0], f32)
    base_inertia = jnp.asarray(model.inertia[0], f32) * (
        base_mass / jnp.asarray(model.mass[0], f32))
    IA_base = S.spatial_inertia(base_mass, base_com, base_inertia)

    R0 = Q.quat_to_rotmat(state.base_quat)
    v0 = jnp.concatenate((R0.T @ state.base_ang_vel,
                          R0.T @ state.base_lin_vel))

    # pass 1: velocities + bias, level by level
    Xup_E, Ss_l, v_lvl, c_lvl = [], [], [], []
    v_par = jnp.broadcast_to(v0, (K, 6))
    for d in range(D):
        R_pc = pk.E_tree[d] @ _axis_rotmat(pk.axis[d], q_l[d])
        E = jnp.swapaxes(R_pc, -1, -2)                       # [K,3,3]
        Si = jnp.concatenate((pk.axis[d], jnp.zeros((K, 3), f32)), axis=-1)
        vi = S.xform_motion(E, pk.p_tree[d], v_par) + Si * qd_l[d][:, None]
        ci = S.crm(vi, Si * qd_l[d][:, None])
        Xup_E.append(E); Ss_l.append(Si)
        v_lvl.append(vi); c_lvl.append(ci)
        v_par = vi

    IA_lvl = [pk.inertia6[d] for d in range(D)]              # [K,6,6]
    pA_lvl = []
    for d in range(D):
        bias = S.crf(v_lvl[d], jnp.einsum("kab,kb->ka", IA_lvl[d], v_lvl[d]))
        if f_ext_body is not None:
            bias = bias - f_ext_body[layout.body_index[d]]   # static gather
        pA_lvl.append(bias)
    pA_base = S.crf(v0, IA_base @ v0)
    if f_ext_body is not None:
        pA_base = pA_base - f_ext_body[0]

    # pass 2: backward
    U_l, d_l, u_l = [None] * D, [None] * D, [None] * D
    for d in range(D - 1, -1, -1):
        Si = Ss_l[d]
        U = jnp.einsum("kab,kb->ka", IA_lvl[d], Si)
        dd = jnp.maximum(jnp.sum(Si * U, -1) + pk.armature[d]
                         + (imp_l[d] if imp_l is not None else 0.0), 1e-9)
        uu = tau_l[d] - jnp.sum(Si * pA_lvl[d], -1)
        U_l[d], d_l[d], u_l[d] = U, dd, uu
        Ia = IA_lvl[d] - U[:, :, None] * U[:, None, :] / dd[:, None, None]
        pa = (pA_lvl[d] + jnp.einsum("kab,kb->ka", Ia, c_lvl[d])
              + U * (uu / dd)[:, None])
        X = S.xmat_motion(Xup_E[d], pk.p_tree[d])            # [K,6,6]
        XIaX = jnp.einsum("kba,kbc,kcd->kad", X, Ia, X)
        pa_par = S.xform_force_to_parent(Xup_E[d], pk.p_tree[d], pa)
        if d > 0:
            IA_lvl[d - 1] = IA_lvl[d - 1] + XIaX
            pA_lvl[d - 1] = pA_lvl[d - 1] + pa_par
        else:
            IA_base = IA_base + jnp.sum(XIaX, axis=0)
            pA_base = pA_base + jnp.sum(pa_par, axis=0)

    a_grav = jnp.concatenate((jnp.zeros(3, f32), R0.T @ gravity))
    if fixed_base:
        a0_rel = -a_grav
    else:
        a0_rel = -S.solve_psd6(IA_base, pA_base)

    # pass 3: forward
    qdd_l = []
    a_par = jnp.broadcast_to(a0_rel, (K, 6))
    for d in range(D):
        ap = S.xform_motion(Xup_E[d], pk.p_tree[d], a_par) + c_lvl[d]
        qdd = (u_l[d] - jnp.sum(U_l[d] * ap, -1)) / d_l[d]
        a_par = ap + Ss_l[d] * qdd[:, None]
        qdd_l.append(qdd)

    # back to joint order (static scatter)
    qdd_full = jnp.zeros(model.nv, f32)
    qdd_full = qdd_full.at[pk.jidx.reshape(-1)].set(
        jnp.stack(qdd_l).reshape(-1))
    return qdd_full, a0_rel + a_grav
