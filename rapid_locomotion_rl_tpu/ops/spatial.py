"""6-D spatial vector algebra (Featherstone convention: [angular; linear]).

Building blocks for the articulated-body dynamics in
:mod:`rapid_locomotion_rl_tpu.ops.dynamics` — the TPU-native replacement for
the PhysX rigid-body solver consumed by the reference via
``gym.simulate`` (reference legged_robot.py:119-121, SURVEY.md §2.1 N1).

All functions broadcast over leading batch axes. Motion vectors are
``[ω; v]``, force vectors ``[n; f]``, both expressed in a frame with a
stated origin. Spatial transforms are represented either functionally
(rotation ``E`` + origin offset ``r``) or as explicit 6x6 matrices where
matrix products are required (articulated-inertia propagation).
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrix: skew(a) @ b = a × b."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack((zero, -z, y, z, zero, -x, -y, x, zero), axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def spatial_inertia(mass, com: jnp.ndarray, inertia_com: jnp.ndarray) -> jnp.ndarray:
    """6x6 spatial inertia about the body-frame origin.

    Args:
      mass: [...] scalar mass.
      com: [..., 3] center of mass in body frame.
      inertia_com: [..., 3, 3] rotational inertia about the CoM.
    """
    mass = jnp.asarray(mass)
    c = skew(com)
    ct = jnp.swapaxes(c, -1, -2)
    m = mass[..., None, None]
    top_left = inertia_com + m * (c @ ct)
    top_right = m * c
    bot_left = m * ct
    bot_right = m * jnp.broadcast_to(jnp.eye(3), c.shape)
    top = jnp.concatenate((top_left, top_right), axis=-1)
    bot = jnp.concatenate((bot_left, bot_right), axis=-1)
    return jnp.concatenate((top, bot), axis=-2)


def xmat_motion(E: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """6x6 motion transform B<-A for a frame with rotation E (x_B = E x_A)
    and origin at r (expressed in A): X = [[E, 0], [-E r̂, E]]."""
    zero = jnp.zeros_like(E)
    top = jnp.concatenate((E, zero), axis=-1)
    bot = jnp.concatenate((-E @ skew(r), E), axis=-1)
    return jnp.concatenate((top, bot), axis=-2)


def xform_motion(E: jnp.ndarray, r: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply the motion transform B<-A to motion vector v (in A coords)."""
    w, vl = v[..., :3], v[..., 3:]
    wn = jnp.einsum("...ij,...j->...i", E, w)
    vn = jnp.einsum("...ij,...j->...i", E, vl + jnp.cross(w, r))
    return jnp.concatenate((wn, vn), axis=-1)


def xform_motion_inv(E: jnp.ndarray, r: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply the inverse transform A<-B to motion vector v (in B coords)."""
    w, vl = v[..., :3], v[..., 3:]
    Et = jnp.swapaxes(E, -1, -2)
    wn = jnp.einsum("...ij,...j->...i", Et, w)
    vn = jnp.einsum("...ij,...j->...i", Et, vl) - jnp.cross(wn, r)
    return jnp.concatenate((wn, vn), axis=-1)


def xform_force_to_parent(E: jnp.ndarray, r: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Transform force vector f from child (B) coords back to parent (A):
    f_A = X_{B<-A}ᵀ f_B (power-invariance dual of xform_motion)."""
    n, fl = f[..., :3], f[..., 3:]
    Et = jnp.swapaxes(E, -1, -2)
    fA = jnp.einsum("...ij,...j->...i", Et, fl)
    nA = jnp.einsum("...ij,...j->...i", Et, n) + jnp.cross(r, fA)
    return jnp.concatenate((nA, fA), axis=-1)


def crm(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product v ×ₘ m."""
    w, vl = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        (jnp.cross(w, mw), jnp.cross(vl, mw) + jnp.cross(w, ml)), axis=-1
    )


def solve_psd6(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for symmetric positive-definite 6x6 A via a fully
    unrolled Cholesky — every op is elementwise over the batch axes, so XLA
    fuses the whole solve (batched `linalg.solve` lowers to a slow pivoting
    loop on TPU)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    # forward substitution: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def crf(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product v ×* f."""
    n, fl = f[..., :3], f[..., 3:]
    w, vl = v[..., :3], v[..., 3:]
    return jnp.concatenate(
        (jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)), axis=-1
    )
