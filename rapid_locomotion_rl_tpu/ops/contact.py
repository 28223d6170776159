"""Sphere-vs-terrain contact: penalty normal force + regularized Coulomb
friction, with first-class contact-force reporting.

TPU-native replacement for PhysX contact dynamics and the net-contact-force
tensor (reference ``acquire_net_contact_force_tensor``,
legged_robot.py:941, :146; SURVEY.md §2.1 N2, N7). Terrain is either an
analytic plane (z=0) or a height grid in HBM shared with height sensing
(legged_robot.py:1469-1503).

Per-env friction/restitution are tensor inputs (domain randomization,
reference `_process_rigid_shape_props` legged_robot.py:471-487); the
effective ground friction follows PhysX's default *average* combine mode
between the robot-shape value and the terrain value.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class TerrainGrid(NamedTuple):
    """Height grid in HBM (reference height_samples, legged_robot.py:1141).

    world x,y map to grid indices via (x + border) / horizontal_scale; grid
    axis 0 is x (rows), axis 1 is y (cols), matching the reference layout.
    """
    height: jnp.ndarray          # [rows, cols] float32 meters (pre-scaled)
    horizontal_scale: float
    border_size: float           # world offset of grid origin
    static_friction: float
    dynamic_friction: float
    restitution: float


def terrain_height_bilinear(grid: TerrainGrid, x: jnp.ndarray, y: jnp.ndarray
                            ) -> jnp.ndarray:
    """Bilinearly interpolated terrain height at world (x, y)."""
    h = grid.height
    fx = (x + grid.border_size) / grid.horizontal_scale
    fy = (y + grid.border_size) / grid.horizontal_scale
    ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, h.shape[0] - 2)
    iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h.shape[1] - 2)
    tx = jnp.clip(fx - ix, 0.0, 1.0)
    ty = jnp.clip(fy - iy, 0.0, 1.0)
    h00 = h[ix, iy]
    h10 = h[ix + 1, iy]
    h01 = h[ix, iy + 1]
    h11 = h[ix + 1, iy + 1]
    return ((1 - tx) * (1 - ty) * h00 + tx * (1 - ty) * h10
            + (1 - tx) * ty * h01 + tx * ty * h11)


def terrain_height_min3(grid: TerrainGrid, x: jnp.ndarray, y: jnp.ndarray
                        ) -> jnp.ndarray:
    """min of the 3 nearest samples — the reference's conservative height
    sensing rule (_get_heights, legged_robot.py:1497-1501)."""
    h = grid.height
    ix = jnp.clip(((x + grid.border_size) / grid.horizontal_scale).astype(jnp.int32),
                  0, h.shape[0] - 2)
    iy = jnp.clip(((y + grid.border_size) / grid.horizontal_scale).astype(jnp.int32),
                  0, h.shape[1] - 2)
    return jnp.minimum(jnp.minimum(h[ix, iy], h[ix + 1, iy]), h[ix, iy + 1])


def terrain_height_min3_patch(grid: TerrainGrid, base_x: jnp.ndarray,
                              base_y: jnp.ndarray, x: jnp.ndarray,
                              y: jnp.ndarray, P: int = 32) -> jnp.ndarray:
    """:func:`terrain_height_min3` with ZERO element gathers: one
    contiguous P x P patch per env (:func:`sample_patch`) and the three
    min-taps as one-hot row/col einsums over it (MXU work, like
    :func:`patch_height_and_normal_mm`).

    Exists because the observation height sensor was the LAST per-element
    gather in the hot loop: N x num_height_points x 3 scalar loads into
    the tens-of-MB grid per env step (4000 x 187 x 3 = 2.2M/step at the
    flagship) kept the rollout terrain-bound (544 of 604 ms/iter) after
    the contact path moved to the patch scheme. x, y are [N, npts] world
    coordinates; P must cover the yaw-rotated sample grid's radius
    (caller sizes it from the measured-points extent). Bit-identical to
    the direct version while every point lands inside the patch."""
    patch, ix0, iy0 = sample_patch(grid, base_x, base_y, P)
    h = grid.height
    s = grid.horizontal_scale
    ix = jnp.clip(((x + grid.border_size) / s).astype(jnp.int32),
                  0, h.shape[0] - 2)
    iy = jnp.clip(((y + grid.border_size) / s).astype(jnp.int32),
                  0, h.shape[1] - 2)
    rx = jnp.clip(ix - ix0[:, None], 0, P - 2)
    ry = jnp.clip(iy - iy0[:, None], 0, P - 2)
    ar = jnp.arange(P, dtype=jnp.int32)
    r0 = (rx[..., None] == ar).astype(patch.dtype)       # [N, npts, P]
    r1 = (rx[..., None] + 1 == ar).astype(patch.dtype)
    c0 = (ry[..., None] == ar).astype(patch.dtype)
    c1 = (ry[..., None] + 1 == ar).astype(patch.dtype)
    # taps (ix,iy), (ix+1,iy), (ix,iy+1) — rows r0,r1,r0 / cols c0,c0,c1
    R = jnp.stack([r0, r1, r0], axis=2)                  # [N, npts, 3, P]
    C = jnp.stack([c0, c0, c1], axis=2)
    tmp = jnp.einsum("npkr,nrc->npkc", R, patch)
    taps = jnp.einsum("npkc,npkc->npk", tmp, C)
    return jnp.min(taps, axis=-1)


def terrain_height_and_normal(grid: TerrainGrid, x: jnp.ndarray,
                              y: jnp.ndarray
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear height AND unit normal from ONE 4-corner lookup.

    The normal is the analytic gradient of the bilinear patch — no extra
    gathers (TPU gathers are the expensive primitive here)."""
    h = grid.height
    s = grid.horizontal_scale
    fx = (x + grid.border_size) / s
    fy = (y + grid.border_size) / s
    ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, h.shape[0] - 2)
    iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h.shape[1] - 2)
    tx = jnp.clip(fx - ix, 0.0, 1.0)
    ty = jnp.clip(fy - iy, 0.0, 1.0)
    h00 = h[ix, iy]
    h10 = h[ix + 1, iy]
    h01 = h[ix, iy + 1]
    h11 = h[ix + 1, iy + 1]
    height = ((1 - tx) * (1 - ty) * h00 + tx * (1 - ty) * h10
              + (1 - tx) * ty * h01 + tx * ty * h11)
    dhdx = ((1 - ty) * (h10 - h00) + ty * (h11 - h01)) / s
    dhdy = ((1 - tx) * (h01 - h00) + tx * (h11 - h10)) / s
    n = jnp.stack((-dhdx, -dhdy, jnp.ones_like(x)), axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return height, n


def terrain_normal(grid: TerrainGrid, x: jnp.ndarray, y: jnp.ndarray
                   ) -> jnp.ndarray:
    """Unit surface normal of the bilinear patch at world (x, y)."""
    return terrain_height_and_normal(grid, x, y)[1]


def sample_patch(grid: TerrainGrid, base_x: jnp.ndarray, base_y: jnp.ndarray,
                 P: int = 16) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One contiguous P x P height patch per env, centered on the base.

    The full grid is tens of MB in HBM; per-geom bilinear lookups into it
    are ng x N x 4 random single-element gathers per control step — the
    dominant trimesh cost (go1's plane config trains ~5x faster than the
    MC trimesh flagship). A robot's geoms all sit within ~0.6 m of its
    base, so ONE P x P patch per env (a gather of N contiguous 2-D slices
    — efficient DMA) serves every geom lookup via
    :func:`patch_height_and_normal`, bit-identically while the geoms stay
    inside the patch (P=16 at 0.1 m cells covers +-0.75 m).

    Returns (patch [N, P, P], ix0 [N], iy0 [N])."""
    h = grid.height
    s = grid.horizontal_scale
    fx = (base_x + grid.border_size) / s
    fy = (base_y + grid.border_size) / s
    ix0 = jnp.clip(jnp.floor(fx).astype(jnp.int32) - P // 2,
                   0, h.shape[0] - P)
    iy0 = jnp.clip(jnp.floor(fy).astype(jnp.int32) - P // 2,
                   0, h.shape[1] - P)
    patch = jax.vmap(
        lambda i, j: jax.lax.dynamic_slice(h, (i, j), (P, P)))(ix0, iy0)
    return patch, ix0, iy0


def make_col_blocks(grid: TerrainGrid, block: int = 128,
                    stride: int = 64) -> Optional[jnp.ndarray]:
    """Overlapped column-block view of the height grid: [nb, R, block]
    where block k covers columns [stride*k, stride*k + block).

    Rationale (round-5 TPU profile): a [P, P] per-env ``dynamic_slice``
    costs one DMA descriptor PER ROW (the row fragments are tiny and
    strided), which made the patch gather the dominant rollout cost even
    after hoisting it to once per env step. A block's [R, block] storage
    is row-major contiguous, so one env's [rows, block] patch out of ONE
    block is a single contiguous fragment — measured 15x faster at the
    4000-env flagship (108.8 -> 7.2 ms per 24-step scan). The stride-2x
    overlap guarantees any window that stays >= (block - stride)/2 cells
    from the chosen block's center fits entirely in one block.

    Returns None when the grid is too narrow to block (callers fall back
    to the square-patch path)."""
    H = grid.height
    if H.shape[1] < block:
        return None
    nb = (H.shape[1] - block) // stride + 1
    starts = stride * jnp.arange(nb)
    return jax.vmap(
        lambda j: jax.lax.dynamic_slice(H, (0, j), (H.shape[0], block))
    )(starts)


def sample_patch_blocked(col_blocks: jnp.ndarray, grid: TerrainGrid,
                         base_x: jnp.ndarray, base_y: jnp.ndarray,
                         rows: int = 32, stride: int = 64
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One [rows, block] patch per env out of the overlapped column
    blocks — a single contiguous DMA fragment per env (see
    :func:`make_col_blocks`). Block choice centers the base: with
    block=128/stride=64 the base's column offset lands in [32, 96), so
    >= 3.2 m of margin on both sides at the 0.1 m scale.

    Returns (patch [N, rows, block], ix0 [N], iy0 [N]) compatible with
    :func:`patch_height_and_normal_mm`."""
    nb, R, block = col_blocks.shape
    s = grid.horizontal_scale
    fx = (base_x + grid.border_size) / s
    fy = (base_y + grid.border_size) / s
    ix0 = jnp.clip(jnp.floor(fx).astype(jnp.int32) - rows // 2,
                   0, R - rows)
    k = jnp.clip((jnp.floor(fy).astype(jnp.int32) - stride // 2)
                 // stride, 0, nb - 1)
    patch = jax.vmap(
        lambda k_, i_: jax.lax.dynamic_slice(col_blocks, (k_, i_, 0),
                                             (1, rows, block))
    )(k, ix0)[:, 0]
    return patch, ix0, k * stride


def patch_height_and_normal_mm(grid: TerrainGrid, patch: jnp.ndarray,
                               ix0: jnp.ndarray, iy0: jnp.ndarray,
                               x: jnp.ndarray, y: jnp.ndarray
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear height + analytic normal from the per-env patch with ZERO
    element gathers: the 2-tap interpolation along each axis is a weight
    VECTOR over the patch rows/cols, so height = wr @ patch @ wc and the
    two gradient taps reuse the chain with difference weights — batched
    einsums that ride the MXU. Identical algebra to the 4-corner formula
    (fp-reassociated). Exists because TPU lowers per-element gathers
    (both the direct grid lookup and take_along_axis into the patch) to
    scalar loads: the round-5 profile measured terrain sampling at ~97%
    of the flagship rollout either way.

    Contraction order is COLUMNS FIRST: the column axis is the larger
    one for blocked patches ([N, 32, 128], :func:`sample_patch_blocked`)
    and contracting it first keeps the intermediate at [N, 2ng, rows]
    instead of [N, 3ng, cols] — measured 3.8x faster than the
    row-first/stacked form at the flagship scale. Accepts any
    rectangular patch (square 16x16 from :func:`sample_patch` or blocked
    32x128)."""
    N = patch.shape[0]
    Pr, Pc = patch.shape[1], patch.shape[2]
    s = grid.horizontal_scale
    fx = (x + grid.border_size) / s
    fy = (y + grid.border_size) / s
    ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0,
                  grid.height.shape[0] - 2)
    iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0,
                  grid.height.shape[1] - 2)
    tx = jnp.clip(fx - ix, 0.0, 1.0)
    ty = jnp.clip(fy - iy, 0.0, 1.0)
    rx = jnp.clip(ix - ix0[:, None], 0, Pr - 2)   # [N, ng]
    ry = jnp.clip(iy - iy0[:, None], 0, Pc - 2)
    arc = jnp.arange(Pc, dtype=jnp.int32)
    c0 = (ry[..., None] == arc).astype(patch.dtype)      # [N, ng, Pc]
    c1 = (ry[..., None] + 1 == arc).astype(patch.dtype)
    wc = (1.0 - ty)[..., None] * c0 + ty[..., None] * c1
    dc = c1 - c0
    # one MXU pass contracts both column-weight sets against the patch
    Wc = jnp.concatenate([wc, dc], axis=1)               # [N, 2ng, Pc]
    tmp = jnp.einsum("ngc,nrc->ngr", Wc, patch)          # [N, 2ng, Pr]
    ng = x.shape[1]
    tmpW, tmpD = tmp[:, :ng], tmp[:, ng:]
    arr = jnp.arange(Pr, dtype=jnp.int32)
    r0 = (rx[..., None] == arr).astype(patch.dtype)      # [N, ng, Pr]
    r1 = (rx[..., None] + 1 == arr).astype(patch.dtype)
    wr = (1.0 - tx)[..., None] * r0 + tx[..., None] * r1
    dr = r1 - r0
    height = jnp.einsum("ngr,ngr->ng", wr, tmpW)
    dhdx = jnp.einsum("ngr,ngr->ng", dr, tmpW) / s
    dhdy = jnp.einsum("ngr,ngr->ng", wr, tmpD) / s
    n = jnp.stack((-dhdx, -dhdy, jnp.ones_like(height)), axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return height, n


def patch_height_and_normal(grid: TerrainGrid, patch: jnp.ndarray,
                            ix0: jnp.ndarray, iy0: jnp.ndarray,
                            x: jnp.ndarray, y: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`terrain_height_and_normal` evaluated out of a per-env patch
    from :func:`sample_patch`. x, y are [N, ng] world coordinates (ng
    lookups per env); returns (height [N, ng], normal [N, ng, 3]). Within
    patch coverage the arithmetic and corner values are identical to the
    direct version."""
    N = patch.shape[0]
    Pr, Pc = patch.shape[1], patch.shape[2]
    s = grid.horizontal_scale
    fx = (x + grid.border_size) / s
    fy = (y + grid.border_size) / s
    ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0,
                  grid.height.shape[0] - 2)
    iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0,
                  grid.height.shape[1] - 2)
    tx = jnp.clip(fx - ix, 0.0, 1.0)
    ty = jnp.clip(fy - iy, 0.0, 1.0)
    rx = jnp.clip(ix - ix0[:, None], 0, Pr - 2)
    ry = jnp.clip(iy - iy0[:, None], 0, Pc - 2)
    flat = patch.reshape(N, Pr * Pc)
    base = rx * Pc + ry

    def take(off):
        return jnp.take_along_axis(flat, base + off, axis=1)

    h00 = take(0)
    h10 = take(Pc)
    h01 = take(1)
    h11 = take(Pc + 1)
    height = ((1 - tx) * (1 - ty) * h00 + tx * (1 - ty) * h10
              + (1 - tx) * ty * h01 + tx * ty * h11)
    dhdx = ((1 - ty) * (h10 - h00) + ty * (h11 - h01)) / s
    dhdy = ((1 - tx) * (h01 - h00) + tx * (h11 - h10)) / s
    n = jnp.stack((-dhdx, -dhdy, jnp.ones_like(height)), axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return height, n


def sample_terrain(model, terrain: Optional[TerrainGrid],
                   geom_pos: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-geom terrain height + normal (hoisted out of the substep loop —
    within one 5 ms control substep the xy drift is well under a grid cell)."""
    x, y = geom_pos[..., 0], geom_pos[..., 1]
    if terrain is None:
        return (jnp.zeros_like(x),
                jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], geom_pos.dtype),
                                 geom_pos.shape))
    return terrain_height_and_normal(terrain, x, y)


def contact_forces(
    model,
    geom_pos: jnp.ndarray,       # [ng,3] world sphere centers
    geom_vel: jnp.ndarray,       # [ng,3] world point velocities
    friction: jnp.ndarray,       # [] per-env robot shape friction
    restitution: jnp.ndarray,    # [] per-env robot restitution
    terrain_hn: Tuple[jnp.ndarray, jnp.ndarray],  # per-geom (height, normal)
    *,
    stiffness: float,
    damping: float,
    friction_vel_eps: float,
    dt: float,
    terrain_friction: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute world-frame contact forces on every collision sphere.

    The spring-damper is solved *implicitly* against each sphere's body mass:
    force magnitudes are discounted by 1/(1 + c_eff·dt/m) so that a stiff
    contact on a light link (64 g mini-cheetah calf) cannot inject energy at
    the integration step — the TPU-friendly stand-in for PhysX's TGS
    iterations (legged_robot_config.py:245-256).

    Returns:
      forces: [ng,3] world-frame force on each sphere.
      report: [nr,3] net contact force per report body (the reference's
        contact-force tensor, used for termination/collision/feet logic).
    """
    z = geom_pos[..., 2]
    h, n = terrain_hn

    r = jnp.asarray(model.geom_radius, jnp.float32)
    m_eff = jnp.asarray(model.mass[model.geom_body], jnp.float32)
    gap = z - r - h                      # <0 when penetrating
    depth = jnp.maximum(-gap, 0.0)
    in_contact = gap < 0.0

    v_n = jnp.sum(geom_vel * n, axis=-1)
    v_t = geom_vel - n * v_n[..., None]

    # normal: FULLY implicit penalty spring-damper — solve
    #   f = k·(δ - dt·v_n') - c·v_n',   v_n' = v_n + f·dt/m
    # for f, which is unconditionally stable and keeps more static
    # stiffness than damping-only implicitness
    zeta = jnp.clip(1.0 - restitution, 0.08, 1.0)
    c_n = zeta * damping + stiffness * dt
    f_n = jnp.maximum(
        (stiffness * depth - c_n * v_n) / (1.0 + c_n * dt / m_eff), 0.0
    ) * in_contact

    # friction: regularized Coulomb, implicit in the tangential velocity;
    # PhysX-style average combine of robot & terrain coefficients
    mu = 0.5 * (friction + terrain_friction)
    vt_norm = jnp.linalg.norm(v_t, axis=-1)
    c_t = mu * f_n / (vt_norm + friction_vel_eps)
    f_t = -(c_t / (1.0 + c_t * dt / m_eff))[..., None] * v_t

    forces = n * f_n[..., None] + f_t    # [ng,3]

    # aggregate per report body: one-hot matmul (static geom->body map);
    # avoids TPU scatter, runs on the MXU
    onehot = _report_onehot(model)
    report = jnp.einsum("rg,gc->rc", onehot, forces)
    return forces, report


def solve33(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 solve by cofactor expansion — elementwise ops only (no
    pivoting loops; M here is the mass-split world inverse apparent inertia
    Lam^-1, symmetric positive definite by construction)."""
    a00, a01, a02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    a10, a11, a12 = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    a20, a21, a22 = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    inv_det = 1.0 / det
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) * inv_det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) * inv_det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) * inv_det
    return jnp.stack((x0, x1, x2), axis=-1)


def contact_forces_implicit(
    model,
    geom_pos: jnp.ndarray,       # [ng,3] world sphere centers
    geom_vel: jnp.ndarray,       # [ng,3] world point velocities
    geom_acc_free: jnp.ndarray,  # [ng,3] world free accelerations (no contact)
    lam_inv: jnp.ndarray,        # [ng,3,3] inverse apparent inertia (world)
    friction: jnp.ndarray,       # [] per-env robot shape friction
    restitution: jnp.ndarray,    # [] per-env restitution
    terrain_hn: Tuple[jnp.ndarray, jnp.ndarray],
    *,
    erp: float,
    max_depenetration_velocity: float,
    bounce_threshold_velocity: float,
    dt: float,
    terrain_friction: float = 1.0,
    geom_omega: Optional[jnp.ndarray] = None,   # [ng,3] body angular vel (world)
    ang_inv: Optional[jnp.ndarray] = None,      # [ng,3,3] angular inv. inertia
    torsional_patch_radius: float = 0.0,
    iterations: int = 1,
    lam_inv_true: Optional[jnp.ndarray] = None,  # [ng,3,3] UNSPLIT response
    phi0_w: Optional[jnp.ndarray] = None,        # [6,6] base mobility (world)
    arm_base: Optional[jnp.ndarray] = None,      # [ng,3] p_c - base origin
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Velocity-level constraint contact against the true articulated
    response (round-2 redesign; replaces both the m_eff=body-mass heuristic
    AND the penalty spring, whose ~100 Hz oscillation against the light
    calf chattered at 2.5 ms substeps).

    Per sphere, the end-of-step point velocity is

        v' = v + dt * (a_free + Lam^-1 f)

    (exact, by linearity of forward dynamics in the applied point force —
    tests/test_osim.py). The solver picks the impulse that drives v' to the
    constraint target — the TGS-style formulation of the PhysX solver the
    reference runs (legged_robot_config.py:245-256: contact_offset /
    rest_offset / bounce_threshold_velocity / max_depenetration_velocity):

        v'_target = n * min(erp/dt * depth, v_depen_max)   (+ restitution
                    bounce when the approach speed exceeds the threshold)
        f = Lam (v'_target - v_pred) / dt                  (3x3 solve)
        then project: f_n >= 0, |f_t| <= mu f_n            (friction cone)

    Including a_free is what lets stance legs transmit the full demanded
    actuation force: stiction resolves to the impulse that cancels both
    slip and the driven push. Cross-contact Jacobi coupling is stabilized
    by mass-splitting in contact_inv_inertia.

    When ``torsional_patch_radius > 0`` (and geom_omega/ang_inv are given),
    a torsional friction torque about the contact normal models the finite
    contact patch PhysX gets from colliding the foot's convex hull: the
    spin-stiction impulse -ang_inertia * w_n / dt, clamped to the torsion
    cone |tau_n| <= mu * f_n * patch_radius. Without it, yaw spin on a
    point contact is frictionally free (the round-2 spin-circle curriculum
    exploit, EXPERIMENTS.md §10).

    Returns (forces [ng,3] world, report [nr,3] per report body,
    torques [ng,3] world pure torques on the owning bodies).
    """
    z = geom_pos[..., 2]
    h, n = terrain_hn
    r = jnp.asarray(model.geom_radius, jnp.float32)
    gap = z - r - h
    depth = jnp.maximum(-gap, 0.0)
    in_contact = (gap < 0.0).astype(jnp.float32)

    v_pred = geom_vel + dt * geom_acc_free
    v_n_now = jnp.sum(geom_vel * n, axis=-1)

    # normal target velocity: Baumgarte depenetration bias + restitution
    bias = jnp.minimum(erp / dt * depth, max_depenetration_velocity)
    bounce = jnp.where(v_n_now < -bounce_threshold_velocity,
                       -restitution * v_n_now, 0.0)
    v_tgt_n = jnp.maximum(bias, bounce)

    # Jacobi mass splitting across SIMULTANEOUS contacts on one body:
    # each contact solves against 1/k of the body's response (k = number
    # of active contacts there), bounding the combined overshoot
    body_oh = _body_onehot(model)                        # [nb,ng]
    n_active = body_oh @ in_contact                      # [nb]
    split = jnp.maximum(n_active[model.geom_body], 1.0)  # [ng]

    if iterations > 1 and phi0_w is not None and arm_base is not None:
        # Iterated Jacobi solve with explicit base cross-coupling: the
        # one-pass splitting leaves each stance foot seeing an inflated
        # base mobility, under-applying stiction (EXPERIMENTS.md §19).
        # Here every contact solves against its TRUE local response and
        # the velocity injected at contact i by the OTHER contacts'
        # impulses is fed back through the floating base each sweep:
        #   v_cross_i = dt * B_i Phi0 (Σ_j B_j^T f_j − B_i^T f_i)
        # with B_i = [−r̃_i | I] the rigid point-velocity map about the
        # base origin (the leading cross-limb coupling; same-limb joint
        # coupling stays approximated by the local solve). Under-relaxed
        # Jacobi (ω=0.7) — the simultaneous analogue of PhysX's TGS
        # iterations. Opt-in via sim.contact_iterations > 1; the default
        # single-pass branch below is traced UNCHANGED (compile-cache
        # stability for the flagship/bench signatures).
        mu = 0.5 * (friction + terrain_friction)

        def _project(fc):
            f_n = jnp.sum(fc * n, axis=-1)
            f_t = fc - n * f_n[..., None]
            f_n = jnp.maximum(f_n, 0.0) * in_contact
            ft_norm = jnp.linalg.norm(f_t, axis=-1)
            sc = (jnp.minimum(1.0, mu * f_n / (ft_norm + 1e-9))
                  * in_contact)
            return n * f_n[..., None] + f_t * sc[..., None], f_n

        loc = lam_inv_true if lam_inv_true is not None else lam_inv
        rb = arm_base                                       # [ng,3]
        dv0 = n * v_tgt_n[..., None] - v_pred
        omega = 0.7
        f = jnp.zeros_like(v_pred)
        for _ in range(int(iterations)):
            F_tot = jnp.concatenate(
                (jnp.sum(jnp.cross(rb, f), axis=0),
                 jnp.sum(f, axis=0)))                       # [6]
            self6 = jnp.concatenate(
                (jnp.cross(rb, f), f), axis=-1)             # [ng,6]
            y = (F_tot[None, :] - self6) @ phi0_w.T         # [ng,6]
            v_cross = y[:, 3:] - jnp.cross(rb, y[:, :3])    # B_i y
            f_new = solve33(loc, (dv0 - dt * v_cross) / dt)
            f_new, _ = _project(f_new)
            f = (1.0 - omega) * f + omega * f_new
        forces, f_n = _project(f)
    else:
        lam_inv = lam_inv * split[..., None, None]

        # f = Lam (v_target - v_pred)/dt  <=>  lam_inv f = (v_target - v_pred)/dt
        dv = n * v_tgt_n[..., None] - v_pred
        f = solve33(lam_inv, dv / dt)

        # unilateral + friction-cone projection
        mu = 0.5 * (friction + terrain_friction)
        f_n = jnp.sum(f * n, axis=-1)
        f_t = f - n * f_n[..., None]
        f_n = jnp.maximum(f_n, 0.0) * in_contact
        ft_norm = jnp.linalg.norm(f_t, axis=-1)
        # smooth stick->slide transition near the cone boundary
        scale = (jnp.minimum(1.0, mu * f_n / (ft_norm + 1e-9))
                 * in_contact)
        forces = n * f_n[..., None] + f_t * scale[..., None]

    # torsional friction (contact patch): spin-stiction about the normal
    if torsional_patch_radius > 0.0 and geom_omega is not None \
            and ang_inv is not None:
        ang_inv = ang_inv * split[..., None, None]   # same Jacobi split
        w_n = jnp.sum(geom_omega * n, axis=-1)
        r_ang = jnp.maximum(
            jnp.einsum("gi,gij,gj->g", n, ang_inv, n), 1e-6)
        tau_max = mu * f_n * torsional_patch_radius
        tau_n = jnp.clip(-w_n / (dt * r_ang), -tau_max, tau_max)
        torques = n * tau_n[..., None]
    else:
        torques = jnp.zeros_like(forces)

    report = jnp.einsum("rg,gc->rc", _report_onehot(model), forces)
    return forces, report, torques


def _report_onehot(model) -> jnp.ndarray:
    import numpy as np
    oh = np.zeros((model.nr, model.ng), np.float32)
    oh[model.geom_report_body, np.arange(model.ng)] = 1.0
    return jnp.asarray(oh)


def _body_onehot(model) -> jnp.ndarray:
    import numpy as np
    oh = np.zeros((model.nb, model.ng), np.float32)
    oh[model.geom_body, np.arange(model.ng)] = 1.0
    return jnp.asarray(oh)


def spatial_forces_on_bodies(model, frames, geom_pos: jnp.ndarray,
                             forces: jnp.ndarray,
                             torques_w: Optional[jnp.ndarray] = None
                             ) -> jnp.ndarray:
    """Convert world-frame sphere forces (plus optional pure torques, e.g.
    torsional friction) to per-dynamics-body spatial forces in each body's
    own frame ([torque-about-origin; force]) for the ABA."""
    gb = model.geom_body
    Rb = frames.R[gb]                        # [ng,3,3]
    arm = geom_pos - frames.p[gb]            # [ng,3]
    torque_w = jnp.cross(arm, forces)
    if torques_w is not None:
        torque_w = torque_w + torques_w
    n_b = jnp.einsum("gji,gj->gi", Rb, torque_w)  # R^T @ t
    f_b = jnp.einsum("gji,gj->gi", Rb, forces)
    f6 = jnp.concatenate((n_b, f_b), axis=-1)     # [ng,6]
    return jnp.einsum("bg,gc->bc", _body_onehot(model), f6)
