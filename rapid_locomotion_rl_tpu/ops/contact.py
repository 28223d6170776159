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
                             forces: jnp.ndarray) -> jnp.ndarray:
    """Convert world-frame sphere forces to per-dynamics-body spatial forces
    in each body's own frame ([torque-about-origin; force]) for the ABA."""
    gb = model.geom_body
    Rb = frames.R[gb]                        # [ng,3,3]
    arm = geom_pos - frames.p[gb]            # [ng,3]
    torque_w = jnp.cross(arm, forces)
    n_b = jnp.einsum("gji,gj->gi", Rb, torque_w)  # R^T @ t
    f_b = jnp.einsum("gji,gj->gi", Rb, forces)
    f6 = jnp.concatenate((n_b, f_b), axis=-1)     # [ng,6]
    return jnp.einsum("bg,gc->bc", _body_onehot(model), f6)
