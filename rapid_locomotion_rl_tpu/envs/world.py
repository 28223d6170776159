"""Per-env static world obstacles (walls / boxes) for HLP navigation.

Re-creates the reference WorldAsset (reference
mini_gym/envs/world/world.py:14-121): a corridor of 4 walls per env. In the
reference these are extra IsaacGym actors (currently commented out of the
LeggedRobot ctor, SURVEY.md §0); here they are analytic boxes the robot's
collision spheres collide against — per-env poses are tensors, so worlds
can be re-randomized on device (`reset_world`, world.py:101-121).

Box contact uses closest-point-on-box vs sphere with the same implicit
penalty model as terrain contact.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class WorldBoxes(NamedTuple):
    """Axis-aligned boxes per env (positions relative to env origin)."""
    centers: jnp.ndarray       # [nbox, 3] or [N, nbox, 3]
    half_extents: jnp.ndarray  # [nbox, 3]


def default_corridor(length: float = 3.5, width: float = 1.6,
                     wall_height: float = 1.0,
                     wall_thickness: float = 0.2) -> WorldBoxes:
    """The reference 4-wall corridor (world.py:46-60): two length x t x h
    side walls at y = ±width/2, two end walls at x = ±(length + t)/2."""
    hy = width / 2.0
    hz = wall_height / 2.0
    t = wall_thickness / 2.0
    ex = (length + wall_thickness) / 2.0
    centers = np.array([
        [0.0, -hy, hz],
        [0.0, hy, hz],
        [ex, 0.0, hz],
        [-ex, 0.0, hz],
    ])
    half = np.array([
        [length / 2.0, t, hz],
        [length / 2.0, t, hz],
        [t, hy + t, hz],
        [t, hy + t, hz],
    ])
    return WorldBoxes(centers=jnp.asarray(centers, jnp.float32),
                      half_extents=jnp.asarray(half, jnp.float32))


def box_sphere_forces(
    boxes: WorldBoxes,
    env_origin: jnp.ndarray,    # [3]
    geom_pos: jnp.ndarray,      # [ng,3] world sphere centers
    geom_vel: jnp.ndarray,      # [ng,3]
    geom_radius: jnp.ndarray,   # [ng]
    m_eff: jnp.ndarray,         # [ng]
    *, stiffness: float, damping: float, friction: float,
    friction_vel_eps: float, dt: float,
) -> jnp.ndarray:
    """World-frame contact forces of all spheres against all boxes [ng,3]."""
    centers = boxes.centers + env_origin          # [nbox,3]
    rel = geom_pos[:, None, :] - centers[None]    # [ng,nbox,3]
    clamped = jnp.clip(rel, -boxes.half_extents[None],
                       boxes.half_extents[None])
    # closest point on box surface to the sphere center
    closest = centers[None] + clamped
    delta = geom_pos[:, None, :] - closest        # [ng,nbox,3]
    dist = jnp.linalg.norm(delta, axis=-1)
    inside = dist < 1e-6
    # outside: normal along center-to-closest; inside: push out through the
    # nearest face (axis of smallest distance-to-surface)
    face_dist = boxes.half_extents[None] - jnp.abs(rel)   # [ng,nbox,3]
    min_axis = jnp.argmin(face_dist, axis=-1)
    face_n = (jnp.sign(jnp.take_along_axis(rel, min_axis[..., None],
                                           axis=-1))
              * jax.nn.one_hot(min_axis, 3))
    n = jnp.where(inside[..., None], face_n,
                  delta / jnp.maximum(dist, 1e-6)[..., None])
    depth_out = jnp.maximum(geom_radius[:, None] - dist, 0.0) * ~inside
    depth_in = (jnp.min(face_dist, axis=-1) + geom_radius[:, None]) * inside
    depth = depth_out + depth_in
    in_contact = depth > 0.0

    v_n = jnp.sum(geom_vel[:, None, :] * n, axis=-1)
    v_t = geom_vel[:, None, :] - n * v_n[..., None]
    c_n = damping + stiffness * dt
    f_n = jnp.maximum(
        (stiffness * depth - c_n * v_n) / (1.0 + c_n * dt / m_eff[:, None]),
        0.0) * in_contact
    vt_norm = jnp.linalg.norm(v_t, axis=-1)
    c_t = friction * f_n / (vt_norm + friction_vel_eps)
    f_t = -(c_t / (1.0 + c_t * dt / m_eff[:, None]))[..., None] * v_t
    return jnp.sum(n * f_n[..., None] + f_t, axis=1)   # sum over boxes
