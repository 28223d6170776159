"""Compute primitives: quaternion/spatial math, articulated dynamics, contact.

Everything here is a pure jnp function, trivially vmappable over the env axis
and safe under jit (static shapes, no Python-level data-dependent control
flow). Replaces the reference's `isaacgym.torch_utils` helpers and the PhysX
native simulation core (SURVEY.md §2.1 N1-N4, N10).
"""
