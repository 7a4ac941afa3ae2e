"""Overdamped (Stokes) force integration with box clamping.

Replaces ``apply_forces_cpu/gpu`` (reference ``cell_backend.py:118-172``): an
elementwise update, trivially fused by XLA into the surrounding physics
substep. Locations in um, forces in N, dt in seconds.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def stokes_integrate(
    locations: jnp.ndarray,  # (C, 3) um
    radii: jnp.ndarray,  # (C,) um
    jkr_forces: jnp.ndarray,  # (C, 3) N
    motility_forces: jnp.ndarray,  # (C, 3) N
    alive: jnp.ndarray,  # (C,)
    stokes: float,
    size: jnp.ndarray,  # (3,) um box
    dt: jnp.ndarray | float,  # seconds (traced per substep)
) -> jnp.ndarray:
    """velocity = F_total / (6 pi mu r); new_loc = loc + dt * v, clamped to the
    box exactly as the reference does (``cell_backend.py:153-170``)."""
    stokes_friction = 6.0 * math.pi * stokes * (radii / 1e6)  # um -> m
    velocity = (jkr_forces + motility_forces) / stokes_friction[:, None]  # m/s
    new_locations = locations + jnp.asarray(dt, locations.dtype) * velocity * 1e6  # m -> um
    new_locations = jnp.clip(new_locations, 0.0, size[None, :])
    return jnp.where(alive[:, None], new_locations, locations)
