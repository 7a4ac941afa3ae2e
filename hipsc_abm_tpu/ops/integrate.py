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
    box exactly as the reference does (``cell_backend.py:153-170``).

    Dead slots carry radius 0; their friction is replaced by 1 so the masked
    branch never divides by zero. The ``where(alive)`` at the end makes the
    primal identical either way (alive cells always have radius > 0), but the
    guard keeps reverse-mode gradients finite — a 0/0 in the discarded branch
    would poison the ``stokes`` cotangent (see ``calibrate.py``)."""
    stokes_friction = 6.0 * math.pi * stokes * (radii / 1e6)  # um -> m
    safe_friction = jnp.where(radii > 0, stokes_friction, 1.0)
    velocity = (jkr_forces + motility_forces) / safe_friction[:, None]  # m/s
    new_locations = locations + jnp.asarray(dt, locations.dtype) * velocity * 1e6  # m -> um
    new_locations = jnp.clip(new_locations, 0.0, size[None, :])
    return jnp.where(alive[:, None], new_locations, locations)
