"""Layout-independent per-agent randomness (counter-based hash RNG).

The reference draws randomness from global ``random``/``np.random`` state in
serial loop order (e.g. ``cell_methods.py:65,190,239``), so its results depend
on agent iteration order. Round 1 replaced that with positional
``jax.random`` draws over the slot axis — reproducible, but still tied to the
*layout*: the same colony stored in a different slot permutation (or sharded
into per-device stripes) draws different numbers per agent.

Here every per-agent draw is a pure function of ``(step key, agent id, salt)``
via a counter-based hash (two murmur3 finalizer rounds keyed by the step
key), so dynamics are identical across layouts: slot order, capacity padding,
and spatial domain decomposition (``parallel.domain``) all see the same
random stream per agent. This is what makes the domain-decomposed engine
bit-for-bit comparable with the single-device engine.

The murmur3 fmix32 finalizer is a full-avalanche bijection on uint32; two
keyed rounds give stream-quality adequate for these Bernoulli/uniform/normal
draws (the model's randomness tolerance is loose: the reference's own noise
is a per-visit ``random.gauss`` over an unordered set).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_GOLDEN = 0x9E3779B9  # 2^32 / golden ratio, the classic stream separator


def _fmix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer: full-avalanche 32-bit mixer (bijective)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def hash_bits(key: jax.Array, ids: jnp.ndarray, salt: int = 0) -> jnp.ndarray:
    """uint32 random bits per agent id, keyed by a raw PRNGKey ``key``
    (shape (2,) uint32) and a small static ``salt`` separating streams
    within one phase."""
    k0 = key[0].astype(jnp.uint32)
    k1 = key[1].astype(jnp.uint32)
    x = ids.astype(jnp.uint32)
    h = _fmix32(x ^ k0)
    h = _fmix32(h ^ (k1 + jnp.uint32((_GOLDEN * (salt + 1)) & 0xFFFFFFFF)))
    return h


def uniform(key: jax.Array, ids: jnp.ndarray, salt: int = 0,
            dtype=jnp.float32) -> jnp.ndarray:
    """U[0, 1) with 24-bit resolution (matches jax.random's f32 uniform)."""
    return (hash_bits(key, ids, salt) >> 8).astype(dtype) * dtype(1.0 / (1 << 24))


def coin_flips(key: jax.Array, ids: jnp.ndarray, salt: int = 0) -> jnp.ndarray:
    """Per-agent randint(0, 1) increments (``cell_methods.py:65,239``)."""
    return (hash_bits(key, ids, salt) & 1).astype(jnp.int32)


def normal(key: jax.Array, ids: jnp.ndarray, salt: int = 0,
           dtype=jnp.float32) -> jnp.ndarray:
    """N(0, 1) via Box-Muller on two independent hash streams."""
    u1 = uniform(key, ids, salt, dtype) + dtype(1.0 / (1 << 25))  # (0, 1]
    u2 = uniform(key, ids, salt + 17, dtype)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(dtype(2.0 * math.pi) * u2)


def unit_vectors(key: jax.Array, ids: jnp.ndarray, two_d: bool, salt: int = 0,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Id-keyed batch of the reference's ``random_vector``
    (``simulation.py:473-486``): a point on the unit circle when the space is
    2D (z = 0), else the reference's (cos(phi) cos(theta), cos(phi) sin(theta),
    sin(phi)) sphere parameterization — reproduced as-is, including its
    non-uniform density."""
    theta = uniform(key, ids, salt, dtype) * dtype(2.0 * math.pi)
    if two_d:
        return jnp.stack(
            [jnp.cos(theta), jnp.sin(theta), jnp.zeros_like(theta)], axis=-1
        )
    phi = uniform(key, ids, salt + 29, dtype) * dtype(2.0 * math.pi)
    radius = jnp.cos(phi)
    return jnp.stack(
        [radius * jnp.cos(theta), radius * jnp.sin(theta), jnp.sin(phi)], axis=-1
    )
