"""Sorted-uniform-grid fixed-radius neighbor engine (TPU-native).

Replaces the reference's bin/bucket machinery and Numba kernels:
- ``assign_bins`` + ``assign_bins_jit`` (reference ``simulation.py:190-223``,
  ``backend.py:31-50``): a scatter of agent indices into a dense
  ``(bx, by, bz, slot)`` array with a host-side adaptive-capacity retry loop.
- ``get_neighbors_cpu/gpu`` (reference ``backend.py:64-160``): a 27-bin
  candidate scan emitting a dynamic edge list into igraph, with a host-side
  ``max_neighbors`` doubling loop.

TPU-first design: no scatter, no dynamic shapes, no retries inside the step.
Agents are sorted by flattened bin id (``jax.lax.sort`` via ``argsort``), bin
start offsets are recovered with ``searchsorted``, and each agent's neighbor
candidates are gathered as a static ``(N, W)`` padded window over the
9 (2D) / 27 (3D) adjacent bins with a validity mask. Capacity overflow is
detected on-device (``max(bin_count) > bin_cap``) and surfaced to the host,
which doubles the static capacity and recompiles — the same doubling policy as
the reference, amortized to O(log) recompiles per run.

Consumers (neighbor counting, FDS pathway means, motility sums, JKR forces)
operate directly on the padded window with masked reductions, so undirected
edges are seen once from each endpoint's row and per-agent accumulation needs
no scatter-add at all — deterministic by construction, unlike the reference's
racy ``prange`` ``+=`` (``cell_backend.py:108-109``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static description of a uniform bin lattice for one search radius.

    Mirrors the reference geometry: bin edge length == search radius, a +1
    index offset and padded border bins so out-of-bounds agents and the
    3x3x3 stencil never index outside the lattice (``simulation.py:202,210``).
    """

    cell_size: float
    nx: int
    ny: int
    nz: int
    two_d: bool
    bin_cap: int  # max agents per bin (static); overflow detected on-device

    @classmethod
    def from_box(
        cls,
        size: Tuple[float, float, float],
        radius: float,
        bin_cap: int,
    ) -> "GridSpec":
        nx = int(math.ceil(size[0] / radius)) + 3
        ny = int(math.ceil(size[1] / radius)) + 3
        nz = int(math.ceil(size[2] / radius)) + 3
        two_d = size[2] == 0
        if two_d:
            nz = 3  # all agents live in z-bin 1; neighbors scan z offset 0 only
        return cls(cell_size=float(radius), nx=nx, ny=ny, nz=nz, two_d=two_d, bin_cap=int(bin_cap))

    @property
    def num_bins(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def offsets(self) -> Tuple[Tuple[int, int, int], ...]:
        zs = (0,) if self.two_d else (-1, 0, 1)
        return tuple(
            (i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in zs
        )

    @property
    def window(self) -> int:
        """Static candidate-window width W = n_adjacent_bins * bin_cap."""
        return len(self.offsets) * self.bin_cap


class Grid(NamedTuple):
    """Built spatial index over one snapshot of agent locations."""

    order: jnp.ndarray  # (C,) agent slots sorted by flat bin id (dead last)
    bin_start: jnp.ndarray  # (num_bins,) start offset of each bin in `order`
    bin_count: jnp.ndarray  # (num_bins,) number of live agents in each bin
    bin_coords: jnp.ndarray  # (C, 3) per-agent integer bin coordinates
    max_in_bin: jnp.ndarray  # () max live agents in any bin (overflow probe)


def _flat_bin_id(spec: GridSpec, coords: jnp.ndarray) -> jnp.ndarray:
    return (coords[..., 0] * spec.ny + coords[..., 1]) * spec.nz + coords[..., 2]


def build_grid(spec: GridSpec, locations: jnp.ndarray, alive: jnp.ndarray) -> Grid:
    """Sort agents by bin id and recover per-bin extents.

    Replaces ``assign_bins_jit`` (``backend.py:31-50``): instead of scattering
    indices into a dense (nx, ny, nz, cap) array, agents are sorted by flat
    bin id; a bin's members are a contiguous run of the sorted order. Dead
    slots are given a sentinel id past the last bin so they sort to the end
    and never appear in any bin's run.
    """
    coords = jnp.floor(locations / spec.cell_size).astype(jnp.int32) + 1
    dims = jnp.array([spec.nx, spec.ny, spec.nz], dtype=jnp.int32)
    coords = jnp.clip(coords, 0, dims - 1)
    flat = _flat_bin_id(spec, coords)
    flat = jnp.where(alive, flat, spec.num_bins)  # dead -> sentinel, sorts last

    order = jnp.argsort(flat)  # stable
    sorted_flat = flat[order]
    bin_ids = jnp.arange(spec.num_bins, dtype=sorted_flat.dtype)
    bin_start = jnp.searchsorted(sorted_flat, bin_ids, side="left").astype(jnp.int32)
    bin_end = jnp.searchsorted(sorted_flat, bin_ids, side="right").astype(jnp.int32)
    bin_count = bin_end - bin_start
    return Grid(
        order=order.astype(jnp.int32),
        bin_start=bin_start,
        bin_count=bin_count,
        bin_coords=coords,
        max_in_bin=jnp.max(bin_count),
    )


def candidate_window(spec: GridSpec, grid: Grid) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather the padded neighbor-candidate window for every agent slot.

    Returns ``(cand_idx, cand_valid)`` of shape (C, W): for each agent, the
    agent slots occupying the adjacent bins (self included), with a mask for
    the padded tail of each bin run. Dead agents never appear as candidates
    (they are in no bin); rows of dead agents contain garbage and must be
    masked by the consumer via the row agent's alive bit.
    """
    capacity = grid.order.shape[0]
    k = jnp.arange(spec.bin_cap, dtype=jnp.int32)

    idx_parts = []
    valid_parts = []
    for off in spec.offsets:
        nb = grid.bin_coords + jnp.array(off, dtype=jnp.int32)
        # border pad bins guarantee in-lattice coords for live agents; clip to
        # keep gathers in-bounds for garbage rows of dead agents
        dims = jnp.array([spec.nx, spec.ny, spec.nz], dtype=jnp.int32)
        nb = jnp.clip(nb, 0, dims - 1)
        nb_flat = _flat_bin_id(spec, nb)
        start = grid.bin_start[nb_flat]  # (C,)
        count = grid.bin_count[nb_flat]  # (C,)
        pos = start[:, None] + k[None, :]  # (C, M)
        valid = k[None, :] < count[:, None]
        idx = grid.order[jnp.clip(pos, 0, capacity - 1)]
        idx_parts.append(idx)
        valid_parts.append(valid)

    cand_idx = jnp.concatenate(idx_parts, axis=1)
    cand_valid = jnp.concatenate(valid_parts, axis=1)
    return cand_idx, cand_valid


def neighbor_mask(
    locations: jnp.ndarray,
    alive: jnp.ndarray,
    cand_idx: jnp.ndarray,
    cand_valid: jnp.ndarray,
    radius: float | jnp.ndarray,
) -> jnp.ndarray:
    """Mask of true neighbors within ``radius`` in the candidate window.

    Matches the reference predicate ``norm(loc_j - loc_i) <= distance``
    (``backend.py:143``) including the inclusive bound; excludes self-pairs
    (the reference's ``index < current`` dedup stores each undirected edge
    once — here each edge appears in both endpoints' rows, which is exactly
    igraph's adjacency view used by every consumer).
    """
    capacity = locations.shape[0]
    self_idx = jnp.arange(capacity, dtype=cand_idx.dtype)[:, None]
    delta = locations[cand_idx] - locations[:, None, :]
    dist2 = jnp.sum(delta * delta, axis=-1)
    r = jnp.asarray(radius, dtype=locations.dtype)
    mask = cand_valid & (cand_idx != self_idx) & (dist2 <= r * r)
    return mask & alive[:, None]


def num_neighbors(mask: jnp.ndarray) -> jnp.ndarray:
    """Per-agent neighbor count — ``Graph.num_neighbors`` (``backend.py:25-28``)."""
    return jnp.sum(mask, axis=1).astype(jnp.int32)


def neighbor_search(
    spec: GridSpec,
    locations: jnp.ndarray,
    alive: jnp.ndarray,
    radius: float | jnp.ndarray,
):
    """One-call equivalent of ``get_neighbors`` (``simulation.py:225-288``).

    Returns ``(cand_idx, mask, max_in_bin)``: the padded window, the true
    neighbor mask, and the on-device bin-occupancy probe the host uses to
    grow ``bin_cap`` (the reference's adaptive doubling loops,
    ``simulation.py:217-221`` and ``:277-281``, moved off the hot path).
    """
    grid = build_grid(spec, locations, alive)
    cand_idx, cand_valid = candidate_window(spec, grid)
    mask = neighbor_mask(locations, alive, cand_idx, cand_valid, radius)
    return cand_idx, mask, grid.max_in_bin


def brute_force_mask(
    locations: jnp.ndarray,
    alive: jnp.ndarray,
    radius: float,
) -> jnp.ndarray:
    """O(n^2) dense adjacency oracle for testing the grid engine."""
    delta = locations[:, None, :] - locations[None, :, :]
    dist2 = jnp.sum(delta * delta, axis=-1)
    n = locations.shape[0]
    eye = jnp.eye(n, dtype=bool)
    return (
        (dist2 <= radius * radius)
        & ~eye
        & alive[:, None]
        & alive[None, :]
    )
