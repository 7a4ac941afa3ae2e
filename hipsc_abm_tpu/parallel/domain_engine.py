"""Domain-decomposed full simulation step (pod-scale multi-chip engine).

The single-chip engine (``hipsc_abm_tpu.engine``) runs the whole colony on one
device; the GSPMD agent-sharded engine (``parallel.mesh``) shards the slot
axis but still builds one *global* grid (O(C) collectives per window rebuild).
This module is the scalable route: **spatial domain decomposition with halo
exchange and agent migration**, the multi-chip generalization of the
reference's bin lattice (``/root/reference/ABM/simulation.py:190-223``,
SURVEY.md §5.7/§7 stage 7).

Decomposition
-------------
The box is split into x-stripes along the **neighbor-lattice column axis**:
stripe ``s`` owns every agent whose radius-15 bin column lies in
``[col_bounds[s], col_bounds[s+1])``. Because the canonical agent order is
(row-major flat bin id, agent id) and stripes are contiguous column ranges,
the global canonical order is exactly the concatenation of the per-stripe
canonical orders — which makes daughter-id assignment (and hence the whole
id-keyed random stream) identical to the single-chip engine.

Each device holds a ``(per_stripe,)`` block of own agent slots plus
``2 * halo_cap`` halo rows mirroring boundary agents of the two adjacent
stripes. Per-stripe grids are built by binning agents on the *global*
lattice (exact integer coords) and shifting the column by the stripe's
static offset — so local bins are global bins, and a window over local rows
contains byte-identical candidate sequences to the global window whenever the
halo covers the probe reach. All biology moments and contact forces are
therefore **bit-exact** against the single-chip engine (validated in
``tests/test_domain_engine.py``).

Communication (all ``ppermute`` ring shifts over ICI; O(boundary) bytes):
- one bio halo exchange at step start (membership = the single boundary bin
  column, frozen for the step) + two value-refresh re-sends (after
  division/death and after the fate updates) so moment consumers see the
  owner's current values through the frozen window;
- one contact-band exchange per physics substep (positions of frozen halo
  members; full packs at Verlet rebuilds, scheduled by a psum'd global drift
  predicate — the same rebuild schedule as the single-chip engine);
- one migration exchange at step end re-homing agents whose column left the
  stripe, with free-slot allocation on the receiving device;
- O(1) scalars: per-stripe dividing counts (daughter-id offsets), psum'd
  step diagnostics, and the psum'd morphogen deposit grid when diffusion is
  enabled.

Every static capacity (per-stripe slots, halo rows, migration rows, bin run
occupancy, bond degree, drift allowance) has an on-device overflow probe;
``DomainHipscEngine.safe_step`` re-executes the step from its unmodified
input after growing whichever capacity tripped — the domain analog of the
reference's adaptive doubling loops (``simulation.py:198-221,242-281``).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hipsc_abm_tpu.engine import (
    CellState,
    EngineConfig,
    HIPSC_ARRAY_SPECS,
    HipscEngine,
    _physics_dts,
    _round_up,
    diffusion_dts_cached,
    make_bio_moments_xla,
)
from hipsc_abm_tpu.models import biology
from hipsc_abm_tpu.models.params import (
    BiologyParams,
    DiffusionParams,
    ExperimentalParams,
    GeneralParams,
)
from hipsc_abm_tpu.ops import diffusion as diffusion_ops
from hipsc_abm_tpu.ops import jkr as jkr_ops
from hipsc_abm_tpu.ops import neighbors as nbr_ops
from hipsc_abm_tpu.ops.integrate import stokes_integrate
from hipsc_abm_tpu.ops.jkr import BondState, clear_bond_rows, pack_physics

AXIS = "stripes"

# migration pack: per-agent arrays that travel when an agent is re-homed
# (motility/jkr forces are zeroed at step end and stay behind as zeros)
_MIG_FIELDS = (
    "ids", "locations", "radii", "FGF4", "FGFR", "ERK", "GATA6", "NANOG",
    "states", "death_counters", "diff_counters", "div_counters", "fds_counters",
)


@dataclasses.dataclass(frozen=True)
class DomainConfig:
    """Static configuration of the decomposed engine (hashable; any change
    recompiles the sharded step)."""

    base: EngineConfig  # global lattice specs / bond_cap / verlet skin
    n_stripes: int
    per_stripe: int  # own agent slots per stripe
    halo_cap: int  # halo rows per side
    mig_cap: int  # migration rows per side per step
    div_cap: int  # per-stripe daughter-table size
    # max distance (um) an agent may drift outside its stripe within one step
    # before re-homing; sizes the contact halo bands. Grown on the
    # drift_exceed probe.
    drift_allowance: float
    col_bounds: Tuple[int, ...]  # (S+1,) nbr-lattice column partition
    nbr_nx_local: int  # uniform local-lattice column counts
    jkr_nx_local: int

    @property
    def local_capacity(self) -> int:
        return self.per_stripe + 2 * self.halo_cap

    @property
    def nbr_spec_local(self) -> nbr_ops.GridSpec:
        return dataclasses.replace(self.base.nbr_spec, nx=self.nbr_nx_local)

    @property
    def jkr_spec_local(self) -> nbr_ops.GridSpec:
        return dataclasses.replace(self.base.jkr_spec, nx=self.jkr_nx_local)


class DomainState(NamedTuple):
    """Sharded state: per-agent arrays in stripe-major ``(S, P, ...)`` slot
    blocks; agents are resident in the stripe owning their bin column."""

    arrays: Dict[str, jnp.ndarray]  # (S, P[, d])
    alive: jnp.ndarray  # (S, P)
    bonds: BondState  # (S, P, K)
    gradients: Dict[str, jnp.ndarray]  # replicated morphogen lattices
    key: jax.Array
    step: jnp.ndarray
    next_id: jnp.ndarray


class DomainStepInfo(NamedTuple):
    """Psum/pmax-reduced step diagnostics; the overflow probes drive
    ``DomainHipscEngine.safe_step`` growth."""

    num_agents: jnp.ndarray
    num_added: jnp.ndarray
    num_removed: jnp.ndarray
    num_deferred: jnp.ndarray
    num_dividing: jnp.ndarray  # max per-stripe dividing count (div_cap probe)
    nbr_max_in_bin: jnp.ndarray
    jkr_max_in_bin: jnp.ndarray
    jkr_max_degree: jnp.ndarray
    max_id: jnp.ndarray
    bio_band_max: jnp.ndarray  # bio boundary-column occupancy (halo_cap probe)
    phys_band_max: jnp.ndarray  # contact band occupancy (halo_cap probe)
    mig_out_max: jnp.ndarray  # emigrants per side (mig_cap probe)
    mig_shortfall: jnp.ndarray  # immigrants without a free slot (per_stripe probe)
    mig_too_far: jnp.ndarray  # emigrants skipping a stripe (drift pathology)
    halo_miss: jnp.ndarray  # frozen halo members absent from a fresh band pack
    drift_exceed: jnp.ndarray  # max um outside own stripe (drift_allowance probe)
    jkr_span_needed: jnp.ndarray  # Pallas DMA span probe (0 on the XLA path)
    max_substep_move: jnp.ndarray  # bond-band-margin probe (see engine.StepInfo)


# ---------------------------------------------------------------------------
# small device-side helpers
# ---------------------------------------------------------------------------


def _compact_idx(mask: jnp.ndarray, cap: int):
    """First-``cap`` compaction of a row mask: returns ``(idx (cap,), valid
    (cap,), count)`` where ``idx[r]`` is the r-th masked row. ``count`` is the
    true masked total (the overflow probe when it exceeds ``cap``)."""
    n = mask.shape[0]
    rank = jnp.cumsum(mask) - 1
    dest = jnp.where(mask & (rank < cap), rank, cap)
    idx = jnp.zeros((cap,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    valid = jnp.zeros((cap,), bool).at[dest].set(True, mode="drop")
    return idx, valid, jnp.sum(mask)


def _gather_pack(lanes, idx: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(cap, L) f32 pack of the given 1-D/2-D lanes at ``idx`` rows; invalid
    rows are all-zero (their alive lane reads 0 = dead)."""
    cols = []
    for lane in lanes:
        g = lane[idx].astype(jnp.float32)
        cols.append(g[:, None] if g.ndim == 1 else g)
    pack = jnp.concatenate(cols, axis=1)
    return jnp.where(valid[:, None], pack, 0.0)


def _ring_exchange(pack_left: jnp.ndarray, pack_right: jnp.ndarray, n: int):
    """Send ``pack_left`` to stripe s-1 and ``pack_right`` to stripe s+1.
    Returns ``(from_left, from_right)``; edge stripes receive zeros (the box
    is not a torus — matching ``parallel.domain``'s edge handling)."""
    to_right = [(i, i + 1) for i in range(n - 1)]
    to_left = [(i, i - 1) for i in range(1, n)]
    from_left = jax.lax.ppermute(pack_right, AXIS, to_right)
    from_right = jax.lax.ppermute(pack_left, AXIS, to_left)
    return from_left, from_right


def _set_halo(arr: jnp.ndarray, P_own: int, H: int, left_vals, right_vals):
    """Write the two halo blocks (static slices) of a (C_loc, ...) array."""
    arr = jax.lax.dynamic_update_slice_in_dim(arr, left_vals, P_own, axis=0)
    return jax.lax.dynamic_update_slice_in_dim(arr, right_vals, P_own + H, axis=0)


def _local_flat(
    spec_local: nbr_ops.GridSpec,
    gcoords: jnp.ndarray,
    col_off: jnp.ndarray,
    alive: jnp.ndarray,
):
    """Local flat bin ids from *global* integer bin coords shifted by the
    stripe's column offset (integer arithmetic — float re-binning against a
    shifted origin could disagree with global binning at bin edges). Rows
    outside the local lattice get the dead sentinel (they become invisible;
    the drift probe forces re-execution if an own row ever lands there).
    Returns ``(flat, local_coords)``. Dimension-agnostic: in 2D ``nz == 1``
    and the z coordinate is 0, so the 3D formula reduces to the 2D one (a
    "column" is a y row in 2D and a y-z slab in 3D — the decomposition axis
    is x either way, matching the reference's 3x3x3 stencil treating 3D as
    first-class, ``backend.py:84-93``)."""
    cxl = gcoords[:, 0] - col_off
    in_range = (cxl >= 0) & (cxl < spec_local.nx)
    flat = (cxl * spec_local.ny + gcoords[:, 1]) * spec_local.nz + gcoords[:, 2]
    flat = jnp.where(alive & in_range, flat, nbr_ops.dead_sentinel(spec_local))
    coords_l = jnp.stack(
        [jnp.clip(cxl, 0, spec_local.nx - 1), gcoords[:, 1], gcoords[:, 2]], axis=1
    )
    return flat, coords_l


# ---------------------------------------------------------------------------
# the decomposed step (shard_map body)
# ---------------------------------------------------------------------------


def _domain_step_body(
    arrays,
    alive,
    partners,
    bmask,
    gradients,
    key,
    current_step,
    next_id,
    sci,
    scf,
    *,
    cfg: DomainConfig,
    gen: GeneralParams,
    xp: ExperimentalParams,
    bio: BiologyParams,
    diff: Optional[DiffusionParams],
):
    """One full decomposed step on one stripe (executes under shard_map).

    Mirrors ``engine.hipsc_step`` phase for phase (reference schedule
    ``cell_simulation.py:85-123``); every value a phase reads about a
    non-resident candidate comes from a halo exchange, so own-row results are
    bit-identical to the single-chip engine's."""
    S = cfg.n_stripes
    P_own = cfg.per_stripe
    H = cfg.halo_cap
    C = cfg.local_capacity
    base = cfg.base
    two_d = base.two_d

    # squeeze the leading (1,) stripe-block dim
    arrays = {k: v[0] for k, v in arrays.items()}
    alive = alive[0]
    partners = partners[0]
    bmask = bmask[0]
    sci = sci[0]  # (10,) int32 stripe constants
    scf = scf[0]  # (2,) f32

    (ncl, nch, col_off_nbr, col_off_jkr, sl_frz, sl_fresh, sr_frz, sr_fresh,
     prev_ncl, next_nch, recv_l_col, recv_r_col) = [sci[i] for i in range(12)]
    del sl_frz, sr_frz  # sender freezes via the receiver-side column filter
    x_lo, x_hi = scf[0], scf[1]

    # --- local (own + halo) slot blocks -------------------------------------
    def pad_rows(a):
        return jnp.pad(a, [(0, C - a.shape[0])] + [(0, 0)] * (a.ndim - 1))

    arrays = {k: pad_rows(v) for k, v in arrays.items()}
    alive = pad_rows(alive)
    bonds = BondState(partners=pad_rows(partners), mask=pad_rows(bmask))
    owned = jnp.arange(C, dtype=jnp.int32) < P_own

    key, k_div, k_path, k_diff, k_stoch, k_mot = jax.random.split(key, 6)
    size = jnp.asarray(gen.size, dtype=arrays["locations"].dtype)

    # --- bio halo exchange A: frozen membership = the boundary bin column ---
    # an own row in column c probes columns c-1..c+1, so the only non-resident
    # candidates are the adjacent stripes' single boundary columns
    gcoords0 = nbr_ops._bin_coords(base.nbr_spec, arrays["locations"][:P_own])
    col0 = gcoords0[:, 0]
    alive_own = alive[:P_own]
    idxL, valL, cntL = _compact_idx(alive_own & (col0 == ncl), H)
    idxR, valR, cntR = _compact_idx(alive_own & (col0 == nch - 1), H)
    bio_band_max = jnp.maximum(cntL, cntR)

    BIO_LANES = ("locations", "radii", "ids", "FGF4", "GATA6", "NANOG", "states")

    def bio_send():
        """(Re-)send the frozen bio band with current values; the alive lane
        carries *current* liveness so consumers drop mid-step deaths."""
        lanes = [arrays[k][:P_own] for k in BIO_LANES]
        a_now = alive[:P_own]
        aliveL = valL & a_now[idxL]
        aliveR = valR & a_now[idxR]
        packL = jnp.concatenate(
            [_gather_pack(lanes, idxL, valL), aliveL.astype(jnp.float32)[:, None]],
            axis=1,
        )
        packR = jnp.concatenate(
            [_gather_pack(lanes, idxR, valR), aliveR.astype(jnp.float32)[:, None]],
            axis=1,
        )
        return _ring_exchange(packL, packR, S)

    def bio_apply(from_left, from_right):
        nonlocal arrays, alive
        c = 0
        for k in BIO_LANES:
            w = arrays[k].shape[1] if arrays[k].ndim == 2 else 1
            vl = from_left[:, c:c + w]
            vr = from_right[:, c:c + w]
            if arrays[k].ndim == 1:
                vl, vr = vl[:, 0], vr[:, 0]
            arrays[k] = _set_halo(
                arrays[k], P_own, H,
                vl.astype(arrays[k].dtype), vr.astype(arrays[k].dtype),
            )
            c += w
        alive = _set_halo(alive, P_own, H, from_left[:, c] > 0, from_right[:, c] > 0)

    bio_apply(*bio_send())

    # --- the step's neighbor graph (frozen window, like the single-chip
    # engine's build at the top of the step) --------------------------------
    loc0 = arrays["locations"]
    gcoords_all = nbr_ops._bin_coords(base.nbr_spec, loc0)
    nflat, ncoords = _local_flat(cfg.nbr_spec_local, gcoords_all, col_off_nbr, alive)
    nbr_grid = nbr_ops.grid_from_flat_coords(nflat, ncoords, arrays["ids"])
    nbr_pos, nbr_valid, nbr_max_in_bin = nbr_ops.window_from_grid(
        cfg.nbr_spec_local, nbr_grid
    )
    bio_moments = make_bio_moments_xla(
        nbr_grid, nbr_pos, nbr_valid, loc0, arrays["ids"], alive,
        bio.neighbor_radius,
    )

    zero_i = jnp.zeros((C,), jnp.int32)
    m1 = bio_moments(loc0, zero_i, zero_i, zero_i, alive)
    nbr_count = m1[:, 0].astype(jnp.int32)

    # --- cell_division (globally consistent daughter ids) -------------------
    div_counters, dividing = biology.division_clock(
        arrays, alive, nbr_count, k_div, bio
    )
    dividing = dividing & owned
    nd_local = jnp.sum(dividing)
    counts = jax.lax.all_gather(nd_local, AXIS)  # (S,) tiny
    s_idx = jax.lax.axis_index(AXIS)
    rank_offset = jnp.sum(
        jnp.where(jnp.arange(S) < s_idx, counts, 0)
    ).astype(jnp.int32)
    arrays, alive, daughter_mask, num_added, num_deferred = biology.division_apply(
        arrays, alive, div_counters, dividing, k_div, bio, two_d,
        canon_order=nbr_grid.order, next_id=next_id, div_cap=cfg.div_cap,
        allocatable=owned, rank_offset=rank_offset,
    )
    bonds = clear_bond_rows(bonds, daughter_mask)
    nbr_count = jnp.where(daughter_mask, 0, nbr_count)

    # --- cell_death ---
    death_counters, removed, _ = biology.cell_death(
        arrays["states"], arrays["death_counters"], alive, nbr_count,
        xp.lonely_thresh, bio.death_thresh,
    )
    removed = removed & owned
    arrays["death_counters"] = death_counters
    alive = alive & ~removed
    num_removed = jnp.sum(removed)

    # --- exchange B: refresh halo values (division moved mothers, deaths
    # changed liveness) through the frozen window ---------------------------
    bio_apply(*bio_send())

    # --- cell_pathway ---
    m2 = bio_moments(arrays["locations"], arrays["FGF4"], zero_i, zero_i, alive)
    count2 = m2[:, 0].astype(jnp.int32)
    # field coupling: the lattice is replicated and locations are global, so
    # the nearest-gridpoint sample is local and bit-equal on every stripe
    # (including halo rows — same lattice, same location, id-keyed noise)
    field_fgf4 = None
    if (base.enable_diffusion and diff is not None and diff.field_coupling
            and "fgf4_values" in gradients):
        field_fgf4 = diffusion_ops.sample_concentration(
            gradients["fgf4_values"], arrays["locations"], diff.spat_res
        )
    (
        arrays["FGF4"], arrays["FGFR"], arrays["ERK"],
        arrays["GATA6"], arrays["NANOG"], arrays["fds_counters"],
    ) = biology.cell_pathway(
        arrays["FGF4"], arrays["FGFR"], arrays["ERK"], arrays["GATA6"],
        arrays["NANOG"], arrays["fds_counters"], arrays["ids"], alive, count2,
        m2[:, 1], m2[:, 2], k_path, current_step, xp, bio,
        field_fgf4=field_fgf4,
    )

    # --- cell_differentiate ---
    arrays["NANOG"], arrays["states"], arrays["diff_counters"] = (
        biology.cell_differentiate(
            arrays["GATA6"], arrays["NANOG"], arrays["states"],
            arrays["diff_counters"], arrays["ids"], alive, k_diff, bio,
        )
    )

    # --- optional phases (reference ships disabled, cell_simulation.py:98-104)
    if base.enable_growth:
        arrays["radii"] = biology.cell_growth(
            arrays["radii"], arrays["states"], arrays["div_counters"], alive, bio
        )
    if base.enable_stochastic:
        arrays["GATA6"], arrays["NANOG"] = biology.cell_stochastic_update(
            arrays["GATA6"], arrays["NANOG"], arrays["ids"], alive, k_stoch, bio
        )
    # exchange C: fate updates flow to neighbors before the moment reads
    bio_apply(*bio_send())
    if base.enable_diff_surround:
        m_ds = bio_moments(
            arrays["locations"], zero_i, zero_i, arrays["states"], alive
        )
        arrays["GATA6"], arrays["NANOG"] = biology.cell_diff_surround(
            arrays["GATA6"], arrays["NANOG"], arrays["states"], alive,
            m_ds[:, 7].astype(jnp.int32), bio,
        )
        bio_apply(*bio_send())

    # --- morphogen diffusion (replicated lattice, psum'd deposits) ----------
    if base.enable_diffusion and diff is not None:
        dts_d = jnp.asarray(diffusion_dts_cached(bio.step_dt, diff.diffuse_dt))
        new_gradients = {}
        for gname in sorted(gradients):
            grid_g = gradients[gname]
            if diff.release_amount > 0.0 or diff.uptake_amount > 0.0:
                secreting = alive & owned & (arrays["NANOG"] > arrays["GATA6"])
                amounts = jnp.where(secreting, diff.release_amount, 0.0)
                amounts = amounts - jnp.where(
                    alive & owned, diff.uptake_amount, 0.0
                )
                delta = diffusion_ops.deposit_morphogen(
                    jnp.zeros_like(grid_g), arrays["locations"], amounts,
                    diff.spat_res,
                )
                grid_g = grid_g + jax.lax.psum(delta, AXIS)
            new_gradients[gname] = diffusion_ops.ftcs_diffuse(
                grid_g, dts_d, diff.diffuse_const, diff.spat_res2,
                diff.max_concentration, diff.degradation,
            )
        gradients = new_gradients

    # --- cell_motility ---
    m3 = bio_moments(
        arrays["locations"], arrays["GATA6"], arrays["NANOG"], arrays["states"],
        alive,
    )
    arrays["motility_forces"] = biology.cell_motility(
        arrays["locations"], arrays["GATA6"], arrays["NANOG"], arrays["states"],
        arrays["motility_forces"], arrays["ids"], alive, count2,
        m3[:, 3].astype(jnp.int32), m3[:, 4:7],
        m3[:, 7].astype(jnp.int32), m3[:, 8:11],
        k_mot, xp, bio, two_d,
    )

    # --- apply_forces: 11 physics substeps with per-substep contact-band
    # exchange and Verlet rebuilds on the psum'd global drift ----------------
    (
        locations, bonds, jkr_max_in_bin, jkr_max_degree,
        phys_band_max, halo_miss, drift_exceed, jkr_span_needed,
        max_substep_move,
    ) = _domain_physics(
        cfg, bio, arrays, alive, bonds, size,
        sl_fresh, sr_fresh, recv_l_col, recv_r_col, col_off_jkr, x_lo, x_hi,
    )
    arrays["locations"] = locations
    arrays["jkr_forces"] = jnp.zeros_like(arrays["jkr_forces"])
    arrays["motility_forces"] = jnp.zeros_like(arrays["motility_forces"])

    # --- agent migration: re-home agents whose bin column left the stripe ---
    (
        arrays, alive, bonds, mig_out_max, mig_shortfall, mig_too_far,
    ) = _migrate(cfg, base, arrays, alive, bonds, ncl, nch, prev_ncl, next_nch)

    # --- outputs -------------------------------------------------------------
    alive_own = alive[:P_own]
    own = {k: v[:P_own][None] for k, v in arrays.items()}
    info = DomainStepInfo(
        num_agents=jax.lax.psum(jnp.sum(alive_own), AXIS),
        num_added=jax.lax.psum(num_added, AXIS),
        num_removed=jax.lax.psum(num_removed, AXIS),
        num_deferred=jax.lax.psum(num_deferred, AXIS),
        num_dividing=jax.lax.pmax(nd_local, AXIS),
        nbr_max_in_bin=jax.lax.pmax(nbr_max_in_bin, AXIS),
        jkr_max_in_bin=jax.lax.pmax(jkr_max_in_bin, AXIS),
        jkr_max_degree=jax.lax.pmax(jkr_max_degree, AXIS),
        max_id=jax.lax.pmax(
            jnp.max(jnp.where(alive_own, arrays["ids"][:P_own], 0)), AXIS
        ),
        bio_band_max=jax.lax.pmax(bio_band_max, AXIS),
        phys_band_max=jax.lax.pmax(phys_band_max, AXIS),
        mig_out_max=jax.lax.pmax(mig_out_max, AXIS),
        mig_shortfall=jax.lax.psum(mig_shortfall, AXIS),
        mig_too_far=jax.lax.psum(mig_too_far, AXIS),
        halo_miss=jax.lax.psum(halo_miss, AXIS),
        drift_exceed=jax.lax.pmax(drift_exceed, AXIS),
        jkr_span_needed=jax.lax.pmax(jkr_span_needed, AXIS),
        max_substep_move=jax.lax.pmax(max_substep_move, AXIS),
    )
    new_next_id = next_id + info.num_added.astype(jnp.int32)
    return (
        own,
        alive_own[None],
        bonds.partners[:P_own][None],
        bonds.mask[:P_own][None],
        gradients,
        key,
        current_step + 1,
        new_next_id,
        info,
    )


def _domain_physics(
    cfg: DomainConfig,
    bio: BiologyParams,
    arrays,
    alive,
    bonds: BondState,
    size,
    sl_fresh, sr_fresh, recv_l_col, recv_r_col, col_off_jkr, x_lo, x_hi,
):
    """The 11 JKR+Stokes substeps under decomposition (XLA window path).

    Design: the contact window (local grid + per-row candidate windows) and
    the halo membership are frozen together at each Verlet rebuild; between
    rebuilds each substep ppermutes the positions of the SAME frozen band
    rows (the sender carries its rebuild-time compaction indices in the scan,
    so refresh row h is by construction the agent behind halo row h — an O(H)
    gather, replacing the O(H^2) id-join an earlier revision used), so every
    candidate an own row sees carries its owner's current position — making
    force sums bit-equal to the single-chip engine's (same candidates, same
    order, same rebuild schedule). The rebuild predicate is pmax'd, so every
    stripe agrees on whether a given exchange carries a fresh-membership pack
    (rebuild) or a frozen-band refresh. At a rebuild the receiver freezes
    only the fresh-pack rows inside its receive columns
    (``recv_l_col``/``recv_r_col``) — the fresh send band is one column wider
    on each side, so a frozen member can never drift out of coverage within a
    window's lifetime (drift < skin/2 < one jkr column); ownership is fixed
    during physics (migration runs at step end), so a frozen sender row
    always remains resident and alive for the window's lifetime."""
    base = cfg.base
    P_own = cfg.per_stripe
    H = cfg.halo_cap
    C = cfg.local_capacity
    spec_l = cfg.jkr_spec_local
    gspec = base.jkr_spec
    skin = base.verlet_skin

    mot = arrays["motility_forces"]
    dts = _physics_dts(bio)  # numpy: the pallas scan needs dts[0] static

    def jcol(x):
        c = jnp.floor(x / gspec.cell_size).astype(jnp.int32) + 1
        return jnp.clip(c, 0, gspec.nx - 1)

    PK_LANES = 6  # x, y, z, radius, id, alive

    def fresh_band_idx(pk):
        """Compaction indices of the current fresh contact band (one column
        wider than the frozen band) — the sender-side membership that gets
        FROZEN into the scan carry at each rebuild."""
        own_alive = pk[:P_own, 5] > 0.0
        cj = jcol(pk[:P_own, 0])
        idxL, valL, cntL = _compact_idx(own_alive & (cj <= sl_fresh), H)
        idxR, valR, cntR = _compact_idx(own_alive & (cj >= sr_fresh), H)
        return (idxL, valL, idxR, valR), jnp.maximum(cntL, cntR)

    def band_exchange(pk, frz):
        """Exchange band packs gathered at the given (frozen or fresh)
        indices."""
        idxL, valL, idxR, valR = frz
        packL = jnp.where(valL[:, None], pk[:P_own][idxL, :PK_LANES], 0.0)
        packR = jnp.where(valR[:, None], pk[:P_own][idxR, :PK_LANES], 0.0)
        return _ring_exchange(packL, packR, cfg.n_stripes)

    use_pallas = base.use_pallas
    span = min(base.jkr_span, C)
    inv_base = jnp.arange(C, dtype=jnp.int32)

    def rebuild(pk, from_left, from_right):
        """Freeze new halo membership (fresh-pack rows inside the receive
        columns) and rebuild the local grid + candidate windows (or, on the
        Pallas path, the per-block span plan)."""
        keep_l = jcol(from_left[:, 0]) >= recv_l_col
        keep_r = jcol(from_right[:, 0]) <= recv_r_col
        from_left = jnp.where(keep_l[:, None], from_left, 0.0)
        from_right = jnp.where(keep_r[:, None], from_right, 0.0)
        halo = jnp.concatenate([from_left, from_right], axis=0)  # (2H, 6)
        pk = jnp.concatenate(
            [pk[:P_own, :], jnp.pad(halo, ((0, 0), (0, pk.shape[1] - PK_LANES)))],
            axis=0,
        )
        alive_now = pk[:, 5] > 0.0
        gc = nbr_ops._bin_coords(gspec, pk[:, :3])
        flat, coords_l = _local_flat(spec_l, gc, col_off_jkr, alive_now)
        grid = nbr_ops.grid_from_flat_coords(flat, coords_l, pk[:, 4].astype(jnp.int32))
        if use_pallas:
            # per-shard Pallas: block span plan over the LOCAL sorted layout;
            # the inverse permutation unsorts kernel outputs each substep
            starts, chunk_needs, span_needed, max_run = nbr_ops.block_span_plan(
                spec_l, grid.sorted_flat, base.pallas_block, span, C,
                base.pallas_chunk,
            )
            inv = jnp.zeros((C,), jnp.int32).at[grid.order].set(inv_base)
            win = (grid.order, inv, starts, chunk_needs,
                   grid.sorted_flat.astype(jnp.float32), pk[:, :3])
        else:
            pos, valid, max_run = nbr_ops.window_from_grid(spec_l, grid)
            span_needed = jax.lax.pcast(
                jnp.zeros((), jnp.int32), (AXIS,), to="varying"
            )
            win = (grid.order, pos, valid, pk[:, :3])
        return pk, win, max_run, span_needed

    def refresh_positions(pk, from_left, from_right):
        """Refresh frozen halo rows' positions: the sender resent its frozen
        band rows in rebuild-time compaction order, so received row h IS the
        agent behind halo row h (rows not kept by the rebuild filter have a
        dead alive lane and are skipped) — one O(H) masked write."""
        fresh = jnp.concatenate([from_left, from_right], axis=0)  # (2H, 6)
        halo_alive = pk[P_own:, 5] > 0.0
        halo_pos = jnp.where(halo_alive[:, None], fresh[:, :3], pk[P_own:, :3])
        return pk.at[P_own:, :3].set(halo_pos)

    # --- scan entry: unconditional build -------------------------------------
    pk0 = pack_physics(arrays["locations"], arrays["radii"], arrays["ids"], alive)
    frz0, band0 = fresh_band_idx(pk0)
    fl0, fr0 = band_exchange(pk0, frz0)
    pk0, win0, max_run0, span0 = rebuild(pk0, fl0, fr0)

    store_radius = (None if base.bond_band_margin is None else
                    bio.jkr_radius - base.bond_band_margin)

    def drift_and_band(pk, win, frz):
        """Shared per-substep prologue: pmax'd global drift predicate,
        out-of-stripe probe, band pack selection + exchange. The pmax makes
        the predicate globally uniform: every stripe sends the same pack
        kind this substep (fresh membership at rebuilds, the frozen band
        otherwise) — selected OUTSIDE the cond so the ppermute stays
        unconditional."""
        own_alive = pk[:P_own, 5] > 0.0
        drift2 = jnp.max(
            jnp.where(
                own_alive,
                jnp.sum((pk[:P_own, :3] - win[-1][:P_own]) ** 2, axis=-1),
                0.0,
            )
        )
        g_drift2 = jax.lax.pmax(drift2, AXIS)
        x_own = pk[:P_own, 0]
        exceed = jnp.max(
            jnp.where(own_alive, jnp.maximum(x_lo - x_own, x_own - x_hi), 0.0)
        )
        do_rebuild = g_drift2 > (skin * 0.5) ** 2
        frz_fresh, band_cnt_f = fresh_band_idx(pk)
        frz = jax.tree_util.tree_map(
            lambda f, o: jnp.where(do_rebuild, f, o), frz_fresh, frz
        )
        band_cnt = jnp.where(do_rebuild, band_cnt_f, 0)
        from_left, from_right = band_exchange(pk, frz)
        return do_rebuild, frz, band_cnt, exceed, from_left, from_right

    def integrate(pk, forces, dt):
        new_loc = stokes_integrate(
            pk[:, :3], pk[:, 3], forces, mot, pk[:, 5] > 0.0, bio.stokes,
            size, dt,
        )
        move2 = jnp.max(
            jnp.where(
                pk[:P_own, 5] > 0.0,
                jnp.sum((new_loc[:P_own] - pk[:P_own, :3]) ** 2, axis=-1),
                0.0,
            )
        )
        return pk.at[:, :3].set(new_loc), move2

    def zero_v():
        return jax.lax.pcast(jnp.zeros((), jnp.int32), (AXIS,), to="varying")

    if use_pallas:
        result = _domain_physics_pallas_scan(
            cfg, bio, bonds, size, dts, pk0, win0, frz0, store_radius,
            drift_and_band, rebuild, refresh_positions, integrate, zero_v,
        )
    else:
        def contact_xla(pk, bonds, win):
            order, pos, valid, _ = win
            return jkr_ops.jkr_substep(
                bonds, pk, order, pos, valid, bio.jkr_radius,
                bio.adhesion_const, bio.poisson, bio.youngs, bio.jkr_break_d,
                store_radius=store_radius,
            )

        def substep(carry, dt):
            pk, bonds, win, frz = carry
            do_rebuild, frz, band_cnt, exceed, from_left, from_right = (
                drift_and_band(pk, win, frz)
            )

            def do_re(args):
                pk, win = args
                pk, win, max_run, span_needed = rebuild(pk, from_left, from_right)
                return pk, win, max_run, span_needed

            def no_re(args):
                pk, win = args
                return (refresh_positions(pk, from_left, from_right), win,
                        zero_v(), zero_v())

            pk, win, max_run, span_needed = jax.lax.cond(
                do_rebuild, do_re, no_re, (pk, win)
            )
            forces, bonds, max_degree = contact_xla(pk, bonds, win)
            pk, move2 = integrate(pk, forces, dt)
            return (pk, bonds, win, frz), (
                max_run, max_degree, band_cnt, exceed, span_needed, move2,
            )

        (pk, bonds, _, _), (runs, degs, bands, exceeds, spans, moves2) = (
            jax.lax.scan(substep, (pk0, bonds, win0, frz0), jnp.asarray(dts))
        )
        result = (pk, bonds, runs, degs, bands, exceeds, spans, moves2)

    pk, bonds, runs, degs, bands, exceeds, spans, moves2 = result
    return (
        pk[:, :3],
        bonds,
        jnp.maximum(jnp.max(runs), max_run0),
        jnp.max(degs),
        jnp.maximum(jnp.max(bands), band0),
        jnp.zeros((), jnp.int32),  # halo_miss: structurally zero (frozen
        # sender-side membership — a frozen member is always resent)
        jnp.max(exceeds),
        jnp.maximum(jnp.max(spans), span0),
        jnp.sqrt(jnp.max(moves2)),
    )


def _domain_physics_pallas_scan(
    cfg, bio, bonds, size, dts, pk0, win0, frz0, store_radius,
    drift_and_band, rebuild, refresh_positions, integrate, zero_v,
):
    """Per-stripe physics with **span-mask bonds** (VERDICT r2 item 2): the
    single-chip engine's fast path, dropped into the decomposed scan.

    While a stripe's Verlet window (local sort order + span plan) is frozen,
    the bond set rides a persistent (C_loc, n_runs*span) int8 mask — one lane
    read for membership, one in-place write for storage — instead of the
    per-substep K-id membership scan + first-K compaction the round-2 path
    ran (~2.5x the per-row kernel cost, BENCHMARKS.md). Id lists are
    reconstructed only at rebuild boundaries and scan exit
    (``compact_mask_bonds``), exactly mirroring
    ``engine._physics_scan_pallas``; the rebuild schedule (pmax'd drift) and
    candidate sequences are unchanged, so domain-vs-single-chip agreement is
    preserved.

    Halo rows carry empty bond rows and garbage masks — harmless by
    construction: eligibility reads only the ROW's own bond state, halo rows'
    force/bond outputs are discarded (their positions are refreshed from the
    owner every substep, and only own rows [:P_own] leave the step)."""
    from hipsc_abm_tpu.ops.pallas_contact import (
        NO_BOND,
        compact_mask_bonds,
        contact_substep_ids_to_mask,
        contact_substep_masked,
    )

    base = cfg.base
    C = cfg.local_capacity
    spec_l = cfg.jkr_spec_local
    span = min(base.jkr_span, C)
    K = bonds.partners.shape[1]
    np_dts = np.asarray(dts)

    kern_kwargs = dict(
        block=base.pallas_block, span=span, run_offs=spec_l.flat_run_offsets,
        radius=bio.jkr_radius, adhesion_const=bio.adhesion_const,
        poisson=bio.poisson, youngs=bio.youngs, break_d=bio.jkr_break_d,
        chunk=base.pallas_chunk, uniform_radius=base.uniform_radius,
        store_radius=store_radius, interpret=base.pallas_interpret,
    )
    compact_kwargs = dict(
        block=base.pallas_block, span=span, run_offs=spec_l.flat_run_offsets,
        bond_cap=K, chunk=base.pallas_chunk, interpret=base.pallas_interpret,
    )

    def srt_of(pk, win):
        order, _inv, _starts, _needs, sflat, _ref = win
        return pk[order].at[:, 6].set(sflat)

    # --- entry: seed the window's mask from the id lists + first substep ---
    srt0 = srt_of(pk0, win0)
    bond_f0 = jnp.where(
        bonds.mask, bonds.partners.astype(jnp.float32), NO_BOND
    )[win0[0]]
    force_deg0, mask = contact_substep_ids_to_mask(
        srt0, bond_f0, win0[2], win0[3], **kern_kwargs
    )
    deg0 = jnp.max(force_deg0[:, 3]).astype(jnp.int32)
    pk0, move2_0 = integrate(pk0, force_deg0[win0[1]][:, :3], float(np_dts[0]))

    def substep(carry, dt):
        pk, mask, win, frz = carry
        do_rebuild, frz, band_cnt, exceed, from_left, from_right = (
            drift_and_band(pk, win, frz)
        )

        def do_re(args):
            pk, mask, win = args
            # mask -> id lists through the OLD window (the only bond
            # representation that survives a re-sort), then freeze the new
            # halo membership, re-plan, and seed the new window's mask
            srt_bonds = compact_mask_bonds(
                srt_of(pk, win), mask, win[2], win[3], **compact_kwargs
            )
            slot_bonds = srt_bonds[win[1]]
            pk, win, max_run, span_needed = rebuild(pk, from_left, from_right)
            force_deg, mask = contact_substep_ids_to_mask(
                srt_of(pk, win), slot_bonds[win[0]], win[2], win[3],
                **kern_kwargs,
            )
            return force_deg, pk, mask, win, max_run, span_needed

        def no_re(args):
            pk, mask, win = args
            pk = refresh_positions(pk, from_left, from_right)
            force_deg, mask = contact_substep_masked(
                srt_of(pk, win), mask, win[2], win[3], **kern_kwargs
            )
            return force_deg, pk, mask, win, zero_v(), zero_v()

        force_deg, pk, mask, win, max_run, span_needed = jax.lax.cond(
            do_rebuild, do_re, no_re, (pk, mask, win)
        )
        max_degree = jnp.max(force_deg[:, 3]).astype(jnp.int32)
        pk, move2 = integrate(pk, force_deg[win[1]][:, :3], dt)
        return (pk, mask, win, frz), (
            max_run, max_degree, band_cnt, exceed, span_needed, move2,
        )

    (pk, mask, win, _), (runs, degs, bands, exceeds, spans, moves2) = (
        jax.lax.scan(substep, (pk0, mask, win0, frz0), jnp.asarray(np_dts[1:]))
    )

    # --- exit: final mask -> id lists, back to slot rows -------------------
    srt_bonds = compact_mask_bonds(
        srt_of(pk, win), mask, win[2], win[3], **compact_kwargs
    )
    bs = srt_bonds[win[1]]
    bonds = BondState(partners=jnp.maximum(bs, 0).astype(jnp.int32), mask=bs >= 0)
    zv = zero_v()
    return (
        pk, bonds,
        jnp.concatenate([(zv * 0)[None], runs]),  # entry window probed by caller
        jnp.concatenate([deg0[None], degs]),
        bands,
        exceeds,
        jnp.concatenate([zv[None], spans]),
        jnp.concatenate([move2_0[None], moves2]),
    )


def _migrate(cfg, base, arrays, alive, bonds, ncl, nch, prev_ncl, next_nch):
    """Re-home own agents whose nbr-lattice column left the stripe: full-state
    packs ppermute to the adjacent stripe and land in its free slots. The
    single-chip engine has no analog (slots are global there); slot choice is
    layout-local and identity rides the agent id, so dynamics are unaffected."""
    P_own = cfg.per_stripe
    M = cfg.mig_cap
    C = cfg.local_capacity
    K = bonds.partners.shape[1]

    gcoords = nbr_ops._bin_coords(base.nbr_spec, arrays["locations"][:P_own])
    col = gcoords[:, 0]
    alive_own = alive[:P_own]
    out_left = alive_own & (col < ncl)
    out_right = alive_own & (col >= nch)
    # pathology probe: an emigrant skipping a stripe cannot be delivered by
    # one ring shift; drift_allowance growth cannot fix that — safe_step raises
    too_far = jnp.sum(out_left & (col < prev_ncl)) + jnp.sum(
        out_right & (col >= next_nch)
    )

    idxL, valL, cntL = _compact_idx(out_left, M)
    idxR, valR, cntR = _compact_idx(out_right, M)
    mig_out_max = jnp.maximum(cntL, cntR)

    lanes = [arrays[k][:P_own] for k in _MIG_FIELDS]
    bond_lane = jnp.where(
        bonds.mask[:P_own], bonds.partners[:P_own], -1
    ).astype(jnp.float32)
    lanes.append(bond_lane)

    def build(idx, val):
        pack = _gather_pack(lanes, idx, val)
        return jnp.concatenate([pack, val.astype(jnp.float32)[:, None]], axis=1)

    from_left, from_right = _ring_exchange(build(idxL, valL), build(idxR, valR), cfg.n_stripes)

    # clear emigrant slots, then place immigrants into free own slots
    alive_own = alive_own & ~(out_left | out_right)
    imm = jnp.concatenate([from_left, from_right], axis=0)  # (2M, L)
    imm_valid = imm[:, -1] > 0.0
    num_imm = jnp.sum(imm_valid)

    free = ~alive_own
    num_free = jnp.sum(free)
    free_rank = jnp.cumsum(free) - 1
    cap2 = 2 * M
    slot_of_rank = jnp.full((cap2,), C, jnp.int32).at[
        jnp.where(free & (free_rank < cap2), free_rank, cap2)
    ].set(jnp.arange(P_own, dtype=jnp.int32), mode="drop")
    imm_rank = jnp.cumsum(imm_valid) - 1
    placeable = imm_valid & (imm_rank < num_free)
    dest = jnp.where(
        placeable, slot_of_rank[jnp.clip(imm_rank, 0, cap2 - 1)], C
    ).astype(jnp.int32)
    mig_shortfall = num_imm - jnp.sum(placeable)

    c = 0
    for k in _MIG_FIELDS:
        arr = arrays[k]
        w = arr.shape[1] if arr.ndim == 2 else 1
        vals = imm[:, c:c + w]
        if arr.ndim == 1:
            arrays[k] = arr.at[dest].set(vals[:, 0].astype(arr.dtype), mode="drop")
        else:
            arrays[k] = arr.at[dest].set(vals.astype(arr.dtype), mode="drop")
        c += w
    bp = imm[:, c:c + K]
    c += K
    new_partners = bonds.partners.at[dest].set(
        jnp.maximum(bp, 0).astype(jnp.int32), mode="drop"
    )
    new_mask = bonds.mask.at[dest].set(bp >= 0, mode="drop")
    bonds = BondState(partners=new_partners, mask=new_mask)

    alive_new = jnp.concatenate([alive_own, jnp.zeros((C - P_own,), bool)])
    alive_new = alive_new.at[dest].set(True, mode="drop")
    return arrays, alive_new, bonds, mig_out_max, mig_shortfall, too_far


def domain_config_to_meta(cfg: DomainConfig) -> dict:
    """DomainConfig as a JSON-able dict (checkpoint metadata). Bit-exact
    resume needs the exact static configuration (probe caps feed RNG draw
    shapes and growth state), not one re-derived from data."""
    from hipsc_abm_tpu.engine import config_to_meta

    d = dataclasses.asdict(cfg)
    d["base"] = config_to_meta(cfg.base)
    d["col_bounds"] = list(cfg.col_bounds)
    return d


def domain_config_from_meta(meta: dict) -> DomainConfig:
    from hipsc_abm_tpu.engine import config_from_meta

    meta = dict(meta)
    meta["base"] = config_from_meta(meta["base"])
    meta["col_bounds"] = tuple(meta["col_bounds"])
    return DomainConfig(**meta)


# ---------------------------------------------------------------------------
# host-side driver
# ---------------------------------------------------------------------------


class DomainHipscEngine:
    """Host driver for the domain-decomposed engine: owns the column
    partition, the jitted shard_map step, and probe-driven capacity growth.

    Equivalent to ``HipscEngine`` for any colony (validated bit-for-ints /
    exactly-for-floats in ``tests/test_domain_engine.py``); communication per
    step is O(boundary band), not O(colony)."""

    def __init__(
        self,
        gen: GeneralParams,
        xp: ExperimentalParams,
        bio: Optional[BiologyParams] = None,
        diff: Optional[DiffusionParams] = None,
        mesh: Optional[Mesh] = None,
        n_stripes: Optional[int] = None,
        per_stripe: Optional[int] = None,
        halo_cap: int = 256,
        mig_cap: int = 128,
        drift_allowance: float = 15.0,
        enable_diffusion: bool = False,
        enable_growth: bool = False,
        enable_stochastic: bool = False,
        enable_diff_surround: bool = False,
        use_pallas: Optional[bool] = None,
        pallas_interpret: bool = False,
    ):
        self.gen = gen
        self.xp = xp
        self.bio = bio or BiologyParams()
        self.diff = diff
        if mesh is None:
            n = n_stripes or jax.device_count()
            mesh = Mesh(np.array(jax.devices()[:n]), (AXIS,))
        self.mesh = mesh
        S = mesh.devices.size
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"

        n0 = gen.num_to_start + xp.num_gata6
        capacity = max(_round_up(int(n0 * 1.3), 128), 256)  # headroom for several steps of growth before a recompile
        base = EngineConfig.create(
            gen.size,
            capacity=capacity,  # informational; per-stripe caps rule below
            bio=self.bio,
            enable_diffusion=enable_diffusion,
            enable_growth=enable_growth,
            enable_stochastic=enable_stochastic,
            enable_diff_surround=enable_diff_surround,
            use_pallas=bool(use_pallas),
            pallas_interpret=pallas_interpret,
            uniform_radius=None if enable_growth else self.bio.max_radius,
        )
        if per_stripe is None:
            # worst-case imbalance headroom; the deferral/migration probes
            # grow it if a stripe ever packs denser (256-aligned so the local
            # capacity keeps the Pallas span chunk-divisible)
            per_stripe = max(_round_up(int(n0 / S * 2.0), 256), 256)
        self.cfg = self._make_cfg(
            base, S, per_stripe, halo_cap, mig_cap, drift_allowance
        )
        self._compiled = {}

    def _make_cfg(self, base, S, per_stripe, halo_cap, mig_cap, drift) -> DomainConfig:
        cell = base.nbr_spec.cell_size
        size_x = self.gen.size[0]
        col_min, col_max = 1, int(math.ceil(size_x / cell)) + 2
        bounds = tuple(
            col_min + round(i * (col_max - col_min) / S) for i in range(S + 1)
        )
        widths = [bounds[i + 1] - bounds[i] for i in range(S)]
        if min(widths) < 3:
            raise ValueError(
                f"stripes need >= 3 neighbor-bin columns; box {size_x} um / "
                f"{S} stripes gives widths {widths}"
            )
        jcell = base.jkr_spec.cell_size
        min_width_um = min(widths) * cell
        need = 2 * drift + 2 * jcell + cell
        if min_width_um <= need:
            raise ValueError(
                f"stripe width {min_width_um:.0f} um must exceed "
                f"2*drift + 2*contact bins = {need:.0f} um; use fewer stripes"
            )
        nbr_nx_local = max(widths) + 4
        # local jkr lattice: cover [x_lo - drift, x_hi + drift] plus the two
        # receive bands and clip pads
        jkr_nx_local = 0
        for s in range(S):
            x_lo = (bounds[s] - 1) * cell
            x_hi = (bounds[s + 1] - 1) * cell
            lo_col = math.floor((x_lo - drift) / jcell) + 1 - 4
            hi_col = math.floor((x_hi + drift) / jcell) + 1 + 4
            jkr_nx_local = max(jkr_nx_local, hi_col - lo_col + 1)
        return DomainConfig(
            base=base,
            n_stripes=S,
            per_stripe=int(per_stripe),
            # 2*halo_cap must keep the local capacity block-aligned AND
            # 256-divisible for the per-shard Pallas kernels (block = 128,
            # chunk = 256: a capacity-clamped span must stay chunk-divisible)
            halo_cap=_round_up(int(halo_cap), 128),
            mig_cap=int(mig_cap),
            div_cap=max(128, _round_up(int(per_stripe) // 32, 128)),
            drift_allowance=float(drift),
            col_bounds=bounds,
            nbr_nx_local=int(nbr_nx_local),
            jkr_nx_local=int(jkr_nx_local),
        )

    def _stripe_consts(self, cfg: DomainConfig):
        """Per-stripe static constants as (S, n) device arrays (each device
        reads its own row under shard_map)."""
        base = cfg.base
        cell = base.nbr_spec.cell_size
        jcell = base.jkr_spec.cell_size
        D = cfg.drift_allowance
        S = cfg.n_stripes
        bounds = cfg.col_bounds
        sci = np.zeros((S, 12), np.int32)
        scf = np.zeros((S, 2), np.float32)

        def cjk(x):
            return math.floor(x / jcell) + 1

        for s in range(S):
            ncl, nch = bounds[s], bounds[s + 1]
            x_lo = (ncl - 1) * cell
            x_hi = (nch - 1) * cell
            col_off_nbr = ncl - 2
            col_off_jkr = cjk(x_lo - D) - 4
            # receive columns (freeze filter): everything my own rows can
            # probe given up-to-D out-of-stripe drift, one column of safety
            recv_l_col = cjk(x_lo - D) - 2
            recv_r_col = cjk(x_hi + D) + 2
            # fresh send bands: one column wider than the adjacent stripe's
            # receive columns so frozen members stay covered while drifting
            sl_fresh = cjk(x_lo + D) + 3  # left neighbor's recv_r + 1
            sr_fresh = cjk(x_hi - D) - 3  # right neighbor's recv_l - 1
            sci[s] = [
                ncl, nch, col_off_nbr, col_off_jkr,
                0, sl_fresh, 0, sr_fresh,
                bounds[s - 1] if s > 0 else 0,
                bounds[s + 2] if s + 2 <= S else bounds[S],
                recv_l_col, recv_r_col,
            ]
            scf[s] = [x_lo, x_hi]
        return jnp.asarray(sci), jnp.asarray(scf)

    # -- state construction ---------------------------------------------------

    def init_state(self, seed: int = 0, locations=None) -> DomainState:
        """Same colony as ``HipscEngine.init_state`` (identical RNG), laid out
        stripe-major by bin column."""
        helper = HipscEngine(
            self.gen, self.xp, bio=self.bio, diff=self.diff,
            cfg=self.cfg.base, use_pallas=False,
        )
        cell_state = helper.init_state(seed=seed, locations=locations)
        # adopt the data-driven run caps the helper derived
        self.cfg = dataclasses.replace(self.cfg, base=helper.cfg)
        return self.from_cell_state(cell_state)

    def from_cell_state(self, state: CellState) -> DomainState:
        """Partition a flat CellState into the stripe-major layout."""
        cfg = self.cfg
        S, Pn = cfg.n_stripes, cfg.per_stripe
        K = state.bonds.partners.shape[1]
        locs = np.asarray(state.arrays["locations"])
        alive = np.asarray(state.alive)
        cell = cfg.base.nbr_spec.cell_size
        col = np.clip(
            np.floor(locs[:, 0] / cell).astype(np.int64) + 1,
            0, cfg.base.nbr_spec.nx - 1,
        )
        bounds = cfg.col_bounds
        stripe = np.searchsorted(np.asarray(bounds[1:]), col, side="right")
        stripe = np.clip(stripe, 0, S - 1)

        arrays = {
            k: np.zeros((S, Pn) + np.asarray(v).shape[1:], np.asarray(v).dtype)
            for k, v in state.arrays.items()
        }
        alive_out = np.zeros((S, Pn), bool)
        partners = np.zeros((S, Pn, K), np.int32)
        bmask = np.zeros((S, Pn, K), bool)
        src_p = np.asarray(state.bonds.partners)
        src_m = np.asarray(state.bonds.mask)
        for s in range(S):
            idx = np.where(alive & (stripe == s))[0]
            if len(idx) > Pn:
                raise ValueError(
                    f"stripe {s} holds {len(idx)} agents > per_stripe {Pn}"
                )
            n = len(idx)
            for k, v in state.arrays.items():
                arrays[k][s, :n] = np.asarray(v)[idx]
            alive_out[s, :n] = True
            partners[s, :n] = src_p[idx]
            bmask[s, :n] = src_m[idx]

        return DomainState(
            arrays={k: jnp.asarray(v) for k, v in arrays.items()},
            alive=jnp.asarray(alive_out),
            bonds=BondState(partners=jnp.asarray(partners), mask=jnp.asarray(bmask)),
            gradients=dict(state.gradients),
            key=state.key,
            step=state.step,
            next_id=state.next_id,
        )

    def to_cell_state(self, dstate: DomainState, capacity: Optional[int] = None) -> CellState:
        """Flatten to a CellState (stripe-major slot order; agent identity is
        carried by ids, so compare engines by id, not slot)."""
        cfg = self.cfg
        S, Pn = cfg.n_stripes, cfg.per_stripe
        C = capacity or S * Pn
        arrays = {
            k: jnp.reshape(v, (S * Pn,) + v.shape[2:])[:C]
            for k, v in dstate.arrays.items()
        }
        return CellState(
            arrays=arrays,
            alive=jnp.reshape(dstate.alive, (S * Pn,))[:C],
            bonds=BondState(
                partners=jnp.reshape(dstate.bonds.partners, (S * Pn, -1))[:C],
                mask=jnp.reshape(dstate.bonds.mask, (S * Pn, -1))[:C],
            ),
            gradients=dict(dstate.gradients),
            key=dstate.key,
            step=dstate.step,
            next_id=dstate.next_id,
        )

    # -- checkpoint / resume ---------------------------------------------------
    #
    # The pod-scale analog of the reference's mode-1 contract
    # (``simulation.py:525-536``): a DomainState round-trips through the flat
    # CellState npz format plus the full DomainConfig as metadata. Dynamics
    # are layout-independent (id-keyed RNG, canonical-order windows), so the
    # re-partition on load — which may place agents in different slots than
    # the interrupted run held them in — yields bit-identical continuation
    # (validated by ``tests/test_domain_engine.py::
    # test_domain_checkpoint_resume_bit_exact``).

    def save_checkpoint(self, path: str, dstate: DomainState) -> None:
        from hipsc_abm_tpu.utils import checkpoint as ckpt

        ckpt.save_state(
            path, self.to_cell_state(dstate),
            meta={"domain_config": domain_config_to_meta(self.cfg)},
        )

    def load_checkpoint(self, path: str) -> DomainState:
        """Restore a DomainState; adopts the checkpoint's static configuration
        (capacities, probe caps, drift allowance) so resume is bit-exact."""
        from hipsc_abm_tpu.utils import checkpoint as ckpt

        state, meta = ckpt.load_state(path)
        if "domain_config" in meta:
            cfg = domain_config_from_meta(meta["domain_config"])
            if cfg.n_stripes != self.mesh.devices.size:
                raise ValueError(
                    f"checkpoint has {cfg.n_stripes} stripes; mesh has "
                    f"{self.mesh.devices.size} devices"
                )
            self.cfg = cfg
        return self.from_cell_state(state)

    # -- stepping --------------------------------------------------------------

    def _step_fn(self, cfg: DomainConfig):
        lkey = (cfg, self.gen, self.xp, self.bio, self.diff, self.mesh)
        if lkey not in self._compiled:
            body = functools.partial(
                _domain_step_body,
                cfg=cfg, gen=self.gen, xp=self.xp, bio=self.bio, diff=self.diff,
            )
            sharded = P(AXIS)
            repl = P()

            def specs_like(state_arrays):
                return jax.tree_util.tree_map(lambda _: sharded, state_arrays)

            def run(arrays, alive, partners, bmask, gradients, key, step, next_id,
                    sci, scf):
                in_specs = (
                    specs_like(arrays), sharded, sharded, sharded,
                    jax.tree_util.tree_map(lambda _: repl, gradients),
                    repl, repl, repl, sharded, sharded,
                )
                out_specs = (
                    specs_like(arrays), sharded, sharded, sharded,
                    jax.tree_util.tree_map(lambda _: repl, gradients),
                    repl, repl, repl,
                    DomainStepInfo(*([repl] * len(DomainStepInfo._fields))),
                )
                # check_vma off: pallas_call outputs can't declare their
                # varying-axes metadata yet, which trips the checker when the
                # per-shard Mosaic kernel runs inside the body
                return shard_map(
                    body, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
                    check_vma=False,
                )(arrays, alive, partners, bmask, gradients, key, step, next_id,
                  sci, scf)

            self._compiled[lkey] = jax.jit(run)
        return self._compiled[lkey]

    def step(self, state: DomainState) -> Tuple[DomainState, DomainStepInfo]:
        cfg = self._cfg_for_state(state)
        sci, scf = self._stripe_consts(cfg)
        out = self._step_fn(cfg)(
            state.arrays, state.alive, state.bonds.partners, state.bonds.mask,
            state.gradients, state.key, state.step, state.next_id, sci, scf,
        )
        (arrays, alive, partners, bmask, gradients, key, step, next_id, info) = out
        new_state = DomainState(
            arrays=arrays, alive=alive,
            bonds=BondState(partners=partners, mask=bmask),
            gradients=gradients, key=key, step=step, next_id=next_id,
        )
        return new_state, info

    def _cfg_for_state(self, state: DomainState) -> DomainConfig:
        cfg = self.cfg
        Pn = state.alive.shape[1]
        K = state.bonds.partners.shape[2]
        if cfg.per_stripe != Pn or cfg.base.bond_cap != K:
            cfg = dataclasses.replace(
                cfg, per_stripe=Pn, base=dataclasses.replace(cfg.base, bond_cap=K)
            )
        return cfg

    def safe_step(self, state: DomainState) -> Tuple[DomainState, DomainStepInfo]:
        """Step with exact overflow recovery: any tripped probe grows its
        static capacity and re-executes from the unmodified input state."""
        for _ in range(16):
            new_state, info = self.step(state)
            # one batched transfer for all growth probes (see
            # HipscEngine.safe_step)
            info = DomainStepInfo(*jax.device_get(tuple(info)))
            if int(info.max_id) >= (1 << 24) - 1:
                raise RuntimeError("agent id space exhausted (2^24)")
            if int(info.mig_too_far) > 0:
                raise RuntimeError(
                    "an agent crossed an entire stripe in one step; the "
                    "decomposition cannot deliver it — use fewer stripes"
                )
            grown = self._grown_cfg(self._cfg_for_state(state), info)
            if grown is None:
                return new_state, info
            self.cfg = grown
            state = self.repad_state(state, grown)
        raise RuntimeError("capacity growth failed to converge")

    def _grown_cfg(self, cfg: DomainConfig, info: DomainStepInfo) -> Optional[DomainConfig]:
        changed = False
        base = cfg.base
        if int(info.nbr_max_in_bin) > base.nbr_spec.run_cap:
            base = dataclasses.replace(
                base,
                nbr_spec=dataclasses.replace(
                    base.nbr_spec,
                    run_cap=_round_up(int(info.nbr_max_in_bin) * 2, 8),
                ),
            )
            changed = True
        if int(info.jkr_max_in_bin) > base.jkr_spec.run_cap:
            base = dataclasses.replace(
                base,
                jkr_spec=dataclasses.replace(
                    base.jkr_spec,
                    run_cap=_round_up(int(info.jkr_max_in_bin) * 2, 8),
                ),
            )
            changed = True
        bond_cap = base.bond_cap
        if int(info.jkr_max_degree) > bond_cap:
            base = dataclasses.replace(
                base, bond_cap=_round_up(int(info.jkr_max_degree) * 2, 8)
            )
            changed = True
        per_stripe = cfg.per_stripe
        div_cap = cfg.div_cap
        if int(info.num_dividing) > div_cap:
            div_cap = min(_round_up(int(info.num_dividing) * 2, 128), per_stripe)
            changed = True
        elif int(info.num_deferred) > 0 or int(info.mig_shortfall) > 0:
            per_stripe = _round_up(per_stripe * 2, 256)
            changed = True
        halo_cap = cfg.halo_cap
        band_need = max(int(info.bio_band_max), int(info.phys_band_max))
        if band_need > halo_cap:
            halo_cap = _round_up(band_need * 2, 128)
            changed = True
        mig_cap = cfg.mig_cap
        if int(info.mig_out_max) > mig_cap:
            mig_cap = _round_up(int(info.mig_out_max) * 2, 8)
            changed = True
        drift = cfg.drift_allowance
        if float(info.drift_exceed) > drift or int(info.halo_miss) > 0:
            drift = drift * 2.0
            changed = True
        margin = base.bond_band_margin
        if margin is not None:
            bio_disp = 2.0 * (self.bio.max_radius - self.bio.min_radius)
            required = 2.0 * float(info.max_substep_move) + bio_disp
            if required > margin:
                new_margin = min(required * 1.5, self.bio.jkr_radius)
                if new_margin > margin:
                    base = dataclasses.replace(base, bond_band_margin=new_margin)
                    changed = True
        if base.use_pallas and int(info.jkr_span_needed) > base.jkr_span:
            base = dataclasses.replace(
                base,
                jkr_span=_round_up(int(info.jkr_span_needed) * 1.25, 128),
            )
            changed = True
        if not changed:
            return None
        # re-derive partition-dependent statics (bands depend on drift)
        new = self._make_cfg(
            base, cfg.n_stripes, per_stripe, halo_cap, mig_cap, drift
        )
        return dataclasses.replace(new, div_cap=div_cap)

    @staticmethod
    def repad_state(state: DomainState, cfg: DomainConfig) -> DomainState:
        """Pad a state to grown per-stripe / bond capacities."""
        Pn = cfg.per_stripe
        K = cfg.base.bond_cap

        def pad_axis1(a):
            if a.shape[1] == Pn:
                return a
            pad = [(0, 0), (0, Pn - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, pad)

        partners = pad_axis1(state.bonds.partners)
        mask = pad_axis1(state.bonds.mask)
        if K != partners.shape[2]:
            if K < partners.shape[2]:
                raise ValueError("bond capacity cannot shrink")
            partners = jnp.pad(partners, ((0, 0), (0, 0), (0, K - partners.shape[2])))
            mask = jnp.pad(mask, ((0, 0), (0, 0), (0, K - mask.shape[2])))
        return DomainState(
            arrays={k: pad_axis1(v) for k, v in state.arrays.items()},
            alive=pad_axis1(state.alive),
            bonds=BondState(partners=partners, mask=mask),
            gradients=state.gradients,
            key=state.key,
            step=state.step,
            next_id=state.next_id,
        )
