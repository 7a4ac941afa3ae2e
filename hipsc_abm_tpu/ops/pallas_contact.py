"""Pallas TPU kernel: fused JKR contact substep over sorted span DMA.

XLA's gather is the bottleneck of the windowed physics path (~45 ns per
gathered index on v5e — per-index overhead, not bandwidth). This kernel
removes every gather from the substep hot loop:

- agents are processed in **sorted (grid) order**, in blocks of B rows;
- a block's stencil candidates live in contiguous sorted spans (one per
  3-bin run — 3 runs in 2D, 9 in 3D; see ``ops.neighbors``); each span is
  DMA'd from HBM into VMEM as a lane-contiguous (8, S) tile of the
  field-major sorted pack, replacing the (C, W, 8) gather. Span starts are
  rounded down to the 128-lane tile boundary; the extra candidates are
  rejected by the per-row interval masks;
- **in-kernel chunked span loop**: each block program walks its spans in
  CHUNK-wide slices with double-buffered DMA (next chunk in flight while the
  current one computes), bounded by a scalar-prefetched per-(run, block)
  chunk count. The static span cap is sized for the worst block, but most
  blocks need a fraction of it — and blocks of dead slots need none — so
  compute scales with the *true* candidate count, not the worst case, and
  the grid stays one program per block (an earlier revision rode the chunk
  index on a second grid dimension; that grid's per-program overhead was
  ~25% of kernel time at 500k agents). VMEM scratch scales with CHUNK, not
  the span cap, so the cap can be generous;
- per-row candidate masks come from flat-bin-id interval tests against the
  row's run (pure VPU compares);
- bond membership (slot-id compare against the row's K partners) and
  first-K bond compaction (prefix-sum + select-reduce) run in-kernel,
  replacing the (C, W, K) broadcast and the one-hot MXU contraction;
- when every agent has the same radius (the reference default — growth is
  disabled, ``cell_simulation.py:98``), the JKR overlap scale and force
  prefactor are compile-time scalars (``uniform_radius``), removing the
  per-pair cube root / divide from the pair law; the pair distance uses one
  ``rsqrt`` (no sqrt + divide), and 2D lattices skip the z lanes entirely.

The kernel computes exactly the same physics as ``ops.jkr.jkr_substep``
(same eligibility rule: fresh contact within the search radius OR an existing
bond, force while the nondimensional overlap stays above the break
threshold); equivalence is tested in ``tests/test_pallas.py`` in interpreter
mode and against the XLA path on real hardware (``tests_tpu/test_tpu_hw.py``).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FIELDS = 8  # pack fields: [x, y, z, radius, slot, alive, flat, 0]
NO_BOND = -1.0
_ALIGN = 128  # lane-tile alignment for span starts


def effective_chunk(span: int, chunk: int) -> int:
    """The chunk width actually used for a given span cap: never wider than
    the span, and falling back to one whole-span chunk when the span is not
    chunk-divisible (callers must use this same value for both
    ``block_span_plan`` and the kernels)."""
    chunk = min(chunk, span)
    if span % chunk:
        return span
    return chunk


def _prefix_sum_lanes(v: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the lane axis (Mosaic has no cumsum)."""
    width = v.shape[1]
    shift = 1
    while shift < width:
        v = v + jnp.pad(v, ((0, 0), (shift, 0)))[:, :width]
        shift *= 2
    return v


def _contact_kernel(
    # scalar prefetch
    span_starts_ref,  # (n_runs+1, nblocks) int32 — 128-aligned span starts
    chunk_needs_ref,  # (n_runs+1, nblocks) int32 — per-run active chunk counts
    # (run-major layout: SMEM pads the minor dim to 128 lanes, so the long
    # block axis must be minor)
    # VMEM blocks
    rows_ref,  # (B, 8) f32 — this block's sorted pack rows
    bonds_ref,  # (B, K) f32 — partner slot ids, NO_BOND empty
    # HBM
    hbm_packT_ref,  # (8, C) f32 — field-major sorted pack (span DMA source)
    # outputs (written once per block)
    out_force_ref,  # (B, 8) f32 — [fx, fy, fz, degree, 0...]
    out_bonds_ref,  # (B, K) f32 — new partner slot ids, NO_BOND empty
    # scratch
    span_ref,  # (n_runs, 2, 8, CS) f32 — double-buffered chunk slots
    sems,  # DMA semaphores (n_runs, 2)
    *,
    CS: int,
    K: int,
    run_offs: Tuple[int, ...],
    two_d: bool,
    radius: float,
    store_radius: Optional[float],
    adhesion_const: float,
    poisson: float,
    youngs: float,
    break_d: float,
    uniform_radius: Optional[float],
):
    i = pl.program_id(0)
    B = rows_ref.shape[0]
    R = len(run_offs)

    needs = [chunk_needs_ref[r, i] for r in range(R)]
    max_need = needs[0]
    for r in range(1, R):
        max_need = jnp.maximum(max_need, needs[r])

    def dma(r, c, slot):
        start = pl.multiple_of(span_starts_ref[r, i] + c * CS, _ALIGN)
        return pltpu.make_async_copy(
            hbm_packT_ref.at[:, pl.ds(start, CS)],
            span_ref.at[r, slot],
            sems.at[r, slot],
        )

    # warm up: chunk 0 into buffer slot 0
    for r in range(R):
        @pl.when(0 < needs[r])
        def _(r=r):
            dma(r, 0, 0).start()

    x = rows_ref[:, 0:1]
    y = rows_ref[:, 1:2]
    z = rows_ref[:, 2:3]
    rad = rows_ref[:, 3:4]
    slot_id = rows_ref[:, 4:5]
    row_alive = rows_ref[:, 5:6] > 0.0
    row_flat = rows_ref[:, 6:7]  # flat bin id at window-build time (f32-exact)

    e_hat = 1.0 / (2.0 * (1.0 - poisson**2) / youngs)
    r2 = jnp.float32(radius * radius)
    if store_radius is not None:
        sr2 = jnp.float32(max(store_radius, 0.0) ** 2)
    if uniform_radius is not None:
        # scalar-radius fast path: the JKR overlap scale and prefactor are
        # compile-time constants (reference default: growth disabled, all
        # radii == max_radius)
        u_r_hat = (uniform_radius * uniform_radius) / (1e6 * 2.0 * uniform_radius)
        u_scale = ((math.pi * adhesion_const) / e_hat) ** (2.0 / 3.0) * u_r_hat ** (
            1.0 / 3.0
        )
        u_inv_scale = 1.0 / (1e6 * u_scale)  # folds the um -> m conversion
        u_fpre = math.pi * adhesion_const * u_r_hat

    def chunk_body(c, carry):
        acc, bond_cols, count = carry
        buf = jax.lax.rem(c, 2)

        # prefetch the next chunk while this one computes
        for r in range(R):
            @pl.when(c + 1 < needs[r])
            def _(r=r):
                dma(r, c + 1, 1 - buf).start()
        for r in range(R):
            @pl.when(c < needs[r])
            def _(r=r):
                dma(r, c, buf).wait()

        for r in range(R):
            active = c < needs[r]
            span = span_ref[r, buf]  # (8, CS)
            cand_x = span[0:1, :]
            cand_y = span[1:2, :]
            cand_rad = span[3:4, :]
            cand_slot = span[4:5, :]
            cand_flat = span[6:7, :]

            # candidate membership in this row's 3-bin stencil run: a pure
            # flat-bin-id interval test against the build-time bin ids. Dead
            # rows/candidates carry the sentinel flat id (or garbage) and are
            # rejected by the alive lanes below.
            run_lo = row_flat + jnp.float32(run_offs[r] - 1)
            in_run = (cand_flat >= run_lo) & (cand_flat < run_lo + 3.0)  # (B, CS)

            dx = x - cand_x
            dy = y - cand_y
            dist2 = dx * dx + dy * dy
            if not two_d:
                cand_z = span[2:3, :]
                dz = z - cand_z
                dist2 = dist2 + dz * dz
            pair_ok = in_run & (cand_slot != slot_id) & row_alive & active

            bonded = jnp.zeros_like(pair_ok)
            for k in range(K):
                bonded |= cand_slot == bonds_ref[:, k : k + 1]
            eligible = pair_ok & ((dist2 <= r2) | bonded)

            # JKR pair law (cell_backend.py:73-113) via one rsqrt:
            # mag = dist2 * inv and w = fmag * inv (no sqrt, no divide)
            inv = jnp.where(dist2 > 0, jax.lax.rsqrt(dist2), 0.0)
            mag = dist2 * inv
            if uniform_radius is not None:
                d = (2.0 * uniform_radius - mag) * u_inv_scale
                survive = d > break_d
                f = ((-0.0204 * d + 0.4942) * d + 1.0801) * d - 1.324
                fmag = f * u_fpre
            else:
                overlap = (rad + cand_rad - mag) / 1e6
                r_hat = (rad * cand_rad) / (1e6 * jnp.maximum(rad + cand_rad, 1e-12))
                overlap_scale = (
                    (math.pi * adhesion_const) / e_hat
                ) ** (2.0 / 3.0) * jnp.power(r_hat, 1.0 / 3.0)
                d = overlap / jnp.maximum(overlap_scale, 1e-30)
                survive = d > break_d
                f = ((-0.0204 * d + 0.4942) * d + 1.0801) * d - 1.324
                fmag = f * (math.pi * adhesion_const) * r_hat

            keep = eligible & survive
            # mask AFTER the products: inactive runs read uninitialized VMEM
            # whose garbage may be NaN, and 0 * NaN = NaN would leak through
            # a pre-masked weight
            w = fmag * inv
            fx = jnp.sum(jnp.where(keep, w * dx, 0.0), axis=1, keepdims=True)
            fy = jnp.sum(jnp.where(keep, w * dy, 0.0), axis=1, keepdims=True)
            if two_d:
                fz = jnp.zeros((B, 1), jnp.float32)
            else:
                fz = jnp.sum(jnp.where(keep, w * dz, 0.0), axis=1, keepdims=True)
            # band storage option: see ops.jkr.jkr_substep_aligned
            stored = keep & (dist2 > sr2) if store_radius is not None else keep
            nstored = jnp.sum(stored.astype(jnp.float32), axis=1, keepdims=True)

            # first-K compaction, continuing the per-row stored count
            dest = _prefix_sum_lanes(stored.astype(jnp.int32)) - 1 + count
            cols = []
            for k in range(K):
                sel = stored & (dest == k)
                val = jnp.sum(jnp.where(sel, cand_slot, 0.0), axis=1, keepdims=True)
                present = jnp.sum(sel.astype(jnp.float32), axis=1, keepdims=True)
                cols.append(jnp.where(present > 0, val, bond_cols[:, k : k + 1]))
            bond_cols = jnp.concatenate(cols, axis=1)

            acc = jnp.concatenate(
                [
                    acc[:, 0:1] + fx,
                    acc[:, 1:2] + fy,
                    acc[:, 2:3] + fz,
                    acc[:, 3:4] + nstored,
                    acc[:, 4:8],
                ],
                axis=1,
            )
            count = count + nstored.astype(jnp.int32)
        return acc, bond_cols, count

    acc0 = jnp.zeros((B, 8), jnp.float32)
    bonds0 = jnp.full((B, K), NO_BOND, jnp.float32)
    count0 = jnp.zeros((B, 1), jnp.int32)
    acc, bond_cols, _ = jax.lax.fori_loop(
        0, max_need, chunk_body, (acc0, bonds0, count0)
    )
    out_force_ref[:] = acc
    out_bonds_ref[:] = bond_cols


def contact_substep_pallas(
    srt_pack: jnp.ndarray,  # (C, 8) f32 sorted pack rows (lane 6 = flat bin id)
    srt_bonds: jnp.ndarray,  # (C, K) f32 partner slot ids (NO_BOND empty)
    span_starts: jnp.ndarray,  # (n_runs+1, nblocks) int32, 128-aligned
    chunk_needs: jnp.ndarray,  # (n_runs+1, nblocks) int32
    *,
    block: int,
    span: int,
    run_offs: Tuple[int, ...],
    radius: float,
    adhesion_const: float,
    poisson: float,
    youngs: float,
    break_d: float,
    store_radius: Optional[float] = None,
    chunk: int = 256,
    uniform_radius: Optional[float] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused contact kernel. Returns ``(force_deg (C, 8), new_bonds
    (C, K))`` in sorted-row order; lane 3 of the force output is the per-row
    stored-bond count (the bond-capacity overflow probe). ``store_radius``
    selects band bond storage (see ``ops.jkr.jkr_substep_aligned``); None
    stores the full edge set.

    ``span_starts``/``chunk_needs`` come from ``neighbors.block_span_plan``;
    the needs bound each block's in-kernel chunk loop. Run membership is
    tested in-kernel against the flat bin ids in pack lane 6 (build-time
    binning), so no per-row run-bound table is needed; ``run_offs`` is
    ``GridSpec.flat_run_offsets`` — the static flat-id offset of each stencil
    run (3 runs in 2D, 9 in 3D).
    """
    C = srt_pack.shape[0]
    K = srt_bonds.shape[1]
    nblocks = C // block
    chunk = effective_chunk(span, chunk)
    assert C % block == 0, (C, block)
    assert span % chunk == 0, (span, chunk)
    assert chunk % _ALIGN == 0 or chunk == C, (chunk, C)
    assert span <= C, f"DMA span {span} exceeds capacity {C}"
    two_d = len(run_offs) == 3

    kernel = functools.partial(
        _contact_kernel,
        CS=chunk,
        K=K,
        run_offs=tuple(run_offs),
        two_d=two_d,
        radius=radius,
        store_radius=store_radius,
        adhesion_const=adhesion_const,
        poisson=poisson,
        youngs=youngs,
        break_d=break_d,
        uniform_radius=uniform_radius,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block, FIELDS), lambda i, *s: (i, 0)),
            pl.BlockSpec((block, K), lambda i, *s: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),  # field-major pack
        ],
        out_specs=[
            pl.BlockSpec((block, 8), lambda i, *s: (i, 0)),
            pl.BlockSpec((block, K), lambda i, *s: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((len(run_offs), 2, FIELDS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((len(run_offs), 2)),
        ],
    )
    force_deg, new_bonds = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((C, 8), jnp.float32),
            jax.ShapeDtypeStruct((C, K), jnp.float32),
        ],
        interpret=interpret,
    )(span_starts, chunk_needs, srt_pack, srt_bonds, srt_pack.T)
    return force_deg, new_bonds


# (per-block span planning lives in ``neighbors.block_span_plan``, computed
# from block-edge table lookups — per-row run bounds are never materialized)


# ---------------------------------------------------------------------------
# span-mask bond representation (the fast path between Verlet rebuilds)
# ---------------------------------------------------------------------------
#
# Measured at 500k agents, 66% of the fused substep kernel was bond
# bookkeeping: the K=8 id-membership test (16 VPU passes per chunk-run) and
# the first-K compaction (prefix sum + 24 passes). While a Verlet window is
# frozen, none of that is necessary: the bond set can live as a persistent
# (C, span) int8 mask over the window's span lanes — "was this (row,
# candidate-lane) pair kept last substep". Eligibility is then ONE lane read
# and the new bond state is the keep mask stored directly. Id lists are
# reconstructed only at window rebuilds (``compact_mask_bonds``), and the
# first substep of a fresh window seeds the mask from id lists
# (``contact_substep_ids_to_mask``). See engine._physics_scan_pallas for the
# segment schedule.


def _pair_consts(poisson, youngs, adhesion_const, uniform_radius):
    """Compile-time pair-law constants; (inv_scale, prefactor) is the
    scalar-radius fast path (growth disabled — the reference default)."""
    e_hat = 1.0 / (2.0 * (1.0 - poisson**2) / youngs)
    if uniform_radius is None:
        return e_hat, None
    u_r_hat = (uniform_radius * uniform_radius) / (1e6 * 2.0 * uniform_radius)
    u_scale = ((math.pi * adhesion_const) / e_hat) ** (2.0 / 3.0) * u_r_hat ** (
        1.0 / 3.0
    )
    return e_hat, (1.0 / (1e6 * u_scale), math.pi * adhesion_const * u_r_hat,
                   uniform_radius)


def _pair_keep(span, rows, run_off, two_d, e_hat, uni, radius, adhesion_const,
               break_d, bonded):
    """Shared per-(chunk, run) pair evaluation: returns ``(keep, dist2, w,
    dx, dy, dz)`` where ``w * (dx, dy, dz)`` is the pair force and ``keep``
    the surviving-eligible mask (same physics as ``ops.jkr.jkr_substep``)."""
    x, y, z, rad, slot_id, row_alive, row_flat = rows
    cand_x = span[0:1, :]
    cand_y = span[1:2, :]
    cand_rad = span[3:4, :]
    cand_slot = span[4:5, :]
    cand_flat = span[6:7, :]

    run_lo = row_flat + jnp.float32(run_off - 1)
    in_run = (cand_flat >= run_lo) & (cand_flat < run_lo + 3.0)

    dx = x - cand_x
    dy = y - cand_y
    dist2 = dx * dx + dy * dy
    dz = None
    if not two_d:
        dz = z - span[2:3, :]
        dist2 = dist2 + dz * dz
    pair_ok = in_run & (cand_slot != slot_id) & row_alive

    r2 = jnp.float32(radius * radius)
    eligible = pair_ok & ((dist2 <= r2) | bonded)

    inv = jnp.where(dist2 > 0, jax.lax.rsqrt(dist2), 0.0)
    mag = dist2 * inv
    if uni is not None:
        u_inv_scale, u_fpre, u_r = uni
        d = (2.0 * u_r - mag) * u_inv_scale
        f = ((-0.0204 * d + 0.4942) * d + 1.0801) * d - 1.324
        fmag = f * u_fpre
    else:
        overlap = (rad + cand_rad - mag) / 1e6
        r_hat = (rad * cand_rad) / (1e6 * jnp.maximum(rad + cand_rad, 1e-12))
        overlap_scale = (
            (math.pi * adhesion_const) / e_hat
        ) ** (2.0 / 3.0) * jnp.power(r_hat, 1.0 / 3.0)
        d = overlap / jnp.maximum(overlap_scale, 1e-30)
        f = ((-0.0204 * d + 0.4942) * d + 1.0801) * d - 1.324
        fmag = f * (math.pi * adhesion_const) * r_hat
    keep = eligible & (d > break_d)
    # mask AFTER the products: inactive runs read uninitialized VMEM whose
    # garbage may be NaN, and 0 * NaN = NaN would leak through a pre-masked
    # weight
    return keep, dist2, fmag * inv, dx, dy, dz


def _row_lanes(rows_ref):
    return (rows_ref[:, 0:1], rows_ref[:, 1:2], rows_ref[:, 2:3],
            rows_ref[:, 3:4], rows_ref[:, 4:5], rows_ref[:, 5:6] > 0.0,
            rows_ref[:, 6:7])


# ---------------------------------------------------------------------------
# span-mask bond representation (the fast path between Verlet rebuilds)
# ---------------------------------------------------------------------------
#
# Measured at 500k agents, 66% of the fused substep kernel was bond
# bookkeeping: the K=8 id-membership test (16 VPU passes per chunk-run) and
# the first-K compaction (prefix sum + 24 passes). While a Verlet window is
# frozen, none of that is necessary: the bond set lives as a persistent
# (C, n_runs*span) int8 mask over the window's span lanes — "was this (row,
# candidate-lane) pair kept last substep". Eligibility is then ONE lane read
# and the new bond state is the keep mask stored directly. Id lists are
# reconstructed only at window rebuilds (``compact_mask_bonds``), and the
# first substep of a fresh window seeds the mask from id lists
# (``contact_substep_ids_to_mask``). See engine._physics_scan_pallas for the
# segment schedule.
#
# Two overhead optimizations shape the round-3 kernels (measured in
# tools/kernel_floor.py: at 500k the masked substep was 16.7 ms of which
# only ~3 ms was lane work — the rest per-program DMA stalls and mask-block
# I/O):
#
# 1. **Cross-program DMA pipelining**: TPU grid programs run sequentially on
#    the core and scratch/semaphores persist across them, so each program's
#    epilogue prefetches the NEXT block's chunk-0 DMAs (span + mask) into
#    the alternating scratch slot (slot = (program + chunk) % 2). Program
#    i's first wait then finds its data already in flight — the per-program
#    DMA-latency stall is paid once by program 0, not 5,586 times.
#
# 2. **Sparse (chunk-granular) mask I/O**: the persistent mask is HBM-
#    resident and the kernels DMA only the ACTIVE chunks (c < needs), in
#    and out, instead of auto-pipelining the full (B, n_runs*span) block:
#    traffic scales with true candidate counts (~1 chunk/run at 500k), not
#    the worst-case span cap, and the output needs no zero-fill (regions
#    beyond a window's needs are never read while that window is frozen —
#    the plan is invariant between rebuilds, and each rebuild's seed
#    rewrites every region the new plan can read).


def _contact_kernel_mask(
    span_starts_ref, chunk_needs_ref,
    rows_ref,  # (B, 8) f32 — this block's sorted pack rows (auto-blocked)
    hbm_packT_ref,  # (8, C) f32 HBM — span DMA source
    in_mask_ref,  # (C, R*SPAN) i8 HBM — persistent bond mask (aliased out)
    out_force_ref,  # (B, 8) f32 (auto-blocked)
    out_mask_ref,  # (C, R*SPAN) i8 HBM
    span_ref,  # (R, 2, 8, CS) f32 scratch
    min_ref,  # (R, 2, B, CS) i8 scratch — in-mask chunks
    mout_ref,  # (R, 2, B, CS) i8 scratch — out-mask staging
    span_sems, mi_sems, mo_sems, *,
    CS, SPAN, run_offs, two_d, radius, adhesion_const, poisson, youngs,
    break_d, uniform_radius, store_radius,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    B = rows_ref.shape[0]
    R = len(run_offs)

    needs = [chunk_needs_ref[r, i] for r in range(R)]
    nxt = jnp.minimum(i + 1, n - 1)
    needs_nxt = [chunk_needs_ref[r, nxt] for r in range(R)]
    max_need = needs[0]
    for r in range(1, R):
        max_need = jnp.maximum(max_need, needs[r])

    def span_dma(prog, r, c):
        start = pl.multiple_of(span_starts_ref[r, prog] + c * CS, _ALIGN)
        slot = jax.lax.rem(prog + c, 2)
        return pltpu.make_async_copy(
            hbm_packT_ref.at[:, pl.ds(start, CS)],
            span_ref.at[r, slot], span_sems.at[r, slot],
        )

    def min_dma(prog, r, c):
        slot = jax.lax.rem(prog + c, 2)
        return pltpu.make_async_copy(
            in_mask_ref.at[r, c, pl.ds(prog * B, B), :],
            min_ref.at[r, slot], mi_sems.at[r, slot],
        )

    def mout_dma(prog, r, c):
        slot = jax.lax.rem(prog + c, 2)
        return pltpu.make_async_copy(
            mout_ref.at[r, slot],
            out_mask_ref.at[r, c, pl.ds(prog * B, B), :],
            mo_sems.at[r, slot],
        )

    # program 0 warms its own chunk 0; every later program's chunk 0 was
    # prefetched by its predecessor's epilogue
    for r in range(R):
        @pl.when((i == 0) & (0 < needs[r]))
        def _(r=r):
            span_dma(i, r, 0).start()
            min_dma(i, r, 0).start()
    # drain the PREDECESSOR's out-mask DMAs before reusing the staging slots
    # (deferred from its epilogue so its DMA latency overlapped this
    # program's prefetched input waits)
    prv = jnp.maximum(i - 1, 0)
    needs_prv = [chunk_needs_ref[r, prv] for r in range(R)]
    for r in range(R):
        for k in (2, 1):
            @pl.when((i > 0) & (needs_prv[r] >= k))
            def _(r=r, k=k):
                mout_dma(prv, r, needs_prv[r] - k).wait()

    rows = _row_lanes(rows_ref)
    e_hat, uni = _pair_consts(poisson, youngs, adhesion_const, uniform_radius)
    if store_radius is not None:
        sr2 = jnp.float32(max(store_radius, 0.0) ** 2)

    def chunk_body(c, acc):
        for r in range(R):
            @pl.when(c + 1 < needs[r])
            def _(r=r):
                span_dma(i, r, c + 1).start()
                min_dma(i, r, c + 1).start()
        for r in range(R):
            active = c < needs[r]

            @pl.when(active)
            def _(r=r):
                span_dma(i, r, c).wait()
                min_dma(i, r, c).wait()

            slot = jax.lax.rem(i + c, 2)
            span = span_ref[r, slot]
            # bond membership = ONE mask lane read (persisted keep set);
            # route i8 -> f32 before comparing: Mosaic cannot relayout the
            # i1 vectors born from packed-i8 loads into the compare layout
            bonded = min_ref[r, slot].astype(jnp.float32) > 0.0
            keep, dist2, w, dx, dy, dz = _pair_keep(
                span, rows, run_offs[r], two_d, e_hat, uni, radius,
                adhesion_const, break_d, bonded,
            )
            keep = keep & active
            fx = jnp.sum(jnp.where(keep, w * dx, 0.0), axis=1, keepdims=True)
            fy = jnp.sum(jnp.where(keep, w * dy, 0.0), axis=1, keepdims=True)
            if two_d:
                fz = jnp.zeros((B, 1), jnp.float32)
            else:
                fz = jnp.sum(jnp.where(keep, w * dz, 0.0), axis=1, keepdims=True)
            # band storage (ops.jkr.jkr_substep_aligned): only pairs beyond
            # store_radius are REMEMBERED; deeper pairs re-qualify via the
            # fresh-contact distance test, so forces are unchanged. The
            # degree lane counts stored pairs (the bond-capacity probe).
            stored = keep & (dist2 > sr2) if store_radius is not None else keep
            nkeep = jnp.sum(stored.astype(jnp.float32), axis=1, keepdims=True)

            @pl.when(active)
            def _(r=r, stored=stored):
                # staging slot is reused at c+2: drain that DMA first
                @pl.when(c >= 2)
                def __():
                    mout_dma(i, r, c - 2).wait()
                mout_ref[r, slot] = jnp.where(stored, 1, 0).astype(jnp.int8)
                mout_dma(i, r, c).start()

            acc = jnp.concatenate(
                [acc[:, 0:1] + fx, acc[:, 1:2] + fy, acc[:, 2:3] + fz,
                 acc[:, 3:4] + nkeep, acc[:, 4:8]],
                axis=1,
            )
        return acc

    out_force_ref[:] = jax.lax.fori_loop(
        0, max_need, chunk_body, jnp.zeros((B, 8), jnp.float32)
    )

    # epilogue: prefetch the next program's chunk 0. Own out-DMAs are NOT
    # drained here — the next program drains them at its start (waiting them
    # immediately would expose the full DMA latency once per program); only
    # the final program drains its own.
    for r in range(R):
        @pl.when((i + 1 < n) & (0 < needs_nxt[r]))
        def _(r=r):
            span_dma(nxt, r, 0).start()
            min_dma(nxt, r, 0).start()
    for r in range(R):
        for k in (2, 1):
            @pl.when((i + 1 == n) & (needs[r] >= k))
            def _(r=r, k=k):
                mout_dma(i, r, needs[r] - k).wait()


def contact_substep_masked(
    srt_pack, in_mask, span_starts, chunk_needs, *,
    block, span, run_offs, radius, adhesion_const, poisson, youngs, break_d,
    chunk=256, uniform_radius=None, store_radius=None, interpret=False,
):
    """Fused contact substep with the bond set as a persistent span mask.

    ``in_mask``/returned mask: (n_runs, span//chunk, C, chunk) int8,
    CHUNK-MAJOR so each per-(run, chunk, block) slab is one contiguous DMA —
    entry ``[r, c, i, p]`` marks whether (sorted row i, candidate ``c*chunk +
    p`` of its block's run-r span) was a kept bond last substep. Valid only
    while the Verlet window (sort order + span plan) is frozen; slabs beyond
    a block's active chunks are left untouched (never read while the window
    is frozen). Returns ``(force_deg (C, 8), new_mask)``; the mask is
    updated IN PLACE (operand aliased into the output) with only the active
    chunks transferred.
    """
    C = srt_pack.shape[0]
    nblocks = C // block
    chunk = effective_chunk(span, chunk)
    assert C % block == 0 and span % chunk == 0
    assert chunk % _ALIGN == 0 or chunk == C
    assert span <= C
    two_d = len(run_offs) == 3
    R = len(run_offs)
    NC = span // chunk
    assert in_mask.shape == (R, NC, C, chunk), in_mask.shape

    kernel = functools.partial(
        _contact_kernel_mask, CS=chunk, SPAN=span, run_offs=tuple(run_offs),
        two_d=two_d, radius=radius, adhesion_const=adhesion_const,
        poisson=poisson, youngs=youngs, break_d=break_d,
        uniform_radius=uniform_radius, store_radius=store_radius,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block, FIELDS), lambda i, *s: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),  # field-major pack
            pl.BlockSpec(memory_space=pltpu.HBM),  # persistent mask (sparse)
        ],
        out_specs=[
            pl.BlockSpec((block, 8), lambda i, *s: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 2, FIELDS, chunk), jnp.float32),
            pltpu.VMEM((R, 2, block, chunk), jnp.int8),
            pltpu.VMEM((R, 2, block, chunk), jnp.int8),
            pltpu.SemaphoreType.DMA((R, 2)),
            pltpu.SemaphoreType.DMA((R, 2)),
            pltpu.SemaphoreType.DMA((R, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((C, 8), jnp.float32),
            jax.ShapeDtypeStruct((R, NC, C, chunk), jnp.int8),
        ],
        # update the GB-scale mask in place (operand index counts the scalar
        # prefetch args): without aliasing every substep allocates a fresh
        # mask buffer and XLA double-buffers the scan carry
        input_output_aliases={4: 1},
        interpret=interpret,
    )(span_starts, chunk_needs, srt_pack, srt_pack.T, in_mask)


def _contact_kernel_seed(
    span_starts_ref, chunk_needs_ref,
    rows_ref,  # (B, 8)
    bonds_ref,  # (B, K) f32 partner ids (NO_BOND empty)
    hbm_packT_ref,
    out_force_ref,  # (B, 8)
    out_mask_ref,  # (C, R*SPAN) i8 HBM
    span_ref, mout_ref, span_sems, mo_sems, *,
    CS, SPAN, K, run_offs, two_d, radius, adhesion_const, poisson, youngs,
    break_d, uniform_radius, store_radius,
):
    """First substep of a fresh Verlet window: bond membership from the id
    lists (the only thing that survives a re-sort), output the keep set as
    the span mask that subsequent ``_contact_kernel_mask`` substeps carry.
    No compaction — that's the whole point."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    B = rows_ref.shape[0]
    R = len(run_offs)

    needs = [chunk_needs_ref[r, i] for r in range(R)]
    nxt = jnp.minimum(i + 1, n - 1)
    needs_nxt = [chunk_needs_ref[r, nxt] for r in range(R)]
    max_need = needs[0]
    for r in range(1, R):
        max_need = jnp.maximum(max_need, needs[r])

    def span_dma(prog, r, c):
        start = pl.multiple_of(span_starts_ref[r, prog] + c * CS, _ALIGN)
        slot = jax.lax.rem(prog + c, 2)
        return pltpu.make_async_copy(
            hbm_packT_ref.at[:, pl.ds(start, CS)],
            span_ref.at[r, slot], span_sems.at[r, slot],
        )

    def mout_dma(prog, r, c):
        slot = jax.lax.rem(prog + c, 2)
        return pltpu.make_async_copy(
            mout_ref.at[r, slot],
            out_mask_ref.at[r, c, pl.ds(prog * B, B), :],
            mo_sems.at[r, slot],
        )

    for r in range(R):
        @pl.when((i == 0) & (0 < needs[r]))
        def _(r=r):
            span_dma(i, r, 0).start()
    prv = jnp.maximum(i - 1, 0)
    needs_prv = [chunk_needs_ref[r, prv] for r in range(R)]
    for r in range(R):
        for k in (2, 1):
            @pl.when((i > 0) & (needs_prv[r] >= k))
            def _(r=r, k=k):
                mout_dma(prv, r, needs_prv[r] - k).wait()

    rows = _row_lanes(rows_ref)
    e_hat, uni = _pair_consts(poisson, youngs, adhesion_const, uniform_radius)
    if store_radius is not None:
        sr2 = jnp.float32(max(store_radius, 0.0) ** 2)

    def chunk_body(c, acc):
        for r in range(R):
            @pl.when(c + 1 < needs[r])
            def _(r=r):
                span_dma(i, r, c + 1).start()
        for r in range(R):
            active = c < needs[r]

            @pl.when(active)
            def _(r=r):
                span_dma(i, r, c).wait()

            slot = jax.lax.rem(i + c, 2)
            span = span_ref[r, slot]
            cand_slot = span[4:5, :]
            bonded = jnp.zeros((B, span.shape[1]), bool)
            for k in range(K):
                bonded |= cand_slot == bonds_ref[:, k : k + 1]
            keep, dist2, w, dx, dy, dz = _pair_keep(
                span, rows, run_offs[r], two_d, e_hat, uni, radius,
                adhesion_const, break_d, bonded,
            )
            keep = keep & active
            fx = jnp.sum(jnp.where(keep, w * dx, 0.0), axis=1, keepdims=True)
            fy = jnp.sum(jnp.where(keep, w * dy, 0.0), axis=1, keepdims=True)
            if two_d:
                fz = jnp.zeros((B, 1), jnp.float32)
            else:
                fz = jnp.sum(jnp.where(keep, w * dz, 0.0), axis=1, keepdims=True)
            stored = keep & (dist2 > sr2) if store_radius is not None else keep
            nkeep = jnp.sum(stored.astype(jnp.float32), axis=1, keepdims=True)

            @pl.when(active)
            def _(r=r, stored=stored):
                @pl.when(c >= 2)
                def __():
                    mout_dma(i, r, c - 2).wait()
                mout_ref[r, slot] = jnp.where(stored, 1, 0).astype(jnp.int8)
                mout_dma(i, r, c).start()

            acc = jnp.concatenate(
                [acc[:, 0:1] + fx, acc[:, 1:2] + fy, acc[:, 2:3] + fz,
                 acc[:, 3:4] + nkeep, acc[:, 4:8]],
                axis=1,
            )
        return acc

    out_force_ref[:] = jax.lax.fori_loop(
        0, max_need, chunk_body, jnp.zeros((B, 8), jnp.float32)
    )

    for r in range(R):
        @pl.when((i + 1 < n) & (0 < needs_nxt[r]))
        def _(r=r):
            span_dma(nxt, r, 0).start()
    # deferred drain: only the final program waits its own out-DMAs (earlier
    # programs' are drained by their successor's prologue)
    for r in range(R):
        for k in (2, 1):
            @pl.when((i + 1 == n) & (needs[r] >= k))
            def _(r=r, k=k):
                mout_dma(i, r, needs[r] - k).wait()


def contact_substep_ids_to_mask(
    srt_pack, srt_bonds, span_starts, chunk_needs, *,
    block, span, run_offs, radius, adhesion_const, poisson, youngs, break_d,
    chunk=256, uniform_radius=None, store_radius=None, interpret=False,
):
    """First substep of a fresh window: membership from (C, K) id lists,
    bond state emitted as the chunk-major (n_runs, span//chunk, C, chunk)
    int8 mask (active chunks only — see the sparse-mask invariant in the
    section comment)."""
    C = srt_pack.shape[0]
    K = srt_bonds.shape[1]
    nblocks = C // block
    chunk = effective_chunk(span, chunk)
    assert C % block == 0 and span % chunk == 0
    assert chunk % _ALIGN == 0 or chunk == C
    assert span <= C
    two_d = len(run_offs) == 3
    R = len(run_offs)

    kernel = functools.partial(
        _contact_kernel_seed, CS=chunk, SPAN=span, K=K,
        run_offs=tuple(run_offs), two_d=two_d, radius=radius,
        adhesion_const=adhesion_const, poisson=poisson, youngs=youngs,
        break_d=break_d, uniform_radius=uniform_radius,
        store_radius=store_radius,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block, FIELDS), lambda i, *s: (i, 0)),
            pl.BlockSpec((block, K), lambda i, *s: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((block, 8), lambda i, *s: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 2, FIELDS, chunk), jnp.float32),
            pltpu.VMEM((R, 2, block, chunk), jnp.int8),
            pltpu.SemaphoreType.DMA((R, 2)),
            pltpu.SemaphoreType.DMA((R, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((C, 8), jnp.float32),
            jax.ShapeDtypeStruct((R, span // chunk, C, chunk), jnp.int8),
        ],
        interpret=interpret,
    )(span_starts, chunk_needs, srt_pack, srt_bonds, srt_pack.T)


def _compact_mask_kernel(
    span_starts_ref, chunk_needs_ref,
    hbm_packT_ref,
    in_mask_ref,  # (C, R*SPAN) i8 HBM (sparse chunk reads)
    out_bonds_ref,  # (B, K) f32 partner ids
    span_ref, min_ref, span_sems, mi_sems, *,
    CS, SPAN, B, K, run_offs,
):
    """Convert the span mask back to (B, K) partner-id lists (runs once per
    Verlet rebuild, replacing the per-substep compaction of the id path)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    R = len(run_offs)

    needs = [chunk_needs_ref[r, i] for r in range(R)]
    nxt = jnp.minimum(i + 1, n - 1)
    needs_nxt = [chunk_needs_ref[r, nxt] for r in range(R)]
    max_need = needs[0]
    for r in range(1, R):
        max_need = jnp.maximum(max_need, needs[r])

    def span_dma(prog, r, c):
        start = pl.multiple_of(span_starts_ref[r, prog] + c * CS, _ALIGN)
        slot = jax.lax.rem(prog + c, 2)
        return pltpu.make_async_copy(
            hbm_packT_ref.at[:, pl.ds(start, CS)],
            span_ref.at[r, slot], span_sems.at[r, slot],
        )

    def min_dma(prog, r, c):
        slot = jax.lax.rem(prog + c, 2)
        return pltpu.make_async_copy(
            in_mask_ref.at[r, c, pl.ds(prog * B, B), :],
            min_ref.at[r, slot], mi_sems.at[r, slot],
        )

    for r in range(R):
        @pl.when((i == 0) & (0 < needs[r]))
        def _(r=r):
            span_dma(i, r, 0).start()
            min_dma(i, r, 0).start()

    def chunk_body(c, carry):
        bond_cols, count = carry
        for r in range(R):
            @pl.when(c + 1 < needs[r])
            def _(r=r):
                span_dma(i, r, c + 1).start()
                min_dma(i, r, c + 1).start()
        for r in range(R):
            active = c < needs[r]

            @pl.when(active)
            def _(r=r):
                span_dma(i, r, c).wait()
                min_dma(i, r, c).wait()

            slot = jax.lax.rem(i + c, 2)
            cand_slot = span_ref[r, slot][4:5, :]
            kept = (min_ref[r, slot].astype(jnp.float32) > 0.0) & active
            dest = _prefix_sum_lanes(kept.astype(jnp.int32)) - 1 + count
            # one max-reduction per output column: slot ids are >= 0, so the
            # NO_BOND sentinel doubles as the presence test (a routing-network
            # compaction with zero reductions was tried and measured 3x
            # SLOWER on hardware — static lane shifts relayout every stage)
            cols = []
            for k in range(K):
                sel = kept & (dest == k)
                val = jnp.max(
                    jnp.where(sel, cand_slot, NO_BOND), axis=1, keepdims=True
                )
                cols.append(jnp.where(val > NO_BOND, val, bond_cols[:, k : k + 1]))
            bond_cols = jnp.concatenate(cols, axis=1)
            count = count + jnp.sum(kept.astype(jnp.int32), axis=1, keepdims=True)
        return bond_cols, count

    bond_cols, _ = jax.lax.fori_loop(
        0, max_need, chunk_body,
        (jnp.full((B, K), NO_BOND, jnp.float32), jnp.zeros((B, 1), jnp.int32)),
    )
    out_bonds_ref[:] = bond_cols

    for r in range(R):
        @pl.when((i + 1 < n) & (0 < needs_nxt[r]))
        def _(r=r):
            span_dma(nxt, r, 0).start()
            min_dma(nxt, r, 0).start()


def compact_mask_bonds(
    srt_pack, mask, span_starts, chunk_needs, *,
    block, span, run_offs, bond_cap, chunk=256, interpret=False,
):
    """Chunk-major (n_runs, span//chunk, C, chunk) int8 keep mask -> (C, bond_cap) f32 partner-id lists
    (NO_BOND padding). The per-row degree probe comes from the force lane of
    the preceding substep kernels."""
    C = srt_pack.shape[0]
    nblocks = C // block
    chunk = effective_chunk(span, chunk)
    assert C % block == 0 and span % chunk == 0
    R = len(run_offs)
    kernel = functools.partial(
        _compact_mask_kernel, CS=chunk, SPAN=span, B=block, K=bond_cap,
        run_offs=tuple(run_offs),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((block, bond_cap), lambda i, *s: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((R, 2, FIELDS, chunk), jnp.float32),
            pltpu.VMEM((R, 2, block, chunk), jnp.int8),
            pltpu.SemaphoreType.DMA((R, 2)),
            pltpu.SemaphoreType.DMA((R, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, bond_cap), jnp.float32),
        interpret=interpret,
    )(span_starts, chunk_needs, srt_pack.T, mask)
