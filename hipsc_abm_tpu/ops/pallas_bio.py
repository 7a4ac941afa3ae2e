"""Pallas TPU kernel: fused biology neighborhood reductions.

The biology phases consume only *moments* of the radius-15 neighborhood
(see ``models.biology``): neighbor count, sum/sum-of-squares of FGF4
(pathway), and class-filtered counts + displacement sums (motility,
diff_surround). On the XLA path those come from a (C, W, 8) window gather —
which at 500k agents costs ~300 ms per gather. This kernel computes all the
moments in one pass over the same DMA'd sorted spans the contact kernel uses
(``ops.pallas_contact``), reducing the per-step biology cost to two row
gathers (sort + unsort) per invocation. Like the contact kernel, the span is
processed in CHUNK-wide gated slices, so compute scales with each block's
true candidate count rather than the static worst-case span.

Pack lanes, 2D (8 lanes): ``[x0, y0, x1, y1, f0, f1, f2, flat]``;
3D (16 lanes): ``[x0, y0, z0, x1, y1, z1, f0, f1, f2, flat, 0 x 6]``.
(x0, y0[, z0]) are the positions the neighbor graph was built from
(pre-division — the reference builds its graph once at the top of the step),
(x1, y1[, z1]) are the current positions used for displacement vectors (the
reference's motility loop reads post-division locations), and ``flat`` is
the build-time flat bin id, which doubles as the aliveness encoding:
rows/candidates that are dead (at build, or killed mid-step — the caller
re-sentinels them per invocation) carry ``neighbors.dead_sentinel``, which
exceeds every live stencil probe, so they match no run interval and
contribute nothing. Blocks made only of dead rows get zero active chunks
from ``neighbors.block_span_plan``.

Each block program walks its stencil runs (3 in 2D, 9 in 3D) in CHUNK-wide
span slices with double-buffered DMA inside one kernel invocation (same
structure as the contact kernel).

Output lanes (C, 16):
  0: neighbor count              (valid & radius & alive)
  1: sum f0                      2: sum f0^2         (pathway FGF4 moments)
  3: count (f1 > f0)             (NANOG-high when f0=GATA6, f1=NANOG)
  4-6: sum (dx1, dy1, dz1)  | f1 > f0
  7: count (f2 != 0)             (differentiated neighbors)
  8-10: sum (dx1, dy1, dz1) | f2 != 0
  11-15: zero
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hipsc_abm_tpu.ops.pallas_contact import _ALIGN, effective_chunk

FIELDS_2D = 8
FIELDS_3D = 16
OUT_LANES = 16


def _bio_kernel(
    span_starts_ref,  # (n_runs+1, nblocks) int32, 128-aligned
    chunk_needs_ref,  # (n_runs+1, nblocks) int32 per-run active chunk counts
    rows_ref,  # (B, F) f32 sorted pack rows
    hbm_packT_ref,  # (F, C) f32 field-major sorted pack
    out_ref,  # (B, 16) f32 moments (written once per block)
    span_ref,  # (n_runs, 2, F, CS) f32 double-buffered chunk slots
    sems,  # (n_runs, 2)
    *,
    CS: int,
    run_offs: Tuple[int, ...],
    num_bins: int,
    radius: float,
    three_d: bool,
    mode: str,
):
    # grid = (nblocks,): each block program walks its runs' spans in
    # CHUNK-wide slices with double-buffered DMA, bounded by the
    # scalar-prefetched per-(run, block) chunk counts (same structure as
    # ops.pallas_contact._contact_kernel — the chunk/run grid dimensions this
    # replaces cost ~25% of kernel time in per-program overhead at 500k).
    i = pl.program_id(0)
    n = pl.num_programs(0)
    B = rows_ref.shape[0]
    R = len(run_offs)
    F = rows_ref.shape[1]

    needs = [chunk_needs_ref[r, i] for r in range(R)]
    nxt = jnp.minimum(i + 1, n - 1)
    needs_nxt = [chunk_needs_ref[r, nxt] for r in range(R)]
    max_need = needs[0]
    for r in range(1, R):
        max_need = jnp.maximum(max_need, needs[r])

    def dma(prog, r, c):
        start = pl.multiple_of(span_starts_ref[r, prog] + c * CS, _ALIGN)
        slot = jax.lax.rem(prog + c, 2)
        return pltpu.make_async_copy(
            hbm_packT_ref.at[:, pl.ds(start, CS)],
            span_ref.at[r, slot],
            sems.at[r, slot],
        )

    # program 0 warms its own chunk 0; later programs' chunk 0 was
    # prefetched by the predecessor's epilogue (cross-program pipelining —
    # see ops.pallas_contact's section comment)
    for r in range(R):
        @pl.when((i == 0) & (0 < needs[r]))
        def _(r=r):
            dma(i, r, 0).start()

    if three_d:
        x0, y0, z0 = rows_ref[:, 0:1], rows_ref[:, 1:2], rows_ref[:, 2:3]
        x1, y1, z1 = rows_ref[:, 3:4], rows_ref[:, 4:5], rows_ref[:, 5:6]
        row_flat = rows_ref[:, 9:10]
    else:
        x0, y0 = rows_ref[:, 0:1], rows_ref[:, 1:2]
        x1, y1 = rows_ref[:, 2:3], rows_ref[:, 3:4]
        row_flat = rows_ref[:, 7:8]
    row_alive = row_flat < jnp.float32(num_bins)
    own_pos = i * B + jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    r2 = jnp.float32(radius * radius)

    def chunk_body(c, acc):
        for r in range(R):
            @pl.when(c + 1 < needs[r])
            def _(r=r):
                dma(i, r, c + 1).start()
        for r in range(R):
            @pl.when(c < needs[r])
            def _(r=r):
                dma(i, r, c).wait()

        for r in range(R):
            active = c < needs[r]
            buf = jax.lax.rem(i + c, 2)
            span = span_ref[r, buf]  # (F, CS)
            if three_d:
                cx0, cy0, cz0 = span[0:1, :], span[1:2, :], span[2:3, :]
                cx1, cy1, cz1 = span[3:4, :], span[4:5, :], span[5:6, :]
                cf0, cf1, cf2 = span[6:7, :], span[7:8, :], span[8:9, :]
                cand_flat = span[9:10, :]
            else:
                cx0, cy0 = span[0:1, :], span[1:2, :]
                cx1, cy1 = span[2:3, :], span[3:4, :]
                cf0, cf1, cf2 = span[4:5, :], span[5:6, :], span[6:7, :]
                cand_flat = span[7:8, :]
            calive = cand_flat < jnp.float32(num_bins)

            abs_pos = (
                span_starts_ref[r, i]
                + c * CS
                + jax.lax.broadcasted_iota(jnp.int32, (1, CS), 1)
            )
            # run membership by flat-bin-id interval (see pallas_contact):
            # run r covers bins [row_flat + run_offs[r] - 1, +3)
            run_lo = row_flat + jnp.float32(run_offs[r] - 1)
            in_run = (cand_flat >= run_lo) & (cand_flat < run_lo + 3.0)

            dx0 = x0 - cx0
            dy0 = y0 - cy0
            dist2 = dx0 * dx0 + dy0 * dy0
            if three_d:
                dz0 = z0 - cz0
                dist2 = dist2 + dz0 * dz0
            m = (in_run & (abs_pos != own_pos) & (dist2 <= r2) & calive
                 & row_alive & active)
            mf = m.astype(jnp.float32)

            zero = jnp.zeros((B, 1), jnp.float32)
            count = jnp.sum(mf, axis=1, keepdims=True)
            # mask AFTER products: inactive runs read uninitialized VMEM
            # whose garbage may be NaN (0 * NaN = NaN)
            if mode in ("full", "pathway"):
                sum_f0 = jnp.sum(jnp.where(m, cf0, 0.0), axis=1, keepdims=True)
                sum_f0sq = jnp.sum(
                    jnp.where(m, cf0 * cf0, 0.0), axis=1, keepdims=True
                )
            else:
                sum_f0 = sum_f0sq = zero
            if mode in ("full", "motility"):
                # displacement vectors use the *current* positions (x1 lanes)
                ddx = cx1 - x1
                ddy = cy1 - y1
                a = m & (cf1 > cf0)
                cnt_a = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)
                sum_adx = jnp.sum(jnp.where(a, ddx, 0.0), axis=1, keepdims=True)
                sum_ady = jnp.sum(jnp.where(a, ddy, 0.0), axis=1, keepdims=True)
                b = m & (cf2 != 0.0)
                cnt_b = jnp.sum(b.astype(jnp.float32), axis=1, keepdims=True)
                sum_bdx = jnp.sum(jnp.where(b, ddx, 0.0), axis=1, keepdims=True)
                sum_bdy = jnp.sum(jnp.where(b, ddy, 0.0), axis=1, keepdims=True)
                if three_d:
                    ddz = cz1 - z1
                    sum_adz = jnp.sum(
                        jnp.where(a, ddz, 0.0), axis=1, keepdims=True
                    )
                    sum_bdz = jnp.sum(
                        jnp.where(b, ddz, 0.0), axis=1, keepdims=True
                    )
                else:
                    sum_adz = sum_bdz = zero
            else:
                cnt_a = sum_adx = sum_ady = sum_adz = zero
                cnt_b = sum_bdx = sum_bdy = sum_bdz = zero

            partial = jnp.concatenate(
                [count, sum_f0, sum_f0sq, cnt_a, sum_adx, sum_ady, sum_adz,
                 cnt_b, sum_bdx, sum_bdy, sum_bdz,
                 jnp.zeros((B, OUT_LANES - 11), jnp.float32)],
                axis=1,
            )
            acc = acc + partial
        return acc

    out_ref[:] = jax.lax.fori_loop(
        0, max_need, chunk_body, jnp.zeros((B, OUT_LANES), jnp.float32)
    )

    # epilogue: prefetch the next program's chunk 0
    for r in range(R):
        @pl.when((i + 1 < n) & (0 < needs_nxt[r]))
        def _(r=r):
            dma(nxt, r, 0).start()


def bio_reduce_pallas(
    srt_pack: jnp.ndarray,  # (C, 8|16) sorted pack rows (see module docstring)
    span_starts: jnp.ndarray,  # (n_runs+1, nblocks) int32 128-aligned
    chunk_needs: jnp.ndarray,  # (n_runs+1, nblocks) int32
    *,
    block: int,
    span: int,
    ny: int,
    num_bins: int,
    radius: float,
    nz: int = 1,
    chunk: int = 256,
    mode: str = "full",
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-sorted-row biology neighborhood moments, (C, 16). The pack width
    selects the dimensionality: 8 lanes = 2D (3 runs), 16 lanes = 3D
    (9 runs, ``nz`` required).

    ``mode`` trims the compute to the lanes a phase actually reads:
    "count" (neighbor count only — division/death), "pathway" (count + FGF4
    sum / sum-of-squares), "motility" (count + class counts and displacement
    sums), "full" (everything). Unused output lanes are zero."""
    assert mode in ("full", "count", "pathway", "motility"), mode
    C, F = srt_pack.shape
    three_d = F == FIELDS_3D
    assert F in (FIELDS_2D, FIELDS_3D), F
    n_runs = 9 if three_d else 3
    nblocks = C // block
    chunk = effective_chunk(span, chunk)
    assert C % block == 0, (C, block)
    assert span % chunk == 0, (span, chunk)
    assert chunk % _ALIGN == 0 or chunk == C, (chunk, C)
    assert span <= C, f"DMA span {span} exceeds capacity {C}"
    nchunks = span // chunk

    if three_d:
        run_offs = tuple(
            ((a - 1) * ny + (b - 1)) * nz for a in range(3) for b in range(3)
        )
    else:
        run_offs = tuple((r - 1) * ny for r in range(3))
    kernel = functools.partial(
        _bio_kernel, CS=chunk, run_offs=run_offs, num_bins=num_bins,
        radius=radius, three_d=three_d, mode=mode,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block, F), lambda i, *s: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((block, OUT_LANES), lambda i, *s: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_runs, 2, F, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((n_runs, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, OUT_LANES), jnp.float32),
        interpret=interpret,
    )(span_starts, chunk_needs, srt_pack, srt_pack.T)
