"""VMEM-resident multi-subcycle FTCS diffusion kernel (Mosaic/TPU).

``ops.diffusion.ftcs_diffuse`` runs the subcycle schedule as a ``lax.scan``
of ~300 tiny 5-point-stencil kernels; at production lattice sizes
(~1000x1000 f32 = 4 MB) each pass is sub-millisecond of HBM traffic, so the
wall cost is almost entirely per-kernel dispatch (~16 ms/step at the 500k
bench shape, BENCHMARKS.md). This kernel holds the padded lattice in VMEM
and runs ALL subcycles inside one ``pallas_call`` — one dispatch, zero HBM
round-trips between subcycles.

Memory design (the round-4 rewrite): the lattice ping-pongs between the
output ref and one VMEM scratch ref; each subcycle writes the reflected
borders in place on the source ref (rank-preserving slice stores — the
original ``.at[int].set`` reflections lowered to ``scatter``, which Mosaic
does not implement and which crashed the round-3 driver bench), then
computes the interior in fixed-height ROW TILES from source to destination.
Peak VMEM is two lattices plus one tile window — a value-semantics
formulation (concatenate-rebuilt lattices) kept 5-6 full-lattice
temporaries live in the subcycle loop and crashed the Mosaic compiler above
~800x800. The last row tile is clamped to the interior's end, overlapping
the previous tile; the overlap recomputes identical values from identical
inputs, so the overlapping stores are exact.

Double-buffer equivalence to the reference's in-place subcycle
(``cell_backend.py:175-204``): each subcycle's border reflection fully
rewrites the ghost ring from current interior values before the stencil
reads it (columns first, then rows — the rows pass overwrites all four
corners), so the destination's never-written ghost ring from two subcycles
ago cannot reach any read. The stencil's operand association is shared with
the XLA scan (``ops.diffusion.ftcs_subcycle``); agreement is ulp-level —
the backends fuse the a*x + b*y FMA differently (``tests/test_diffusion.py``,
``tests_tpu/test_tpu_hw.py``).

The kernel is only eligible when TWO padded lattices plus the tile window
fit VMEM (``fits_vmem``); callers fall back to the XLA scan otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# two padded f32 lattices (ping-pong) + tile windows + the static regions'
# stack temporaries must fit the ~16 MB VMEM: hardware-probed bound — the
# 1003^2 padded lattice (4.03 MB, the 500k bench shape) compiles and runs
# bit-exact; 1102^2 (4.86 MB) crashes the Mosaic compiler's stack
# allocation. Anything that still slips through degrades to the XLA scan
# via the engine's compile-failure ladder.
_VMEM_BUDGET_BYTES = int(4.25 * 1024 * 1024)

_ROW_TILE = 128  # interior rows computed per tile (window = tile + 2 halo);
# 256 OOM'd compiler stack space at the 1001x1001 bench lattice — the
# middle-loop AND static-tail regions' value temporaries coexist on the
# kernel's VMEM stack alongside the two ping-pong lattices


def fits_vmem(shape, itemsize: int = 4) -> bool:
    """True when the (nx, ny) lattice (plus ghost ring) is VMEM-resident.
    ``itemsize`` is the lattice element width in bytes (pass
    ``grid.dtype.itemsize``; defaults to f32). ``HIPSC_NO_PALLAS_FTCS=1``
    force-disables the kernel (engines then run the XLA subcycle scan) —
    a USER-FACING escape hatch only: library code never writes it (engine
    fallback state is per-engine, ``EngineConfig.use_pallas_ftcs``)."""
    import os

    if os.environ.get("HIPSC_NO_PALLAS_FTCS") == "1":
        return False
    nx, ny = int(shape[0]), int(shape[1])
    return (nx + 2) * (ny + 2) * int(itemsize) <= _VMEM_BUDGET_BYTES


def _reflect_and_step(src, dst, a, b, H, W):
    """One FTCS subcycle, src ref -> dst ref (refs of padded (H, W) shape).

    Keeps the reference's reflection order and the shared stencil operand
    association (``ops.diffusion.ftcs_subcycle``): columns, then rows (so
    corners take already-reflected values), then
    ``b*interior + a*(down + up + right + left)``."""
    src[:, 0:1] = src[:, 1:2]
    src[:, W - 1:W] = src[:, W - 2:W - 1]
    src[0:1, :] = src[1:2, :]
    src[H - 1:H, :] = src[H - 2:H - 1, :]

    # Tile loop constraints, all hardware-diagnosed: (1) Mosaic rejects
    # DYNAMIC sublane (dim 0) offsets — loads AND stores — that it cannot
    # statically prove are multiples of 8; (2) a STATIC unrolled tile loop
    # stack-allocates every unrolled iteration's value temporaries and OOMs
    # VMEM at the 1001x1001 bench lattice. Layout that satisfies both:
    #   - static HEAD: interior rows [0, 7) — the +1 ghost offset means
    #     aligned stores must start at padded row 8;
    #   - fori_loop MIDDLE tiles t: load the aligned superset
    #     src[t*T, t*T + T+16) (t*T is affine, provably 8-aligned),
    #     value-slice rows [7, T+9) as the halo window, store padded rows
    #     [8 + t*T, 8 + (t+1)*T) — also affine-aligned;
    #   - static ragged TAIL for the remainder (covers everything when the
    #     lattice is too small for an aligned middle tile).
    n_int = H - 2  # interior rows; interior r lives at padded row r + 1
    T = _ROW_TILE

    def stencil(win):
        interior = win[1:-1, 1:-1]
        temp = a * (win[2:, 1:-1] + win[:-2, 1:-1]
                    + win[1:-1, 2:] + win[1:-1, :-2])
        return b * interior + temp

    head = min(7, n_int)
    if head:
        dst[1:head + 1, 1:W - 1] = stencil(src[0:head + 2, :])
    # middle tiles need their aligned superset load (T+16 rows from t*T)
    # to stay inside the ref: nmid*T + 16 <= H  <=>  nmid <= (n_int-14)//T
    nmid = max(0, (n_int - 14) // T) if n_int > 7 else 0
    if nmid > 0:
        def do_tile(t, _):
            base = t * T
            fw = src[pl.ds(base, T + 16), :]
            # stencil over padded rows [base+8, base+T+8) read directly from
            # the superset (no materialized halo-window slice): center rows
            # are fw[8:T+8], up fw[7:T+7], down fw[9:T+9]
            temp = a * (fw[9:T + 9, 1:W - 1] + fw[7:T + 7, 1:W - 1]
                        + fw[8:T + 8, 2:W] + fw[8:T + 8, 0:W - 2])
            dst[pl.ds(base + 8, T), 1:W - 1] = b * fw[8:T + 8, 1:W - 1] + temp
            return 0

        jax.lax.fori_loop(0, nmid, do_tile, 0)
    tail_lo = head if nmid == 0 else 7 + nmid * T
    if tail_lo < n_int:
        dst[tail_lo + 1:n_int + 1, 1:W - 1] = stencil(src[tail_lo:n_int + 2, :])


def _ftcs_kernel(base_ref, out_ref, scratch_ref, *, steps, a_main, a_last,
                 b_main, b_last):
    H, W = out_ref.shape
    # choose the starting buffer so the LAST subcycle writes out_ref:
    # `steps` buffer hops from start; even -> start in out_ref
    if steps % 2 == 0:
        first, second = out_ref, scratch_ref
    else:
        first, second = scratch_ref, out_ref
    first[:] = base_ref[:]

    # (steps - 1) main subcycles then one remainder subcycle (a_last)
    pairs, rem_main = divmod(steps - 1, 2)

    def pair(_, carry):
        _reflect_and_step(first, second, a_main, b_main, H, W)
        _reflect_and_step(second, first, a_main, b_main, H, W)
        return carry

    jax.lax.fori_loop(0, pairs, pair, 0)
    if rem_main:
        _reflect_and_step(first, second, a_main, b_main, H, W)
        _reflect_and_step(second, first, a_last, b_last, H, W)
    else:
        _reflect_and_step(first, second, a_last, b_last, H, W)


def ftcs_diffuse_pallas(
    gradient: jnp.ndarray,  # (nx, ny)
    dts,  # static (S,) subcycle dt schedule (numpy or tuple)
    diffuse_const: float,
    spat_res2: float,
    max_concentration: float,
    degradation: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``ftcs_diffuse`` with a STATIC dt schedule of the
    ``diffusion_dts`` shape: all subcycles equal except an optional shorter
    last one (validated — any other schedule raises rather than silently
    diffusing with the wrong coefficients). The caller is responsible for
    the ``fits_vmem`` eligibility check."""
    dts = np.asarray(dts, dtype=np.float64)
    steps = int(dts.shape[0])
    degradation = float(degradation)
    if steps == 0:  # degenerate schedule: match the XLA scan's no-op
        return jnp.clip(gradient, 0.0, max_concentration) * (1.0 - degradation)
    if steps > 1 and not np.allclose(dts[:-1], dts[0], rtol=0.0, atol=0.0):
        raise ValueError(
            "ftcs_diffuse_pallas needs a diffusion_dts-shaped schedule "
            f"(uniform dts + optional short last); got {dts!r}"
        )
    a_main = float(dts[0]) * float(diffuse_const) / float(spat_res2)
    a_last = float(dts[-1]) * float(diffuse_const) / float(spat_res2)
    base = jnp.pad(jnp.clip(gradient, 0.0, max_concentration), 1)
    out = pl.pallas_call(
        functools.partial(
            _ftcs_kernel,
            steps=steps,
            a_main=a_main,
            a_last=a_last,
            b_main=1.0 - 4.0 * a_main,
            b_last=1.0 - 4.0 * a_last,
        ),
        out_shape=jax.ShapeDtypeStruct(base.shape, base.dtype),
        scratch_shapes=[pltpu.VMEM(base.shape, base.dtype)],
        # alias the (freshly padded, safely donatable) input onto the output
        # buffer: VMEM peak is TWO lattices + one tile window, not three —
        # a separate input ref OOMs the 16 MB VMEM at the 1001x1001 500k
        # bench lattice ("Ran out of memory in memory space vmem")
        input_output_aliases={0: 0},
        interpret=bool(interpret),
    )(base)
    return out[1:-1, 1:-1] * (1.0 - degradation)
