"""VMEM-resident multi-subcycle FTCS diffusion kernel (Mosaic/TPU).

``ops.diffusion.ftcs_diffuse`` runs the subcycle schedule as a ``lax.scan``
of ~300 tiny 5-point-stencil kernels; at production lattice sizes
(~1000x1000 f32 = 4 MB) each pass is sub-millisecond of HBM traffic, so the
wall cost is almost entirely per-kernel dispatch (~16 ms/step at the 500k
bench shape, BENCHMARKS.md). This kernel holds the whole padded lattice in
VMEM and runs ALL subcycles in one ``fori_loop`` inside one ``pallas_call``
— one dispatch, zero HBM round-trips between subcycles.

Semantics mirror ``ftcs_diffuse`` (reference ``cell_backend.py:175-204``):
the same sequential edge reflection order, the same operand association in
the stencil sum, the same trailing short substep. Agreement with the XLA
scan is ulp-level, not bit-level — the backends fuse the a*x + b*y stencil
arithmetic (FMA) differently (``tests/test_diffusion.py``,
``tests_tpu/test_tpu_hw.py``). The subcycle dt schedule is static (``diffusion_dts``), which makes
the FTCS coefficients compile-time constants: every subcycle uses
``a_main`` except the last, which uses the remainder ``a_last``.

The kernel is only eligible when the padded lattice fits VMEM with loop
headroom (``fits_vmem``); callers fall back to the XLA scan otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# padded f32 lattice bytes that safely leave fori_loop double-buffer +
# reflection headroom inside the ~16 MB VMEM
_VMEM_BUDGET_BYTES = 5 * 1024 * 1024


def fits_vmem(shape, itemsize: int = 4) -> bool:
    """True when the (nx, ny) lattice (plus ghost ring) is VMEM-resident.
    ``itemsize`` is the lattice element width in bytes (pass
    ``grid.dtype.itemsize``; defaults to f32). ``HIPSC_NO_PALLAS_FTCS=1``
    force-disables the kernel (engines then run the XLA subcycle scan) —
    the escape hatch if a Mosaic lowering issue surfaces on a backend this
    kernel has not been validated on."""
    import os

    if os.environ.get("HIPSC_NO_PALLAS_FTCS") == "1":
        return False
    nx, ny = int(shape[0]), int(shape[1])
    return (nx + 2) * (ny + 2) * int(itemsize) <= _VMEM_BUDGET_BYTES


def _ftcs_kernel(base_ref, out_ref, *, steps, a_main, a_last, b_main, b_last):
    from hipsc_abm_tpu.ops.diffusion import ftcs_subcycle

    base = base_ref[:]

    def subcycle(i, base):
        last = i == steps - 1
        a = jnp.where(last, a_last, a_main)
        b = jnp.where(last, b_last, b_main)
        # the shared body (ops.diffusion.ftcs_subcycle) keeps the reflection
        # order and stencil operand association structurally identical to
        # the XLA scan — the ulp-level agreement contract
        return ftcs_subcycle(base, a, b)

    out_ref[:] = jax.lax.fori_loop(0, steps, subcycle, base)


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
        interpret=bool(interpret),
    )(base)
    return out[1:-1, 1:-1] * (1.0 - degradation)
