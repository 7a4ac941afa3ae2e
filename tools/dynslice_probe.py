"""Probe: does Mosaic support (and at what cost) dynamic lane-axis slices
from VMEM at arbitrary (non-128-aligned) offsets?

The planned quarter-window contact kernel computes each 32-row group against
a narrow window sliced from the block's span at a per-(group, run) dynamic
offset. This probe measures that primitive in isolation:

  A: static aligned slices            (baseline)
  B: dynamic 128-aligned slices       (pl.ds with runtime multiple-of-128)
  C: dynamic unaligned slices         (pl.ds with arbitrary runtime offset)

Usage: python tools/dynslice_probe.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")

NBLK = 4096      # programs
SPAN = 1024      # lanes of span data per program
G = 4            # row groups per block
ROWS = 32        # rows per group
W = 128          # window lanes
REPS = 30


def kernel(offs_ref, rows_ref, span_ref, out_ref, *, mode):
    i = pl.program_id(0)
    acc = jnp.zeros((G * ROWS, 1), jnp.float32)
    cols = []
    for g in range(G):
        if mode == "static":
            off = (g * 160) // 128 * 128  # static aligned
            win = span_ref[:, off:off + W]
        elif mode == "dyn_aligned":
            off = pl.multiple_of((offs_ref[g, i] // 128) * 128, 128)
            win = span_ref[:, pl.ds(off, W)]
        else:  # dyn_unaligned
            off = offs_ref[g, i]
            win = span_ref[:, pl.ds(off, W)]
        rows = rows_ref[pl.ds(g * ROWS, ROWS), :]
        x = rows[:, 0:1]
        y = rows[:, 1:2]
        dx = x - win[0:1, :]
        dy = y - win[1:2, :]
        d2 = dx * dx + dy * dy
        keep = d2 < 100.0
        cols.append(jnp.sum(jnp.where(keep, dx * d2, 0.0), axis=1, keepdims=True))
    out_ref[:] = jnp.concatenate(cols, axis=0)


def run(mode):
    rows = jnp.asarray(np.random.default_rng(0).random((NBLK * G * ROWS, 8)), jnp.float32)
    span = jnp.asarray(np.random.default_rng(1).random((8, NBLK * SPAN)), jnp.float32)
    offs = jnp.asarray(
        np.random.default_rng(2).integers(0, SPAN - W, (G, NBLK)), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NBLK,),
        in_specs=[
            pl.BlockSpec((G * ROWS, 8), lambda i, *s: (i, 0)),
            pl.BlockSpec((8, SPAN), lambda i, *s: (0, i)),
        ],
        out_specs=pl.BlockSpec((G * ROWS, 1), lambda i, *s: (i, 0)),
    )
    fn = jax.jit(lambda o, r, s: pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NBLK * G * ROWS, 1), jnp.float32),
    )(o, r, s))
    out = fn(offs, rows, span)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(offs, rows, span)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{mode:14s} {dt:8.3f} ms  ({NBLK*G*ROWS*W/dt/1e6:.1f} Glanes/s)")


if __name__ == "__main__":
    for mode in (sys.argv[1:] or ["static", "dyn_aligned", "dyn_unaligned"]):
        try:
            run(mode)
        except Exception as e:  # noqa: BLE001 — probe reports and continues
            print(f"{mode:14s} FAILED: {type(e).__name__}: {str(e)[:300]}")
