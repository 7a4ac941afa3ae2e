"""Probe 2: VPU efficiency vs op tile shape, and whether quarter-windows
(4x fewer lanes at (32,128) shapes) beat full-span scans ((128,512) shapes).

  full:      128 rows x 512 lanes   (the current kernel's per-run shape)
  quarters:  4 x (32 rows x 128 lanes) dynamic-aligned windows  (4x fewer lanes)
  q256:      4 x (32 rows x 256 lanes) windows                  (2x fewer lanes)
  octets:    16 x (8 rows x 128 lanes) windows                  (4x fewer lanes)
  half:      2 x (64 rows x 256 lanes) windows                  (2x fewer lanes)
"""
import functools, sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")

NBLK = 4096
SPAN = 512
B = 128
REPS = 30
OPS = 14  # body ops per lane, roughly like the masked contact kernel


def body(rows, win):
    x = rows[:, 0:1]; y = rows[:, 1:2]; f = rows[:, 2:3]
    cx = win[0:1, :]; cy = win[1:2, :]; cf = win[2:3, :]
    dx = x - cx; dy = y - cy
    d2 = dx * dx + dy * dy
    in_run = (cf >= f) & (cf < f + 3.0)
    ok = in_run & (d2 < 100.0) & (win[4:5, :] != rows[:, 4:5])
    inv = jnp.where(d2 > 0, jax.lax.rsqrt(d2), 0.0)
    m = d2 * inv
    dd = (10.0 - m) * 0.71
    fm = ((-0.02 * dd + 0.49) * dd + 1.08) * dd - 1.3
    keep = ok & (dd > -0.36)
    w = fm * inv
    fx = jnp.sum(jnp.where(keep, w * dx, 0.0), axis=1, keepdims=True)
    fy = jnp.sum(jnp.where(keep, w * dy, 0.0), axis=1, keepdims=True)
    return fx + fy


def kernel(offs_ref, rows_ref, span_ref, out_ref, *, mode):
    i = pl.program_id(0)
    if mode == "full":
        out_ref[:] = body(rows_ref[:], span_ref[:])
    else:
        gr = {"quarters": 32, "q256": 32, "octets": 8, "half": 64}[mode]
        W = {"quarters": 128, "q256": 256, "octets": 128, "half": 256}[mode]
        cols = []
        for g in range(B // gr):
            off = pl.multiple_of(
                jnp.minimum((offs_ref[g % 4, i] // 128) * 128, SPAN - W), 128
            )
            win = span_ref[:, pl.ds(off, W)]
            cols.append(body(rows_ref[pl.ds(g * gr, gr), :], win))
        out_ref[:] = jnp.concatenate(cols, axis=0)


def run(mode):
    rows = jnp.asarray(np.random.default_rng(0).random((NBLK * B, 8)), jnp.float32)
    span = jnp.asarray(np.random.default_rng(1).random((8, NBLK * SPAN)), jnp.float32)
    offs = jnp.asarray(np.random.default_rng(2).integers(0, SPAN - 256, (4, NBLK)), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NBLK,),
        in_specs=[pl.BlockSpec((B, 8), lambda i, *s: (i, 0)),
                  pl.BlockSpec((8, SPAN), lambda i, *s: (0, i))],
        out_specs=pl.BlockSpec((B, 1), lambda i, *s: (i, 0)),
    )
    fn = jax.jit(lambda o, r, s: pl.pallas_call(
        functools.partial(kernel, mode=mode), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NBLK * B, 1), jnp.float32))(o, r, s))
    out = fn(offs, rows, span); float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(offs, rows, span)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / REPS * 1000
    lanes = {"full": B * SPAN, "quarters": B * 128, "q256": B * 256,
             "octets": B * 128, "half": B * 256}[mode] * NBLK
    print(f"{mode:10s} {dt:8.3f} ms  {lanes/dt/1e6:7.1f} Glanes/s  "
          f"({lanes/1e6:.0f} Mlanes)")


if __name__ == "__main__":
    for mode in (sys.argv[1:] or ["full", "half", "q256", "quarters", "octets"]):
        try:
            run(mode)
        except Exception as e:
            print(f"{mode:10s} FAILED: {type(e).__name__}: {str(e)[:200]}")
