"""A/B the VMEM-resident FTCS kernel vs the XLA subcycle scan on the chip.

Both variants run in ONE process (standalone timings through the tunnel can
be 3x off — BENCHMARKS.md), at the 500k bench lattice shape and the
production schedule. Also times one full bench-config step with the engine
dispatch on vs off. Usage: ``python tools/ab_ftcs.py``.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")
sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return out


def main():
    from hipsc_abm_tpu.ops.diffusion import diffusion_dts, ftcs_diffuse
    from hipsc_abm_tpu.ops.pallas_diffusion import fits_vmem, ftcs_diffuse_pallas

    rng = np.random.default_rng(3)
    # the 500k bench lattice: 20000 um box / 20 um spat_res
    g = jnp.asarray(rng.random((1001, 1001)).astype(np.float32)) * 3.0
    dts = diffusion_dts(1800.0, 6.0)
    print(f"lattice {g.shape}, {len(dts)} subcycles, fits_vmem={fits_vmem(g.shape)}",
          flush=True)

    xla = jax.jit(lambda x: ftcs_diffuse(x, jnp.asarray(dts), 2.0, 400.0, 2.0, 0.1))
    pal = jax.jit(lambda x: ftcs_diffuse_pallas(x, dts, 2.0, 400.0, 2.0, 0.1))
    a = timeit("ftcs XLA scan (301 subcycles)", xla, g)
    b = timeit("ftcs Pallas VMEM-resident", pal, g)
    diff = float(jnp.max(jnp.abs(a - b)))
    print(f"max abs diff: {diff:.3e}", flush=True)
    assert diff < 1e-5


if __name__ == "__main__":
    main()
