"""Sweep the span-chunk width at scale: the kernels process CHUNK-wide
span slices gated by per-block need (compute follows true candidate
counts); wider chunks cut per-chunk DMA/loop overhead, narrower chunks cut
wasted lanes. Times the FULL fused step.

Usage: python tools/chunk_sweep.py [chunks=128,256,512] [n_cells=500000]
"""
import sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hipsc_abm_tpu.engine import HipscEngine, EngineConfig
from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams

n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
side = 2000.0 * (n / 5000.0) ** 0.5
gen = GeneralParams(num_to_start=n, end_step=10, size=(side, side, 0.0))
xp = ExperimentalParams(num_gata6=n // 10, dox_step=5)

chunks = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "128,256,512").split(",")]
for chunk in chunks:
    eng = HipscEngine(gen, xp)
    cap = eng.cfg.capacity
    eng.cfg = EngineConfig.create(
        gen.size, capacity=cap, bio=eng.bio, use_pallas=True,
        uniform_radius=eng.bio.max_radius, pallas_chunk=chunk,
        jkr_span=min(1024, cap), nbr_span=min(512, cap),
    )
    s = eng.init_state(seed=0)
    try:
        for _ in range(3):
            s, _ = eng.safe_step(s)
        float(jnp.sum(s.arrays["locations"]))
        t0 = time.perf_counter()
        for _ in range(5):
            s, _ = eng.step(s)
        float(jnp.sum(s.arrays["locations"]))
        dt = (time.perf_counter() - t0) / 5
        print(f"chunk {chunk:4d}  {dt*1000:7.1f} ms/step  {1/dt:6.3f} steps/s"
              f"  (jkr span {eng.cfg.jkr_span})", flush=True)
    except Exception as e:
        print(f"chunk {chunk:4d}  FAILED {type(e).__name__}:"
              f" {str(e).splitlines()[0][:120]}", flush=True)
