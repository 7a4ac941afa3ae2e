"""Sweep the Pallas program block size at scale: bigger blocks = fewer grid
programs = less per-program overhead (the measured bound of the masked
contact kernel — BENCHMARKS.md round-3 floor analysis: 81% of its wall was
per-program/DMA overhead, noop floor 11.3 of 18 ms). The trade: per-program
VMEM frames scale with block x span. Times the FULL fused step.

Usage: python tools/block_sweep.py [blocks=128,256] [n_cells=500000]
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

blocks = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "128,256").split(",")]
for block in blocks:
    eng = HipscEngine(gen, xp)
    cap = eng.cfg.capacity
    eng.cfg = EngineConfig.create(
        gen.size, capacity=cap, bio=eng.bio, use_pallas=True,
        uniform_radius=eng.bio.max_radius, pallas_block=block,
        jkr_span=min(768, cap), nbr_span=min(512, cap),
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
        print(f"block {block:4d}  {dt*1000:7.1f} ms/step  {1/dt:6.3f} steps/s"
              f"  (jkr span {eng.cfg.jkr_span}, use_pallas"
              f" {eng.cfg.use_pallas})", flush=True)
    except Exception as e:
        print(f"block {block:4d}  FAILED {type(e).__name__}:"
              f" {str(e).splitlines()[0][:120]}", flush=True)
