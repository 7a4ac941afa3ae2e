"""Sweep the Verlet skin at 500k: larger skin = fewer in-step window
rebuilds (each costs sort + plan + permute + seed + compact ~ 67 ms at 500k)
at slightly wider bins/spans. Times the FULL fused step."""
import sys, time, functools
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hipsc_abm_tpu.engine import HipscEngine, EngineConfig
from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams

n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
side = 2000.0 * (n / 5000.0) ** 0.5
gen = GeneralParams(num_to_start=n, end_step=10, size=(side, side, 0.0))
xp = ExperimentalParams(num_gata6=n // 10, dox_step=5)

for skin in [float(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "6,10,14,18").split(",")]:
    eng = HipscEngine(gen, xp)
    cap = eng.cfg.capacity
    eng.cfg = EngineConfig.create(
        gen.size, capacity=cap, bio=eng.bio, verlet_skin=skin,
        use_pallas=True, uniform_radius=eng.bio.max_radius,
        jkr_span=min(768, cap), nbr_span=min(512, cap),
    )
    s = eng.init_state(seed=0)
    for _ in range(3):
        s, _ = eng.safe_step(s)
    float(jnp.sum(s.arrays["locations"]))
    t0 = time.perf_counter()
    for _ in range(5):
        s, _ = eng.step(s)
    float(jnp.sum(s.arrays["locations"]))
    dt = (time.perf_counter() - t0) / 5
    print(f"skin {skin:5.1f}  {dt*1000:7.1f} ms/step  {1/dt:6.3f} steps/s  "
          f"(jkr bin {eng.cfg.jkr_spec.cell_size:.1f} um, span {eng.cfg.jkr_span})")
