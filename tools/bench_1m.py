"""1,000,000-cell capability benchmark (single chip, bench-config model).

2x the reference's claimed maximum scale ("500,000+ cells",
/root/reference/README.md:5-6), same workload shape as ``bench.py``
(reference colony density, forces + diffusion + fate). Verbose staging so a
tunnel-slow compile is distinguishable from a hang; every phase prints with
wall time. Run standalone: ``python tools/bench_1m.py [n_cells]``.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg, t0):
    print(f"[{time.perf_counter() - t0:8.1f}s] {msg}", flush=True)


def main(n_cells=1_000_000, steps_timed=4):
    from hipsc_abm_tpu.engine import HipscEngine
    from hipsc_abm_tpu.models.params import (
        DiffusionParams,
        ExperimentalParams,
        GeneralParams,
    )

    t0 = time.perf_counter()
    side = 2000.0 * (n_cells / 5000.0) ** 0.5  # reference default density
    gen = GeneralParams(num_to_start=n_cells, end_step=200, size=(side, side, 0.0))
    xp = ExperimentalParams(num_gata6=n_cells // 10, dox_step=5)
    diff = DiffusionParams(spat_res=20.0, diffuse_dt=6.0, diffuse_const=2.0,
                           max_concentration=2.0, degradation=0.1,
                           release_amount=0.01)
    eng = HipscEngine(gen, xp, diff=diff, enable_diffusion=True)
    log(f"engine ready: capacity {eng.cfg.capacity}, jkr_span "
        f"{eng.cfg.jkr_span}, use_pallas {eng.cfg.use_pallas}", t0)

    state = eng.init_state(seed=0)
    float(jnp.sum(state.arrays["locations"]))
    log("init_state done", t0)

    for i in range(3):
        state, info = eng.safe_step(state)
        n = int(info.num_agents)
        log(f"warmup step {i}: {n} agents", t0)

    float(jnp.sum(state.arrays["locations"]))
    t1 = time.perf_counter()
    for _ in range(steps_timed):
        state, info = eng.step(state)
    float(jnp.sum(state.arrays["locations"]))
    dt = (time.perf_counter() - t1) / steps_timed
    log(f"TIMED: {1.0 / dt:.3f} steps/sec ({dt * 1000:.0f} ms/step) at "
        f"{int(jax.device_get(info.num_agents))} agents", t0)
    return 1.0 / dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    main(n)
