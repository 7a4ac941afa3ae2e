"""Benchmark: full-model steps/sec on one TPU chip.

Headline workload = the driver BASELINE.json metric ("Steps/sec at 100k and
500k cells (forces+diffusion+fate)"): 100,000 cells at the reference's
default colony density (5k cells per 2000 um square -> 8944 um box), running
the complete fused step — radius-15 neighbor search, division/death slot
dynamics, FDS pathway + differentiation, motility, 11 physics substeps of
JKR contact (Pallas span-DMA kernel) + Stokes integration, and FTCS morphogen
diffusion with per-cell release. No host outputs in the timed region.

Baseline: the reference publishes no numbers (BASELINE.md), so
``vs_baseline`` divides by the MEASURED reference — the unmodified code at
/root/reference executed end-to-end with C++/OpenMP equivalents of its five
numba kernels (tools/reference_baseline/measure_reference.py), read from its
own data CSV at 100k and 500k cells. The round-1 single-threaded numpy proxy
is still measured live and reported as ``vs_numpy_proxy`` for continuity.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")

N_CELLS = 100_000
PROXY_CELLS = 12_500


def _wait_for_backend(max_wait_s: float) -> bool:
    """Probe the accelerator backend in disposable subprocesses.

    A tunneled TPU backend can wedge after an interrupted job: the next
    PJRT init hangs forever (not an exception). Probing in a subprocess
    with a timeout — BEFORE this process runs its first jax op — turns
    that failure mode into a bounded wait. Returns True once a trivial
    device op succeeds, False when max_wait_s elapses first.
    """
    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.sum(jnp.ones((8, 8)))))")
    deadline = time.monotonic() + max_wait_s

    def _probe_once(timeout_s: float) -> bool:
        proc = subprocess.Popen(
            [sys.executable, "-c", probe], stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, start_new_session=True)
        try:
            return proc.wait(timeout=timeout_s) == 0
        except subprocess.TimeoutExpired:
            proc.kill()
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                pass  # stuck in an uninterruptible PJRT call — abandon it
            return False

    attempt = 0
    while True:
        attempt += 1
        # per-attempt timeout BACKS OFF: a congested-but-working tunnel can
        # take >2 min just to initialize PJRT (measured 133 s first-op),
        # which a fixed 120 s probe window misreads as a wedge — and then
        # the bench wrongly falls back to CPU
        per_attempt = min(120.0 * (2 ** (attempt - 1)),
                          max(10.0, deadline - time.monotonic()))
        if _probe_once(per_attempt):
            return True
        if time.monotonic() >= deadline:
            return False
        print(f"bench: backend probe {attempt} failed, retrying "
              f"({int(deadline - time.monotonic())}s left)", file=sys.stderr)
        time.sleep(min(60.0, max(1.0, deadline - time.monotonic())))


def _preflight_kernel_paths(timeout_s: float = 1200.0) -> None:
    """Compile + run the full Pallas step in a DISPOSABLE subprocess before
    this process touches the backend (hardware-gate policy, README).

    The engine already degrades in-process compile failures to the XLA path
    (``HipscEngine._call_step``); this preflight covers the harder failure
    mode where a Mosaic compile aborts or wedges the whole process — the
    subprocess dies, this process flips the matching escape hatch
    (``HIPSC_NO_PALLAS_FTCS`` / ``HIPSC_NO_PALLAS``) and benches the
    surviving path. The driver ALWAYS gets a JSON line."""
    if os.environ.get("HIPSC_NO_PALLAS") == "1":
        return
    code = (
        "import jax, os, sys\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " '/tmp/hipsc_jax_cache_tpu')\n"
        "from hipsc_abm_tpu.engine import HipscEngine\n"
        "from hipsc_abm_tpu.models.params import (DiffusionParams,"
        " ExperimentalParams, GeneralParams)\n"
        "gen = GeneralParams(num_to_start=450, end_step=5,"
        " size=(600.0, 600.0, 0.0))\n"
        "xp = ExperimentalParams(num_gata6=50, dox_step=1)\n"
        "diff = DiffusionParams(spat_res=20.0, diffuse_dt=6.0,"
        " diffuse_const=2.0, max_concentration=2.0, degradation=0.1,"
        " release_amount=0.01)\n"
        "eng = HipscEngine(gen, xp, diff=diff, enable_diffusion=True,"
        " use_pallas=True)\n"
        "state = eng.init_state(seed=0)\n"
        "state, info = eng.safe_step(state)\n"
        "assert int(info.num_agents) > 0\n"
        "print('PALLAS_OK' if eng.cfg.use_pallas else 'PALLAS_BAD')\n"
        "print('FTCS_OK' if os.environ.get('HIPSC_NO_PALLAS_FTCS') != '1'"
        " else 'FTCS_BAD')\n"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, start_new_session=True)
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        out = ""
    if proc.returncode != 0 or "PALLAS_BAD" in out:
        print("bench: preflight lost the Pallas step "
              f"(rc={proc.returncode}) — benching the XLA path",
              file=sys.stderr)
        os.environ["HIPSC_NO_PALLAS"] = "1"
    elif "FTCS_BAD" in out:
        print("bench: preflight lost the FTCS Mosaic kernel — benching with "
              "the XLA diffusion scan", file=sys.stderr)
        os.environ["HIPSC_NO_PALLAS_FTCS"] = "1"


def bench_tpu(n_cells: int, steps_timed: int = 8):
    from hipsc_abm_tpu.engine import HipscEngine
    from hipsc_abm_tpu.models.params import (
        DiffusionParams,
        ExperimentalParams,
        GeneralParams,
    )

    side = 2000.0 * (n_cells / 5000.0) ** 0.5  # reference default density
    gen = GeneralParams(
        num_to_start=n_cells, end_step=200, size=(side, side, 0.0)
    )
    xp = ExperimentalParams(num_gata6=n_cells // 10, dox_step=5)
    diff = DiffusionParams(spat_res=20.0, diffuse_dt=6.0, diffuse_const=2.0,
                           max_concentration=2.0, degradation=0.1,
                           release_amount=0.01)
    eng = HipscEngine(gen, xp, diff=diff, enable_diffusion=True)
    state = eng.init_state(seed=0)

    # warmup: trigger compile + any capacity growth
    for _ in range(3):
        state, info = eng.safe_step(state)
    float(jnp.sum(state.arrays["locations"]))  # force (block_until_ready is
    # unreliable through tunneled TPU backends — always fetch a scalar)

    t0 = time.perf_counter()
    for _ in range(steps_timed):
        state, info = eng.step(state)
    float(jnp.sum(state.arrays["locations"]))
    dt = (time.perf_counter() - t0) / steps_timed
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


def _numpy_step(locs, radii, rng, box):
    """One reference-equivalent step: biology bookkeeping + 11 physics
    substeps (JKR + Stokes)."""
    import math

    n = len(locs)
    i15, j15 = _numpy_neighbors(locs, 15.0)
    counts = np.bincount(i15, minlength=n) + np.bincount(j15, minlength=n)
    _ = rng.integers(0, 2, n)  # division clocks
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
        locs = np.clip(locs + 180.0 * vel * 1e6, 0.0, np.array([box, box, 0.0]))
    return locs


def bench_numpy_proxy():
    rng = np.random.default_rng(0)
    box = 2000.0 * (PROXY_CELLS / 5000.0) ** 0.5  # same density as the TPU run
    locs = rng.random((PROXY_CELLS, 3)) * np.array([box, box, 0.0])
    radii = np.full(PROXY_CELLS, 5.0)
    _numpy_step(locs, radii, rng, box)  # warm caches
    t0 = time.perf_counter()
    _numpy_step(locs, radii, rng, box)
    proxy_sps = 1.0 / (time.perf_counter() - t0)
    return proxy_sps * PROXY_CELLS / N_CELLS  # linear-in-n scaling to 100k


# The MEASURED reference baseline (steps/sec): the unmodified reference code
# run end-to-end via tools/reference_baseline/measure_reference.py, its five
# numba kernels executing through equivalent C++/OpenMP implementations (see
# BASELINE.md "Measured: the ACTUAL reference"). Both points measured
# directly (500k: 30.1 s/step). These are recorded constants from that run
# (one specific CPU host), NOT re-measured alongside the TPU number — the
# JSON carries provenance fields so the ratio is self-describing.
REF_MEASURED_100K = 0.235
REF_MEASURED_500K = 0.033
REF_BASELINE_SOURCE = (
    "tools/reference_baseline/measure_reference.py (reference code + "
    "C++/OpenMP kernel equivalents), recorded round 2 on the bench host's "
    "CPUs; see BASELINE.md"
)

# Last TPU-hardware measurements of this exact bench workload (one v5e via
# the axon tunnel, 2026-08-17, BENCHMARKS.md "Full-model steps/sec by scale"
# round-3 table). Reported as provenance in the CPU-fallback JSON only —
# never as `value`, which is always measured in the current run.
LAST_TPU_MEASURED = {
    "100k_steps_per_sec": 11.1,
    "500k_steps_per_sec": 2.08,
    "measured": "2026-08-17, one v5e (axon tunnel), BENCHMARKS.md round-3 table",
}


def _bench_cpu_fallback(wait_s: float):
    """The tunnel never answered: measure the same workload on the XLA CPU
    backend (clearly labeled) instead of emitting a dead 0.0. jax is
    imported but no backend is initialized yet, so switching platforms
    in-process is safe (env JAX_PLATFORMS is too late — sitecustomize
    registers the axon plugin at interpreter start)."""
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_cpu")
    try:
        cpu_sps = bench_tpu(N_CELLS, steps_timed=3)
    except Exception as e:
        # the driver parses ONE JSON line — never leave it a bare traceback
        print(json.dumps({
            "metric": (f"steps_per_sec_{N_CELLS // 1000}k_cells_"
                       "forces_diffusion_fate"),
            "value": 0.0,
            "unit": "steps/sec",
            "vs_baseline": 0.0,
            "error": ("TPU backend unreachable after "
                      f"{int(wait_s)}s AND the CPU-backend fallback "
                      f"measurement failed: {type(e).__name__}: {e}"),
            "last_tpu_measured": LAST_TPU_MEASURED,
        }))
        return
    print(json.dumps({
        "metric": f"steps_per_sec_{N_CELLS // 1000}k_cells_forces_diffusion_fate",
        "value": round(cpu_sps, 3),
        "unit": "steps/sec",
        "vs_baseline": round(cpu_sps / REF_MEASURED_100K, 2),
        "platform": "cpu-fallback",
        "error": ("TPU backend unreachable after "
                  f"{int(wait_s)}s of probing (tunneled TPU wedge; see "
                  "BENCHMARKS.md ops note) — value is the SAME workload on "
                  "the XLA CPU backend, not a TPU number"),
        "last_tpu_measured": LAST_TPU_MEASURED,
        "ref_baseline_steps_per_sec": {"100k": REF_MEASURED_100K,
                                       "500k": REF_MEASURED_500K},
        "ref_baseline_source": REF_BASELINE_SOURCE,
    }))


def _bench_resilient(n_cells: int, steps_timed: int):
    """Measure, degrading the kernel path instead of dying: the driver must
    ALWAYS get a real number if ANY path runs (VERDICT r3 weak #1). Returns
    (steps_per_sec, note-or-None); (0.0, error) only when even the pure-XLA
    TPU path failed."""
    ladder = [
        (None, None),
        ("HIPSC_NO_PALLAS_FTCS", "FTCS Mosaic kernel disabled after failure"),
        ("HIPSC_NO_PALLAS", "pure-XLA path after Pallas failure"),
    ]
    err = None
    for env_key, note in ladder:
        if env_key is not None:
            if os.environ.get(env_key) == "1":
                continue  # this rung already active — its failure is final
            os.environ[env_key] = "1"
        try:
            return bench_tpu(n_cells, steps_timed=steps_timed), note
        except Exception as e:  # noqa: BLE001 — any failure walks the ladder
            err = f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
            print(f"bench: {n_cells} cells failed ({err}); degrading",
                  file=sys.stderr)
    return 0.0, f"all kernel paths failed: {err}"


if __name__ == "__main__":
    wait_s = float(os.environ.get("HIPSC_BENCH_BACKEND_WAIT_S", "1800"))
    if not _wait_for_backend(wait_s):
        _bench_cpu_fallback(wait_s)
        sys.exit(0)
    _preflight_kernel_paths()
    tpu_sps, note_100k = _bench_resilient(N_CELLS, steps_timed=8)
    tpu_500k, note_500k = _bench_resilient(500_000, steps_timed=4)
    try:
        proxy_sps = bench_numpy_proxy()
    except Exception:  # noqa: BLE001 — continuity metric only, never fatal
        proxy_sps = 0.0
    notes = {}
    if note_100k:
        notes["note_100k"] = note_100k
    if note_500k:
        notes["note_500k"] = note_500k
    print(json.dumps({
        "metric": f"steps_per_sec_{N_CELLS // 1000}k_cells_forces_diffusion_fate",
        "value": round(tpu_sps, 3),
        "unit": "steps/sec",
        # vs_baseline*: TPU measurement divided by the recorded measured
        # reference (the ONLY headline ratios)
        "vs_baseline": round(tpu_sps / REF_MEASURED_100K, 2),
        "steps_per_sec_500k_cells": round(tpu_500k, 3),
        "vs_baseline_500k": round(tpu_500k / REF_MEASURED_500K, 2),
        "ref_baseline_steps_per_sec": {"100k": REF_MEASURED_100K,
                                       "500k": REF_MEASURED_500K},
        "ref_baseline_source": REF_BASELINE_SOURCE,
        # round-1 single-threaded numpy re-implementation, kept only for
        # cross-round continuity — NOT a reference measurement
        "vs_round1_numpy_proxy_nonbaseline": (
            round(tpu_sps / proxy_sps, 2) if proxy_sps else 0.0),
        **notes,
    }))
