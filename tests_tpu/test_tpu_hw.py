"""Compiled-Mosaic kernels vs the XLA path on REAL TPU hardware.

Interpreter-mode equivalence (tests/test_pallas.py) validates kernel logic;
this file validates the *compiled* kernels — Mosaic lowering, span DMA,
scalar prefetch, chunk gating — against the XLA window path on the actual
chip (VERDICT round-1 item 5b: nothing previously asserted compiled-Mosaic
== XLA on hardware).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)


def _engines(size):
    from hipsc_abm_tpu.engine import HipscEngine
    from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams

    gen = GeneralParams(num_to_start=900, end_step=3, size=size)
    xp = ExperimentalParams(num_gata6=90, dox_step=2)
    eng_x = HipscEngine(gen, xp, use_pallas=False)
    eng_p = HipscEngine(gen, xp, use_pallas=True)
    assert eng_p.cfg.use_pallas and not eng_p.cfg.pallas_interpret
    return eng_x, eng_p


@requires_tpu
@pytest.mark.parametrize(
    "size", [(800.0, 800.0, 0.0), (250.0, 250.0, 250.0)], ids=["2d", "3d"]
)
def test_compiled_kernels_match_xla_full_steps(size):
    """Two full fused steps (division, death, pathway, motility, 11 contact
    substeps): the compiled Pallas engine must agree with the XLA engine —
    ints exactly, force-summed floats to accumulation-order tolerance."""
    eng_x, eng_p = _engines(size)
    s_x = eng_x.init_state(seed=7)
    s_p = eng_p.init_state(seed=7)
    for _ in range(2):
        s_x, _ = eng_x.safe_step(s_x)
        s_p, _ = eng_p.safe_step(s_p)

    np.testing.assert_array_equal(np.asarray(s_x.alive), np.asarray(s_p.alive))
    np.testing.assert_allclose(
        np.asarray(s_x.arrays["locations"]),
        np.asarray(s_p.arrays["locations"]),
        atol=1e-4,
    )
    for name in ("GATA6", "NANOG", "states", "div_counters", "death_counters",
                 "FGF4", "FGFR", "ERK", "diff_counters", "fds_counters"):
        np.testing.assert_array_equal(
            np.asarray(s_x.arrays[name]), np.asarray(s_p.arrays[name]),
            err_msg=name,
        )
    bx = np.where(np.asarray(s_x.bonds.mask), np.asarray(s_x.bonds.partners), -1)
    bp = np.where(np.asarray(s_p.bonds.mask), np.asarray(s_p.bonds.partners), -1)
    for i in range(bx.shape[0]):
        assert set(bx[i][bx[i] >= 0]) == set(bp[i][bp[i] >= 0]), i


@requires_tpu
def test_pallas_vs_xla_distributional_long_run():
    """Production-length float-drift bound (VERDICT r2 weak item 4): 60 full
    steps of a dividing, differentiating colony on the compiled Pallas engine
    vs the XLA engine. Per-step force sums differ only in accumulation order,
    so positions diverge chaotically over 60 steps — but the COLONY must stay
    distributionally identical: population, state counts, FDS totals, radial
    distribution moments."""
    from hipsc_abm_tpu.engine import HipscEngine
    from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams

    gen = GeneralParams(num_to_start=1200, end_step=60, size=(1000.0, 1000.0, 0.0))
    xp = ExperimentalParams(num_gata6=120, dox_step=10)
    eng_x = HipscEngine(gen, xp, use_pallas=False)
    eng_p = HipscEngine(gen, xp, use_pallas=True)
    s_x = eng_x.init_state(seed=41)
    s_p = eng_p.init_state(seed=41)
    for _ in range(60):
        s_x, _ = eng_x.safe_step(s_x)
        s_p, _ = eng_p.safe_step(s_p)

    def summary(s):
        a = np.asarray(s.alive)
        st = np.asarray(s.arrays["states"])[a]
        loc = np.asarray(s.arrays["locations"])[a][:, :2]
        center = loc.mean(axis=0)
        r = np.linalg.norm(loc - center, axis=1)
        return {
            "n": int(a.sum()),
            "diff": int((st == 1).sum()),
            "gata6": int(np.asarray(s.arrays["GATA6"])[a].sum()),
            "nanog": int(np.asarray(s.arrays["NANOG"])[a].sum()),
            "r_mean": float(r.mean()),
            "r_std": float(r.std()),
        }

    mx, mp = summary(s_x), summary(s_p)
    # id-keyed RNG makes the biology stream identical; only float force sums
    # differ. Population dynamics are integer-thresholded, so counts must
    # track closely; radial moments bound spatial drift.
    assert abs(mx["n"] - mp["n"]) <= 0.01 * mx["n"] + 5, (mx, mp)
    assert abs(mx["diff"] - mp["diff"]) <= 0.05 * max(mx["diff"], 20), (mx, mp)
    assert abs(mx["gata6"] - mp["gata6"]) <= 0.05 * max(mx["gata6"], 50), (mx, mp)
    assert abs(mx["nanog"] - mp["nanog"]) <= 0.05 * max(mx["nanog"], 50), (mx, mp)
    assert abs(mx["r_mean"] - mp["r_mean"]) <= 0.03 * mx["r_mean"], (mx, mp)
    assert abs(mx["r_std"] - mp["r_std"]) <= 0.06 * mx["r_std"], (mx, mp)


@requires_tpu
def test_compiled_ftcs_kernel_matches_xla():
    """The VMEM-resident multi-subcycle FTCS kernel, COMPILED through Mosaic,
    agrees with the XLA subcycle scan on the chip (ulp-level tolerance: the
    backends may fuse the a*x+b*y stencil arithmetic differently)."""
    from hipsc_abm_tpu.ops.diffusion import diffusion_dts, ftcs_diffuse
    from hipsc_abm_tpu.ops.pallas_diffusion import (
        fits_vmem,
        ftcs_diffuse_pallas,
    )

    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.random((1001, 1001)).astype(np.float32)) * 3.0
    dts = diffusion_dts(1800.0, 6.0)  # the production schedule: 301 subcycles
    assert fits_vmem(g.shape)
    a = np.asarray(ftcs_diffuse(g, jnp.asarray(dts), 2.0, 400.0, 2.0, 0.1))
    # the tunnel's compile helpers fail transiently (the same kernel fails
    # on one instance and compiles on the next) — bounded retry, same as
    # the engine ladder's remote_compile retry
    for attempt in range(4):
        try:
            b = np.asarray(ftcs_diffuse_pallas(g, dts, 2.0, 400.0, 2.0, 0.1))
            break
        except Exception as e:  # noqa: BLE001
            if "remote_compile" not in str(e) or attempt == 3:
                raise
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


@requires_tpu
def test_rollout_gradient_finite_on_tpu():
    """Reverse-mode AD through a 2-step rollout on the REAL chip: the
    NaN-guarded physics (ops/jkr, ops/integrate, models/biology) must stay
    finite under the TPU backend's compiled gradients, and the gradient
    fit surface (calibrate.Calibrator) must run end-to-end."""
    from hipsc_abm_tpu.calibrate import (
        Calibrator,
        radius_of_gyration,
        squared_error,
    )
    from hipsc_abm_tpu.engine import HipscEngine
    from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams

    gen = GeneralParams(num_to_start=900, end_step=3,
                        size=(800.0, 800.0, 0.0))
    xp = ExperimentalParams(num_gata6=90, dox_step=1)
    eng = HipscEngine(gen, xp, use_pallas=False)  # calibration's XLA path
    state = eng.init_state(seed=0)
    state, _ = eng.safe_step(state)

    cal = Calibrator(eng, ["adhesion_const", "motility_force"],
                     squared_error(radius_of_gyration, 200.0), horizon=2)
    theta = cal.theta0()
    (loss, _), grad = cal._fns(eng.cfg)[0](theta, state)
    assert bool(jnp.isfinite(loss))
    assert bool(jnp.all(jnp.isfinite(grad))), np.asarray(grad)
    res = cal.fit(state, iters=2, learning_rate=0.05)
    assert len(res.loss_history) == 2
    assert all(np.isfinite(res.loss_history))
