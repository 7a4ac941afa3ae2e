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
