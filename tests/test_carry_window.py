"""Cross-step contact-window carryover (``EngineConfig.carry_window``).

``run_steps`` blocks on the Pallas windowed path may re-enter the previous
step's physics window when the step's division phase added no agents
(VERDICT r4 task 4). Two contracts:

* gate CLOSED (any birth): the block is bit-identical to carry_window=False
  — in a division-active hiPSC colony the gate essentially never fires, so
  default behavior is unchanged;
* gate OPEN (no births): the reused window must produce the same physics a
  fresh rebuild would — same bonds, same trajectories to summation-order
  tolerance — including deaths since the build (re-sentineled lanes).
"""

import dataclasses

import numpy as np
import pytest

from hipsc_abm_tpu.engine import HipscEngine
from hipsc_abm_tpu.models.params import (
    BiologyParams,
    ExperimentalParams,
    GeneralParams,
)


def _engines(bio=None, n=150, k=4):
    gen = GeneralParams(num_to_start=n, end_step=k + 2,
                        size=(300.0, 300.0, 0.0))
    xp = ExperimentalParams(num_gata6=n // 10, dox_step=2)
    kw = {"bio": bio} if bio is not None else {}
    eng_a = HipscEngine(gen, xp, use_pallas=True, **kw)
    eng_b = HipscEngine(gen, xp, use_pallas=True, **kw)
    eng_a.cfg = dataclasses.replace(eng_a.cfg, pallas_interpret=True)
    eng_b.cfg = dataclasses.replace(
        eng_b.cfg, pallas_interpret=True, carry_window=True)
    return eng_a, eng_b


def _canon(state):
    alive = np.asarray(state.alive)
    ids = np.asarray(state.arrays["ids"])[alive]
    order = np.argsort(ids)
    out = {"ids": ids[order]}
    for key in ("locations", "states", "div_counters", "death_counters"):
        out[key] = np.asarray(state.arrays[key])[alive][order]
    bonds = np.where(np.asarray(state.bonds.mask),
                     np.asarray(state.bonds.partners), -1)[alive][order]
    out["bonds"] = [set(r[r >= 0]) for r in bonds]
    return out


@pytest.mark.slow
def test_carry_window_division_active_bit_exact():
    """Default biology divides from step one (randomized clocks), so the
    birth gate stays closed and carry_window blocks are BIT-identical to
    the plain block path."""
    k = 4
    eng_a, eng_b = _engines(k=k)
    sa = eng_a.init_state(seed=11)
    sb = eng_b.init_state(seed=11)
    sa, infos_a = eng_a.run_steps(sa, k)
    sb, infos_b = eng_b.run_steps(sb, k)

    # the spare probe slot reports reuse on the carry path: all zeros here
    assert np.asarray(infos_b.max_window_drift).max() == 0.0

    a, b = _canon(sa), _canon(sb)
    np.testing.assert_array_equal(a["ids"], b["ids"])
    np.testing.assert_array_equal(a["locations"], b["locations"])
    for key in ("states", "div_counters", "death_counters"):
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    assert a["bonds"] == b["bonds"]


@pytest.mark.slow
def test_carry_window_reuse_matches_rebuild():
    """With division disabled the gate opens after the first block step;
    reused windows must reproduce the fresh-rebuild physics (positions to
    summation-order tolerance, bond sets and biology exactly) including
    deaths since the window build."""
    bio = BiologyParams(
        pluri_div_thresh=10_000, diff_div_thresh=10_000,  # no divisions
        death_thresh=2,  # lonely cells die quickly (re-sentinel path)
    )
    k = 4
    eng_a, eng_b = _engines(bio=bio, k=k)
    sa = eng_a.init_state(seed=5)
    sb = eng_b.init_state(seed=5)
    sa, infos_a = eng_a.run_steps(sa, k)
    sb, infos_b = eng_b.run_steps(sb, k)

    reuse = np.asarray(infos_b.max_window_drift)
    assert reuse[0] == 0.0  # first block step has no cache yet
    assert reuse[1:].max() == 1.0, reuse  # gate fired at least once

    # some deaths should have happened so the sentinel path is exercised
    assert int(np.asarray(infos_b.num_agents)[-1]) < int(
        np.asarray(infos_b.num_agents)[0])

    a, b = _canon(sa), _canon(sb)
    np.testing.assert_array_equal(a["ids"], b["ids"])
    np.testing.assert_allclose(a["locations"], b["locations"], atol=1e-4)
    for key in ("states", "div_counters", "death_counters"):
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    assert a["bonds"] == b["bonds"]


def test_carry_window_per_step_path_unchanged():
    """safe_step ignores carry_window (no block, no cache): identical
    traces, identical states."""
    eng_a, eng_b = _engines()
    sa = eng_a.init_state(seed=2)
    sb = eng_b.init_state(seed=2)
    for _ in range(2):
        sa, _ = eng_a.safe_step(sa)
        sb, _ = eng_b.safe_step(sb)
    np.testing.assert_array_equal(
        np.asarray(sa.arrays["locations"]), np.asarray(sb.arrays["locations"]))
