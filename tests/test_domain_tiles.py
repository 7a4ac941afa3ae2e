"""2-D tile decomposition (x by y tile grid) of the domain engine.

Round-2 verdict flagged the domain engine as "x-stripes only (no 2-D
tiling)"; this file validates the tile generalization: the canonical
(flat bin, id) order restricted to a tile equals the global order (so
daughter ids and windowed float sums stay bit-exact), corners flow through
the dimension-ordered two-hop exchanges, and diagonal migration is
delivered x-hop-then-y-hop within one step. Agents are compared BY ID —
slot layouts differ by design (see ``test_domain_engine.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipsc_abm_tpu.engine import HipscEngine
from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams
from hipsc_abm_tpu.parallel.domain_engine import DomainHipscEngine

from tests.test_domain_engine import bond_sets, by_id

requires_multi = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)


def make_engines(tiles, n=1200, gata6=120, box=1600.0, steps_dox=2,
                 size=None, **dom_kwargs):
    size = size or (box, box, 0.0)
    gen = GeneralParams(num_to_start=n, end_step=8, size=size)
    xp = ExperimentalParams(num_gata6=gata6, dox_step=steps_dox)
    dom = DomainHipscEngine(gen, xp, tiles=tiles, **dom_kwargs)
    single = HipscEngine(gen, xp, cfg=dom.cfg.base, use_pallas=False)
    return dom, single


def tile_of_rows(cfg, state):
    """{agent id: tile index} for every alive agent."""
    locs = np.asarray(state.arrays["locations"])
    alive = np.asarray(state.alive)
    ids = np.asarray(state.arrays["ids"])
    res = {}
    for s in range(cfg.n_stripes):
        for i in ids[s][alive[s]]:
            res[int(i)] = s
    return res


def assert_resident(cfg, state):
    """Every own agent's bin column/row is inside its tile."""
    cell = cfg.base.nbr_spec.cell_size
    locs = np.asarray(state.arrays["locations"])
    alive = np.asarray(state.alive)
    xb, yb, Ty = cfg.col_bounds, cfg.row_bounds, cfg.n_ty
    for tx in range(cfg.n_tx):
        for ty in range(Ty):
            s = tx * Ty + ty
            l = locs[s, alive[s]]
            col = np.floor(l[:, 0] / cell).astype(int) + 1
            row = np.floor(l[:, 1] / cell).astype(int) + 1
            assert ((col >= xb[tx]) & (col < xb[tx + 1])).all(), f"tile {s}"
            assert ((row >= yb[ty]) & (row < yb[ty + 1])).all(), f"tile {s}"


@requires_multi
def test_tiles_match_single_engine_multistep():
    """4x2 tile grid: bit-for-ints, exactly-for-floats over a multi-step
    colony run with division + death + fate dynamics — the stripe
    equivalence test rerun on a genuinely 2-D decomposition (corner bio
    candidates, two-phase physics bands, per-column daughter ranks)."""
    dom, single = make_engines(tiles=(4, 2))
    dstate = dom.init_state(seed=11)
    sstate = single.init_state(seed=11)
    single.cfg = dom.cfg.base

    for step in range(5):
        dstate, dinfo = dom.safe_step(dstate)
        sstate, sinfo = single.safe_step(sstate)
        assert int(dinfo.num_added) == int(sinfo.num_added), f"step {step}"
        assert int(dinfo.num_removed) == int(sinfo.num_removed), f"step {step}"

    a = by_id(dom.to_cell_state(dstate))
    b = by_id(sstate)
    assert a["ids"].shape == b["ids"].shape
    np.testing.assert_array_equal(a["ids"], b["ids"])
    for k in ("GATA6", "NANOG", "states", "FGF4", "FGFR", "ERK",
              "death_counters", "diff_counters", "div_counters", "fds_counters"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    np.testing.assert_array_equal(a["locations"], b["locations"])
    np.testing.assert_array_equal(a["radii"], b["radii"])
    assert bond_sets(dom.to_cell_state(dstate)) == bond_sets(sstate)
    assert_resident(dom.cfg, dstate)


@requires_multi
def test_tiles_2x4_and_y_only_match_single():
    """Other tile aspect ratios (including a pure y decomposition, Tx == 1,
    where the x exchange carries nothing) stay bit-exact."""
    for tiles in ((2, 4), (1, 8)):
        dom, single = make_engines(tiles=tiles, n=900, gata6=90, box=1400.0)
        dstate = dom.init_state(seed=7)
        sstate = single.init_state(seed=7)
        single.cfg = dom.cfg.base
        for _ in range(3):
            dstate, _ = dom.safe_step(dstate)
            sstate, _ = single.safe_step(sstate)
        a = by_id(dom.to_cell_state(dstate))
        b = by_id(sstate)
        np.testing.assert_array_equal(a["ids"], b["ids"], err_msg=str(tiles))
        np.testing.assert_array_equal(
            a["locations"], b["locations"], err_msg=str(tiles)
        )
        for k in ("GATA6", "NANOG", "states", "div_counters"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{tiles} {k}")
        assert bond_sets(dom.to_cell_state(dstate)) == bond_sets(sstate)


@requires_multi
def test_tiles_migration_rehomes_including_y():
    """Migration across tile boundaries re-homes agents along BOTH axes; the
    population is conserved and residency holds on both coordinates."""
    dom, _ = make_engines(tiles=(2, 4), n=1000, gata6=100, box=1200.0)
    dstate = dom.init_state(seed=7)
    cfg = dom.cfg
    before = tile_of_rows(cfg, dstate)
    n0 = int(jnp.sum(dstate.alive))
    added = removed = 0
    for _ in range(6):
        dstate, info = dom.safe_step(dstate)
        added += int(info.num_added)
        removed += int(info.num_removed)
    after = tile_of_rows(cfg, dstate)
    assert int(jnp.sum(dstate.alive)) == n0 + added - removed
    moved = [i for i in after if i in before and after[i] != before[i]]
    # y-tiles are stacked per x-stripe: a tile change of +-1 within the same
    # x group is a y move (stride n_ty = 4 would be an x move)
    y_moves = [i for i in moved if after[i] // 4 == before[i] // 4]
    assert moved, "expected at least one migration in 6 steps"
    assert y_moves, "expected at least one y-axis migration"
    assert_resident(dom.cfg, dstate)


@requires_multi
def test_tiles_diagonal_migration_delivered():
    """An agent placed just across a corner (out of range in x AND y) is
    delivered to the diagonal tile by the x-then-y two-hop route in ONE
    step."""
    dom, _ = make_engines(tiles=(2, 4), n=800, gata6=0, box=1200.0)
    state = dom.init_state(seed=3)
    cfg = dom.cfg
    cell = cfg.base.nbr_spec.cell_size
    # tile (0, 1) owns cols [xb0, xb1) rows [yb1, yb2); craft a location just
    # inside tile (1, 2)'s corner, a few um across both boundaries
    xb, yb = cfg.col_bounds, cfg.row_bounds
    # 30 um past both boundaries: deep enough that one step of physics
    # cannot push it back across, far from an entire-tile crossing
    x_target = (xb[1] - 1) * cell + 30.0
    y_target = (yb[2] - 1) * cell + 30.0
    locs = np.asarray(state.arrays["locations"]).copy()
    alive = np.asarray(state.alive)
    src_tile = 0 * 4 + 1
    rows = np.where(alive[src_tile])[0]
    assert rows.size > 0
    moved_id = int(np.asarray(state.arrays["ids"])[src_tile, rows[0]])
    locs[src_tile, rows[0]] = [x_target, y_target, 0.0]
    state = state._replace(arrays={**state.arrays, "locations": jnp.asarray(locs)})
    state, info = dom.safe_step(state)
    assert int(info.mig_too_far) == 0
    home = tile_of_rows(cfg, state)[moved_id]
    assert home == 1 * 4 + 2, f"diagonal emigrant landed in tile {home}"
    assert_resident(cfg, state)


@requires_multi
def test_tiles_3d_match_single():
    """3D box under a 2-D (x, y) tile grid with full-z pencils: the 9-run
    stencils per shard stay bit-exact against the single-chip engine."""
    gen = GeneralParams(num_to_start=900, end_step=8, size=(700.0, 700.0, 250.0))
    xp = ExperimentalParams(num_gata6=90, dox_step=2)
    dom = DomainHipscEngine(gen, xp, tiles=(2, 2))
    single = HipscEngine(gen, xp, cfg=dom.cfg.base, use_pallas=False)

    dstate = dom.init_state(seed=17)
    sstate = single.init_state(seed=17)
    single.cfg = dom.cfg.base

    for _ in range(3):
        dstate, _ = dom.safe_step(dstate)
        sstate, _ = single.safe_step(sstate)

    a = by_id(dom.to_cell_state(dstate))
    b = by_id(sstate)
    np.testing.assert_array_equal(a["ids"], b["ids"])
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    assert bond_sets(dom.to_cell_state(dstate)) == bond_sets(sstate)


@requires_multi
@pytest.mark.slow
def test_tiles_pallas_matches_tiles_xla():
    """Per-shard Pallas span-mask kernels (interpret mode) under the 2-D tile
    decomposition agree with the tile XLA window path."""
    dom_x, _ = make_engines(tiles=(2, 2), n=900, gata6=90, box=1400.0)
    dom_p, _ = make_engines(
        tiles=(2, 2), n=900, gata6=90, box=1400.0,
        use_pallas=True, pallas_interpret=True,
    )
    assert dom_p.cfg.base.use_pallas
    sx = dom_x.init_state(seed=5)
    sp = dom_p.init_state(seed=5)
    for _ in range(3):
        sx, ix = dom_x.safe_step(sx)
        sp, ip = dom_p.safe_step(sp)
        assert int(ix.num_added) == int(ip.num_added)

    a = by_id(dom_x.to_cell_state(sx))
    b = by_id(dom_p.to_cell_state(sp))
    np.testing.assert_array_equal(a["ids"], b["ids"])
    for k in ("GATA6", "NANOG", "states", "div_counters", "death_counters"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    np.testing.assert_allclose(a["locations"], b["locations"], atol=1e-3)
    assert bond_sets(dom_x.to_cell_state(sx)) == bond_sets(dom_p.to_cell_state(sp))


@requires_multi
def test_tiles_checkpoint_resume_bit_exact(tmp_path):
    """Checkpoint/resume round-trips the tile configuration (n_ty,
    row_bounds) and re-partitions bit-exactly."""
    dom, _ = make_engines(tiles=(4, 2), n=900, gata6=90, box=1500.0)
    state = dom.init_state(seed=11)
    for _ in range(2):
        state, _ = dom.safe_step(state)

    path = str(tmp_path / "tile_ckpt.npz")
    dom.save_checkpoint(path, state)
    for _ in range(2):
        state, _ = dom.safe_step(state)

    gen = GeneralParams(num_to_start=900, end_step=8, size=(1500.0, 1500.0, 0.0))
    xp = ExperimentalParams(num_gata6=90, dox_step=2)
    dom2 = DomainHipscEngine(gen, xp, tiles=(4, 2))
    restored = dom2.load_checkpoint(path)
    assert dom2.cfg == dom.cfg
    assert dom2.cfg.n_ty == 2
    for _ in range(2):
        restored, _ = dom2.safe_step(restored)

    a = by_id(dom.to_cell_state(state))
    b = by_id(dom2.to_cell_state(restored))
    np.testing.assert_array_equal(a["ids"], b["ids"])
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@requires_multi
@pytest.mark.slow
def test_tiles_collectives_are_boundary_sized():
    """The 2-D tile step's collectives stay O(boundary): every collective
    operand is bounded by the halo/migration caps (plus the O(columns)
    divider-count table), and total collective bytes do not grow with the
    per-tile population."""
    import re

    def collective_bytes(dom, state):
        cfg = dom._cfg_for_state(state)
        sci, scf = dom._stripe_consts(cfg)
        lowered = dom._step_fn(cfg).lower(
            state.arrays, state.alive, state.bonds.partners, state.bonds.mask,
            state.gradients, state.key, state.step, state.next_id, sci, scf,
        )
        hlo = lowered.compile().as_text()
        band_bound = max(
            (cfg.halo_cap + cfg.mig_cap) * 64 * 4,
            cfg.n_stripes * cfg.nbr_nx_local * 4,  # divider-count all_gather
        )
        total = 0
        for m in re.finditer(
            r"= \w+\[([\d,]*)\][^=\n]*?"
            r"(collective-permute|all-gather|all-reduce)\(", hlo
        ):
            dims = [int(d) for d in m.group(1).split(",") if d]
            b = 4 * int(np.prod(dims)) if dims else 4
            assert b <= band_bound, f"oversized collective: {m.group(0)[:120]}"
            total += b
        assert total > 0
        return total

    dom, _ = make_engines(tiles=(4, 2), n=1200, gata6=120)
    state = dom.init_state(seed=1)
    small = collective_bytes(dom, state)

    dom2, _ = make_engines(
        tiles=(4, 2), n=1200, gata6=120, per_stripe=4 * dom.cfg.per_stripe
    )
    state2 = dom2.init_state(seed=1)
    big = collective_bytes(dom2, state2)
    assert big == small, (small, big)


@requires_multi
@pytest.mark.slow
def test_tiles_soak_with_growth_events():
    """Tile-grid soak: 16 steps at colony density with deliberately
    undersized halo/migration/drift capacities, forcing Verlet rebuilds,
    per-step migrations on both axes, and probe-driven growth — still
    bit-exact against the single-chip engine."""
    gen = GeneralParams(num_to_start=1000, end_step=24, size=(1500.0, 1500.0, 0.0))
    xp = ExperimentalParams(num_gata6=100, dox_step=2)
    dom = DomainHipscEngine(
        gen, xp, tiles=(2, 2), halo_cap=64, mig_cap=8, drift_allowance=4.0,
    )
    single = HipscEngine(gen, xp, cfg=dom.cfg.base, use_pallas=False)

    dstate = dom.init_state(seed=5)
    sstate = single.init_state(seed=5)
    single.cfg = dom.cfg.base

    cfg0 = dom.cfg
    migrations = 0
    for _ in range(16):
        dstate, dinfo = dom.safe_step(dstate)
        sstate, _ = single.safe_step(sstate)
        migrations += int(dinfo.mig_out_max)

    assert migrations > 0, "soak never migrated an agent"
    grew = (
        dom.cfg.halo_cap > cfg0.halo_cap
        or dom.cfg.mig_cap > cfg0.mig_cap
        or dom.cfg.drift_allowance > cfg0.drift_allowance
        or dom.cfg.per_stripe > cfg0.per_stripe
    )
    assert grew, "undersized capacities never grew — soak too gentle"

    a = by_id(dom.to_cell_state(dstate))
    b = by_id(sstate)
    np.testing.assert_array_equal(a["ids"], b["ids"])
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    assert bond_sets(dom.to_cell_state(dstate)) == bond_sets(sstate)
    assert_resident(dom.cfg, dstate)


@requires_multi
@pytest.mark.slow
def test_rebalance_preserves_trajectory():
    """Quantile re-partitioning mid-run changes the layout only: 3 steps +
    rebalance + 3 steps == the single-chip engine's 6 steps, bit-exact."""
    dom, single = make_engines(tiles=(4, 2), n=1000, gata6=100, box=1500.0)
    dstate = dom.init_state(seed=9)
    sstate = single.init_state(seed=9)
    single.cfg = dom.cfg.base

    for _ in range(3):
        dstate, _ = dom.safe_step(dstate)
        sstate, _ = single.safe_step(sstate)
    bounds_before = dom.cfg.col_bounds
    dstate = dom.rebalance(dstate)
    assert_resident(dom.cfg, dstate)
    for _ in range(3):
        dstate, _ = dom.safe_step(dstate)
        sstate, _ = single.safe_step(sstate)

    a = by_id(dom.to_cell_state(dstate))
    b = by_id(sstate)
    np.testing.assert_array_equal(a["ids"], b["ids"])
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    assert bond_sets(dom.to_cell_state(dstate)) == bond_sets(sstate)
    # at least the partition machinery ran (bounds may legitimately differ)
    assert len(dom.cfg.col_bounds) == len(bounds_before)


@requires_multi
def test_rebalance_evens_out_clustered_colony():
    """A center-clustered colony (the model's actual regime) overloads the
    middle tiles of a uniform partition; quantile bounds even the per-tile
    populations out."""
    gen = GeneralParams(num_to_start=1200, end_step=8, size=(2400.0, 2400.0, 0.0))
    xp = ExperimentalParams(num_gata6=0, dox_step=2)
    dom = DomainHipscEngine(gen, xp, tiles=(4, 2))
    rng = np.random.default_rng(2)
    # gaussian blob in the box center, ~1/6 box sigma
    locs = rng.normal(1200.0, 260.0, size=(1200, 3)).clip(60.0, 2340.0)
    locs[:, 2] = 0.0
    state = dom.init_state(seed=2, locations=locs)

    def per_tile(state):
        return np.asarray(jnp.sum(state.alive, axis=1))

    spread_uniform = per_tile(state)
    state = dom.rebalance(state)
    spread_balanced = per_tile(state)
    assert spread_balanced.max() < spread_uniform.max() * 0.75, (
        spread_uniform.tolist(), spread_balanced.tolist(),
    )
    # the balanced partition still steps correctly
    state, info = dom.safe_step(state)
    assert int(info.num_agents) > 0
    assert int(info.mig_too_far) == 0


@requires_multi
def test_sharded_checkpoint_resume_bit_exact(tmp_path):
    """The per-tile sharded checkpoint (pod-scale save path: no O(colony)
    flatten) round-trips the tile config and resumes bit-exactly, matching
    the flat-npz resume."""
    dom, _ = make_engines(tiles=(2, 2), n=900, gata6=90, box=1500.0)
    state = dom.init_state(seed=11)
    for _ in range(2):
        state, _ = dom.safe_step(state)

    import os
    shard_dir = str(tmp_path / "dom_shards")
    dom.save_checkpoint_sharded(shard_dir, state)
    assert os.path.isfile(os.path.join(shard_dir, "manifest.json"))
    assert os.path.isfile(os.path.join(shard_dir, "shard_3.npz"))

    for _ in range(2):
        state, _ = dom.safe_step(state)

    gen = GeneralParams(num_to_start=900, end_step=8, size=(1500.0, 1500.0, 0.0))
    xp = ExperimentalParams(num_gata6=90, dox_step=2)
    dom2 = DomainHipscEngine(gen, xp, tiles=(2, 2))
    restored = dom2.load_checkpoint_sharded(shard_dir)
    assert dom2.cfg == dom.cfg
    for _ in range(2):
        restored, _ = dom2.safe_step(restored)

    a = by_id(dom.to_cell_state(state))
    b = by_id(dom2.to_cell_state(restored))
    np.testing.assert_array_equal(a["ids"], b["ids"])
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    assert bond_sets(dom.to_cell_state(state)) == bond_sets(
        dom2.to_cell_state(restored)
    )


@requires_multi
@pytest.mark.slow
def test_tiles_pallas_with_diffusion_matches_xla():
    """The VMEM-resident FTCS kernel dispatched INSIDE shard_map (per-tile
    replica) agrees with the XLA-scan domain path, gradients included."""
    from hipsc_abm_tpu.models.params import DiffusionParams

    gen = GeneralParams(num_to_start=700, end_step=8, size=(1400.0, 1400.0, 0.0))
    xp = ExperimentalParams(num_gata6=70, dox_step=1)
    diff = DiffusionParams(spat_res=25.0, diffuse_dt=6.0, diffuse_const=2.0,
                           max_concentration=2.0, degradation=0.1,
                           release_amount=0.02)
    dom_x = DomainHipscEngine(gen, xp, diff=diff, tiles=(2, 2),
                              enable_diffusion=True)
    dom_p = DomainHipscEngine(gen, xp, diff=diff, tiles=(2, 2),
                              enable_diffusion=True,
                              use_pallas=True, pallas_interpret=True)
    sx = dom_x.init_state(seed=5)
    sp = dom_p.init_state(seed=5)
    for _ in range(2):
        sx, _ = dom_x.safe_step(sx)
        sp, _ = dom_p.safe_step(sp)

    gx = np.asarray(sx.gradients["fgf4_values"])
    gp = np.asarray(sp.gradients["fgf4_values"])
    assert gx.max() > 0
    np.testing.assert_allclose(gx, gp, atol=1e-5)
    a = by_id(dom_x.to_cell_state(sx))
    b = by_id(dom_p.to_cell_state(sp))
    np.testing.assert_array_equal(a["ids"], b["ids"])
    np.testing.assert_allclose(a["locations"], b["locations"], atol=1e-3)


@requires_multi
@pytest.mark.slow
def test_tiles_optional_phases_and_diffusion_match_single():
    """Growth (per-agent radii through the halo packs), stochastic updates,
    diff_surround, and diffusion all stay bit-exact under a 2-D tile grid."""
    from hipsc_abm_tpu.models.params import DiffusionParams

    gen = GeneralParams(num_to_start=700, end_step=8, size=(1400.0, 1400.0, 0.0))
    xp = ExperimentalParams(num_gata6=70, dox_step=1)
    diff = DiffusionParams(spat_res=25.0, diffuse_dt=6.0, diffuse_const=2.0,
                           max_concentration=2.0, degradation=0.1,
                           release_amount=0.02)
    flags = dict(enable_diffusion=True, enable_growth=True,
                 enable_stochastic=True, enable_diff_surround=True)
    dom = DomainHipscEngine(gen, xp, diff=diff, tiles=(2, 2), **flags)
    single = HipscEngine(gen, xp, diff=diff, cfg=dom.cfg.base, use_pallas=False)

    dstate = dom.init_state(seed=23)
    sstate = single.init_state(seed=23)
    single.cfg = dom.cfg.base

    for _ in range(3):
        dstate, _ = dom.safe_step(dstate)
        sstate, _ = single.safe_step(sstate)

    a = by_id(dom.to_cell_state(dstate))
    b = by_id(sstate)
    np.testing.assert_array_equal(a["ids"], b["ids"])
    for k in ("GATA6", "NANOG", "states", "div_counters"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    np.testing.assert_array_equal(a["locations"], b["locations"])
    np.testing.assert_array_equal(a["radii"], b["radii"])  # growth active
    ga = np.asarray(dstate.gradients["fgf4_values"])
    gb = np.asarray(sstate.gradients["fgf4_values"])
    np.testing.assert_allclose(ga, gb, atol=1e-5)
    assert ga.max() > 0


@requires_multi
@pytest.mark.slow
def test_balanced_bounds_property():
    """Quantile bounds stay monotone with legal widths for adversarial
    colonies (all-in-one-bin, bimodal, uniform), and the re-partition always
    fits (per_stripe auto-grows on overflow)."""
    dom, _ = make_engines(tiles=(4, 2), n=800, gata6=0, box=2400.0)
    cfg = dom.cfg
    cell = cfg.base.nbr_spec.cell_size
    hi = int(np.ceil(2400.0 / cell)) + 2
    rng = np.random.default_rng(0)
    cases = [
        np.full(800, 1200.0),                       # single bin
        np.concatenate([rng.normal(200, 20, 400),   # bimodal
                        rng.normal(2200, 20, 400)]).clip(10, 2390),
        rng.uniform(10, 2390, 800),                 # uniform
    ]
    for vals in cases:
        xb = dom._balanced_axis_bounds(vals, cfg.n_tx, 0, cfg.drift_allowance)
        assert xb[0] == 1 and xb[-1] == hi
        widths = np.diff(xb)
        assert (widths >= 3).all(), xb
        assert ((widths * cell) > (2 * cfg.drift_allowance
                                   + 2 * cfg.base.jkr_spec.cell_size + cell)).all()

    # a maximally clustered colony still re-partitions and steps
    locs = np.zeros((800, 3))
    locs[:, 0] = rng.normal(1200.0, 30.0, 800).clip(60, 2340)
    locs[:, 1] = rng.normal(1200.0, 30.0, 800).clip(60, 2340)
    state = dom.init_state(seed=4, locations=locs)
    state = dom.rebalance(state)
    assert_resident(dom.cfg, state)
    state, info = dom.safe_step(state)
    assert int(info.num_agents) > 0


@requires_multi
@pytest.mark.slow
def test_tiles_3d_pallas_matches_tiles_xla():
    """3D tiles on the Pallas span path (9-run stencil with BOTH local-axis
    offsets in the flat run strides) agree with the tile XLA window path."""
    gen = GeneralParams(num_to_start=600, end_step=8, size=(600.0, 600.0, 220.0))
    xp = ExperimentalParams(num_gata6=60, dox_step=2)
    dom_x = DomainHipscEngine(gen, xp, tiles=(2, 2))
    dom_p = DomainHipscEngine(gen, xp, tiles=(2, 2),
                              use_pallas=True, pallas_interpret=True)
    sx = dom_x.init_state(seed=5)
    sp = dom_p.init_state(seed=5)
    for _ in range(2):
        sx, ix = dom_x.safe_step(sx)
        sp, ip = dom_p.safe_step(sp)
        assert int(ix.num_added) == int(ip.num_added)

    a = by_id(dom_x.to_cell_state(sx))
    b = by_id(dom_p.to_cell_state(sp))
    np.testing.assert_array_equal(a["ids"], b["ids"])
    for k in ("GATA6", "NANOG", "states", "div_counters"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    np.testing.assert_allclose(a["locations"], b["locations"], atol=1e-3)
    assert bond_sets(dom_x.to_cell_state(sx)) == bond_sets(dom_p.to_cell_state(sp))


@requires_multi
def test_sharded_values_output_matches_flat(tmp_path):
    """Pod-scale value-CSV output: per-tile shards (written from addressable
    shards only, no O(colony) gather) merge into the reference's one-file
    format with exactly the flat writer's rows (as a set — tile order vs
    flat slot order differ by design)."""
    import os

    from hipsc_abm_tpu.utils import io as io_utils

    dom, _ = make_engines(tiles=(2, 2), n=900, gata6=90, box=1500.0)
    state = dom.init_state(seed=7)
    state, info = dom.safe_step(state)

    out = str(tmp_path / "vals")
    order = sorted(state.arrays)
    shards = dom.write_values_sharded(out, "pod", 1, state, order=order)
    assert len(shards) == 4
    merged = io_utils.merge_sharded_values(out, "pod", 1)

    # flat parity writer over the same colony
    flat = dom.to_cell_state(state)
    alive = np.asarray(flat.alive)
    rows = {k: np.asarray(v)[alive] for k, v in flat.arrays.items()}
    flat_path = os.path.join(out, "flat.csv")
    io_utils.write_values_csv(flat_path, rows, order)

    # BYTE-level comparison (binary mode): the merge must preserve the
    # parity writer's CRLF row endings, not rewrite them through text mode
    with open(merged, "rb") as f:
        m_header, m_rows = f.readline(), sorted(f.readlines())
    with open(flat_path, "rb") as f:
        f_header, f_rows = f.readline(), sorted(f.readlines())
    assert m_header == f_header
    assert len(m_rows) == int(info.num_agents)
    assert m_rows == f_rows

    # a missing TRAILING shard is only detectable with the expected count
    # (the found set [0,1,2] is otherwise indistinguishable from a complete
    # 3-tile run); a dead last-tile host must not merge silently smaller
    os.remove(shards[3])
    io_utils.merge_sharded_values(out, "pod", 1, out_path=str(
        tmp_path / "trail_undetectable.csv"))  # count-free: cannot know
    with pytest.raises(FileNotFoundError, match="incomplete"):
        io_utils.merge_sharded_values(out, "pod", 1, out_path=str(
            tmp_path / "trail.csv"), n_shards=4)

    # a missing INTERIOR tile shard must fail loudly even without the count
    os.remove(shards[1])
    with pytest.raises(FileNotFoundError, match="incomplete"):
        io_utils.merge_sharded_values(out, "pod", 1, out_path=str(
            tmp_path / "gap.csv"
        ))


@requires_multi
def test_elastic_resume_on_different_tile_count(tmp_path):
    """Elastic recovery (SURVEY §5.3): a sharded checkpoint written by a
    4-tile run resumes on a 2-stripe engine (half the devices — the
    lost-pod-host scenario) and on an 8-stripe engine (scale-up),
    bit-exact vs the uninterrupted 4-tile run. Layout independence is what
    makes this exact, not approximate."""
    import os

    dom, _ = make_engines(tiles=(2, 2), n=900, gata6=90, box=1500.0)
    state = dom.init_state(seed=13)
    for _ in range(2):
        state, _ = dom.safe_step(state)
    shard_dir = str(tmp_path / "elastic_shards")
    dom.save_checkpoint_sharded(shard_dir, state)
    for _ in range(2):
        state, _ = dom.safe_step(state)
    ref = by_id(dom.to_cell_state(state))
    ref_bonds = bond_sets(dom.to_cell_state(state))

    gen = GeneralParams(num_to_start=900, end_step=8, size=(1500.0, 1500.0, 0.0))
    xp = ExperimentalParams(num_gata6=90, dox_step=2)
    for n_stripes in (2, 8):
        dom2 = DomainHipscEngine(gen, xp, n_stripes=n_stripes)
        # a mismatched mesh without elastic stays a loud error
        with pytest.raises(ValueError, match="elastic"):
            dom2.load_checkpoint_sharded(shard_dir)
        restored = dom2.load_checkpoint_sharded(shard_dir, elastic=True)
        assert dom2.cfg.n_stripes == n_stripes
        assert dom2.cfg.base.bond_cap == dom.cfg.base.bond_cap
        for _ in range(2):
            restored, _ = dom2.safe_step(restored)
        got = by_id(dom2.to_cell_state(restored))
        np.testing.assert_array_equal(ref["ids"], got["ids"])
        for k in ref:
            np.testing.assert_array_equal(ref[k], got[k], err_msg=k)
        assert bond_sets(dom2.to_cell_state(restored)) == ref_bonds
