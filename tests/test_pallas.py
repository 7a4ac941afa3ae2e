"""Pallas fused contact kernel vs the XLA jkr_substep path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hipsc_abm_tpu.models.params import BiologyParams
from hipsc_abm_tpu.ops import neighbors as nbr
from hipsc_abm_tpu.ops.jkr import BondState, jkr_substep, pack_physics
from hipsc_abm_tpu.ops.pallas_contact import (
    NO_BOND,
    contact_substep_pallas,
)

BIO = BiologyParams()
BOX = (300.0, 300.0, 0.0)
BOX3D = (120.0, 120.0, 120.0)
CELL = BIO.jkr_radius + 2 * BIO.jkr_break_band + 2.0  # engine's jkr bin size


def ids_of(C):
    return jnp.arange(C, dtype=jnp.int32)  # slot == id in these unit tests


def build_inputs(rng, C=256, n=230, bond_cap=8, seed_bonds=False, box=BOX):
    locs = np.zeros((C, 3), np.float32)
    locs[:n] = rng.random((n, 3)).astype(np.float32) * np.asarray(box, np.float32)
    radii = np.full(C, 5.0, np.float32)
    alive = np.zeros(C, bool)
    alive[:n] = True

    spec = nbr.GridSpec.from_box(box, CELL, run_cap=64)
    grid = nbr.build_grid(spec, jnp.asarray(locs), ids_of(C), jnp.asarray(alive))
    packed = pack_physics(jnp.asarray(locs), jnp.asarray(radii), ids_of(C), jnp.asarray(alive))

    bonds = BondState.empty(C, bond_cap)
    if seed_bonds:
        # bond every close pair (run one XLA substep to produce a bond state)
        g2, pos, valid, _ = nbr.sorted_window(spec, jnp.asarray(locs), ids_of(C), jnp.asarray(alive))
        _, bonds, _ = jkr_substep(
            bonds, packed, g2.order, pos, valid, BIO.jkr_radius,
            BIO.adhesion_const, BIO.poisson, BIO.youngs, BIO.jkr_break_d,
        )
    return locs, radii, alive, spec, grid, packed, bonds


def run_xla(spec, locs, alive, packed, bonds):
    grid, pos, valid, _ = nbr.sorted_window(
        spec, jnp.asarray(locs), ids_of(len(locs)), jnp.asarray(alive)
    )
    return jkr_substep(
        bonds, packed, grid.order, pos, valid, BIO.jkr_radius,
        BIO.adhesion_const, BIO.poisson, BIO.youngs, BIO.jkr_break_d,
    )


def run_pallas(spec, grid, packed, bonds, block=64, chunk=128,
               uniform_radius=None):
    C = packed.shape[0]
    order = grid.order
    # pack lane 6 carries the build-time flat bin ids in sorted order
    srt_pack = packed[order].at[:, 6].set(grid.sorted_flat.astype(jnp.float32))
    # bonds in sorted-row order, NO_BOND padding
    partners_f = jnp.where(bonds.mask, bonds.partners.astype(jnp.float32), NO_BOND)
    srt_bonds = partners_f[order]

    _, _, span_needed, _ = nbr.block_span_plan(
        spec, grid.sorted_flat, block, span=C, capacity=C, chunk=C
    )
    span = min(int(((int(span_needed) + 127) // 128) * 128), C)
    starts, chunk_needs, _, _ = nbr.block_span_plan(
        spec, grid.sorted_flat, block, span=span, capacity=C, chunk=chunk
    )

    force_deg, new_bonds_srt = contact_substep_pallas(
        srt_pack, srt_bonds, starts, chunk_needs,
        block=block, span=span, run_offs=spec.flat_run_offsets, radius=BIO.jkr_radius,
        adhesion_const=BIO.adhesion_const, poisson=BIO.poisson,
        youngs=BIO.youngs, break_d=BIO.jkr_break_d,
        chunk=chunk,
        uniform_radius=uniform_radius, interpret=True,
    )
    # unsort to slot rows
    inv = jnp.zeros((C,), jnp.int32).at[order].set(jnp.arange(C, dtype=jnp.int32))
    return force_deg[inv], new_bonds_srt[inv]


@pytest.mark.parametrize("seed_bonds", [False, True])
@pytest.mark.slow
def test_kernel_matches_xla_substep(rng, seed_bonds):
    locs, radii, alive, spec, grid, packed, bonds = build_inputs(
        rng, seed_bonds=seed_bonds
    )
    f_xla, b_xla, deg_xla = run_xla(spec, locs, alive, packed, bonds)
    fd_pal, b_pal = run_pallas(spec, grid, packed, bonds)

    np.testing.assert_allclose(
        np.asarray(fd_pal[:, :3]), np.asarray(f_xla), rtol=1e-4, atol=1e-13
    )
    # same bond sets per agent (order within the list may differ)
    exp = np.where(np.asarray(b_xla.mask), np.asarray(b_xla.partners), -1)
    got = np.asarray(b_pal).astype(np.int64)
    for i in range(got.shape[0]):
        assert set(got[i][got[i] >= 0].tolist()) == set(exp[i][exp[i] >= 0].tolist()), i
    # degree probe agrees (the (C, K) matrix truncates at K; the probe is the
    # true count used by the host to grow K)
    K = b_xla.partners.shape[1]
    np.testing.assert_array_equal(
        np.minimum(np.asarray(fd_pal[:, 3]).astype(int), K),
        np.asarray(jnp.sum(b_xla.mask, axis=1)).astype(int),
    )


@pytest.mark.parametrize("seed_bonds", [False, True])
@pytest.mark.slow
def test_kernel_matches_xla_substep_3d(rng, seed_bonds):
    """3D: 9-run span DMA (the reference's 3x3x3 stencil,
    backend.py:84-93) equals the XLA window path."""
    locs, radii, alive, spec, grid, packed, bonds = build_inputs(
        rng, seed_bonds=seed_bonds, box=BOX3D
    )
    assert len(spec.flat_run_offsets) == 9
    f_xla, b_xla, deg_xla = run_xla(spec, locs, alive, packed, bonds)
    fd_pal, b_pal = run_pallas(spec, grid, packed, bonds)
    np.testing.assert_allclose(
        np.asarray(fd_pal[:, :3]), np.asarray(f_xla), rtol=1e-4, atol=1e-13
    )
    exp = np.where(np.asarray(b_xla.mask), np.asarray(b_xla.partners), -1)
    got = np.asarray(b_pal).astype(np.int64)
    for i in range(got.shape[0]):
        assert set(got[i][got[i] >= 0].tolist()) == set(exp[i][exp[i] >= 0].tolist()), i


def test_kernel_uniform_radius_matches_general(rng):
    """The scalar-radius fast path equals the general pair law when all
    radii are in fact equal."""
    locs, radii, alive, spec, grid, packed, bonds = build_inputs(
        rng, seed_bonds=True
    )
    f_gen, b_gen = run_pallas(spec, grid, packed, bonds)
    f_uni, b_uni = run_pallas(spec, grid, packed, bonds, uniform_radius=5.0)
    np.testing.assert_allclose(
        np.asarray(f_uni[:, :3]), np.asarray(f_gen[:, :3]), rtol=1e-4, atol=1e-13
    )
    np.testing.assert_array_equal(np.asarray(b_uni), np.asarray(b_gen))


def test_kernel_chunk_widths_agree(rng):
    """Span chunk gating is a pure execution-schedule choice: every chunk
    width yields identical forces and bond sets."""
    locs, radii, alive, spec, grid, packed, bonds = build_inputs(
        rng, seed_bonds=True
    )
    f_128, b_128 = run_pallas(spec, grid, packed, bonds, chunk=128)
    f_full, b_full = run_pallas(spec, grid, packed, bonds, chunk=10**9)
    np.testing.assert_allclose(
        np.asarray(f_128), np.asarray(f_full), rtol=1e-6, atol=1e-13
    )
    np.testing.assert_array_equal(np.asarray(b_128), np.asarray(b_full))


def test_bond_persistence_through_kernel(rng):
    """A pre-existing bond beyond the search radius still exerts force."""
    C = 64
    locs = np.zeros((C, 3), np.float32)
    locs[0] = [100.0, 100.0, 0.0]
    locs[1] = [110.2, 100.0, 0.0]  # outside search radius 10, inside break
    radii = np.full(C, 5.0, np.float32)
    alive = np.zeros(C, bool)
    alive[:2] = True

    spec = nbr.GridSpec.from_box(BOX, CELL, run_cap=16)
    grid = nbr.build_grid(spec, jnp.asarray(locs), ids_of(C), jnp.asarray(alive))
    packed = pack_physics(jnp.asarray(locs), jnp.asarray(radii), ids_of(C), jnp.asarray(alive))

    no_bonds = BondState.empty(C, 8)
    f0, _ = run_pallas(spec, grid, packed, no_bonds)
    np.testing.assert_allclose(np.asarray(f0[:, :3]), 0.0)

    bonded = BondState(
        partners=no_bonds.partners.at[0, 0].set(1).at[1, 0].set(0),
        mask=no_bonds.mask.at[0, 0].set(True).at[1, 0].set(True),
    )
    f1, b1 = run_pallas(spec, grid, packed, bonded)
    assert float(f1[0, 0]) > 0  # adhesion pulls toward the partner at +x
    assert float(f1[1, 0]) < 0
    assert int(b1[0, 0]) == 1 and int(b1[1, 0]) == 0  # bond survives


@pytest.mark.parametrize("size", [(300.0, 300.0, 0.0), (150.0, 150.0, 150.0)])
@pytest.mark.slow
def test_engine_pallas_matches_xla(rng, size):
    """Full fused steps: Pallas engine (interpret mode) == XLA engine, in 2D
    (3-run kernels) and 3D (9-run kernels, 16-lane bio pack)."""
    from hipsc_abm_tpu.engine import HipscEngine
    from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams
    import dataclasses

    gen = GeneralParams(num_to_start=150, end_step=3, size=size)
    xp = ExperimentalParams(num_gata6=16, dox_step=2)
    eng_x = HipscEngine(gen, xp, use_pallas=False)
    eng_p = HipscEngine(gen, xp, use_pallas=True)
    eng_p.cfg = dataclasses.replace(eng_p.cfg, pallas_interpret=True)

    s_x = eng_x.init_state(seed=3)
    s_p = eng_p.init_state(seed=3)
    for _ in range(2):
        s_x, _ = eng_x.safe_step(s_x)
        s_p, _ = eng_p.safe_step(s_p)

    np.testing.assert_array_equal(np.asarray(s_x.alive), np.asarray(s_p.alive))
    # chunked span accumulation reorders the f32 force sums, so positions
    # agree to summation-order tolerance, not bit-exactly
    np.testing.assert_allclose(
        np.asarray(s_x.arrays["locations"]), np.asarray(s_p.arrays["locations"]),
        atol=1e-4,
    )
    for name in ("GATA6", "NANOG", "states", "div_counters", "death_counters"):
        np.testing.assert_array_equal(
            np.asarray(s_x.arrays[name]), np.asarray(s_p.arrays[name]), err_msg=name
        )
    # bond graphs agree as sets
    bx = np.where(np.asarray(s_x.bonds.mask), np.asarray(s_x.bonds.partners), -1)
    bp = np.where(np.asarray(s_p.bonds.mask), np.asarray(s_p.bonds.partners), -1)
    for i in range(bx.shape[0]):
        assert set(bx[i][bx[i] >= 0]) == set(bp[i][bp[i] >= 0]), i


def test_masked_band_storage_matches_xla(rng):
    """bond_band_margin plumbing on the span-mask path: the seed and masked
    kernels honor ``store_radius`` (only pairs beyond it are remembered),
    agreeing with the XLA ``jkr_substep(store_radius=...)`` over two substeps
    at frozen positions — forces, stored bond sets, and the degree probe."""
    from hipsc_abm_tpu.ops.pallas_contact import (
        compact_mask_bonds,
        contact_substep_ids_to_mask,
        contact_substep_masked,
    )

    locs, radii, alive, spec, grid, packed, bonds = build_inputs(
        rng, seed_bonds=True
    )
    C = packed.shape[0]
    sr = BIO.jkr_radius - 3.0

    # XLA oracle: two band-storage substeps at fixed positions
    g2, pos, valid, _ = nbr.sorted_window(
        spec, jnp.asarray(locs), ids_of(C), jnp.asarray(alive)
    )
    kw = dict(radius=BIO.jkr_radius, adhesion_const=BIO.adhesion_const,
              poisson=BIO.poisson, youngs=BIO.youngs, break_d=BIO.jkr_break_d,
              store_radius=sr)
    f1, b1, _ = jkr_substep(bonds, packed, g2.order, pos, valid, **kw)
    f2, b2, _ = jkr_substep(b1, packed, g2.order, pos, valid, **kw)

    # Pallas: seed (ids -> mask) then one masked substep, both with the band
    order = grid.order
    srt_pack = packed[order].at[:, 6].set(grid.sorted_flat.astype(jnp.float32))
    partners_f = jnp.where(bonds.mask, bonds.partners.astype(jnp.float32), NO_BOND)
    block, chunk = 64, 128
    _, _, span_needed, _ = nbr.block_span_plan(
        spec, grid.sorted_flat, block, span=C, capacity=C, chunk=C
    )
    span = min(int(((int(span_needed) + 127) // 128) * 128), C)
    starts, needs, _, _ = nbr.block_span_plan(
        spec, grid.sorted_flat, block, span=span, capacity=C, chunk=chunk
    )
    pkw = dict(block=block, span=span, run_offs=spec.flat_run_offsets,
               chunk=chunk, interpret=True, **kw)
    fd1, mask1 = contact_substep_ids_to_mask(
        srt_pack, partners_f[order], starts, needs, **pkw
    )
    fd2, mask2 = contact_substep_masked(srt_pack, mask1, starts, needs, **pkw)
    got_bonds = compact_mask_bonds(
        srt_pack, mask2, starts, needs, block=block, span=span,
        run_offs=spec.flat_run_offsets, bond_cap=bonds.partners.shape[1],
        chunk=chunk, interpret=True,
    )

    inv = jnp.zeros((C,), jnp.int32).at[order].set(jnp.arange(C, dtype=jnp.int32))
    np.testing.assert_allclose(
        np.asarray(fd2[inv][:, :3]), np.asarray(f2), rtol=1e-4, atol=1e-13
    )
    exp = np.where(np.asarray(b2.mask), np.asarray(b2.partners), -1)
    got = np.asarray(got_bonds[inv]).astype(np.int64)
    for i in range(C):
        assert set(got[i][got[i] >= 0].tolist()) == set(
            exp[i][exp[i] >= 0].tolist()
        ), i
    np.testing.assert_array_equal(
        np.asarray(fd2[inv][:, 3]).astype(int),
        np.asarray(jnp.sum(b2.mask, axis=1)).astype(int),
    )


def test_compact_mask_overflow_truncates_in_scan_order(rng):
    """More kept mask lanes than ``bond_cap``: the compaction keeps the first
    K in its (chunk, run, lane) scan order and silently drops the rest — the
    engine's degree probe, not the kernel, flags bond-capacity overflow.
    Pins the truncation semantics the max-reduction rewrite must preserve."""
    from hipsc_abm_tpu.ops.pallas_contact import compact_mask_bonds, effective_chunk

    locs, radii, alive, spec, grid, packed, bonds = build_inputs(rng)
    C = packed.shape[0]
    block, chunk, K = 64, 128, 8
    order = grid.order
    srt_pack = packed[order].at[:, 6].set(grid.sorted_flat.astype(jnp.float32))
    _, _, span_needed, _ = nbr.block_span_plan(
        spec, grid.sorted_flat, block, span=C, capacity=C, chunk=C
    )
    span = min(int(((int(span_needed) + 127) // 128) * 128), C)
    starts, chunk_needs, _, _ = nbr.block_span_plan(
        spec, grid.sorted_flat, block, span=span, capacity=C, chunk=chunk
    )
    CS = effective_chunk(span, chunk)
    R = len(spec.flat_run_offsets)
    NC = span // CS

    starts_np = np.asarray(starts)
    needs_np = np.asarray(chunk_needs)
    # pick a block whose run-0 window is active, overflow a row in it
    blk = int(np.argmax(needs_np[0, : C // block] > 0))
    assert needs_np[0, blk] > 0
    row = blk * block  # first sorted row of that block
    n_kept = K + 4
    mask = np.zeros((R, NC, C, CS), np.int8)
    mask[0, 0, row, :n_kept] = 1

    got = np.asarray(
        compact_mask_bonds(
            srt_pack, jnp.asarray(mask), starts, chunk_needs,
            block=block, span=span, run_offs=spec.flat_run_offsets,
            bond_cap=K, chunk=chunk, interpret=True,
        )
    )
    # scan order for one run/chunk is ascending lanes from the block's span
    # start; expected = slot lane of the first K candidates
    slots = np.asarray(srt_pack[:, 4])
    start0 = starts_np[0, blk]
    expect = slots[start0 : start0 + K]
    np.testing.assert_array_equal(got[row], expect)
    # every other row stays empty
    others = np.delete(got, row, axis=0)
    assert np.all(others == -1.0)
