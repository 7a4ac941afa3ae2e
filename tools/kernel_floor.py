"""Decompose the masked contact kernel's time at 500k into per-program
overhead vs lane work vs mask-block I/O, and sweep the block size.

  real:      actual span plan               (baseline, = in-engine cost)
  noop:      chunk_needs forced to 0        (pure per-program + block-I/O floor)
  nomask:    real needs, mask input replaced by a (C, 8) dummy — isolates the
             (B, R*span) int8 mask auto-DMA cost        [seed kernel, no mask in]
  blockN:    real needs at block size N

Usage: python tools/kernel_floor.py [n]
"""
import sys, time, functools
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hipsc_abm_tpu.engine import HipscEngine
from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams
from hipsc_abm_tpu.ops import neighbors as nbr_ops
from hipsc_abm_tpu.ops.jkr import pack_physics
from hipsc_abm_tpu.ops.pallas_contact import (
    NO_BOND, contact_substep_ids_to_mask, contact_substep_masked,
    compact_mask_bonds,
)


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1000:9.2f} ms")
    return out


def main(n=500_000):
    side = 2000.0 * (n / 5000.0) ** 0.5
    gen = GeneralParams(num_to_start=n, end_step=10, size=(side, side, 0.0))
    xp = ExperimentalParams(num_gata6=n // 10, dox_step=5)
    eng = HipscEngine(gen, xp)
    s = eng.init_state(0)
    for _ in range(2):
        s, _ = eng.safe_step(s)
    cfg, bio = eng.cfg, eng.bio
    C = cfg.capacity
    spec = cfg.jkr_spec
    locs, radii, alive, ids = (s.arrays["locations"], s.arrays["radii"],
                               s.alive, s.arrays["ids"])
    grid = nbr_ops.build_grid(spec, locs, ids, alive)
    flat_slot = nbr_ops.flat_bin_ids(spec, locs, alive)
    srt_pack = pack_physics(locs, radii, ids, alive, flat_slot)[grid.order]
    srt_bonds = jnp.full((C, cfg.bond_cap), NO_BOND, jnp.float32)

    def kw(block, chunk=None):
        return dict(block=block, span=cfg.jkr_span,
                    run_offs=spec.flat_run_offsets, radius=bio.jkr_radius,
                    adhesion_const=bio.adhesion_const, poisson=bio.poisson,
                    youngs=bio.youngs, break_d=bio.jkr_break_d,
                    chunk=chunk or cfg.pallas_chunk,
                    uniform_radius=cfg.uniform_radius)

    def plan(block):
        return nbr_ops.block_span_plan(
            spec, grid.sorted_flat, block, cfg.jkr_span, C, cfg.pallas_chunk)

    starts, needs, _, _ = jax.jit(functools.partial(plan, cfg.pallas_block))()

    # seed a mask
    _, mask = jax.jit(lambda a, b, c, d: contact_substep_ids_to_mask(
        a, b, c, d, **kw(cfg.pallas_block)))(srt_pack, srt_bonds, starts, needs)

    nblocks = C // cfg.pallas_block
    print(f"C={C} blocks={nblocks} span={cfg.jkr_span} chunk={cfg.pallas_chunk} "
          f"mean_chunks/run={float(jnp.mean(needs[:3].astype(jnp.float32))):.2f}")

    timeit("masked real", jax.jit(lambda a, m, c, d: contact_substep_masked(
        a, m, c, d, **kw(cfg.pallas_block))), srt_pack, mask, starts, needs)
    zneeds = jnp.zeros_like(needs)
    timeit("masked noop (needs=0)", jax.jit(
        lambda a, m, c, d: contact_substep_masked(
            a, m, c, d, **kw(cfg.pallas_block))), srt_pack, mask, starts, zneeds)
    timeit("seed real (no mask input)", jax.jit(
        lambda a, b, c, d: contact_substep_ids_to_mask(
            a, b, c, d, **kw(cfg.pallas_block))), srt_pack, srt_bonds, starts, needs)
    timeit("seed noop", jax.jit(
        lambda a, b, c, d: contact_substep_ids_to_mask(
            a, b, c, d, **kw(cfg.pallas_block))), srt_pack, srt_bonds, starts, zneeds)
    timeit("compact real", jax.jit(
        lambda a, m, c, d: compact_mask_bonds(
            a, m, c, d, block=cfg.pallas_block, span=cfg.jkr_span,
            run_offs=spec.flat_run_offsets, bond_cap=cfg.bond_cap,
            chunk=cfg.pallas_chunk)), srt_pack, mask, starts, needs)

    for block in (256, 384, 512):
        if C % block:
            continue
        st_b, nd_b, _, _ = jax.jit(functools.partial(plan, block))()
        _, mask_b = jax.jit(lambda a, b, c, d, bl=block: contact_substep_ids_to_mask(
            a, b, c, d, **kw(bl)))(srt_pack, srt_bonds, st_b, nd_b)
        timeit(f"masked block={block}", jax.jit(
            lambda a, m, c, d, bl=block: contact_substep_masked(
                a, m, c, d, **kw(bl))), srt_pack, mask_b, st_b, nd_b)
        timeit(f"seed block={block}", jax.jit(
            lambda a, b, c, d, bl=block: contact_substep_ids_to_mask(
                a, b, c, d, **kw(bl))), srt_pack, srt_bonds, st_b, nd_b)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000)
