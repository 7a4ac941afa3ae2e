"""Phase-level profile of the fused step at large scale on the real TPU.

Times the full step plus each hot component in isolation, so optimization
targets are measured instead of guessed. Forces completion with a scalar
fetch (block_until_ready is unreliable through tunneled TPU backends).

Usage: python tools/profile_500k.py [n_cells]
"""
import sys, time, functools
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hipsc_abm_tpu.engine import HipscEngine, hipsc_step
from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams
from hipsc_abm_tpu.ops import neighbors as nbr_ops
from hipsc_abm_tpu.ops.jkr import pack_physics
from hipsc_abm_tpu.ops.pallas_contact import contact_substep_pallas, NO_BOND
from hipsc_abm_tpu.ops.pallas_bio import bio_reduce_pallas
from hipsc_abm_tpu.ops.integrate import stokes_integrate


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1000:9.2f} ms")
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
    locs, radii, alive = s.arrays["locations"], s.arrays["radii"], s.alive
    ids = s.arrays["ids"]
    C = cfg.capacity
    print(f"capacity {C}  jkr run_cap {cfg.jkr_spec.run_cap}  nbr run_cap "
          f"{cfg.nbr_spec.run_cap}  K {cfg.bond_cap}  jkr_span {cfg.jkr_span} "
          f"nbr_span {cfg.nbr_span}  pallas {cfg.use_pallas}")

    full = jax.jit(lambda st: hipsc_step(st, cfg=cfg, gen=gen, xp=xp, bio=bio, diff=None)[0])
    timeit("FULL STEP", full, s, reps=5)

    spec = cfg.jkr_spec
    grid = timeit("build_grid(jkr) [argsort]", jax.jit(functools.partial(nbr_ops.build_grid, spec)), locs, ids, alive)
    starts, cneeds, _, _ = timeit("block_span_plan", jax.jit(functools.partial(
        nbr_ops.block_span_plan, spec, block=cfg.pallas_block, span=cfg.jkr_span,
        capacity=C, chunk=cfg.pallas_chunk)), grid.sorted_flat)

    flat_slot = nbr_ops.flat_bin_ids(spec, locs, alive)
    packed = jax.jit(pack_physics)(locs, radii, ids, alive, flat_slot)
    timeit("pack_physics (elementwise)", jax.jit(pack_physics), locs, radii, ids, alive, flat_slot)
    timeit("packed[order] row gather (C,8)", jax.jit(lambda p, o: p[o]), packed, grid.order)
    srt_pack = packed[grid.order]
    srt_bonds = jnp.full((C, cfg.bond_cap), NO_BOND, jnp.float32)
    kw = dict(block=cfg.pallas_block, span=cfg.jkr_span,
              run_offs=spec.flat_run_offsets, radius=bio.jkr_radius,
              adhesion_const=bio.adhesion_const, poisson=bio.poisson,
              youngs=bio.youngs, break_d=bio.jkr_break_d,
              chunk=cfg.pallas_chunk, uniform_radius=cfg.uniform_radius)
    from hipsc_abm_tpu.ops.pallas_contact import (
        compact_mask_bonds, contact_substep_ids_to_mask, contact_substep_masked)
    timeit("contact ids kernel (domain path)", jax.jit(
        lambda a, b, c, d: contact_substep_pallas(a, b, c, d, **kw)),
        srt_pack, srt_bonds, starts, cneeds)
    _, mask = timeit("contact seed (ids->mask, rebuilds)", jax.jit(
        lambda a, b, c, d: contact_substep_ids_to_mask(a, b, c, d, **kw)),
        srt_pack, srt_bonds, starts, cneeds)
    timeit("contact masked substep (hot path)", jax.jit(
        lambda a, m, c, d: contact_substep_masked(a, m, c, d, **kw)),
        srt_pack, mask, starts, cneeds)
    ckw = dict(block=cfg.pallas_block, span=cfg.jkr_span,
               run_offs=spec.flat_run_offsets, bond_cap=cfg.bond_cap,
               chunk=cfg.pallas_chunk)
    timeit("compact mask->ids (rebuilds)", jax.jit(
        lambda a, m, c, d: compact_mask_bonds(a, m, c, d, **ckw)),
        srt_pack, mask, starts, cneeds)
    timeit("stokes_integrate (elementwise)", jax.jit(functools.partial(
        stokes_integrate, stokes=bio.stokes, size=jnp.asarray(gen.size), dt=180.0)),
        locs, radii, s.arrays["jkr_forces"], s.arrays["motility_forces"], alive)

    nspec = cfg.nbr_spec
    ngrid = timeit("build_grid(nbr) [argsort]", jax.jit(functools.partial(nbr_ops.build_grid, nspec)), locs, ids, alive)
    nstarts, nneeds, _, _ = jax.jit(functools.partial(
        nbr_ops.block_span_plan, nspec, block=cfg.pallas_block, span=cfg.nbr_span,
        capacity=C, chunk=cfg.pallas_chunk))(ngrid.sorted_flat)
    nflat = nbr_ops.flat_bin_ids(nspec, locs, alive).astype(jnp.float32)
    bio_pack = jnp.concatenate([locs[:, :2], locs[:, :2],
                                jnp.zeros((C, 3), jnp.float32),
                                nflat[:, None]], axis=1)
    timeit("bio pack[order] gather (C,8)", jax.jit(lambda p, o: p[o]), bio_pack, ngrid.order)
    srt_bio = bio_pack[ngrid.order]
    def run_bio(sp, st, cn):
        return bio_reduce_pallas(
            sp, st, cn, block=cfg.pallas_block, span=cfg.nbr_span,
            ny=nspec.ny, num_bins=nspec.num_bins,
            radius=bio.neighbor_radius, chunk=cfg.pallas_chunk)
    out = timeit("bio_reduce_pallas", jax.jit(run_bio),
                 srt_bio, nstarts, nneeds)
    inv = jnp.zeros((C,), jnp.int32).at[ngrid.order].set(jnp.arange(C, dtype=jnp.int32))
    timeit("moments out[inv] gather (C,16)", jax.jit(lambda o, i: o[i]), out, inv)

    # how often does the Verlet window rebuild inside the scan? (probe via
    # the count of argsort-sized sorts is invisible; instead report drift)
    print("\nper-step budget: 1 nbr grid + 3-4 bio invocations + 11 physics "
          "substeps (+ rebuilds)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000)
