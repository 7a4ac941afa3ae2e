"""Per-phase timing of the fused step with fetch-forced completion.

Usage: python tools/profile_step.py [n_cells]
(block_until_ready is unreliable through tunneled TPU backends; every
measurement here forces with a scalar device fetch.)
"""
import sys, time, functools
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hipsc_abm_tpu.engine import HipscEngine, hipsc_step, _physics_dts
from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams
from hipsc_abm_tpu.ops import neighbors as nbr_ops
from hipsc_abm_tpu.ops.jkr import BondState, jkr_substep, pack_physics, _compact_bonds, _is_bonded, _pair_jkr
from hipsc_abm_tpu.ops.integrate import stokes_integrate


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: jnp.sum(x).block_until_ready(), out)
    # force with a scalar fetch
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(sum(float(jnp.sum(l.astype(jnp.float32))) for l in leaves[:1]))
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1000:8.2f} ms")
    return out


def main(n=10000):
    gen = GeneralParams(num_to_start=n, end_step=10, size=(2000.0, 2000.0, 0.0))
    xp = ExperimentalParams(num_gata6=n // 10, dox_step=5)
    eng = HipscEngine(gen, xp)
    s = eng.init_state(0)
    for _ in range(2):
        s, _ = eng.safe_step(s)
    cfg, bio = eng.cfg, eng.bio
    locs, radii, alive = s.arrays["locations"], s.arrays["radii"], s.alive
    ids = s.arrays["ids"]
    print("capacity", cfg.capacity, "jkr W", cfg.jkr_spec.window, "nbr W", cfg.nbr_spec.window, "K", cfg.bond_cap)

    full = jax.jit(lambda st: hipsc_step(st, cfg=cfg, gen=gen, xp=xp, bio=bio, diff=None)[0])
    timeit("full step", full, s, reps=5)

    spec = cfg.jkr_spec
    timeit("build_grid(jkr)", jax.jit(functools.partial(nbr_ops.build_grid, spec)), locs, ids, alive)
    timeit("sorted_window(jkr)", jax.jit(functools.partial(nbr_ops.sorted_window, spec)), locs, ids, alive)
    grid, pos, valid, _ = jax.jit(functools.partial(nbr_ops.sorted_window, spec))(locs, ids, alive)
    packed = pack_physics(locs, radii, ids, alive)
    bonds = s.bonds

    timeit("jkr_substep", jax.jit(functools.partial(
        jkr_substep, radius=bio.jkr_radius, adhesion_const=bio.adhesion_const,
        poisson=bio.poisson, youngs=bio.youngs, break_d=bio.jkr_break_d)),
        bonds, packed, grid.order, pos, valid)

    sorted_pack = packed[grid.order]
    timeit("window gather (C,W,8)", jax.jit(lambda sp, p: sp[p]), sorted_pack, pos)
    timeit("compact top_k", jax.jit(functools.partial(_compact_bonds, bond_cap=cfg.bond_cap)),
           jnp.zeros(pos.shape, jnp.int32), valid)
    timeit("is_bonded", jax.jit(_is_bonded), bonds, jnp.zeros(pos.shape, jnp.int32))

    nspec = cfg.nbr_spec
    timeit("neighbor_search(15)", jax.jit(functools.partial(nbr_ops.neighbor_search, nspec, radius=15.0)), locs, alive)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10000)
