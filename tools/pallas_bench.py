"""TPU timing harness: Pallas fused contact path vs the XLA substep."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hipsc_jax_cache_tpu")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hipsc_abm_tpu.engine import HipscEngine
from hipsc_abm_tpu.models.params import BiologyParams, ExperimentalParams, GeneralParams
from hipsc_abm_tpu.ops import neighbors as nbr
from hipsc_abm_tpu.ops.jkr import jkr_substep, pack_physics
from hipsc_abm_tpu.ops.pallas_contact import (
    NO_BOND,
    contact_substep_pallas,
)

BIO = BiologyParams()
n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
# box scaled to the reference default density (5k cells / 2000 um square)
side = 2000.0 * (n / 5000.0) ** 0.5
gen = GeneralParams(num_to_start=n, end_step=10, size=(side, side, 0.0))
xp = ExperimentalParams(num_gata6=n // 10, dox_step=5)
eng = HipscEngine(gen, xp)
s = eng.init_state(0)
for _ in range(2):
    s, _ = eng.safe_step(s)
float(jnp.sum(s.arrays["locations"]))
C = eng.cfg.capacity
spec = eng.cfg.jkr_spec
locs, radii, alive = s.arrays["locations"], s.arrays["radii"], s.alive
ids = s.arrays["ids"]
bonds = s.bonds
BLOCK = 128


@functools.partial(jax.jit, static_argnums=(4,))
def pallas_path(locs, radii, alive, bonds, span):
    grid = nbr.build_grid(spec, locs, ids, alive)
    flat_slot = nbr.flat_bin_ids(spec, locs, alive)
    packed = pack_physics(locs, radii, ids, alive, flat_slot)
    srt_pack = packed[grid.order]
    partners_f = jnp.where(bonds.mask, bonds.partners.astype(jnp.float32), NO_BOND)
    srt_bonds = partners_f[grid.order]
    starts, chunk_needs, need, _ = nbr.block_span_plan(
        spec, grid.sorted_flat, BLOCK, span=span, capacity=C, chunk=256)
    fd, nb = contact_substep_pallas(
        srt_pack, srt_bonds, starts, chunk_needs,
        block=BLOCK, span=span, run_offs=spec.flat_run_offsets, radius=BIO.jkr_radius,
        adhesion_const=BIO.adhesion_const, poisson=BIO.poisson,
        youngs=BIO.youngs, break_d=BIO.jkr_break_d,
    )
    inv = jnp.zeros((C,), jnp.int32).at[grid.order].set(jnp.arange(C, dtype=jnp.int32))
    return fd[inv], nb[inv], need


grid = nbr.build_grid(spec, locs, ids, alive)

_, _, need, _ = nbr.block_span_plan(spec, grid.sorted_flat, BLOCK, span=min(C, 4096), capacity=C, chunk=min(C, 4096))
SPAN = int((int(need) + 127) // 128 * 128)
print("span needed:", int(need), "-> S =", SPAN)

fd, nb, _ = pallas_path(locs, radii, alive, bonds, SPAN)
float(jnp.sum(fd))
t0 = time.perf_counter()
for _ in range(20):
    fd, nb, _ = pallas_path(locs, radii, alive, bonds, SPAN)
float(jnp.sum(fd))
print("pallas full path (incl sort+bounds+unsort):",
      round((time.perf_counter() - t0) / 20 * 1000, 2), "ms")

g2, pos, valid, _ = jax.jit(functools.partial(nbr.sorted_window, spec))(locs, ids, alive)
packed = pack_physics(locs, radii, ids, alive)
jk = jax.jit(functools.partial(
    jkr_substep, radius=BIO.jkr_radius, adhesion_const=BIO.adhesion_const,
    poisson=BIO.poisson, youngs=BIO.youngs, break_d=BIO.jkr_break_d))
f_x, b_x, deg = jk(bonds, packed, g2.order, pos, valid)
t0 = time.perf_counter()
for _ in range(20):
    f_x2, b_x2, _ = jk(bonds, packed, g2.order, pos, valid)
float(jnp.sum(f_x2))
print("xla substep only (window prebuilt):",
      round((time.perf_counter() - t0) / 20 * 1000, 2), "ms")
err = np.abs(np.asarray(fd[:, :3]) - np.asarray(f_x)).max()
print("max force diff:", err)
