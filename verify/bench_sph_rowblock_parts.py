"""Per-stage breakdown of the rowblock SPH step on the real TPU:
sort_tables, pack, kernel A/B, full step — to find the next floor."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.scenes import base_dam, unidyn_tank
from tpufluids import binning
from tpufluids.sph_pallas import (base_forces_rowblock,
                                  unidyn_forces_rowblock,
                                  _pack_base_by_order,
                                  _pack_unidyn_by_order)
from tpufluids.step import sph_step

def timeit(name, fn, reps=30):
    r = fn()
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.ravel(leaf)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.ravel(leaf)[0])
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms",
          flush=True)

cfg = BASE_CONFIG
s0 = base_dam(cfg)
tables_j = jax.jit(lambda s: binning.sort_tables(s, cfg))
order, bt = tables_j(s0)
timeit("base sort_tables", lambda: tables_j(s0))
pack_j = jax.jit(lambda s, o, b: _pack_base_by_order(s, o, b, 128))
timeit("base pack_by_order", lambda: pack_j(s0, order, bt))
fj = jax.jit(lambda s, o, b: base_forces_rowblock(s, b, cfg, order=o,
                                                  w_chunk=cfg.pallas_w_chunk))
timeit("base rowblock forces (incl pack+unpack)", lambda: fj(s0, order, bt))
step_j = jax.jit(lambda s: sph_step(s, cfg))
timeit("base full step", lambda: step_j(s0))

ucfg = UNIDYN_CONFIG
u0 = unidyn_tank(ucfg)
utab = jax.jit(lambda s: binning.sort_tables(s, ucfg))
uorder, ubt = utab(u0)
timeit("unidyn sort_tables", lambda: utab(u0))
upack = jax.jit(lambda s, o, b: _pack_unidyn_by_order(s, o, b, 128))
timeit("unidyn pack_by_order", lambda: upack(u0, uorder, ubt))
uf = jax.jit(lambda s, o, b: unidyn_forces_rowblock(
    s, b, ucfg, order=o, w_chunk=ucfg.pallas_w_chunk,
    subbin_threshold=ucfg.subbin_threshold))
timeit("unidyn rowblock A+B (incl pack+unpack)", lambda: uf(u0, uorder, ubt))
ustep = jax.jit(lambda s: sph_step(s, ucfg))
timeit("unidyn full step", lambda: ustep(u0), reps=20)
