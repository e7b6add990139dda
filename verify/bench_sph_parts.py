import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from tpufluids.config import BASE_CONFIG
from tpufluids.scenes import base_dam
from tpufluids import binning
from tpufluids.sph_pallas import base_forces_pallas
from tpufluids.step import sph_step

cfg = BASE_CONFIG
s0 = base_dam(cfg)

def timeit(name, fn, reps=20):
    r = fn()
    jax.tree_util.tree_map(lambda a: a.block_until_ready() if hasattr(a, 'block_until_ready') else a, r)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.ravel(leaf)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.ravel(leaf)[0])
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)

sort_j = jax.jit(lambda s: binning.sort_by_cell(s, cfg, runs=False))
ss, bt = sort_j(s0)
timeit("sort_by_cell (argsort + SoA gather)", lambda: sort_j(s0))

forces_j = jax.jit(lambda ss, bt: base_forces_pallas(ss, bt, cfg, b=cfg.pallas_col_cap, w_cap=cfg.pallas_col_cap))
timeit("base_forces_pallas (cap 128)", lambda: forces_j(ss, bt))
forces64 = jax.jit(lambda ss, bt: base_forces_pallas(ss, bt, cfg, b=64, w_cap=64))
timeit("base_forces_pallas (cap 64)", lambda: forces64(ss, bt))

step_j = jax.jit(lambda s: sph_step(s, cfg))
timeit("full sph_step", lambda: step_j(s0))

# --- round 2: sort_tables (no-repermute) mode --------------------------
tables_j = jax.jit(lambda s: binning.sort_tables(s, cfg))
order, bt2 = tables_j(s0)
timeit("sort_tables (no pool permute)", lambda: tables_j(s0))

from tpufluids.sph_pallas import _pack_base_by_order
pack_j = jax.jit(lambda s, o, b: _pack_base_by_order(s, o, b, cfg.pallas_col_cap))
timeit("pack_base_by_order", lambda: pack_j(s0, order, bt2))

forces_o = jax.jit(lambda s, o, b: base_forces_pallas(
    s, b, cfg, b=cfg.pallas_col_cap, w_cap=cfg.pallas_col_cap, order=o))
timeit("base_forces_pallas (order mode)", lambda: forces_o(s0, order, bt2))

from tpufluids.config import UNIDYN_CONFIG
from tpufluids.scenes import unidyn_tank
ucfg = UNIDYN_CONFIG
u0 = unidyn_tank(ucfg)
ustep = jax.jit(lambda s: sph_step(s, ucfg))
timeit("full unidyn sph_step (subbin default)", lambda: ustep(u0), reps=10)
