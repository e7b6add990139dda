"""Per-stage breakdown of the SPH step at large pool sizes: where does
the per-particle cost growth (192 ns/p at 131k -> 252 ns/p at 524k,
verify/bench_sph_scaling_ab.py) come from — the packed-key sort, the
run-table build, the row-block pack, or the force kernels?

    python verify/bench_sph_bigpool_parts.py [n ...]   (default 131072 524288)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.config import BASE_CONFIG
from tpufluids import binning
from tpufluids.binning import suggest_col_cap
from tpufluids.sph_pallas import (base_forces_pallas,
                                  base_forces_rowblock,
                                  _pack_base_by_order)
from tpufluids.state import make_state
from tpufluids.step import sph_step


def timeit(name, fn, reps=20):
    r = fn()
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.ravel(leaf)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.ravel(leaf)[0])
    print(f"{name:46s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms",
          flush=True)


sizes = [int(a) for a in sys.argv[1:]] or [131072, 524288]
for n in sizes:
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)), jnp.float32)
    s0 = make_state(pos, cfg=BASE_CONFIG)
    cap = suggest_col_cap(s0, BASE_CONFIG)
    print(f"--- n={n}, col_cap={cap}", flush=True)

    tables_j = jax.jit(lambda s: binning.sort_tables(s, BASE_CONFIG))
    order, bt = tables_j(s0)
    timeit(f"n={n} sort_tables", lambda: tables_j(s0))

    pack_j = jax.jit(lambda s, o, b: _pack_base_by_order(s, o, b, 128))
    timeit(f"n={n} pack_by_order", lambda: pack_j(s0, order, bt))

    rb_j = jax.jit(lambda s, o, b: base_forces_rowblock(
        s, b, BASE_CONFIG, order=o,
        w_chunk=BASE_CONFIG.pallas_w_chunk))
    timeit(f"n={n} rowblock forces (incl pack+unpack)",
           lambda: rb_j(s0, order, bt))

    cfg_col = BASE_CONFIG.replace(pallas_kernel="column",
                                  pallas_col_cap=cap)
    sc, btc = jax.jit(lambda s: binning.sort_by_cell(s, cfg_col))(s0)
    # b/w_cap must carry the derived cap — the dispatch path passes
    # cfg.pallas_col_cap; the parameter default (128) silently
    # overflows at these densities and undertimes the kernel
    col_j = jax.jit(lambda s, t: base_forces_pallas(
        s, t, cfg_col, b=cap, w_cap=cap,
        w_chunk=cfg_col.pallas_w_chunk))
    timeit(f"n={n} column forces (on sorted state)",
           lambda: col_j(sc, btc))

    for fam in ("rowblock", "column"):
        cfg = BASE_CONFIG.replace(pallas_kernel=fam)
        if fam == "column":
            cfg = cfg.replace(pallas_col_cap=cap)
        step_j = jax.jit(lambda s, cfg=cfg: sph_step(s, cfg))
        timeit(f"n={n} full step ({fam})", lambda: step_j(s0))
