"""A/B the column family's z-band tile skip at large pools: full
sph_step with h_chunk=128, z_skip off vs on, interleaved in one
process (CLAUDE.md: tunnel variance demands same-process A/B).

The uniform fill's columns span the full z extent, so each home chunk
is stencil-adjacent to only a few window chunks — z_skip turns the
rest into lax.cond skips (sph_pallas._make_base_body_hc).

    python verify/bench_sph_zskip_ab.py [n ...]   (default 524288)
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
from tpufluids.binning import suggest_col_cap
from tpufluids.state import make_state
from tpufluids.step import sph_step


def timeit(name, fn, reps=20):
    r = fn()
    float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    print(f"{name:44s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms",
          flush=True)


sizes = [int(a) for a in sys.argv[1:]] or [524288, 131072]
for n in sizes:
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)), jnp.float32)
    s0 = make_state(pos, cfg=BASE_CONFIG)
    cap = suggest_col_cap(s0, BASE_CONFIG)
    print(f"--- n={n}, col_cap={cap}", flush=True)
    steps = {}
    for fam in ("column", "rowblock"):
        for zs in (0, 1):
            cfg = BASE_CONFIG.replace(pallas_kernel=fam,
                                      pallas_col_cap=cap,
                                      pallas_h_chunk=128,
                                      pallas_z_skip=zs)
            steps[(fam, zs)] = jax.jit(lambda s, cfg=cfg: sph_step(s, cfg))
            steps[(fam, zs)](s0)  # compile
    outs = {}
    for rep in range(2):  # interleave
        for (fam, zs), f in steps.items():
            timeit(f"n={n} full step ({fam}, z_skip={zs})",
                   lambda f=f: f(s0))
            outs[(fam, zs)] = f(s0)
    for fam in ("column", "rowblock"):
        same = bool((outs[(fam, 1)][0].pos == outs[(fam, 0)][0].pos)
                    .all())
        ovf = int(jnp.max(outs[(fam, 1)][1].bin_overflow))
        print(f"{fam} z_skip pos match: {same}; overflow {ovf}",
              flush=True)
