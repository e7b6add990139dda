"""A/B the column family's home-lane chunking at large pools: full
sph_step, h_chunk 0 (whole-cap tiles) vs 64/128, interleaved in one
process (CLAUDE.md: tunnel variance demands same-process A/B).

    python verify/bench_sph_hchunk_ab.py [n ...]   (default 524288)
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
    print(f"{name:40s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms",
          flush=True)


sizes = [int(a) for a in sys.argv[1:]] or [524288]
for n in sizes:
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)), jnp.float32)
    s0 = make_state(pos, cfg=BASE_CONFIG)
    cap = suggest_col_cap(s0, BASE_CONFIG)
    print(f"--- n={n}, col_cap={cap}", flush=True)
    steps = {}
    for hc in (0, 64, 128):
        cfg = BASE_CONFIG.replace(pallas_kernel="column",
                                  pallas_col_cap=cap, pallas_h_chunk=hc)
        steps[hc] = jax.jit(lambda s, cfg=cfg: sph_step(s, cfg))
        steps[hc](s0)  # compile
    outs = {}
    for rep in range(2):  # interleave
        for hc, f in steps.items():
            timeit(f"n={n} full step (column, h_chunk={hc})",
                   lambda f=f: f(s0))
            outs[hc] = f(s0)
    base_pos = outs[0][0].pos
    for hc in (64, 128):
        same = bool((outs[hc][0].pos == base_pos).all())
        print(f"h_chunk={hc} bitwise pos match vs 0: {same}", flush=True)
