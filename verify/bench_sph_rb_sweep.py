"""Sweep row-block kernel (rb, w_chunk) on the real TPU, interleaved.
The force call is timed in isolation (jit of forces only, repeated on
fixed inputs -> throughput) AND as the full step latency chain."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.scenes import base_dam, unidyn_tank
from tpufluids import binning
from tpufluids.sph_pallas import (base_forces_rowblock,
                                  unidyn_forces_rowblock)

GRID = [(128, 16), (128, 32), (128, 64), (256, 32), (256, 64),
        (384, 32), (256, 128)]

cfg = BASE_CONFIG
s0 = base_dam(cfg)
order, bt = jax.jit(lambda s: binning.sort_tables(s, cfg))(s0)
ucfg = UNIDYN_CONFIG
u0 = unidyn_tank(ucfg)
uorder, ubt = jax.jit(lambda s: binning.sort_tables(s, ucfg))(u0)

def timeit(fn, reps):
    r = fn()
    float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    return (time.perf_counter() - t0) / reps * 1e3

fns = {}
for rb, ch in GRID:
    fns[("base", rb, ch)] = jax.jit(
        lambda o, b, rb=rb, ch=ch: base_forces_rowblock(
            s0, b, cfg, order=o, w_chunk=ch, rb=rb))
    fns[("uni", rb, ch)] = jax.jit(
        lambda o, b, rb=rb, ch=ch: unidyn_forces_rowblock(
            u0, b, ucfg, order=o, w_chunk=ch, rb=rb,
            subbin_threshold=ucfg.subbin_threshold))

# compile all first (one-time), then interleave 3 rounds
for k, f in fns.items():
    a = (order, bt) if k[0] == "base" else (uorder, ubt)
    r = f(*a)
    float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    print("compiled", k, flush=True)

res = {k: [] for k in fns}
for rnd in range(3):
    for k, f in fns.items():
        a = (order, bt) if k[0] == "base" else (uorder, ubt)
        res[k].append(timeit(lambda: f(*a), 20))
for k in sorted(res):
    v = sorted(res[k])[1]
    print(f"{k[0]:5s} rb={k[1]:3d} ch={k[2]:3d}: {v:7.2f} ms", flush=True)
