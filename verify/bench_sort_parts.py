import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from tpufluids.config import BASE_CONFIG
from tpufluids.scenes import base_dam
from tpufluids import binning

cfg = BASE_CONFIG
s = base_dam(cfg)
cid, _ = binning.cell_id(s.pos, s.alive, cfg, None)
n = cid.shape[0]
num_cells = cfg.grid_size ** 3

def timeit(name, fn, reps=30):
    r = fn(); float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)

argsort_j = jax.jit(lambda c: jnp.argsort(c, stable=True))
order = argsort_j(cid)
timeit("argsort 8192 keys", lambda: argsort_j(cid))

gather_j = jax.jit(lambda s, o: jax.tree_util.tree_map(lambda a: a[o], s))
timeit("tree gather (15 arrays)", lambda: gather_j(s, order))

scid = cid[order]
ss_j = jax.jit(lambda c: jnp.searchsorted(c, jnp.arange(num_cells + 2, dtype=c.dtype), side="left").astype(jnp.int32))
timeit("searchsorted cell_start (64002 queries)", lambda: ss_j(scid))

def cs_scatter(c):
    counts = jnp.zeros(num_cells + 2, jnp.int32).at[jnp.clip(c, 0, num_cells + 1)].add(1)
    return jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts[:-1])]).astype(jnp.int32)
cs_j = jax.jit(cs_scatter)
a = ss_j(scid); b = cs_j(scid)
print("scatter cell_start matches searchsorted:", bool(jnp.array_equal(a, b)), flush=True)
timeit("scatter+cumsum cell_start", lambda: cs_j(scid))
