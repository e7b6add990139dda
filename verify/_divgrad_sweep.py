import os, sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.grid import pallas_kernels as pk

n = 256
shape = (n + 2,) * 3
key = jax.random.PRNGKey(0)
u, v, w, x = (jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32)
              for i in range(4))

def timeit(name, fn, reps=30):
    r = fn(); float(jnp.ravel(r[0] if isinstance(r, tuple) else r)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    float(jnp.ravel(r[0] if isinstance(r, tuple) else r)[0])
    print(f"{name:32s} {(time.perf_counter()-t0)/reps*1e3:7.2f} ms", flush=True)

for tx in (16, 32, 64):
    timeit(f"div tx={tx}", lambda tx=tx: pk.div3d_pallas(u, v, w, tx=tx))
for tx in (16, 24, 48):
    timeit(f"gradsub tx={tx}", lambda tx=tx: pk.gradsub3d_pallas(x, u, v, w, tx=tx))
