import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.grid import pallas_kernels as pk

n = 256
shape = (n + 2,) * 3
key = jax.random.PRNGKey(0)
u, v, w, d, t_ = (jax.random.normal(jax.random.fold_in(key, i), shape,
                                    jnp.float32) * 0.1 for i in range(5))

def timeit(name, fn, reps=25):
    r = fn(); float(jnp.ravel(r[0])[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    float(jnp.ravel(r[0])[0])
    print(f"{name:28s} {(time.perf_counter()-t0)/reps*1e3:7.2f} ms", flush=True)

for tx in (8, 12, 16, 24):
    timeit(f"forcing tx={tx}",
           lambda tx=tx: pk.forcing3d_pallas(u, v, w, d, t_, 0.002,
                                             1.0 / n, 2.0, 0.05, 0.5,
                                             0.0, tx=tx))
