import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.grid import pallas_kernels as pk

n = 256
shape = (n + 2,) * 3
key = jax.random.PRNGKey(0)
x0 = jax.random.normal(key, shape, jnp.float32)
z = jnp.zeros(shape, jnp.float32)

def timeit(name, fn, reps=10):
    r = fn(); float(r[1,1,1])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    float(r[1,1,1])
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)

for tx, fuse, pipe in [(24,4,True),(24,2,True),(32,4,True)]:
    try:
        f = jax.jit(lambda x0, tx=tx, fuse=fuse, pipe=pipe: pk.lin_solve3d_rb_packed(
            0, z, x0, 1.0, 6.0, 20, tx=tx, fuse=fuse, pipeline=pipe))
        timeit(f"rb tx={tx} fuse={fuse} pipe={pipe}", lambda: f(x0))
    except Exception as e:
        print(f"rb tx={tx} fuse={fuse}: FAIL {str(e)[:100]}", flush=True)
