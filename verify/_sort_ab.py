import os, sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

rng = np.random.default_rng(0)
for n, cells in ((8192, 64001), (16384, 4914)):
    # (131072, 64001) overflows the int32 packed key - the production
    # path gates on (num_cells+1)*n <= 2^31 and falls back to argsort
    cid = jnp.asarray(rng.integers(0, cells, n), jnp.int32)
    f1 = jax.jit(lambda c: jnp.argsort(c, stable=True))
    f2 = jax.jit(lambda c, n=n: jnp.sort(c * n + jnp.arange(n, dtype=jnp.int32)) % n)
    a, b = f1(cid), f2(cid)
    assert bool(jnp.array_equal(a, b))
    for name, f in (("argsort", f1), ("packedkey", f2)):
        r = f(cid); int(r[0])
        t0 = time.perf_counter()
        for _ in range(40):
            r = f(cid)
        int(r[0])
        print(f"n={n} {name:10s} {(time.perf_counter()-t0)/40*1e3:6.2f} ms", flush=True)
