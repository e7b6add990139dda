import os, sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.grid import stam
from tpufluids.grid import pallas_kernels as pk

n = 256
cfg = stam.StamConfig(n=n, dt=0.05, jacobi_iters=20, red_black=True)
key = jax.random.PRNGKey(0)
shape = (n + 2,) * 3
u, v, w = (jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32) * 0.1
           for i in range(3))

def timeit(name, fn, reps=12):
    r = fn(); float(jnp.ravel(r[0] if isinstance(r, tuple) else r)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    float(jnp.ravel(r[0] if isinstance(r, tuple) else r)[0])
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1e3:7.2f} ms", flush=True)

proj = jax.jit(lambda u, v, w: stam.project3d(u, v, w, cfg))
timeit("project3d (div inside)", lambda: proj(u, v, w))

def proj_nodiv(u, v, w, div):
    tx, fuse, pipe = pk.rb_packed_plan(div.shape, 20)
    p = pk.lin_solve3d_rb_packed(0, jnp.zeros_like(div), div, 1.0, 6.0, 20,
                                 tx=tx, fuse=fuse, pipeline=pipe, x_zero=True)
    return pk.gradsub3d_pallas(p, u, v, w)
pn = jax.jit(proj_nodiv)
div = pk.div3d_pallas(u, v, w)
timeit("project3d minus div call", lambda: pn(u, v, w, div))
