import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import time, functools
import jax, jax.numpy as jnp
from tpufluids.grid import stam

n = 256
cfg = stam.StamConfig(n=n, dt=0.05, jacobi_iters=20, red_black=True,
                      vorticity_eps=2.0, buoyancy_alpha=0.05,
                      buoyancy_beta=0.5)
key = jax.random.PRNGKey(0)
shape = (n + 2, n + 2, n + 2)
u, v, w = (jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32) * 0.1
           for i in range(3))

proj = jax.jit(lambda u, v, w: stam.project3d(u, v, w, cfg))
outs = proj(u, v, w)
jax.block_until_ready(outs)
float(outs[0][1,1,1])

def timeit(name, fn, reps=10):
    fn(); r = fn()
    float(r[0][1,1,1] if isinstance(r, tuple) else r[1,1,1])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    float(r[0][1,1,1] if isinstance(r, tuple) else r[1,1,1])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:45s} {dt:8.2f} ms", flush=True)

timeit("project3d (full)", lambda: proj(u, v, w))

from tpufluids.grid import pallas_kernels as pk
div = pk.div3d_pallas(u, v, w)
tx, fuse, pipe = pk.rb_packed_plan(div.shape, 20)
print("plan:", tx, fuse, pipe)
solve = jax.jit(lambda d: pk.lin_solve3d_rb_packed(0, jnp.zeros_like(d), d, 1.0, 6.0, 20, tx=tx, fuse=fuse, pipeline=pipe))
timeit("div3d", lambda: pk.div3d_pallas(u, v, w))
timeit("rb solve (planned)", lambda: solve(div))
p = solve(div)
timeit("gradsub3d", lambda: pk.gradsub3d_pallas(p, u, v, w))
