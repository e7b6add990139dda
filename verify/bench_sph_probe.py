import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from tpufluids.config import BASE_CONFIG
from tpufluids.scenes import base_dam
from tpufluids.step import run_python

s0 = base_dam(BASE_CONFIG)
s, m = run_python(s0, BASE_CONFIG, 2)
float(s.pos[0, 0])

for steps in (30, 120):
    s = s0
    t0 = time.perf_counter()
    s, m = run_python(s, BASE_CONFIG, steps)
    float(s.pos[0, 0])
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"base_dam {steps} steps: {dt:.2f} ms/step", flush=True)

# dispatch floor: a trivial jitted chain of the same call count
f = jax.jit(lambda x: x * 1.000001 + 1e-9)
x = jnp.zeros((1024, 1024), jnp.float32)
x = f(x); float(x[0, 0])
t0 = time.perf_counter()
for _ in range(120):
    x = f(x)
float(x[0, 0])
print(f"trivial jitted call chain: {(time.perf_counter()-t0)/120*1e3:.2f} ms/call", flush=True)
