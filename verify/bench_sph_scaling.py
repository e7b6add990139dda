"""SPH throughput scaling: random blob, base physics, Pallas backend
(the BASELINE.md scaling rows)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.config import BASE_CONFIG
from tpufluids.binning import suggest_col_cap
from tpufluids.state import make_state
from tpufluids.step import run_python

for n in (32768, 131072, 524288):
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)), jnp.float32)
    s = make_state(pos, cfg=BASE_CONFIG)
    cap = suggest_col_cap(s, BASE_CONFIG)
    cfg = BASE_CONFIG.replace(pallas_col_cap=cap)
    print(f"n={n}: col cap {cap}", flush=True)
    s, m = run_python(s, cfg, 2)
    float(s.pos[0, 0])
    steps = 30 if n < 300000 else 10
    t0 = time.perf_counter()
    s, m = run_python(s, cfg, steps)
    float(s.pos[0, 0])
    print(f"{n}: {(time.perf_counter()-t0)/steps*1e3:.2f} ms/step, "
          f"overflow={int(jnp.max(m.bin_overflow))}", flush=True)
