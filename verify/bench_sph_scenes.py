import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.scenes import base_dam, unidyn_tank
from tpufluids.step import run_python

for name, cfg, scene in (("base_dam", BASE_CONFIG, base_dam),
                         ("unidyn_tank", UNIDYN_CONFIG, unidyn_tank)):
    s = scene(cfg)
    s, m = run_python(s, cfg, 2)
    float(s.pos[0, 0])
    t0 = time.perf_counter()
    s, m = run_python(s, cfg, 60)
    float(s.pos[0, 0])
    print(f"{name}: {(time.perf_counter()-t0)/60*1e3:.2f} ms/step, "
          f"overflow={int(jnp.max(m.bin_overflow))}, "
          f"max_speed={float(jnp.ravel(m.max_speed)[-1]):.3f}", flush=True)
