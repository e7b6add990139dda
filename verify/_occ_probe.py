import os, sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.scenes import base_dam, unidyn_tank
from tpufluids.step import run_python
from tpufluids.binning import suggest_col_cap

for name, cfg, scene, steps in (("base_dam", BASE_CONFIG, base_dam, 4000),
                                ("unidyn_tank", UNIDYN_CONFIG, unidyn_tank, 1450)):
    s = scene(cfg)
    print(f"{name} initial cap suggestion: {suggest_col_cap(s, cfg)}", flush=True)
    peak = 0
    for chunk in range(10):
        s, m = run_python(s, cfg, steps // 10)
        float(s.pos[0, 0])
        cap = suggest_col_cap(s, cfg, headroom=1.0, minimum=0)
        peak = max(peak, cap)
    print(f"{name} peak exact max-column over run (sampled): {peak}", flush=True)
