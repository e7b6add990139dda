"""SPH scaling A/B: row-block vs column Pallas force kernels at
32k/131k/524k uniform fill (the BASELINE.md scaling rows were measured
with the column family before row-block became the default).

Interleaved in one process (tunnel variance +-10-15%).  Run on the
real chip: python verify/bench_sph_scaling_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.config import BASE_CONFIG
from tpufluids.binning import suggest_col_cap
from tpufluids.state import make_state
from tpufluids.step import run_python

for n in (32768, 131072, 524288):
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)), jnp.float32)
    s0 = make_state(pos, cfg=BASE_CONFIG)
    cap = suggest_col_cap(s0, BASE_CONFIG)
    cfgs = {
        "rowblock": BASE_CONFIG.replace(pallas_kernel="rowblock"),
        "column": BASE_CONFIG.replace(pallas_kernel="column",
                                      pallas_col_cap=cap),
    }
    steps = 30 if n < 300000 else 10
    warm = {}
    for name, cfg in cfgs.items():
        try:
            s, m = run_python(s0, cfg, 2)
            float(s.pos[0, 0])
            warm[name] = cfg
        except Exception as e:
            print(f"n={n} {name}: FAIL {str(e)[:120]}", flush=True)
    acc = {k: [] for k in warm}
    ovf = {}
    for _ in range(3):
        for name, cfg in warm.items():
            s, _ = run_python(s0, cfg, 2)
            float(s.pos[0, 0])
            t0 = time.perf_counter()
            s, m = run_python(s0, cfg, steps)
            float(s.pos[0, 0])
            acc[name].append((time.perf_counter() - t0) / steps * 1e3)
            ovf[name] = int(jnp.max(m.bin_overflow))
    for name, ts in acc.items():
        print(f"n={n} {name:9s} {sorted(ts)[1]:8.2f} ms/step (runs "
              f"{[round(t, 1) for t in ts]}, overflow {ovf[name]})",
              flush=True)
