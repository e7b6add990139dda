"""A/B the run_python fence cadence on the real TPU.  The every-8-step
blocking readback costs a tunnel round trip; at 2-8 ms step times it
can dominate.  Interleaved, one process."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.scenes import base_dam, unidyn_tank
from tpufluids.step import _jitted_sph_step

STEPS = 96

def run_fenced(s, cfg, n, every):
    for i in range(n):
        s, m = _jitted_sph_step(s, cfg, None)
        if every and (i % every) == every - 1:
            float(s.pos[0, 0])
    float(s.pos[0, 0])
    return s

cases = []
for name, cfg, scene in (("base", BASE_CONFIG, base_dam),
                         ("uni", UNIDYN_CONFIG, unidyn_tank)):
    s = scene(cfg)
    s = run_fenced(s, cfg, 2, 1)
    cases.append((name, cfg, s))

res = {}
for rnd in range(3):
    for name, cfg, s in cases:
        for every in (8, 32, 0):
            t0 = time.perf_counter()
            run_fenced(s, cfg, STEPS, every)
            dt = (time.perf_counter() - t0) / STEPS * 1e3
            res.setdefault((name, every), []).append(dt)
            print(f"r{rnd} {name} fence={every}: {dt:.2f} ms/step",
                  flush=True)
print("--- medians ---")
for k in sorted(res, key=str):
    print(f"{k[0]:5s} fence={k[1]:3d}: {sorted(res[k])[1]:.2f} ms/step",
          flush=True)
