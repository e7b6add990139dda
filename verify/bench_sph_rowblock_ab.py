"""A/B: rowblock vs column Pallas SPH force kernels, interleaved in one
process (tunnel variance rule, CLAUDE.md).  Real-TPU probe."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.scenes import base_dam, unidyn_tank
from tpufluids.step import run_python

STEPS = 40
ROUNDS = 3

cases = []
for name, cfg, scene in (("base_dam", BASE_CONFIG, base_dam),
                         ("unidyn_tank", UNIDYN_CONFIG, unidyn_tank)):
    for kern in ("column", "rowblock"):
        cases.append((f"{name}/{kern}", cfg.replace(pallas_kernel=kern),
                      scene))

states = {}
for label, cfg, scene in cases:
    s = scene(cfg)
    s, m = run_python(s, cfg, 2)   # compile + settle
    float(s.pos[0, 0])
    states[label] = s

results = {label: [] for label, _, _ in cases}
for r in range(ROUNDS):
    for label, cfg, scene in cases:
        s = states[label]
        t0 = time.perf_counter()
        s, m = run_python(s, cfg, STEPS)
        float(s.pos[0, 0])
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        states[label] = s
        results[label].append(dt)
        print(f"round {r} {label}: {dt:.2f} ms/step "
              f"overflow={int(jnp.max(m.bin_overflow))}", flush=True)

print("--- medians ---")
for label in results:
    v = sorted(results[label])[ROUNDS // 2]
    print(f"{label}: {v:.2f} ms/step", flush=True)
