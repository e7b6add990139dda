"""Run both reference scenes to their full step counts (solver.cu:19
t<4000; solver-unidyn.cu:23 t<1450) and report wall time + physics
sanity — the closest thing to the reference's own headline benchmark."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.scenes import base_dam, unidyn_tank
from tpufluids.step import run_python

for name, cfg, scene, steps in (("base_dam", BASE_CONFIG, base_dam, 4000),
                                ("unidyn_tank", UNIDYN_CONFIG, unidyn_tank, 1450)):
    s = scene(cfg)
    s, m = run_python(s, cfg, 2)
    float(s.pos[0, 0])
    t0 = time.perf_counter()
    s, m = run_python(s, cfg, steps)
    float(s.pos[0, 0])
    dt = time.perf_counter() - t0
    pos = s.pos[s.alive]
    print(f"{name}: {steps} steps in {dt:.1f}s = {dt/steps*1e3:.2f} ms/step; "
          f"alive={int(s.num_alive())}, finite={bool(jnp.isfinite(s.pos).all())}, "
          f"overflow={int(jnp.max(m.bin_overflow))}, "
          f"pos range z [{float(pos[:,2].min()):.3f},{float(pos[:,2].max()):.3f}]",
          flush=True)
