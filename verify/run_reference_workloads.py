"""Run both reference scenes to their full step counts (solver.cu:19
t<4000; solver-unidyn.cu:23 t<1450) and report wall time + physics
sanity — the closest thing to the reference's own headline benchmark.

Exits nonzero if an end-state envelope drifts (r4: the recorded facts
became regression guards — BASELINE.md "Full reference trajectories"):
finiteness, full alive counts, zero overflow, and the final z range
(base_dam free-falls through open space — solver.cu:115-121 seeds with
no floor — so z brackets -g*t^2/2 at t = 2 s; unidyn_tank settles
inside the tank walls above the floor recycle plane at -0.89)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.scenes import base_dam, unidyn_tank
from tpufluids.step import run_python

# name -> (alive, z_min bracket, z_max bracket); r3 measured end states:
# base_dam z [-21.26, -17.84], unidyn_tank z [-0.74, -0.30]
ENVELOPES = {
    "base_dam": (8000, (-25.0, -15.0), (-22.0, -14.0)),
    "unidyn_tank": (14040, (-0.95, -0.55), (-0.55, 0.1)),
}

failures = []
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
    alive = int(s.num_alive())
    finite = bool(jnp.isfinite(s.pos).all())
    overflow = int(jnp.max(m.bin_overflow))
    zmin, zmax = float(pos[:, 2].min()), float(pos[:, 2].max())
    print(f"{name}: {steps} steps in {dt:.1f}s = {dt/steps*1e3:.2f} ms/step; "
          f"alive={alive}, finite={finite}, overflow={overflow}, "
          f"pos range z [{zmin:.3f},{zmax:.3f}]", flush=True)

    want_alive, zmin_b, zmax_b = ENVELOPES[name]
    for label, ok in (
            ("alive", alive == want_alive),
            ("finite", finite),
            ("overflow", overflow == 0),
            ("z_min", zmin_b[0] <= zmin <= zmin_b[1]),
            ("z_max", zmax_b[0] <= zmax <= zmax_b[1])):
        if not ok:
            failures.append(f"{name}: {label} out of envelope")

if failures:
    print("REGRESSION: " + "; ".join(failures), flush=True)
    sys.exit(1)
print("end-state envelopes OK", flush=True)
