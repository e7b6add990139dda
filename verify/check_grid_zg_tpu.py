"""Real-TPU validation + timing of the z-ghostless grid kernels
(CLAUDE.md: pallas kernels need real-TPU validation, not just
interpret mode).

1. 64^3 step3d: pallas (z-ghostless layout) vs dense XLA, 3 steps.
2. 256^3 headline config (red-black jacobi x20 + vorticity + stencil
   advect): ms/step, to compare against the round-1 ghosted-layout
   number (BASELINE.md config 3).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import numpy as np
from tpufluids.grid import stam

# --- correctness at 64^3 ---------------------------------------------------
kw = dict(n=64, dt=0.05, jacobi_iters=20, red_black=True,
          advect_mode="stencil", vorticity_eps=2.0, buoyancy_beta=0.6,
          buoyancy_alpha=0.05)
cfg_p = stam.StamConfig(solver_backend="pallas", **kw)
cfg_x = stam.StamConfig(solver_backend="xla", **kw)
s0 = stam.make_grid3d(cfg_p)
s0 = s0.replace(temp=s0.temp.at[20:44, 20:44, 2:8].set(2.0),
                dens=s0.dens.at[20:44, 20:44, 2:8].set(1.0))

outs = {}
for name, cfg in (("pallas", cfg_p), ("xla", cfg_x)):
    s = s0
    step = jax.jit(lambda st, c=cfg: stam.step3d(st, c))
    for _ in range(3):
        s = step(s)
    outs[name] = jax.device_get(s)
for f in ("u", "v", "w", "dens", "temp"):
    a = np.asarray(getattr(outs["pallas"], f))
    b = np.asarray(getattr(outs["xla"], f))
    scale = max(1.0, np.abs(b).max())
    err = np.abs(a - b).max() / scale
    print(f"64^3 step3d {f}: rel max err {err:.2e}", flush=True)
    assert err < 5e-6, (f, err)
print("64^3 pallas-vs-xla step3d on TPU: PASS", flush=True)

# --- 256^3 headline timing -------------------------------------------------
cfg = stam.StamConfig(n=256, dt=0.05, jacobi_iters=20, red_black=True,
                      advect_mode="stencil", vorticity_eps=2.0,
                      buoyancy_beta=0.6, buoyancy_alpha=0.05,
                      solver_backend="pallas")
s = stam.make_grid3d(cfg)
s = s.replace(temp=s.temp.at[100:160, 100:160, 2:20].set(2.0),
              dens=s.dens.at[100:160, 100:160, 2:20].set(1.0))
step = jax.jit(lambda st: stam.step3d(st, cfg))
t0 = time.perf_counter()
s = step(s)
float(s.u[1, 1, 1])
print(f"256^3 compile+first step: {time.perf_counter()-t0:.1f} s",
      flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        s = step(s)
    float(s.u[1, 1, 1])
    dt_ms = (time.perf_counter() - t0) / N * 1e3
    print(f"256^3 step3d: {dt_ms:.1f} ms/step (rep {rep})", flush=True)
assert np.isfinite(np.asarray(jax.device_get(s.u))).all()
print("done", flush=True)
