"""Measured numbers for all five BASELINE.json configs."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.grid import stam

# config 1: 2D 128^2 smoke box, 20 jacobi iters
n = 128
cfg = stam.StamConfig(n=n, dt=0.1, diff=1e-5, visc=1e-5, jacobi_iters=20)
s = stam.make_grid2d(cfg)
src = jnp.zeros((n + 2, n + 2), jnp.float32).at[n//2-4:n//2+4, 4:8].set(5.0)
fv = jnp.zeros_like(src).at[n//2-4:n//2+4, 4:8].set(2.0)
sources = {"dens": src, "fv": fv}
s = stam.run2d_python(s, cfg, 3, sources=sources)
float(s.dens[1, 1])
t0 = time.perf_counter()
s = stam.run2d_python(s, cfg, 100, sources=sources)
float(s.dens[1, 1])
print(f"config1 smoke2d 128^2: {(time.perf_counter()-t0)/100*1e3:.2f} ms/step", flush=True)

# config 2: 3D 64^3 velocity+density step with walls and inflow source
# config 4: buoyant plume 64^3 (temperature + gravity forcing)
for name, kw in (("config2 grid3d 64^3", {}),
                 ("config4 plume3d 64^3", dict(buoyancy_alpha=0.05,
                                               buoyancy_beta=1.0,
                                               vorticity_eps=2.0))):
    cfg = stam.StamConfig(n=64, dt=0.05, diff=1e-5, visc=1e-5,
                          jacobi_iters=20, red_black=True,
                          advect_mode="stencil", **kw)
    s = stam.make_grid3d(cfg)
    k = 8
    s = s.replace(dens=s.dens.at[24:40, 24:40, 1:9].set(1.0),
                  temp=s.temp.at[24:40, 24:40, 1:9].set(3.0))
    s, res = stam.run3d_python(s, cfg, 3)
    float(jnp.sum(s.u))
    t0 = time.perf_counter()
    s, res = stam.run3d_python(s, cfg, 100)
    float(jnp.sum(s.u))
    print(f"{name}: {(time.perf_counter()-t0)/100*1e3:.2f} ms/step, "
          f"residual {float(res[-1]):.2e}", flush=True)
