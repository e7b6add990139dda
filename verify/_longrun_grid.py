import os, sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.grid import stam

n = 256
cfg = stam.StamConfig(n=n, dt=0.5 / n, jacobi_iters=20, red_black=True,
                      vorticity_eps=2.0, buoyancy_beta=0.5,
                      buoyancy_alpha=0.05, advect_mode="stencil")
s = stam.make_grid3d(cfg)
k = n // 8
s = s.replace(dens=s.dens.at[3*k:5*k, 3*k:5*k, 1:k].set(1.0),
              temp=s.temp.at[3*k:5*k, 3*k:5*k, 1:k].set(3.0))
t0 = time.perf_counter()
s, res = stam.run3d_python(s, cfg, 500)
print(f"500 steps in {time.perf_counter()-t0:.0f}s; residual {float(res[-1]):.3e}")
for f in ("u","v","w","dens","temp"):
    a = getattr(s, f)
    print(f"{f}: finite={bool(jnp.isfinite(a).all())} max|.|={float(jnp.abs(a).max()):.3f}")
