"""Sharded-grid-on-1-chip overhead A/B (VERDICT r4 #3): unsharded
256^3 DCT step vs the sharded step on a 1-device mesh, interleaved in
ONE process (the tunnel's ±10-15% run-to-run variance would swamp the
~1-2 ms gap across processes).  The r5 change under test: the
n_dev==1 fast path in _dct_solve_local_zg (dense interior solver —
3-axis radix, no partial-matmul/psum_scatter pattern).

    python verify/bench_config5_parts.py [n]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp

from tpufluids.grid import stam
from tpufluids.shard import grid_sharded, make_mesh

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SEG = 20

cfg = stam.StamConfig(n=n, dt=0.5 / n, jacobi_iters=20, red_black=True,
                      vorticity_eps=2.0, buoyancy_beta=0.5,
                      buoyancy_alpha=0.05, advect_mode="stencil",
                      projection="dct")
s = stam.make_grid3d(cfg)
k = n // 8
s = s.replace(dens=s.dens.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(1.0),
              temp=s.temp.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(3.0))

print(f"device: {jax.devices()[0]}, n={n}", flush=True)

# unsharded
t0 = time.perf_counter()
su, _ = stam.run3d_python(s, cfg, 3)
float(jnp.sum(su.u))
print(f"unsharded compile+warm: {time.perf_counter() - t0:.1f}s", flush=True)

# sharded on 1 device
mesh = make_mesh(1)
s5 = grid_sharded.shard_state(grid_sharded.to_sharded_layout(s), mesh)
step5 = grid_sharded.make_sharded_step(mesh, cfg, n_steps=SEG)
t0 = time.perf_counter()
s5w, r5 = step5(s5)
float(jnp.sum(s5w.u))
print(f"sharded compile+warm: {time.perf_counter() - t0:.1f}s", flush=True)

res_u, res_s = [], []
for rep in range(3):
    t0 = time.perf_counter()
    su, ru = stam.run3d_python(su, cfg, SEG)
    float(jnp.sum(su.u))
    res_u.append((time.perf_counter() - t0) / SEG * 1e3)
    t0 = time.perf_counter()
    s5w, r5 = step5(s5w)
    float(jnp.sum(s5w.u))
    res_s.append((time.perf_counter() - t0) / SEG * 1e3)

mu = sorted(res_u)[1]
ms = sorted(res_s)[1]
print(f"unsharded: {mu:.2f} ms/step {[round(x,2) for x in res_u]} "
      f"residual {float(ru[-1]):.2e}", flush=True)
print(f"sharded(1): {ms:.2f} ms/step {[round(x,2) for x in res_s]} "
      f"residual {float(r5):.2e}", flush=True)
print(f"overhead: {(ms / mu - 1) * 100:.1f}%", flush=True)
