"""Real-TPU validation + A/B of the fused whole-2D-step kernel
(config 1 of BASELINE.json: 128^2 smoke box, 20 Jacobi iters).

Compares the ONE-kernel-call step (pallas + stencil advect) against
the multi-call path (per-solve pallas kernels + dense XLA stages) for
numerics and ms/step, interleaved in one process.

    python verify/bench_step2d_whole.py [n]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.grid import pallas_kernels as pk
from tpufluids.grid import stam

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
cfg = stam.StamConfig(n=n, dt=0.1, diff=1e-5, visc=1e-5,
                      jacobi_iters=20, advect_mode="stencil")
src = jnp.zeros((n + 2, n + 2), jnp.float32).at[n//2-4:n//2+4, 4:8].set(5.0)
sources = {"dens": src, "fv": jnp.zeros_like(src).at[n//2-4:n//2+4,
                                                     4:8].set(2.0)}

# numeric check: 10 steps whole vs multi-call (monkeypatch the gate)
s0 = stam.make_grid2d(cfg).replace(
    dens=jnp.full((n + 2, n + 2), 0.1, jnp.float32))
ok_orig = pk.step2d_whole_ok
whole = jax.jit(lambda s: stam.step2d(s, cfg, sources))
pk.step2d_whole_ok = lambda shape: False
multi = jax.jit(lambda s: stam.step2d(s, cfg, sources))
pk.step2d_whole_ok = ok_orig

a, b = s0, s0
for _ in range(10):
    a, b = whole(a), multi(b)
for f in ("u", "v", "dens"):
    x, y = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
    scale = max(1.0, np.abs(y).max())
    print(f"whole-vs-multicall {f}: rel max err "
          f"{np.abs(x - y).max() / scale:.2e}", flush=True)

# A/B ms/step (fence cadence matching run2d_python: every 64)
res = {}
for rep in range(3):
    for name, fn in (("whole", whole), ("multi", multi)):
        s = s0
        t0 = time.perf_counter()
        for i in range(128):
            s = fn(s)
            if (i & 63) == 63:
                float(s.dens[1, 1])
        res.setdefault(name, []).append(
            (time.perf_counter() - t0) / 128 * 1e3)
for name, v in res.items():
    print(f"step2d {name:6s} {min(v):6.2f} ms/step  {v}", flush=True)
