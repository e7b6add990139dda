"""A/B the DCT projection's MXU precision (StamConfig.dct_precision)
at 256^3 and 512^3: full step ms + final Poisson residual per setting,
interleaved in ONE process.

The DCT solve is matmul-bound at large n; HIGHEST = 6-pass f32
emulation, HIGH = 3 bf16 passes, DEFAULT = 1 bf16 pass — precision
costs MXU passes, so the question is how many residual digits each
pass tier buys back vs the 20-sweep Jacobi reference (~2.5e-5).

    python verify/bench_dct_precision.py [n ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from tpufluids.grid import stam

sizes = [int(a) for a in sys.argv[1:]] or [256, 512]

for n in sizes:
    print(f"--- n={n}", flush=True)
    steps = 24 if n <= 256 else 10
    runs = {}
    for prec in ("highest", "high", "default"):
        cfg = stam.StamConfig(n=n, dt=0.5 / n, jacobi_iters=20,
                              red_black=True, vorticity_eps=2.0,
                              buoyancy_beta=0.5, buoyancy_alpha=0.05,
                              advect_mode="stencil", projection="dct",
                              dct_precision=prec)
        state = stam.make_grid3d(cfg)
        k = n // 8
        state = state.replace(
            dens=state.dens.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(1.0),
            temp=state.temp.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(3.0))
        state, res = stam.run3d_python(state, cfg, 3)
        float(jnp.sum(state.u))
        runs[prec] = (cfg, state)
    for rep in range(3):
        for prec, (cfg, state) in runs.items():
            t0 = time.perf_counter()
            state, res = stam.run3d_python(state, cfg, steps)
            float(jnp.sum(state.u))
            ms = (time.perf_counter() - t0) / steps * 1e3
            print(f"n={n} dct {prec:8s} {ms:8.2f} ms/step  "
                  f"residual {float(res[-1]):.3e}", flush=True)
            runs[prec] = (cfg, state)
print("DONE", flush=True)
