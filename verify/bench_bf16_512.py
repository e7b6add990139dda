"""512^3 step with bfloat16 solver sweeps (solver_dtype option) vs the
f32 benchmark config, one process — the VPU-bound projection is the
~55% stage of the 512^3 step, and bf16 doubles VPU throughput at the
cost of ~3 decimal digits in the solved pressure (visual-effects
quality; the benchmark definition stays f32).

    python verify/bench_bf16_512.py [n]
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

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
steps = 10
# one dtype resident at a time: two 512^3 5-field states plus step
# intermediates exhausted the (shared) chip's HBM when interleaved —
# sequential phases trade the +-10-15% tunnel variance for fitting,
# acceptable for the ~2x effect under test
for dt_ in ("float32", "bfloat16"):
    cfg = stam.StamConfig(n=n, dt=0.5 / n, jacobi_iters=20,
                          red_black=True, vorticity_eps=2.0,
                          buoyancy_beta=0.5, buoyancy_alpha=0.05,
                          advect_mode="stencil", solver_dtype=dt_)
    state = stam.make_grid3d(cfg)
    k = n // 8
    state = state.replace(
        dens=state.dens.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(1.0),
        temp=state.temp.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(3.0))
    state, res = stam.run3d_python(state, cfg, 3)
    float(jnp.sum(state.u))
    for rep in range(3):
        t0 = time.perf_counter()
        state, res = stam.run3d_python(state, cfg, steps)
        float(jnp.sum(state.u))
        ms = (time.perf_counter() - t0) / steps * 1e3
        print(f"n={n} solver_dtype={dt_:9s} {ms:8.2f} ms/step  "
              f"residual {float(res[-1]):.3e}", flush=True)
    del state, res
print("DONE", flush=True)
