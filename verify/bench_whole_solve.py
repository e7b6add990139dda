"""A/B the whole-solve-in-VMEM solvers against the windowed plans at
small grid sizes (one process, interleaved — tunnel variance +-10-15%).

Whole-solve mode (rb: tx=n_full/fuse=iters; jacobi: same encoding) runs
the entire iteration loop in ONE kernel call with the buffers resident:
no per-pass call overhead, no halo recompute, one HBM read+write.
rb_packed_plan / stam._lin_solve3d pick it automatically under the
jacobi_whole_ok / 6 MB gates; this probe verifies the gate choice on
the real chip.

    python verify/bench_whole_solve.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.grid import pallas_kernels as pk

for n in (64, 128):
    shape = (n + 2,) * 3
    x0 = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    z = jnp.zeros(shape, jnp.float32)
    print(f"--- n={n}, auto rb plan: {pk.rb_packed_plan(shape, 20)}",
          flush=True)

    cands = {
        "rb windowed tx=24 fuse=4": lambda x0: pk.lin_solve3d_rb_packed(
            0, z, x0, 1.0, 6.0, 20, tx=24, fuse=4, x_zero=True),
        "rb whole": lambda x0: pk.lin_solve3d_rb_packed(
            0, z, x0, 1.0, 6.0, 20, tx=n + 2, fuse=20, x_zero=True),
        "jac windowed tx=24 fuse=2": lambda x0: pk.lin_solve3d_pallas(
            0, x0, x0, 1.0, 7.0, 20, fuse=2, tx=24),
        "jac whole": lambda x0: pk.lin_solve3d_pallas(
            0, x0, x0, 1.0, 7.0, 20, fuse=20, tx=n + 2),
    }
    fns, ref = {}, {}
    for name, f in cands.items():
        fj = jax.jit(f)
        try:
            r = fj(x0)
        except Exception as e:
            print(f"{name:28s} FAIL {str(e)[:120]}", flush=True)
            continue
        key = name.split()[0]
        if key not in ref:
            ref[key] = r
        else:
            d = float(jnp.max(jnp.abs(r - ref[key])))
            if d != 0.0:
                print(f"{name}: NOT bit-compatible, max|diff|={d}",
                      flush=True)
                continue
        fns[name] = fj
        print(f"{name:28s} compiled, sum={float(jnp.sum(r)):.6e}",
              flush=True)

    acc = {k: [] for k in fns}
    for _ in range(3):
        for name, f in fns.items():
            r = f(x0)
            float(r[1, 1, 1])
            t0 = time.perf_counter()
            for _ in range(20):
                r = f(x0)
            float(r[1, 1, 1])
            acc[name].append((time.perf_counter() - t0) / 20 * 1e3)
    for name, ts in acc.items():
        print(f"{name:28s} {sorted(ts)[1]:8.3f} ms  (runs: "
              f"{[round(t, 2) for t in ts]})", flush=True)
