"""A/B the zg-resident step loop (state stays in the z-ghostless
layout across steps, conversions once per run) against dense per-step
stepping, and measure the small-grid call-fusion work (whole-solve,
fused projection, multi-field diffuse) — one process, interleaved.

    python verify/bench_zg_resident.py [n ...]   # default 64 128 256
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

sizes = [int(a) for a in sys.argv[1:]] or [64, 128, 256]

for n in sizes:
    cfg = stam.StamConfig(n=n, dt=0.05, diff=1e-5, visc=1e-5,
                          jacobi_iters=20, red_black=True,
                          advect_mode="stencil", buoyancy_alpha=0.05,
                          buoyancy_beta=1.0, vorticity_eps=2.0)
    s = stam.make_grid3d(cfg)
    s = s.replace(dens=stam.set_bnd3d(
        0, s.dens.at[n // 3:n // 2, n // 3:n // 2, 1:n // 8].set(1.0)),
        temp=stam.set_bnd3d(
        0, s.temp.at[n // 3:n // 2, n // 3:n // 2, 1:n // 8].set(3.0)))

    step = stam._jitted_step3d(cfg)
    step_res = stam._jitted_step3d(cfg, True)

    def run_dense(s0, k):
        # same call shape as run3d_python: k-1 plain steps + one
        # with_residual step, so the arms differ ONLY by the layout
        # conversions and per-step entry/exit passes under test
        for _ in range(k - 1):
            s0 = step(s0)
        s0, _res = step_res(s0)
        float(s0.u[1, 1, 1])
        return s0

    def run_zg(s0, k):
        out, _ = stam.run3d_python(s0, cfg, k)
        float(out.u[1, 1, 1])
        return out

    # compile both paths
    run_dense(s, 1)
    run_zg(s, 2)
    steps = 30 if n <= 128 else 10
    acc = {"dense per-step": [], "zg-resident": []}
    for _ in range(3):
        for name, f in (("dense per-step", run_dense),
                        ("zg-resident", run_zg)):
            f(s, 2)  # settle
            t0 = time.perf_counter()
            f(s, steps)
            acc[name].append((time.perf_counter() - t0) / steps * 1e3)
    print(f"--- n={n} ({steps} steps/rep)")
    for name, ts in acc.items():
        print(f"{name:16s} {sorted(ts)[1]:8.2f} ms/step  (runs: "
              f"{[round(t, 2) for t in ts]})", flush=True)
